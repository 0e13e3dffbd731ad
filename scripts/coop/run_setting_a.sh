#!/bin/bash
# Setting-A imbalance sweep with the trainer pinned to CoOp.
# Parity: reference scripts/coop/run_setting_a.sh (the generic sweep lives
# in scripts/imbalance/run_setting_a.sh).
# usage: bash scripts/coop/run_setting_a.sh <dataset> <seed> <config> \
#            <n_head_classes> <n_tail_classes> [loss_type] [data_root]
exec bash "$(dirname "$0")/../imbalance/run_setting_a.sh" CoOp "$@"
