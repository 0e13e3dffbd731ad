#!/bin/bash
# Setting-B imbalance sweep with the trainer pinned to IVLP.
# Parity: reference scripts/independent-vlp/run_setting_b.sh.
# usage: bash scripts/independent-vlp/run_setting_b.sh <dataset> <seed> \
#            <config> <n_head_classes> <n_tail_classes> [data_root]
exec bash "$(dirname "$0")/../imbalance/run_setting_b.sh" IVLP "$@"
