#!/bin/bash
# Setting-B imbalance sweep with the trainer pinned to PromptSRC.
# Parity: reference scripts/promptsrc/run_setting_b.sh (the generic sweep
# lives in scripts/imbalance/run_setting_b.sh).
# usage: bash scripts/promptsrc/run_setting_b.sh <dataset> <seed> <config> \
#            <n_head_classes> <n_tail_classes> [data_root]
exec bash "$(dirname "$0")/../imbalance/run_setting_b.sh" PromptSRC "$@"
