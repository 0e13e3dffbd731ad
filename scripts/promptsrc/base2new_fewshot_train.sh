#!/bin/bash
# PromptSRC imbalanced base-to-new protocol (train phase).
# Parity: reference scripts/promptsrc/base2new_fewshot_train.sh
# usage: bash scripts/promptsrc/base2new_fewshot_train.sh <dataset> <seed> \
#            '<per_class_shots>' [data_root]     e.g. '[16,16,16,1,1,1]'
# env overrides: CFG, LOADEP, SUB, SHOTS (default -2 sentinel)
cd "$(dirname "$0")/../.."
MODE=train
TRAINER=PromptSRC
CFGDIR=PromptSRC
CFG=${CFG:-vit_b16_c2_ep20_batch4_4+4ctx}
LOADEP=${LOADEP:-20}
source scripts/_lib/base2new_fewshot.sh "$@"
