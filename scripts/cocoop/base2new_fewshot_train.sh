#!/bin/bash
# CoCoOp imbalanced base-to-new protocol (train phase).
# Parity: reference scripts/cocoop/base2new_fewshot_train.sh
# usage: bash scripts/cocoop/base2new_fewshot_train.sh <dataset> <seed> \
#            '<per_class_shots>' [data_root]     e.g. '[16,16,16,1,1,1]'
# env overrides: CFG, LOADEP, SUB, SHOTS (default -2 sentinel)
cd "$(dirname "$0")/../.."
MODE=train
TRAINER=CoCoOp
CFGDIR=CoCoOp
CFG=${CFG:-vit_b16_c4_ep10_batch1_ctxv1}
LOADEP=${LOADEP:-10}
source scripts/_lib/base2new_fewshot.sh "$@"
