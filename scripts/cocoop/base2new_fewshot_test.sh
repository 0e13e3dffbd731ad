#!/bin/bash
# CoCoOp imbalanced base-to-new protocol (test phase).
# Parity: reference scripts/cocoop/base2new_fewshot_test.sh
# usage: bash scripts/cocoop/base2new_fewshot_test.sh <dataset> <seed> \
#            '<per_class_shots>' [data_root]     e.g. '[16,16,16,1,1,1]'
# env overrides: CFG, LOADEP, SUB, SHOTS (default -2 sentinel)
cd "$(dirname "$0")/../.."
MODE=test
TRAINER=CoCoOp
CFGDIR=CoCoOp
CFG=${CFG:-vit_b16_c4_ep10_batch1_ctxv1}
LOADEP=${LOADEP:-10}
source scripts/_lib/base2new_fewshot.sh "$@"
