#!/bin/bash
# MaPLe imbalanced base-to-new protocol (train phase).
# Parity: reference scripts/maple/base2new_fewshot_train.sh
# usage: bash scripts/maple/base2new_fewshot_train.sh <dataset> <seed> \
#            '<per_class_shots>' [data_root]     e.g. '[16,16,16,1,1,1]'
# env overrides: CFG, LOADEP, SUB, SHOTS (default -2 sentinel)
cd "$(dirname "$0")/../.."
MODE=train
TRAINER=MaPLe
CFGDIR=MaPLe
CFG=${CFG:-vit_b16_t1_d9_ep5_batch4_2ctx}
LOADEP=${LOADEP:-5}
source scripts/_lib/base2new_fewshot.sh "$@"
