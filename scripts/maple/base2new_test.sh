#!/bin/bash
# MaPLe base-to-novel: evaluate a base-trained checkpoint on the novel half.
# Parity: reference scripts/maple/base2new_test*.sh
# usage: bash scripts/maple/base2new_test.sh <dataset> <seed> [data_root]
# env overrides: CFG, LOADEP, SUB (new|base|all), SHOTS
cd "$(dirname "$0")/../.."
TRAINER=MaPLe
CFGDIR=MaPLe
CFG=${CFG:-vit_b16_t1_d9_ep5_batch4_2ctx}
LOADEP=${LOADEP:-5}
source scripts/_lib/base2new_test.sh "$@"
