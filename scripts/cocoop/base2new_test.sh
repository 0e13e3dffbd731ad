#!/bin/bash
# CoCoOp base-to-novel: evaluate a base-trained checkpoint on the novel half.
# Parity: reference scripts/cocoop/base2new_test*.sh
# usage: bash scripts/cocoop/base2new_test.sh <dataset> <seed> [data_root]
# env overrides: CFG, LOADEP, SUB (new|base|all), SHOTS
cd "$(dirname "$0")/../.."
TRAINER=CoCoOp
CFGDIR=CoCoOp
CFG=${CFG:-vit_b16_c4_ep10_batch1_ctxv1}
LOADEP=${LOADEP:-10}
source scripts/_lib/base2new_test.sh "$@"
