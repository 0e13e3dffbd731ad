#!/bin/bash
# PLIP base-to-novel: evaluate a base-trained checkpoint on the novel half.
# Parity: reference scripts/plip/base2new_test*.sh
# usage: bash scripts/plip/base2new_test.sh <dataset> <seed> [data_root]
# env overrides: CFG, LOADEP, SUB (new|base|all), SHOTS
cd "$(dirname "$0")/../.."
TRAINER=PLIP
CFGDIR=PLIP
CFG=${CFG:-vit_b16_c4_ep10_batch4}
LOADEP=${LOADEP:-10}
source scripts/_lib/base2new_test.sh "$@"
