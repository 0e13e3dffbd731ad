#!/bin/bash
# IVLP base-to-novel: evaluate a base-trained checkpoint on the novel half.
# Parity: reference scripts/independent-vlp/base2new_test*.sh
# usage: bash scripts/independent-vlp/base2new_test.sh <dataset> <seed> [data_root]
# env overrides: CFG, LOADEP, SUB (new|base|all), SHOTS
cd "$(dirname "$0")/../.."
TRAINER=IVLP
CFGDIR=IVLP
CFG=${CFG:-vit_b16_c2_ep5_batch4_2+2ctx}
LOADEP=${LOADEP:-5}
source scripts/_lib/base2new_test.sh "$@"
