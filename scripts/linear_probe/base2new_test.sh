#!/bin/bash
# LinearProbeCLIP base-to-novel: evaluate a base-trained checkpoint on the novel half.
# Parity: reference scripts/linear_probe/base2new_test*.sh
# usage: bash scripts/linear_probe/base2new_test.sh <dataset> <seed> [data_root]
# env overrides: CFG, LOADEP, SUB (new|base|all), SHOTS
cd "$(dirname "$0")/../.."
TRAINER=LinearProbeCLIP
CFGDIR=LinearProbeCLIP
CFG=${CFG:-vit_b16_ep50}
LOADEP=${LOADEP:-50}
source scripts/_lib/base2new_test.sh "$@"
