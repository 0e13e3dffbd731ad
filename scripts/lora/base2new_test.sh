#!/bin/bash
# LoRA base-to-novel: evaluate a base-trained checkpoint on the novel half.
# Parity: reference scripts/lora/base2new_test*.sh
# usage: bash scripts/lora/base2new_test.sh <dataset> <seed> [data_root]
# env overrides: CFG, LOADEP, SUB (new|base|all), SHOTS
cd "$(dirname "$0")/../.."
TRAINER=LoRA
CFGDIR=LoRA
CFG=${CFG:-vit_b16_ep10_batch32}
LOADEP=${LOADEP:-10}
source scripts/_lib/base2new_test.sh "$@"
