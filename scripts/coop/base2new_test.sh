#!/bin/bash
# CoOp base-to-novel: evaluate a base-trained checkpoint on the novel half.
# Parity: reference scripts/coop/base2new_test.sh
# usage: bash scripts/coop/base2new_test.sh <dataset> <seed> [data_root]
# env overrides: CFG, NCTX, CSC, CTP, LOADEP, SUB, SHOTS
cd "$(dirname "$0")/../.."
TRAINER=CoOp; CFGDIR=CoOp
CFG=${CFG:-vit_b16_ep50}; NCTX=${NCTX:-16}; CSC=${CSC:-False}; CTP=${CTP:-end}
LOADEP=${LOADEP:-50}
TAG=_nctx${NCTX}_csc${CSC}_ctp${CTP}
EXTRA_OPTS="TRAINER.COOP.N_CTX ${NCTX} TRAINER.COOP.CSC ${CSC} TRAINER.COOP.CLASS_TOKEN_POSITION ${CTP} ${EXTRA_OPTS}"
source scripts/_lib/base2new_test.sh "$@"
