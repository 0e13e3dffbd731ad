#!/bin/bash
# CoOp imbalanced base-to-new protocol (test phase).
# Parity: reference scripts/coop/base2new_fewshot_test.sh
# usage: bash scripts/coop/base2new_fewshot_test.sh <dataset> <seed> \
#            '<per_class_shots>' [data_root]      e.g. '[16,16,16,1,1,1]'
# env overrides: CFG, NCTX, CSC, CTP, LOADEP, SUB, SHOTS (default -1 sentinel)
cd "$(dirname "$0")/../.."
MODE=test; TRAINER=CoOp; CFGDIR=CoOp
CFG=${CFG:-vit_b16_ep50}; NCTX=${NCTX:-16}; CSC=${CSC:-False}; CTP=${CTP:-end}
LOADEP=${LOADEP:-50}; SHOTS=${SHOTS:--1}
TAG=_nctx${NCTX}_csc${CSC}_ctp${CTP}
EXTRA_OPTS="TRAINER.COOP.N_CTX ${NCTX} TRAINER.COOP.CSC ${CSC} TRAINER.COOP.CLASS_TOKEN_POSITION ${CTP} ${EXTRA_OPTS}"
source scripts/_lib/base2new_fewshot.sh "$@"
