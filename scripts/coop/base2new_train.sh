#!/bin/bash
# CoOp base-to-novel training on the base class half.
# Parity: reference scripts/coop/base2new_train.sh (7-arg protocol).
# usage: bash scripts/coop/base2new_train.sh <dataset> <seed> [data_root]
# env overrides: CFG, NCTX, CSC, CTP, SHOTS
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2; DATA=${3:-${DATA:-~/data}}
CFG=${CFG:-vit_b16_ep50}; NCTX=${NCTX:-16}; CSC=${CSC:-False}; CTP=${CTP:-end}
SHOTS=${SHOTS:-16}
DIR=${OUT_ROOT:-output}/base2new/train_base/${DATASET}/shots_${SHOTS}/CoOp/${CFG}_nctx${NCTX}_csc${CSC}_ctp${CTP}/seed${SEED}
python train.py --root "${DATA}" --seed "${SEED}" --trainer CoOp \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/CoOp/${CFG}.yaml \
    --output-dir "${DIR}" \
    TRAINER.COOP.N_CTX ${NCTX} TRAINER.COOP.CSC ${CSC} \
    TRAINER.COOP.CLASS_TOKEN_POSITION ${CTP} \
    DATASET.NUM_SHOTS ${SHOTS} DATASET.SUBSAMPLE_CLASSES base
