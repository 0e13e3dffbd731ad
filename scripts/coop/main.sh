#!/bin/bash
# CoOp few-shot training, seeds 1-3 (parity: reference scripts/coop/main.sh;
# the reference's fgvc_aircraft.sh / imagenet.sh / pets.sh are instances of
# this driver with the dataset argument fixed).
# usage: bash scripts/coop/main.sh <dataset> <shots> [config] [data_root]
# env overrides: NCTX, CSC, CTP
cd "$(dirname "$0")/../.."
DATASET=$1; SHOTS=$2; CFG=${3:-${CFG:-vit_b16_ep50}}; DATA=${4:-${DATA:-~/data}}
NCTX=${NCTX:-16}; CSC=${CSC:-False}; CTP=${CTP:-end}
for SEED in ${SEEDS:-1 2 3}; do
  DIR=${OUT_ROOT:-output}/${DATASET}/CoOp/${CFG}_${SHOTS}shots/nctx${NCTX}_csc${CSC}_ctp${CTP}/seed${SEED}
  if [ -d "${DIR}" ]; then echo "Results are available in ${DIR}. Skip"; continue; fi
  python train.py --root "${DATA}" --seed "${SEED}" --trainer CoOp \
      --dataset-config-file configs/datasets/${DATASET}.yaml \
      --config-file configs/trainers/CoOp/${CFG}.yaml \
      --output-dir "${DIR}" \
      TRAINER.COOP.N_CTX ${NCTX} TRAINER.COOP.CSC ${CSC} \
      TRAINER.COOP.CLASS_TOKEN_POSITION ${CTP} \
      DATASET.NUM_SHOTS ${SHOTS} || exit 1
done
