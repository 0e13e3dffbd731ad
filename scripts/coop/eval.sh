#!/bin/bash
# Cross-dataset evaluation of an ImageNet-trained CoOp prompt, seeds 1-3.
# Parity: reference scripts/coop/eval.sh
# usage: bash scripts/coop/eval.sh <dataset> [config] [data_root]
# env overrides: NCTX, CSC, CTP, SHOTS, LOADEP
cd "$(dirname "$0")/../.."
DATASET=$1; CFG=${2:-${CFG:-vit_b16_ep50}}; DATA=${3:-${DATA:-~/data}}
NCTX=${NCTX:-16}; CSC=${CSC:-False}; CTP=${CTP:-end}
SHOTS=${SHOTS:-16}; LOADEP=${LOADEP:-50}
for SEED in ${SEEDS:-1 2 3}; do
  python train.py --root "${DATA}" --seed "${SEED}" --trainer CoOp \
      --dataset-config-file configs/datasets/${DATASET}.yaml \
      --config-file configs/trainers/CoOp/${CFG}.yaml \
      --output-dir ${OUT_ROOT:-output}/evaluation/CoOp/${CFG}_${SHOTS}shots/nctx${NCTX}_csc${CSC}_ctp${CTP}/${DATASET}/seed${SEED} \
      --model-dir ${OUT_ROOT:-output}/imagenet/CoOp/${CFG}_${SHOTS}shots/nctx${NCTX}_csc${CSC}_ctp${CTP}/seed${SEED} \
      --load-epoch ${LOADEP} --eval-only \
      TRAINER.COOP.N_CTX ${NCTX} TRAINER.COOP.CSC ${CSC} \
      TRAINER.COOP.CLASS_TOKEN_POSITION ${CTP} || exit 1
done
