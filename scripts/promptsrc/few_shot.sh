#!/bin/bash
# PromptSRC few-shot protocol: train with the dedicated ep50 few-shot
# config at K shots, seeds 1-3.
# Parity: reference scripts/promptsrc/few_shot.sh
# usage: bash scripts/promptsrc/few_shot.sh <dataset> <shots> [data_root]
# env overrides: CFG
cd "$(dirname "$0")/../.."
DATASET=$1; SHOTS=$2; DATA=${3:-${DATA:-~/data}}
CFG=${CFG:-vit_b16_c2_ep50_batch4_4+4ctx_few_shot}
for SEED in ${SEEDS:-1 2 3}; do
  DIR=${OUT_ROOT:-output}/${DATASET}/PromptSRC/${CFG}_${SHOTS}shots/seed${SEED}
  if [ -d "${DIR}" ]; then echo "The results exist at ${DIR}"; continue; fi
  python train.py --root "${DATA}" --seed "${SEED}" --trainer PromptSRC \
      --dataset-config-file configs/datasets/${DATASET}.yaml \
      --config-file configs/trainers/PromptSRC/${CFG}.yaml \
      --output-dir "${DIR}" DATASET.NUM_SHOTS ${SHOTS} || exit 1
done
