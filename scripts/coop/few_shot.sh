#!/bin/bash
# Few-shot CoOp sweep over K in {1,2,4,8,16} (parity: scripts/coop/main.sh).
# usage: bash scripts/coop/few_shot.sh <dataset> <seed> [config] [data_root]
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2; CFG=${3:-${CFG:-vit_b16_ep50}}; DATA=${4:-${DATA:-~/data}}
for SHOTS in ${SHOT_SWEEP:-1 2 4 8 16}; do
  DIR=${OUT_ROOT:-output}/${DATASET}/CoOp/${CFG}_${SHOTS}shots/seed${SEED}
  python train.py --root "${DATA}" --seed "${SEED}" --trainer CoOp \
      --dataset-config-file configs/datasets/${DATASET}.yaml \
      --config-file configs/trainers/CoOp/${CFG}.yaml \
      --output-dir "${DIR}" DATASET.NUM_SHOTS ${SHOTS} || exit 1
done
