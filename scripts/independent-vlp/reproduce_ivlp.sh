#!/bin/bash
# Reproduce IVLP base-to-novel from the published torch checkpoints
# (reference scripts/independent-vlp/reproduce_ivlp.sh: LOADEP=5 with the
# ep20 config — mirrored as-is; WEIGHTSPATH layout
# <weightspath>/base/seed<S>/VLPromptLearner/model.pth.tar-<LOADEP>).
# usage: bash scripts/independent-vlp/reproduce_ivlp.sh <dataset> <seed> <weightspath> [data_root]
cd "$(dirname "$0")/../.."

DATA=${4:-${DATA:-~/data}}
TRAINER=IVLP
DATASET=$1
SEED=$2
WEIGHTSPATH=$3

CFG=${CFG:-vit_b16_c2_ep20_batch4_4+4ctx}
SHOTS=16
LOADEP=${LOADEP:-5}

COMMON_DIR=${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}/seed${SEED}
TORCH_CKPT=${WEIGHTSPATH}/base/seed${SEED}/VLPromptLearner/model.pth.tar-${LOADEP}
MODEL_DIR=${OUT_ROOT:-output}/base2new/imported/${COMMON_DIR}

python tools/import_torch_prompts.py "${TORCH_CKPT}" \
    --trainer ${TRAINER} --output-dir "${MODEL_DIR}" || exit 1

for SUB in base new; do
    DIR=${OUT_ROOT:-output}/base2new/test_${SUB}/${COMMON_DIR}
    python train.py \
        --root "${DATA}" \
        --seed "${SEED}" \
        --trainer ${TRAINER} \
        --dataset-config-file configs/datasets/${DATASET}.yaml \
        --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
        --output-dir "${DIR}" \
        --model-dir "${MODEL_DIR}" \
        --load-epoch ${LOADEP} \
        --eval-only \
        DATASET.NUM_SHOTS ${SHOTS} \
        DATASET.SUBSAMPLE_CLASSES ${SUB} \
        ${FSVLM_EXTRA_OPTS} || exit 1
done
