#!/bin/bash
# LoRA few-shot training with regularization loss weights and sampler
# selection.  Parity: reference scripts/lora/main_val.sh — including the
# TRAINER.LORA.{TEXT,IMAGE,LOGITS}_LOSS_WEIGHT opts the reference script
# passes but whose config keys the reference never defines (defined here,
# see fsvlm_tpu/config/defaults.py).
# usage: bash scripts/lora/main_val.sh <dataset> <seed> [shots] [config] [data_root]
# env overrides: SAMPLER (RandomSampler|WeightedClassSampler), ENCODER
#   (both|vision|text), TEXT_W, IMAGE_W, LOGITS_W
cd "$(dirname "$0")/../.."
DATASET=$1; SEED=$2; SHOTS=${3:-16}; CFG=${4:-${CFG:-vit_b16_ep50}}; DATA=${5:-${DATA:-~/data}}
SAMPLER=${SAMPLER:-RandomSampler}
ENCODER=${ENCODER:-both}
TEXT_W=${TEXT_W:-25}; IMAGE_W=${IMAGE_W:-10}; LOGITS_W=${LOGITS_W:-1.0}
DIR=${OUT_ROOT:-output}/${DATASET}/LoRA/${CFG}_${SHOTS}shots/${SAMPLER}_REG/seed${SEED}
python train.py --root "${DATA}" --seed "${SEED}" --trainer LoRA \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/LoRA/${CFG}.yaml \
    --output-dir "${DIR}" \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATALOADER.TRAIN_X.SAMPLER ${SAMPLER} \
    TRAINER.LORA.ENCODER ${ENCODER} \
    TRAINER.LORA.TEXT_LOSS_WEIGHT ${TEXT_W} \
    TRAINER.LORA.IMAGE_LOSS_WEIGHT ${IMAGE_W} \
    TRAINER.LORA.LOGITS_LOSS_WEIGHT ${LOGITS_W}
