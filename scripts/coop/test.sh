#!/bin/bash
# Evaluate a CoOp prompt trained by scripts/coop/train.sh.  Parity:
# reference scripts/coop/test.sh (same 7-positional interface and
# base2new/train_base -> test_${SUB} directory contract).
# usage: bash scripts/coop/test.sh <dataset> <cfg> <ctp> <nctx> <shots> <csc> <seed>
# env: SUB (default all), LOADEP (default 100), LOSS_TYPE, PER_CLASS_SHOTS,
#      DATA, OUT_ROOT
cd "$(dirname "$0")/../.."
DATASET=$1; CFG=$2; CTP=$3; NCTX=$4; SHOTS=$5; CSC=$6; SEED=$7
DATA=${DATA:-~/data}; SUB=${SUB:-all}; LOADEP=${LOADEP:-100}
LOSS_TYPE=${LOSS_TYPE:-ce}; PER_CLASS_SHOTS=${PER_CLASS_SHOTS:-[]}
FOCAL=$([ "${LOSS_TYPE}" = focal ] && echo True || echo False)
COMMON_DIR=${DATASET}/shots_${SHOTS}/CoOp/${CFG}_nctx${NCTX}_csc${CSC}_ctp${CTP}/seed${SEED}
MODEL_DIR=${OUT_ROOT:-output}/base2new/train_base/${COMMON_DIR}
DIR=${OUT_ROOT:-output}/base2new/test_${SUB}/${COMMON_DIR}
echo "Evaluating model on '${SUB}' classes"
python train.py \
    --root "${DATA}" --seed "${SEED}" --trainer CoOp \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/CoOp/${CFG}.yaml \
    --output-dir "${DIR}" --model-dir "${MODEL_DIR}" \
    --load-epoch ${LOADEP} --eval-only \
    TRAINER.COOP.N_CTX ${NCTX} TRAINER.COOP.CSC ${CSC} \
    TRAINER.COOP.CLASS_TOKEN_POSITION ${CTP} \
    TRAINER.COOP.LOSS_TYPE ${LOSS_TYPE} \
    TRAINER.COOP.USE_FOCAL_LOSS ${FOCAL} \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.PER_CLASS_SHOTS "${PER_CLASS_SHOTS}" \
    DATASET.SUBSAMPLE_CLASSES ${SUB}
