#!/bin/bash
# CoOp base-class training with the fork's 7-positional interface; the
# imbalance knobs come in through env.  Parity: reference
# scripts/coop/train.sh (same args; its hardcoded USE_FOCAL/PER_CLASS_SHOTS
# constants are env overrides here).
# usage: bash scripts/coop/train.sh <dataset> <cfg> <ctp> <nctx> <shots> <csc> <seed>
# env: SUB (default base), LOSS_TYPE (ce/focal/simclr), PER_CLASS_SHOTS
#      (e.g. "[16,16,1,1]"; pair with a negative <shots>), DATA, OUT_ROOT
cd "$(dirname "$0")/../.."
DATASET=$1; CFG=$2; CTP=$3; NCTX=$4; SHOTS=$5; CSC=$6; SEED=$7
DATA=${DATA:-~/data}; SUB=${SUB:-base}
LOSS_TYPE=${LOSS_TYPE:-ce}; PER_CLASS_SHOTS=${PER_CLASS_SHOTS:-[]}
FOCAL=$([ "${LOSS_TYPE}" = focal ] && echo True || echo False)
DIR=${OUT_ROOT:-output}/base2new/train_${SUB}/${DATASET}/shots_${SHOTS}/CoOp/${CFG}_nctx${NCTX}_csc${CSC}_ctp${CTP}/seed${SEED}
[ -d "$DIR" ] && echo "Results already exist in ${DIR}. Resuming..."
python train.py \
    --root "${DATA}" --seed "${SEED}" --trainer CoOp \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/CoOp/${CFG}.yaml \
    --output-dir "${DIR}" \
    TRAINER.COOP.N_CTX ${NCTX} TRAINER.COOP.CSC ${CSC} \
    TRAINER.COOP.CLASS_TOKEN_POSITION ${CTP} \
    TRAINER.COOP.LOSS_TYPE ${LOSS_TYPE} \
    TRAINER.COOP.USE_FOCAL_LOSS ${FOCAL} \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.PER_CLASS_SHOTS "${PER_CLASS_SHOTS}" \
    DATASET.SUBSAMPLE_CLASSES ${SUB}
