#!/bin/bash
# Imbalance protocol Setting A: the head half of the classes keeps 16 shots
# while the tail half sweeps 1..16 shots.
# Parity: reference scripts/coop/run_setting_a.sh:40-90 (negative NUM_SHOTS
# flags the per-class path; this framework keys the few-shot cache by the
# shot-list hash, so the magic per-sweep negative numbers are unnecessary).
# usage: bash scripts/imbalance/run_setting_a.sh <trainer> <dataset> <seed> \
#            <config> <n_head_classes> <n_tail_classes> [loss_type] [data_root]
cd "$(dirname "$0")/../.."

TRAINER=$1
DATASET=$2
SEED=$3
CFG=$4
HEAD_N=$5
TAIL_N=$6
LOSS=${7:-ce}
DATA=${8:-${DATA:-~/data}}

# LOSS_TYPE exists only on the CoOp/PromptSRC/LinearProbeCLIP config nodes
# (and LinearProbeCLIP's node is LINEAR_PROBE, not ${TRAINER^^}); other
# trainers run their default objective and must not get the opt at all.
case "${TRAINER}" in
  CoOp) LOSS_OPT=(TRAINER.COOP.LOSS_TYPE "${LOSS}") ;;
  PromptSRC) LOSS_OPT=(TRAINER.PROMPTSRC.LOSS_TYPE "${LOSS}") ;;
  LinearProbeCLIP) LOSS_OPT=(TRAINER.LINEAR_PROBE.LOSS_TYPE "${LOSS}") ;;
  *) LOSS_OPT=() ;;
esac

repeat_value() {
  local out=""
  for ((i = 0; i < $2; i++)); do out="$out,$1"; done
  echo "${out#,}"
}

for TAIL_SHOTS in ${TAIL_SWEEP:-1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16}; do
  HEAD=$(repeat_value 16 "${HEAD_N}")
  TAIL=$(repeat_value "${TAIL_SHOTS}" "${TAIL_N}")
  PER_CLASS_SHOTS="[${HEAD},${TAIL}]"
  DIR=${OUT_ROOT:-output}/setting_a/${DATASET}/${TRAINER}/${CFG}/${LOSS}/tail${TAIL_SHOTS}/seed${SEED}

  echo ">> setting A: tail=${TAIL_SHOTS} PER_CLASS_SHOTS=${PER_CLASS_SHOTS}"
  python train.py \
      --root "${DATA}" \
      --seed "${SEED}" \
      --trainer "${TRAINER}" \
      --dataset-config-file configs/datasets/${DATASET}.yaml \
      --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
      --output-dir "${DIR}" \
      DATASET.NUM_SHOTS -1 \
      DATASET.PER_CLASS_SHOTS "${PER_CLASS_SHOTS}" \
      "${LOSS_OPT[@]}" || exit 1
done
