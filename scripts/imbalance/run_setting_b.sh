#!/bin/bash
# Imbalance protocol Setting B: sweep fixed (head, tail) shot pairs.
# Parity: reference scripts/promptsrc/run_setting_b.sh:93-111.
# usage: bash scripts/imbalance/run_setting_b.sh <trainer> <dataset> <seed> \
#            <config> <n_head_classes> <n_tail_classes> [data_root]
cd "$(dirname "$0")/../.."

TRAINER=$1
DATASET=$2
SEED=$3
CFG=$4
HEAD_N=$5
TAIL_N=$6
DATA=${7:-${DATA:-~/data}}

repeat_value() {
  local out=""
  for ((i = 0; i < $2; i++)); do out="$out,$1"; done
  echo "${out#,}"
}

PAIRS=(
  "16 0" "15 1" "14 2" "13 3" "12 4" "11 5" "10 6" "9 7" "8 8"
  "8 0" "7 1" "6 2" "5 3" "4 4" "4 0" "3 1" "2 2"
)
# CI/bounded runs: SETTING_B_PAIRS="16 0;8 8" overrides the sweep
if [ -n "${SETTING_B_PAIRS}" ]; then
  IFS=';' read -ra PAIRS <<< "${SETTING_B_PAIRS}"
fi

for pair in "${PAIRS[@]}"; do
  read -r HEAD_SHOTS TAIL_SHOTS <<< "${pair}"
  HEAD=$(repeat_value "${HEAD_SHOTS}" "${HEAD_N}")
  TAIL=$(repeat_value "${TAIL_SHOTS}" "${TAIL_N}")
  PER_CLASS_SHOTS="[${HEAD},${TAIL}]"
  DIR=${OUT_ROOT:-output}/setting_b/${DATASET}/${TRAINER}/${CFG}/head${HEAD_SHOTS}_tail${TAIL_SHOTS}/seed${SEED}

  echo ">> setting B: head=${HEAD_SHOTS} tail=${TAIL_SHOTS}"
  python train.py \
      --root "${DATA}" \
      --seed "${SEED}" \
      --trainer "${TRAINER}" \
      --dataset-config-file configs/datasets/${DATASET}.yaml \
      --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
      --output-dir "${DIR}" \
      DATASET.NUM_SHOTS -1 \
      DATASET.PER_CLASS_SHOTS "${PER_CLASS_SHOTS}" || exit 1
done
