#!/bin/bash
# CLIP-feature linear probe, stage interface.  Parity: reference
# lpclip/feat_extractor.sh — the reference extracts train/val/test features
# to .npz files and probes them in a second process; tools/lpclip.py runs
# the same extract + 2-stage C-search protocol in one process (features are
# extracted once, in memory), so both stage wrappers drive the same tool.
# usage: bash scripts/lpclip/feat_extractor.sh <dataset> [backbone] [shots] \
#            [seed] [data_root]
cd "$(dirname "$0")/../.."
DATASET=${1:-oxford_pets}; BACKBONE=${2:-RN50}; SHOTS=${3:-16}; SEED=${4:-1}
DATA=${5:-${DATA:-~/data}}
python tools/lpclip.py --root "${DATA}" \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --backbone "${BACKBONE}" --num-shots ${SHOTS} --seed ${SEED} \
    --output-dir ${OUT_ROOT:-output}/lpclip/${DATASET}_${SHOTS}shots_seed${SEED}
