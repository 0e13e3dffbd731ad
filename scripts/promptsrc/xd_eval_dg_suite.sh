#!/bin/bash
# Domain-generalization suite: evaluate an ImageNet-trained checkpoint on
# ImageNet-V2 / Sketch / A / R in one go (reference xd_test.sh loop).
# usage: bash scripts/promptsrc/xd_eval_dg_suite.sh <seed> [data_root]
cd "$(dirname "$0")/../.."
SEED=$1; DATA=${2:-${DATA:-~/data}}
for DS in ${DG_DATASETS:-imagenetv2 imagenet_sketch imagenet_a imagenet_r}; do
  bash scripts/promptsrc/xd_test.sh "${DS}" "${SEED}" "${DATA}" || exit 1
done
