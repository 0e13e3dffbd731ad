#!/bin/bash
# Linear probe on imagenet — the generic driver with the dataset pinned.
# Parity: reference scripts/linear_probe/imagenet.sh.
# usage: bash scripts/linear_probe/imagenet.sh [sampler] [data_root]
#        (env: BACKBONE, LOSS_TYPE, SEED, SHOTS, PER_CLASS_SHOTS)
exec bash "$(dirname "$0")/train.sh" imagenet "${BACKBONE:-ViT-B/16}" \
    "${LOSS_TYPE:-ce}" "${SEED:-1}" "$@"
