#!/bin/bash
# CoOp on imagenet — the generic driver with the dataset pinned.
# Parity: reference scripts/coop/imagenet.sh.
# usage: bash scripts/coop/imagenet.sh [data_root]   (env: SHOTS, CFG, NCTX, CSC, CTP)
exec bash "$(dirname "$0")/main.sh" imagenet "${SHOTS:-16}" "${CFG:-vit_b16_ep50}" "$@"
