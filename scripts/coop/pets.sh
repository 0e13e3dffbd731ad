#!/bin/bash
# CoOp on oxford_pets — the generic driver with the dataset pinned.
# Parity: reference scripts/coop/pets.sh.
# usage: bash scripts/coop/pets.sh [data_root]   (env: SHOTS, CFG, NCTX, CSC, CTP)
exec bash "$(dirname "$0")/main.sh" oxford_pets "${SHOTS:-16}" "${CFG:-vit_b16_ep50}" "$@"
