#!/bin/bash
# CoOp on fgvc_aircraft — the generic driver with the dataset pinned.
# Parity: reference scripts/coop/fgvc_aircraft.sh.
# usage: bash scripts/coop/fgvc_aircraft.sh [data_root]   (env: SHOTS, CFG, NCTX, CSC, CTP)
exec bash "$(dirname "$0")/main.sh" fgvc_aircraft "${SHOTS:-16}" "${CFG:-vit_b16_ep50}" "$@"
