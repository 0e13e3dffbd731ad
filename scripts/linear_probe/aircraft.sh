#!/bin/bash
# Linear probe on fgvc_aircraft — the generic driver with the dataset pinned.
# Parity: reference scripts/linear_probe/aircraft.sh.
# usage: bash scripts/linear_probe/aircraft.sh [sampler] [data_root]
#        (env: BACKBONE, LOSS_TYPE, SEED, SHOTS, PER_CLASS_SHOTS)
exec bash "$(dirname "$0")/train.sh" fgvc_aircraft "${BACKBONE:-ViT-B/16}" \
    "${LOSS_TYPE:-ce}" "${SEED:-1}" "$@"
