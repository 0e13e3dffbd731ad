#!/bin/bash
# CLIP-feature linear probe, probe stage.  Parity: reference
# lpclip/linear_probe.sh — see feat_extractor.sh: tools/lpclip.py fuses
# extraction and the 2-stage logistic-regression C search into one run.
# usage: bash scripts/lpclip/linear_probe.sh <dataset> [backbone] [shots] \
#            [seed] [data_root]
exec bash "$(dirname "$0")/feat_extractor.sh" "$@"
