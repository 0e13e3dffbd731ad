#!/bin/bash
# Reference-named alias.  Parity: reference
# scripts/independent-vlp/base2new_train_ivlp.sh == base2new_train.sh here.
exec bash "$(dirname "$0")/base2new_train.sh" "$@"
