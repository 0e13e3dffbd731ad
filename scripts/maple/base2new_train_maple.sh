#!/bin/bash
# Reference-named alias.  Parity: reference scripts/maple/base2new_train_maple.sh == base2new_train.sh here.
exec bash "$(dirname "$0")/base2new_train.sh" "$@"
