#!/bin/bash
# Reference-named alias.  Parity: reference scripts/maple/xd_train_maple.sh == xd_train.sh here.
exec bash "$(dirname "$0")/xd_train.sh" "$@"
