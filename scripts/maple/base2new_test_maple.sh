#!/bin/bash
# Reference-named alias.  Parity: reference scripts/maple/base2new_test_maple.sh == base2new_test.sh here.
exec bash "$(dirname "$0")/base2new_test.sh" "$@"
