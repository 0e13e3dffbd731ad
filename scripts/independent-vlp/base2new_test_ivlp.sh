#!/bin/bash
# Reference-named alias.  Parity: reference
# scripts/independent-vlp/base2new_test_ivlp.sh == base2new_test.sh here.
exec bash "$(dirname "$0")/base2new_test.sh" "$@"
