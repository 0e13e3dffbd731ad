#!/bin/bash
# Reference-named alias.  Parity: reference scripts/maple/xd_test_maple.sh == xd_test.sh here.
exec bash "$(dirname "$0")/xd_test.sh" "$@"
