"""The driver-facing dryrun must keep compiling + executing on a virtual
8-device mesh (regression guard for the multi-chip path)."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
