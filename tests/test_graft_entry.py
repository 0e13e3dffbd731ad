"""The driver-facing dryrun must keep compiling + executing on a virtual
8-device mesh (regression guard for the multi-chip path).

Fast lane: the SPMD/zoo/fused-epoch stages (multihost elided via
FSVLM_DRYRUN_NO_MULTIHOST).  Slow tier: the full dryrun including the
2-process jax.distributed multihost stage — exactly what the driver runs
for MULTICHIP_r{N}.json."""

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8(monkeypatch):
    from __graft_entry__ import dryrun_multichip

    monkeypatch.setenv("FSVLM_DRYRUN_NO_MULTIHOST", "1")
    dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_8_with_multihost(monkeypatch):
    from __graft_entry__ import dryrun_multichip

    monkeypatch.delenv("FSVLM_DRYRUN_NO_MULTIHOST", raising=False)
    dryrun_multichip(8)
