"""The driver's multi-chip dryrun must pass on the 8-device CPU mesh."""

import sys
import os

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
