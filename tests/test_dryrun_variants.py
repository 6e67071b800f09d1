"""Multi-chip dryrun across every factorization of 8 (VERDICT r4 items 6).

The driver's ``dryrun_multichip`` historically always picked data2 x space4;
these variants pin the other mesh shapes end-to-end on the virtual 8-device
CPU backend:

* pure ``data8`` — the throughput mesh (PERF.md "Predicted multi-chip
  scaling"): one combined gradient all-reduce, no halo traffic;
* ``space8`` over a 32^3 input — the space axis EXCEEDS the deep levels'
  depth extent (level 5 of the 6-level flagship topology has depth 1), so
  ``activation_spec`` must degrade those levels to replicated while the
  shallow levels stay depth-sharded; this runs that fallback through a real
  train step, not just the spec function.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from __graft_entry__ import dryrun_multichip  # noqa: E402

pytestmark = pytest.mark.slow  # each variant compiles a full sharded step


@pytest.fixture(autouse=True)
def _needs_eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")


def test_dryrun_default_factorization():
    dryrun_multichip(8)


def test_dryrun_pure_data8():
    dryrun_multichip(8, mesh_spec={"data": 8})


def test_dryrun_space8_exceeds_deep_level_depth():
    dryrun_multichip(8, mesh_spec={"data": 1, "space": 8})
