"""Driver contract file regression tests: __graft_entry__.entry() must
stay jittable and dryrun_multichip must execute a real DP step on a
virtual mesh."""

import importlib.util
import os

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def graft():
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("__graft_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs(graft):
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 64000)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8(graft):
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2(graft):
    graft.dryrun_multichip(2)
