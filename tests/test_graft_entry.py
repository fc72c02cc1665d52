"""Driver contract: entry() compiles single-device; dryrun_multichip runs a
full sharded train step on the 8-device CPU mesh."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, ".")

import __graft_entry__ as ge


def test_entry_forward_jits():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 3, 128, 256)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)
