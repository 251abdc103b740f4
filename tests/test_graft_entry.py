"""Driver entry points stay green: entry() compiles single-device and
dryrun_multichip exercises the 2-D sharded training step on the fake mesh."""

import os
import sys

import numpy as np
import pytest
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    fwd, mask = out
    assert fwd.shape == (2, 2, 64, 64, 3)
    assert mask.shape == (2, 2, 64, 64, 1)
    assert np.isfinite(np.asarray(fwd)).all()


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)  # asserts finite loss internally
