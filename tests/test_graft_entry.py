"""Driver contract: entry() compiles single-device, dryrun_multichip runs
on the simulated multi-device mesh."""
import sys

import jax
import numpy as np


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
