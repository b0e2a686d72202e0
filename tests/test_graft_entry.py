"""Driver-interface checks (__graft_entry__.py).

The driver compile-checks ``entry()`` single-chip and runs
``dryrun_multichip`` on a virtual device mesh; these tests keep both
callable paths working on the CPU lane.  ``entry()`` is planar
(real-only XLA) so it compiles on every observed backend tier.
"""
import jax
import numpy as np
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    exe = jax.jit(fn).lower(*args).compile()
    out = exe(*args)
    leaves = jax.tree_util.tree_leaves(out)
    assert leaves, "entry() produced no outputs"
    # real-only contract: no complex leaf may appear in args or outputs
    for leaf in jax.tree_util.tree_leaves((args, out)):
        assert not np.issubdtype(np.asarray(leaf).dtype,
                                 np.complexfloating)


@pytest.mark.slow
def test_dryrun_multichip_two_devices():
    import __graft_entry__ as ge
    ge.dryrun_multichip(2)
