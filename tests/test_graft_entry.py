"""Contract tests for the driver entry points in __graft_entry__."""
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_contract():
    from __graft_entry__ import entry

    fn, args = entry()
    out_shape = jax.eval_shape(fn, *args)
    assert out_shape.shape == (8, 32, 32, 3)
    assert out_shape.dtype == jnp.float32
