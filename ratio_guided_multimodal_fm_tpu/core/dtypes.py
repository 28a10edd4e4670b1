"""Mixed-precision policy.

TPU MXU peak throughput is bf16; params and reductions stay f32. The
reference is f32-everywhere PyTorch; here bf16 compute is an opt-in policy
applied to model activations, with the guidance logsumexp path pinned to f32
(SURVEY §7 hard-part #1: the max-stabilized weight math must not be done in
bf16).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    # dtype for guidance-weight math / loss reductions — always f32.
    reduce_dtype: jnp.dtype = jnp.float32


DEFAULT_POLICY = Policy()
BF16_POLICY = Policy(compute_dtype=jnp.bfloat16)


def cast_floating(tree, dtype):
    """Cast floating leaves of a pytree to `dtype` (ints/bools untouched)."""
    import jax

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
