"""Segmented-array primitives shared by the cluster kernels."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def padded_size(n: int, minimum: int = 256, factor: int = 4) -> int:
    """Round up on a coarse geometric ladder to bound jit recompilations.

    Factor 4 keeps at most ~6 distinct shapes per run — compiles through a
    remote-compile TPU tunnel cost tens of seconds each, so fewer shapes
    beat tighter padding."""
    size = minimum
    while size < n:
        size *= factor
    return size


def boundary_flags(*keys, valid):
    """True where any key differs from the previous row (row 0 = False).

    Padded/invalid rows never open segments."""
    flags = jnp.zeros_like(valid)
    for k in keys:
        prev = jnp.concatenate([k[:1], k[:-1]])
        flags = flags | (k != prev)
    flags = flags.at[0].set(False)
    return flags & valid


def seg_sum(values, ids, num):
    return jax.ops.segment_sum(values, ids, num_segments=num)


def seg_min(values, ids, num):
    return jax.ops.segment_min(values, ids, num_segments=num)


