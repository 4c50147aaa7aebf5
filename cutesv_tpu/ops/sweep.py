"""Interval cover counting on device (the genotype-support hot loop).

Replaces the reference's per-chromosome endpoint sweep (overlap_cover,
cuteSV_genotype.py:95-159) with a blocked dominance count:

    cover(sv) = #{primary reads: start <= s and end >= e}

computed as a lax.scan over read tiles with the SV vector resident — pure
VPU compare+accumulate, no data-dependent control flow, exact integers.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cutesv_tpu.ops.segments import padded_size

_READ_TILE = 4096


@partial(jax.jit, static_argnames=("n_tiles",))
def _cover_scan(sv_s, sv_e, starts_tiled, ends_tiled, n_tiles: int):
    def step(acc, tile):
        st, en = tile
        m = (st[None, :] <= sv_s[:, None]) & (en[None, :] >= sv_e[:, None])
        return acc + jnp.sum(m, axis=1, dtype=jnp.int32), None

    init = jnp.zeros(sv_s.shape[0], jnp.int32)
    acc, _ = jax.lax.scan(step, init, (starts_tiled, ends_tiled))
    return acc


def cover_counts_device(sv_windows, read_starts, read_ends) -> np.ndarray:
    """Device dominance count; same contract as genotype.cover_counts."""
    n_sv = len(sv_windows)
    if n_sv == 0 or len(read_starts) == 0:
        return np.zeros(n_sv, np.int64)
    s = np.asarray([w[0] for w in sv_windows], np.float64)
    e = np.asarray([w[1] for w in sv_windows], np.float64)
    # windows may be half-integral (bias/2); scale by 2 to stay in ints
    s2 = np.floor(s * 2).astype(np.int64)
    e2 = np.ceil(e * 2).astype(np.int64)
    # start <= s  <=>  2*start <= floor(2s); end >= e  <=>  2*end >= ceil(2e)
    sp = padded_size(n_sv)
    rp = padded_size(len(read_starts), _READ_TILE)
    sv_s = np.full(sp, np.iinfo(np.int32).min, np.int64)
    sv_e = np.full(sp, np.iinfo(np.int32).max, np.int64)
    sv_s[:n_sv] = s2
    sv_e[:n_sv] = e2
    st = np.full(rp, np.iinfo(np.int32).max, np.int64)
    en = np.full(rp, np.iinfo(np.int32).min, np.int64)
    st[:len(read_starts)] = 2 * np.asarray(read_starts, np.int64)
    en[:len(read_ends)] = 2 * np.asarray(read_ends, np.int64)
    n_tiles = rp // _READ_TILE
    acc = _cover_scan(jnp.asarray(sv_s, jnp.int32), jnp.asarray(sv_e, jnp.int32),
                      jnp.asarray(st.reshape(n_tiles, _READ_TILE), jnp.int32),
                      jnp.asarray(en.reshape(n_tiles, _READ_TILE), jnp.int32),
                      n_tiles)
    return np.asarray(acc)[:n_sv].astype(np.int64)
