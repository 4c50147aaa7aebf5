"""Interval cover counting on device (the genotype-support hot loop).

Replaces the reference's per-chromosome endpoint sweep (overlap_cover,
cuteSV_genotype.py:95-159) with a blocked dominance count:

    cover(sv) = #{primary reads: start <= s and end >= e}

computed as a lax.scan over read tiles with the SV vector resident — pure
VPU compare+accumulate, no data-dependent control flow, exact integers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


_READ_TILE = 4096
_READ_CHUNK = 64 * _READ_TILE   # 262144 reads per device call
_SV_CHUNK = 8192                # SV windows per device call

# Fixed chunk shapes: exactly ONE compiled program serves every cover call
# in a run, regardless of per-chromosome sizes.




def scale_and_pad(sv_windows, read_starts, read_ends, sv_multiple,
                  read_multiple):
    """The shared cover-kernel coordinate contract: windows may be
    half-integral (bias/2), so everything is doubled to stay integral —
    start <= s  <=>  2*start <= floor(2s);  end >= e  <=>  2*end >= ceil(2e)
    — then padded to the given multiples with never-covering sentinels.
    One implementation serves sweep/pallas_sweep/sharded_cover so the
    contract cannot drift. Callers guarantee doubled coordinates fit
    int32 (pipeline._batched_cover_multi's 1e9 budget + per-chromosome
    host fallback)."""
    n_sv = len(sv_windows)
    n_reads = len(read_starts)
    s = np.asarray([w[0] for w in sv_windows], np.float64)
    e = np.asarray([w[1] for w in sv_windows], np.float64)
    sp = -(-n_sv // sv_multiple) * sv_multiple
    sv_s = np.full(sp, np.iinfo(np.int32).min, np.int64)
    sv_e = np.full(sp, np.iinfo(np.int32).max, np.int64)
    sv_s[:n_sv] = np.floor(s * 2).astype(np.int64)
    sv_e[:n_sv] = np.ceil(e * 2).astype(np.int64)
    rp = -(-n_reads // read_multiple) * read_multiple
    st = np.full(rp, np.iinfo(np.int32).max, np.int64)
    en = np.full(rp, np.iinfo(np.int32).min, np.int64)
    st[:n_reads] = 2 * np.asarray(read_starts, np.int64)
    en[:n_reads] = 2 * np.asarray(read_ends, np.int64)
    return sv_s, sv_e, st, en


@jax.jit
def _cover_scan(sv_s, sv_e, starts_tiled, ends_tiled):
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
    n_reads = len(read_starts)
    if n_sv == 0 or n_reads == 0:
        return np.zeros(n_sv, np.int64)
    sv_s, sv_e, st, en = scale_and_pad(sv_windows, read_starts, read_ends,
                                       _SV_CHUNK, _READ_CHUNK)
    sp, rp = len(sv_s), len(st)
    out = np.zeros(sp, np.int64)
    for r0 in range(0, rp, _READ_CHUNK):
        st_t = jnp.asarray(
            st[r0:r0 + _READ_CHUNK].reshape(-1, _READ_TILE), jnp.int32)
        en_t = jnp.asarray(
            en[r0:r0 + _READ_CHUNK].reshape(-1, _READ_TILE), jnp.int32)
        for s0 in range(0, sp, _SV_CHUNK):
            acc = _cover_scan(
                jnp.asarray(sv_s[s0:s0 + _SV_CHUNK], jnp.int32),
                jnp.asarray(sv_e[s0:s0 + _SV_CHUNK], jnp.int32),
                st_t, en_t)
            out[s0:s0 + _SV_CHUNK] += np.asarray(acc)
    return out[:n_sv]
