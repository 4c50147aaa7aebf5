"""Pallas TPU kernel for interval cover counting.

Computes, per SV window, #{reads: start <= s and end >= e} — the genotype
read-support count (genotype.py contract). The XLA fallback in
ops/sweep.py materializes (SV_TILE, READ_TILE) masks through HBM between
scan steps; this kernel keeps the full read tile resident in VMEM and
streams SV tiles over the grid, so the compare/accumulate loop runs at
VPU speed with no HBM round-trips.

Shapes are fixed (_SV_CHUNK x _READ_CHUNK from ops/sweep.py) so one
compiled program serves every call. Falls back transparently off-TPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

SV_TILE = 1024
READ_TILE = 2048
READ_CHUNK = 64 * READ_TILE  # fixed read-block shape -> one compiled program
SV_CHUNK = 8 * SV_TILE       # fixed SV-block shape likewise


def _cover_kernel(svs_ref, sve_ref, st_ref, en_ref, out_ref):
    """One SV tile vs all read tiles.

    svs/sve: (SV_TILE, 1) window starts/ends (x2-scaled ints)
    st/en:   (N_RT, READ_TILE) read starts/ends
    out:     (SV_TILE, 1) counts
    """
    n_rt = st_ref.shape[0]
    svs = svs_ref[:]          # (SV_TILE, 1)
    sve = sve_ref[:]

    def body(i, acc):
        st = st_ref[i, :].reshape(1, READ_TILE)
        en = en_ref[i, :].reshape(1, READ_TILE)
        m = (st <= svs) & (en >= sve)
        return acc + jnp.sum(m.astype(jnp.int32), axis=1, keepdims=True)

    out_ref[:] = jax.lax.fori_loop(
        0, n_rt, body, jnp.zeros((SV_TILE, 1), jnp.int32))


@partial(jax.jit, static_argnames=("interpret",))
def _cover_pallas(sv_s, sv_e, starts_tiled, ends_tiled, interpret=False):
    """sv_s/sv_e: (S,) with S % SV_TILE == 0; reads: (N_RT, READ_TILE)."""
    s = sv_s.shape[0]
    grid = (s // SV_TILE,)
    return pl.pallas_call(
        _cover_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((SV_TILE, 1), lambda i: (i, 0)),
            pl.BlockSpec((SV_TILE, 1), lambda i: (i, 0)),
            pl.BlockSpec(starts_tiled.shape, lambda i: (0, 0)),
            pl.BlockSpec(ends_tiled.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((SV_TILE, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((s, 1), jnp.int32),
        interpret=interpret,
    )(sv_s.reshape(-1, 1), sv_e.reshape(-1, 1), starts_tiled, ends_tiled)


def cover_counts_pallas(sv_windows, read_starts, read_ends,
                        interpret=None) -> np.ndarray:
    """Drop-in replacement for sweep.cover_counts_device."""
    n_sv = len(sv_windows)
    n_reads = len(read_starts)
    if n_sv == 0 or n_reads == 0:
        return np.zeros(n_sv, np.int64)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    from cutesv_tpu.ops.sweep import scale_and_pad
    sv_s, sv_e, st, en = scale_and_pad(sv_windows, read_starts, read_ends,
                                       SV_CHUNK, READ_CHUNK)
    sp, rp = len(sv_s), len(st)
    out = np.zeros(sp, np.int64)
    # bounded-depth pipeline: keep a few chunks in flight (hides the
    # dispatch/fetch round-trip) without holding every output buffer on
    # device at once — a genome-scale flush can dispatch thousands of
    # chunks, and an unbounded pending list would raise the HBM
    # high-water mark from O(1 chunk) to O(all chunks)
    pending: list = []

    def drain(limit: int):
        while len(pending) > limit:
            s0, acc = pending.pop(0)
            out[s0:s0 + SV_CHUNK] += np.asarray(acc).reshape(-1)

    for r0 in range(0, rp, READ_CHUNK):
        st_j = jnp.asarray(st[r0:r0 + READ_CHUNK].reshape(-1, READ_TILE),
                           jnp.int32)
        en_j = jnp.asarray(en[r0:r0 + READ_CHUNK].reshape(-1, READ_TILE),
                           jnp.int32)
        for s0 in range(0, sp, SV_CHUNK):
            acc = _cover_pallas(
                jnp.asarray(sv_s[s0:s0 + SV_CHUNK], jnp.int32),
                jnp.asarray(sv_e[s0:s0 + SV_CHUNK], jnp.int32),
                st_j, en_j, interpret=interpret)
            copy = getattr(acc, "copy_to_host_async", None)
            if copy is not None:
                copy()
            pending.append((s0, acc))
            drain(8)
    drain(0)
    return out[:n_sv]
