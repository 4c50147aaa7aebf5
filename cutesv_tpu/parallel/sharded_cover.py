"""Multi-device genotype cover counting (the --n_shards path).

Shards the SV-window axis across the genome mesh with the read tile set
replicated per device — the production layout for multi-chip genotyping
(SURVEY §2.5): per-bin candidate windows live where their signatures
live; read intervals are small and replicate cheaply.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from cutesv_tpu.parallel import mesh as pmesh


@lru_cache(maxsize=4)
def _fns(n_shards: int):
    devices = pmesh.pick_devices(n_shards)
    if devices is None:
        return None
    mesh = pmesh.make_mesh(n_shards, devices=devices)
    return mesh, pmesh.sharded_cover_counts(mesh)


def make_sharded_cover(n_shards: int):
    """Sharded cover-count callable, or None when no backend offers
    ``n_shards`` devices (callers fall back to a serial kernel)."""
    pair = _fns(n_shards)
    if pair is None:
        return None
    mesh, fn = pair

    def cover(sv_windows, read_starts, read_ends) -> np.ndarray:
        import jax.numpy as jnp

        n_sv = len(sv_windows)
        n_reads = len(read_starts)
        if n_sv == 0 or n_reads == 0:
            return np.zeros(n_sv, np.int64)
        from cutesv_tpu.ops.sweep import scale_and_pad
        sv_s, sv_e, st, en = scale_and_pad(sv_windows, read_starts,
                                           read_ends, n_shards,
                                           pmesh.READ_TILE)
        out = fn(jnp.asarray(sv_s, jnp.int32), jnp.asarray(sv_e, jnp.int32),
                 jnp.asarray(st, jnp.int32), jnp.asarray(en, jnp.int32))
        return np.asarray(out)[:n_sv].astype(np.int64)

    return cover
