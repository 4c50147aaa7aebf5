"""Genome-axis sharding of the clustering + genotype pipeline.

The reference parallelizes over genome intervals with a process pool and
pickle files (cuteSV:1026-1076). The TPU-native equivalent shards the
merged per-chromosome signature stream across a 1-D device mesh
("genome" axis): each chip owns one contiguous bin of the sorted stream,
cluster boundaries are decided locally after receiving the previous
shards' last valid position (an ``all_gather`` of each shard's last/count
— one scalar pair per shard on the wire, the moral equivalent of a halo
exchange), global cluster ids come from an exclusive scan of per-shard
boundary counts, and
per-cluster statistics are combined with ``psum`` so clusters spanning bin
boundaries are exact. Genotype cover counting shards the SV axis with read
tiles resident per chip.

Everything is jit-compiled once per (shard size) bucket via shard_map;
collectives ride ICI on real hardware and compile/execute identically on
the virtual CPU mesh used in tests and the driver's multi-chip dry run.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def make_mesh(n_devices: int, devices=None) -> Mesh:
    if devices is None:
        return _default_mesh(n_devices)
    return Mesh(np.array(devices[:n_devices]), ("genome",))


def pick_devices(n_shards: int):
    """Device set for an ``n_shards`` genome mesh, shared by every sharded
    entry point: this host's own chips in a multi-process run (global
    arrays would need cross-process sharding the stream cuts don't do),
    all devices otherwise; falls back to the CPU backend when the primary
    platform has fewer than ``n_shards`` devices. Returns None when no
    backend offers ``n_shards`` devices — callers then run their serial
    kernel."""
    devices = (jax.local_devices() if jax.process_count() > 1
               else jax.devices())
    if len(devices) < n_shards:
        try:
            devices = jax.devices("cpu")
        except RuntimeError:
            return None
    if len(devices) < n_shards:
        return None
    return devices


@functools.lru_cache(maxsize=8)
def _default_mesh(n_devices: int) -> Mesh:
    # one Mesh object per device count: identical-but-distinct Mesh
    # instances would defeat the factories' lru_cache keys
    return Mesh(np.array(jax.devices()[:n_devices]), ("genome",))


def sharded_cluster_sizes(mesh: Mesh, max_cluster_bias: int):
    """Build the jitted sharded step: sorted positions -> (cluster id per
    row, cluster sizes, number of clusters).

    Inputs/outputs are sharded along the leading axis; cluster sizes are
    returned replicated (psum-combined across shards). Shapes are static
    per call signature; pad anywhere with `valid`=False rows (INT32_MIN is
    reserved as the internal no-previous sentinel) — gaps are measured to
    the last VALID position, so per-shard tail padding and empty shards
    cluster identically to the unpadded serial stream.
    """
    n = mesh.devices.size
    _NONE = jnp.iinfo(jnp.int32).min

    def step(pos, valid):
        # pos, valid: this shard's rows (sorted stream slice)
        axis = jax.lax.axis_index("genome")
        # incoming carry: the last valid position of any earlier shard.
        # positions are globally ascending, so a masked max over shards
        # < axis equals the most recent valid position
        local_last = jnp.max(jnp.where(valid, pos, _NONE))
        lasts = jax.lax.all_gather(local_last, "genome")
        incoming = jnp.max(jnp.where(jnp.arange(n) < axis, lasts, _NONE))

        # per-row previous-valid position (scan carries past pad rows)
        def body(carry, xv):
            p, v = xv
            return jnp.where(v, p, carry), carry

        _, prev = jax.lax.scan(body, incoming, (pos, valid))
        new_cluster = valid & (prev != _NONE) & \
            (pos - prev > max_cluster_bias)
        # exclusive scan of per-shard boundary counts -> global ids
        local_count = jnp.sum(new_cluster.astype(jnp.int32))
        counts = jax.lax.all_gather(local_count, "genome")
        offset = jnp.sum(jnp.where(jnp.arange(n) < axis, counts, 0))
        cid = offset + jnp.cumsum(new_cluster.astype(jnp.int32))
        cid = jnp.where(valid, cid, -1)
        # per-cluster sizes, combined across shards (boundary clusters get
        # contributions from both sides)
        total = pos.shape[0] * n  # upper bound on cluster count
        local_sizes = jax.ops.segment_sum(
            valid.astype(jnp.int32), jnp.where(valid, cid, total),
            num_segments=total + 1)[:total]
        sizes = jax.lax.psum(local_sizes, "genome")
        n_clusters = jax.lax.psum(local_count, "genome") + 1
        return cid, sizes, n_clusters

    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P("genome"), P("genome")),
        out_specs=(P("genome"), P(), P()),
    ))


READ_TILE = 4096


def sharded_cover_counts(mesh: Mesh):
    """Genotype read-support counting with the SV axis sharded.

    Each chip holds the full read tile set (starts/ends, replicated,
    padded to a READ_TILE multiple by the caller) and a shard of SV
    windows; counts = #{reads: start <= s and end >= e} per SV. The read
    axis is scanned in READ_TILE chunks so the (sv, read) compare mask
    stays VMEM-sized instead of materializing sv_shard x n_reads through
    HBM (ops/sweep.py's layout, which genome-scale censuses require)."""
    def step(sv_s, sv_e, starts, ends):
        st = starts.reshape(-1, READ_TILE)
        en = ends.reshape(-1, READ_TILE)

        def body(acc, tile):
            s, e = tile
            m = (s[None, :] <= sv_s[:, None]) & (e[None, :] >= sv_e[:, None])
            return acc + jnp.sum(m, axis=1, dtype=jnp.int32), None

        # zeros_like inherits sv_s's varying manual axis under shard_map
        acc, _ = jax.lax.scan(body, jnp.zeros_like(sv_s), (st, en))
        return acc

    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P("genome"), P("genome"), P(), P()),
        out_specs=P("genome"),
    ))


def full_sharded_step(mesh: Mesh, max_cluster_bias: int = 200):
    """The combined per-bin device step used by the multi-chip dry run:
    cluster segmentation + sizes + genotype cover counts, composed from
    the two jitted shard_maps above (one compilation each)."""
    n = mesh.devices.size
    cluster = sharded_cluster_sizes(mesh, max_cluster_bias)
    cover = sharded_cover_counts(mesh)

    def step(pos, valid, sv_s, sv_e, read_starts, read_ends):
        cid, sizes, n_clusters = cluster(pos, valid)
        counts = cover(sv_s, sv_e, read_starts, read_ends)
        return cid, sizes, n_clusters, counts

    return step


def demo_inputs(n_devices: int, rows_per_shard: int = 64,
                svs_per_shard: int = 8, n_reads: int = 128):
    """Tiny, valid inputs for compile checks: a sorted position stream with
    plausible cluster structure, SV windows and read intervals."""
    rng = np.random.default_rng(0)
    total = n_devices * rows_per_shard
    gaps = rng.integers(0, 400, size=total)
    pos = np.cumsum(gaps).astype(np.int32)
    valid = np.ones(total, bool)
    valid[-rows_per_shard // 2:] = False  # padded tail
    sv_total = n_devices * svs_per_shard
    anchors = np.sort(rng.integers(0, pos.max() + 1, size=sv_total))
    sv_s = (anchors - 200).clip(0).astype(np.int32)
    sv_e = (anchors + 200).astype(np.int32)
    # reads padded to a READ_TILE multiple with never-covering sentinels
    # (the cover step scans fixed-width read tiles)
    rp = max(READ_TILE, -(-n_reads // READ_TILE) * READ_TILE)
    starts = np.full(rp, np.iinfo(np.int32).max, np.int32)
    ends = np.full(rp, np.iinfo(np.int32).min, np.int32)
    starts[:n_reads] = rng.integers(0, pos.max() + 1, size=n_reads)
    ends[:n_reads] = (starts[:n_reads]
                      + rng.integers(1000, 20000, size=n_reads))
    return (jnp.asarray(pos), jnp.asarray(valid), jnp.asarray(sv_s),
            jnp.asarray(sv_e), jnp.asarray(starts), jnp.asarray(ends))
