"""DUP/INV cluster-structure kernel.

Device side of resolution for two-breakpoint signature streams
(cuteSV_resolveDUP.py:17-131, cuteSV_resolveINV.py:6-203): primary gap
clustering over k1 (optionally also breaking on k2 gaps / aux changes for
INV), raw-size and distinct-support gates, and the per-cluster re-sort by
k2 that defines sub-clusters. Sub-group segmentation and the small
band/running means stay on host (models/device.py) where exact integer
sums reproduce the reference's Python arithmetic.
"""
from __future__ import annotations

import functools

from functools import partial

import jax
import jax.numpy as jnp

from cutesv_tpu.ops import segments as seg


@partial(jax.jit, static_argnames=("num_rows", "break_on_k2"))
def pair_cluster_structure(k1, k2, aux, rid, n_valid, bias, read_count,
                           num_rows: int, break_on_k2: bool):
    """Arrays are length ``num_rows`` (padded; the first ``n_valid`` rows
    are real — the mask is derived on device). Returns kept rows sorted
    by (cluster, k2, stream order) plus n_kept."""
    n = num_rows
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < n_valid
    big = jnp.int32(n + 1)

    prev_k1 = jnp.concatenate([k1[:1], k1[:-1]])
    prev_k2 = jnp.concatenate([k2[:1], k2[:-1]])
    prev_aux = jnp.concatenate([aux[:1], aux[:-1]])
    new_cluster = (k1 - prev_k1 > bias) | (aux != prev_aux)
    if break_on_k2:
        new_cluster = new_cluster | (k2 - prev_k2 > bias)
    new_cluster = (new_cluster & valid).at[0].set(False)
    cid = jnp.cumsum(new_cluster.astype(jnp.int32))
    cid = jnp.where(valid, cid, big)

    size = seg.seg_sum(valid.astype(jnp.int32), cid, n + 2)
    size_ok = size[cid] >= read_count

    # distinct rids per cluster via a (cid, rid) sort
    order1 = jnp.lexsort((idx, rid, cid))
    s_cid = cid[order1]
    s_rid = rid[order1]
    s_valid = valid[order1]
    grp_first = seg.boundary_flags(s_cid, s_rid, valid=s_valid)
    grp_first = grp_first | (jnp.arange(n) == jnp.argmax(s_valid))
    grp_first = grp_first & s_valid
    distinct = seg.seg_sum(grp_first.astype(jnp.int32), s_cid, n + 2)
    dist_ok = distinct >= read_count

    kept = valid & size_ok & dist_ok[cid]
    sort_cid = jnp.where(kept, cid, big)
    order2 = jnp.lexsort((idx, k2, sort_cid))
    return dict(
        cid=sort_cid[order2],
        k1=k1[order2],
        k2=k2[order2],
        rid=rid[order2],
        stream_idx=idx[order2],
        n_kept=jnp.sum(kept.astype(jnp.int32)),
    )


@functools.lru_cache(maxsize=64)
def sharded_pair_cluster(mesh, max_cluster_bias, read_count,
                         shard_rows: int, break_on_k2: bool):
    """shard_map wrapper (lru_cache'd — see sharded_cluster_structure): each device runs the pair-cluster kernel on its
    own contiguous stream shard. The caller cuts the stream at k1 gaps
    > bias — a guaranteed cluster boundary (the break conditions are
    OR-ed), so per-shard results equal the global computation.

    Inputs are (n_shards, shard_rows) arrays sharded on the genome axis;
    outputs are the kernel's row arrays per shard plus per-shard n_kept.
    """
    import jax
    from jax.sharding import PartitionSpec as P

    bias = jnp.int32(max_cluster_bias)
    rc = jnp.int32(read_count)

    def per_shard(k1, k2, aux, rid, nv):
        out = pair_cluster_structure(k1[0], k2[0], aux[0], rid[0],
                                     nv[0, 0], bias, rc, shard_rows,
                                     break_on_k2)
        return (out["cid"][None], out["stream_idx"][None],
                out["n_kept"][None])

    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("genome", None),) * 5,
        out_specs=(P("genome", None),) * 2 + (P("genome"),),
    ))

@partial(jax.jit, static_argnames=("cap_out",))
def compact_pair_outputs(cid, stream_idx, cap_out: int):
    """Shrink pair-kernel outputs to the leading ``cap_out`` rows (kept
    rows sort to the front): the host consumer only needs cluster
    boundaries + row indices, so one uint32 per kept row (boundary flag
    in the top bit) replaces five full-width padded arrays."""
    boundary = jnp.concatenate([
        jnp.ones((1,), jnp.uint32),
        (cid[1:] != cid[:-1]).astype(jnp.uint32)])
    packed = stream_idx.astype(jnp.uint32) | (boundary << 31)
    return jax.lax.slice(packed, (0,), (cap_out,))
