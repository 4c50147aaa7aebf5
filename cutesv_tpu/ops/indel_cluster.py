"""DEL/INS cluster-structure kernel.

Device side of the resolution algorithm (cuteSV_resolveINDEL.py): given the
merged, sorted signature stream of one chromosome as dense arrays, compute

  1. gap clusters          (new cluster when pos gap > max_cluster_bias)
  2. cluster size gate     (raw size  >= read_count)
  3. per-read dedup        (keep max length; first occurrence wins ties and
                            keeps the read's first-occurrence stream order)
  4. distinct-support gate (distinct reads >= read_count)
  5. the allele stream     (kept rows re-sorted by (cluster, len,
                            first-occurrence order))
  6. exact integer sums    (kept count + length sum per cluster, so the host
                            reproduces np.mean bit-for-bit as sum/count)

Everything here is integer sorting + segment reductions — the float allele
finalization stays on host (models/device.py) where f64 matches the
reference's numpy exactly.
"""
from __future__ import annotations

import functools

from functools import partial

import jax
import jax.numpy as jnp

from cutesv_tpu.ops import segments as seg


@partial(jax.jit, static_argnames=("num_rows",))
def indel_cluster_structure(pos, length, rid, n_valid, max_cluster_bias,
                            read_count, num_rows: int):
    """All arrays are length ``num_rows`` (padded; the first ``n_valid``
    rows are real — the mask is derived on device so one byte per padded
    row never crosses the host->device link). Returns a dict of arrays
    in 'allele stream' order plus per-cluster integer stats."""
    n = num_rows
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < n_valid
    big = jnp.int32(n + 1)

    # --- 1. gap clusters over the (already sorted) stream ---------------
    prev_pos = jnp.concatenate([pos[:1], pos[:-1]])
    new_cluster = (pos - prev_pos > max_cluster_bias) & valid
    new_cluster = new_cluster.at[0].set(False)
    cid = jnp.cumsum(new_cluster.astype(jnp.int32))
    cid = jnp.where(valid, cid, big)

    # --- 2. raw size gate ------------------------------------------------
    size = seg.seg_sum(valid.astype(jnp.int32), cid, n + 2)
    size_ok = size[cid] >= read_count

    # --- 3. dedup sort: (cid, rid, -len, idx) ---------------------------
    order1 = jnp.lexsort((idx, -length, rid, cid))
    s_cid = cid[order1]
    s_rid = rid[order1]
    s_len = length[order1]
    s_pos = pos[order1]
    s_idx = idx[order1]
    s_valid = valid[order1]
    s_size_ok = size_ok[order1]

    grp_first = seg.boundary_flags(s_cid, s_rid, valid=s_valid)
    grp_first = grp_first | (jnp.arange(n) == jnp.argmax(s_valid))
    grp_first = grp_first & s_valid
    # group ids over (cid, rid)
    gid = jnp.cumsum(grp_first.astype(jnp.int32))
    gid = jnp.where(s_valid, gid, big)
    ins_key = seg.seg_min(jnp.where(s_valid, s_idx, big), gid, n + 2)[gid]

    # --- 4. distinct support gate ---------------------------------------
    distinct = seg.seg_sum(grp_first.astype(jnp.int32), s_cid, n + 2)
    dist_ok = distinct[s_cid] >= read_count

    kept = grp_first & s_size_ok & dist_ok

    # --- 5. allele stream sort: kept rows by (cid, len, ins_key) --------
    # (length sums for the reference's np.mean threshold are integer-exact
    # and computed host-side in f64 from this stream)
    sort_cid = jnp.where(kept, s_cid, big)
    order2 = jnp.lexsort((ins_key, s_len, sort_cid))
    # only what the host finalize needs crosses the device boundary
    return dict(
        cid=sort_cid[order2],
        pos=s_pos[order2],
        length=s_len[order2],
        stream_idx=s_idx[order2],
        n_kept=jnp.sum(kept.astype(jnp.int32)),
    )


@partial(jax.jit, static_argnames=("cap_out",))
def compact_cluster_outputs(cid, pos, length, stream_idx, cap_out: int):
    """Shrink cluster-kernel outputs to the leading ``cap_out`` rows
    (kept rows sort to the front) with the new-cluster boundary flag
    packed into stream_idx's top bit — the device->host link pays for
    n_kept rows x 12 bytes instead of num_rows x 16. The host rebuilds
    dense cluster ids as cumsum(boundary) - 1, an order-preserving
    relabeling of ``cid``."""
    boundary = jnp.concatenate([
        jnp.ones((1,), jnp.uint32),
        (cid[1:] != cid[:-1]).astype(jnp.uint32)])
    packed = stream_idx.astype(jnp.uint32) | (boundary << 31)

    def sl(x):
        return jax.lax.slice(x, (0,), (cap_out,))

    return dict(pos=sl(pos), length=sl(length), packed=sl(packed))


@functools.lru_cache(maxsize=64)
def sharded_cluster_structure(mesh, max_cluster_bias, read_count,
                              shard_rows: int):
    """shard_map wrapper: each device runs the cluster kernel on its own
    contiguous stream shard. The caller guarantees shards are cut at
    inter-cluster gaps (pos gap > max_cluster_bias), so no cluster spans
    devices and per-shard results equal the global computation.

    Inputs are (n_shards, shard_rows) arrays sharded on the genome axis;
    outputs are the kernel's row arrays per shard plus per-shard n_kept.

    lru_cache'd: rebuilding the jit(shard_map(...)) wrapper per call would
    retrace (and through the remote-TPU tunnel recompile) on every batch.
    """
    import jax
    from jax.sharding import PartitionSpec as P

    bias = jnp.int32(max_cluster_bias)
    rc = jnp.int32(read_count)

    def per_shard(pos, length, rid, nv):
        out = indel_cluster_structure(pos[0], length[0], rid[0], nv[0, 0],
                                      bias, rc, shard_rows)
        return (out["cid"][None], out["pos"][None], out["length"][None],
                out["stream_idx"][None], out["n_kept"][None])

    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("genome", None),) * 4,
        out_specs=(P("genome", None),) * 4 + (P("genome"),),
    ))
