"""Device (JAX/TPU) resolvers for DEL/INS.

Splits the work TPU-first:
  * device — the O(N log N) integer work over the full signature stream:
    sorting, gap clustering, per-read dedup, support gates, and the allele
    stream ordering (ops/indel_cluster.py);
  * host  — per-allele f64 finalization (means of the closest-to-mean
    members, CIPOS/CILEN), which must match numpy's f64 semantics exactly
    and touches only ~1e3-1e5 small slices.

Integer-exactness note: the allele-split threshold is
``ratio * np.mean(lengths)``; lengths are integers, so np.mean's pairwise
f64 summation is exact and equals bincount_sum/count computed here.

Output rows are identical to models/host.py (golden-tested in
tests/test_device_parity.py).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from cutesv_tpu.models.host import finalize_indel_allele
from cutesv_tpu.ops.indel_cluster import indel_cluster_structure
from cutesv_tpu.ops.segments import padded_size

import jax.numpy as jnp


def _cluster_arrays(rows: Sequence, read_count: int, bias: int):
    """Run the device kernel over one chromosome's signature stream.

    Returns (cid, pos, length, stream_idx) numpy arrays of the kept rows in
    allele-stream order, or None when the stream is empty."""
    n = len(rows)
    if n == 0:
        return None
    pos = np.fromiter((r[0] for r in rows), np.int64, n)
    length = np.fromiter((r[1] for r in rows), np.int64, n)
    names = np.array([r[2] for r in rows])
    _, rid = np.unique(names, return_inverse=True)
    cap = padded_size(n)
    pad = cap - n

    def padded(a, fill, dtype):
        return jnp.asarray(np.concatenate(
            [a.astype(dtype), np.full(pad, fill, dtype)]))

    valid = jnp.asarray(
        np.concatenate([np.ones(n, bool), np.zeros(pad, bool)]))
    out = indel_cluster_structure(
        padded(pos, 0, np.int32), padded(length, 0, np.int32),
        padded(rid.astype(np.int64), 0, np.int32), valid,
        jnp.int32(bias), jnp.int32(read_count), cap)
    nk = int(out["n_kept"])
    return (np.asarray(out["cid"])[:nk].astype(np.int64),
            np.asarray(out["pos"])[:nk].astype(np.int64),
            np.asarray(out["length"])[:nk].astype(np.int64),
            np.asarray(out["stream_idx"])[:nk].astype(np.int64))


def _allele_slices(cid, length, threshold_gloab):
    """Exact allele segmentation of the kept stream + processing order.

    Returns (aid, order) where ``aid`` assigns contiguous allele ids and
    ``order`` lists allele ids in the reference's processing order:
    clusters in stream order, alleles within a cluster by ascending
    support (stable)."""
    nk = len(cid)
    csum = np.bincount(cid, weights=length.astype(np.float64))
    ccnt = np.bincount(cid)
    with np.errstate(invalid="ignore", divide="ignore"):
        thr = threshold_gloab * (csum / np.maximum(ccnt, 1))
    new_cluster = np.ones(nk, bool)
    new_cluster[1:] = cid[1:] != cid[:-1]
    boundary = new_cluster.copy()
    dlen = length[1:] - length[:-1]
    boundary[1:] |= (~new_cluster[1:]) & (dlen > thr[cid[1:]])
    aid = np.cumsum(boundary) - 1
    n_alleles = aid[-1] + 1 if nk else 0
    support = np.bincount(aid, minlength=n_alleles)
    first_row = np.nonzero(boundary)[0]
    a_cluster = cid[first_row]
    order = np.lexsort((np.arange(n_alleles), support, a_cluster))
    return aid, first_row, support, order


def resolve_del_device(sigs: Sequence, chrom: str, read_count: int,
                       threshold_gloab: float, max_cluster_bias: int,
                       minimum_support_reads: int,
                       remain_reads_ratio: float, action: bool):
    """Device counterpart of models.host.resolve_del; identical outputs."""
    if remain_reads_ratio > 1:
        remain_reads_ratio = 1
    res = _cluster_arrays(sigs, read_count, max_cluster_bias)
    candidates: List[list] = []
    gt_jobs: List[dict] = []
    if res is None:
        return candidates, gt_jobs
    cid, pos, length, sidx = res
    if len(cid) == 0:
        return candidates, gt_jobs
    aid, first_row, support, order = _allele_slices(cid, length,
                                                    threshold_gloab)
    for a in order:
        sup = int(support[a])
        if sup < minimum_support_reads:
            continue
        lo = int(first_row[a])
        hi = int(first_row[a + 1]) if a + 1 < len(first_row) else len(cid)
        poss = [int(p) for p in pos[lo:hi]]
        lens = [int(v) for v in length[lo:hi]]
        al = finalize_indel_allele(poss, lens, sup, remain_reads_ratio)
        names = [sigs[int(k)][2] for k in sidx[lo:hi]]
        if action:
            anchor = int(al["search_threshold"])
            gt_jobs.append(dict(
                window=(max(anchor - max_cluster_bias, 0),
                        anchor + max_cluster_bias),
                support=names))
            candidates.append([chrom, "DEL", str(int(al["breakpoint"])),
                               str(int(-al["signal_len"])), str(sup),
                               al["cipos"], al["cilen"], None, None, None,
                               None, None, ",".join(names)])
        else:
            candidates.append([chrom, "DEL", str(int(al["breakpoint"])),
                               str(int(-al["signal_len"])), str(sup),
                               al["cipos"], al["cilen"], ".", "./.",
                               ".,.,.", ".", ".", ",".join(names)])
    return candidates, gt_jobs


def resolve_ins_device(sigs: Sequence, chrom: str, read_count: int,
                       threshold_gloab: float, max_cluster_bias: int,
                       minimum_support_reads: int,
                       remain_reads_ratio: float, action: bool):
    """Device counterpart of models.host.resolve_ins; identical outputs."""
    if remain_reads_ratio > 1:
        remain_reads_ratio = 1
    res = _cluster_arrays(sigs, read_count, max_cluster_bias)
    candidates: List[list] = []
    gt_jobs: List[dict] = []
    if res is None:
        return candidates, gt_jobs
    cid, pos, length, sidx = res
    if len(cid) == 0:
        return candidates, gt_jobs
    aid, first_row, support, order = _allele_slices(cid, length,
                                                    threshold_gloab)
    for a in order:
        sup = int(support[a])
        if sup < minimum_support_reads:
            continue
        lo = int(first_row[a])
        hi = int(first_row[a + 1]) if a + 1 < len(first_row) else len(cid)
        poss = [int(p) for p in pos[lo:hi]]
        lens = [int(v) for v in length[lo:hi]]
        al = finalize_indel_allele(poss, lens, sup, remain_reads_ratio)
        breakpoint = al["breakpoint"]
        signal_len = al["signal_len"]
        seqs = [sigs[int(k)][3] for k in sidx[lo:hi]]
        ideal_seq = None
        for p, sq in zip(poss, seqs):
            if len(sq) >= int(signal_len):
                breakpoint = p
                ideal_seq = sq[:int(signal_len)]
                break
        if ideal_seq is None:
            continue
        names = [sigs[int(k)][2] for k in sidx[lo:hi]]
        if action:
            anchor = int(breakpoint)
            gt_jobs.append(dict(window=(max(anchor - 1000, 0),
                                        anchor + 1000),
                                support=names))
            candidates.append([chrom, "INS", str(int(breakpoint)),
                               str(int(signal_len)), str(sup), al["cipos"],
                               al["cilen"], None, None, None, None, None,
                               ",".join(names), ideal_seq])
        else:
            candidates.append([chrom, "INS", str(int(breakpoint)),
                               str(int(signal_len)), str(sup), al["cipos"],
                               al["cilen"], ".", "./.", ".,.,.", ".", ".",
                               ",".join(names), ideal_seq])
    return candidates, gt_jobs
