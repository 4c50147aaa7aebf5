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

Inputs arrive either as the oracle's tuple streams or as the native
decoder's columnar arrays (`IndelStream.from_arrays`); outputs are
identical to models/host.py (golden-tested in tests/test_device_parity.py).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from cutesv_tpu.genotype import cal_CIPOS
from cutesv_tpu.models.host import finalize_indel_allele
from cutesv_tpu.ops.indel_cluster import indel_cluster_structure
from cutesv_tpu.ops.segments import padded_size


class IndelStream:
    """Columnar view over one chromosome's merged DEL or INS stream.

    ``pos``/``length`` int64 arrays; ``rid`` int read identities whose
    numeric order equals read-name string order. Two storage modes share
    one row API (``seq_of``/``names_of``/``keys_of``): tuple-backed
    (oracle path, string identities) and array-backed (native decode
    path, rank-id identities). Plain attributes only, so signature
    checkpoints pickle cleanly.
    """

    def __init__(self, pos, length, rid, rows=None, names_table=None,
                 seq_len=None, seq_blob=None, seq_off=None):
        self.pos = pos
        self.length = length
        self.rid = rid
        self._rows = rows               # tuple mode
        self._names_table = names_table  # array mode
        self.seq_len = seq_len
        self._seq_blob = seq_blob
        self._seq_off = seq_off

    def __len__(self):
        return len(self.pos)

    def seq_of(self, k):
        if self._rows is not None:
            return self._rows[k][3]
        o = int(self._seq_off[k])
        return self._seq_blob[o:o + int(self.seq_len[k])].decode("ascii")

    def seqs_of(self, ks, lens):
        """``seq_of(k)[:l]`` over parallel lists — batched so a native
        blob view pays ONE span call for the whole emission instead of
        one ctypes round trip per allele."""
        if self._rows is not None:
            return [self._rows[int(k)][3][:l] for k, l in zip(ks, lens)]
        offs = [int(self._seq_off[k]) for k in ks]
        tl = [min(int(self.seq_len[k]), int(l)) for k, l in zip(ks, lens)]
        blob = self._seq_blob
        if hasattr(blob, "spans"):
            data = blob.spans(offs, tl)
            out, p = [], 0
            for l in tl:
                out.append(data[p:p + l].decode("ascii"))
                p += l
            return out
        return [blob[o:o + l].decode("ascii")
                for o, l in zip(offs, tl)]

    def tuples(self):
        """Materialize resolver-format tuple rows (host-engine path over a
        native store); read identities stay rank keys."""
        if self._rows is not None:
            return self._rows
        if self.seq_len is not None:
            return [(int(self.pos[k]), int(self.length[k]),
                     int(self.rid[k]), self.seq_of(k))
                    for k in range(len(self.pos))]
        return list(zip(self.pos.tolist(), self.length.tolist(),
                        self.rid.tolist()))

    def names_of(self, idx) -> list:
        """Vectorized name_of over an index array (one pass instead of a
        python call per row)."""
        if self._rows is not None:
            rows = self._rows
            return [rows[int(k)][2] for k in idx]
        tbl = self._names_table
        return [tbl[r] for r in self.rid[idx].tolist()]

    def keys_of(self, idx) -> list:
        """Vectorized key_of over an index array."""
        if self._rows is not None:
            rows = self._rows
            return [rows[int(k)][2] for k in idx]
        return self.rid[idx].tolist()

    @classmethod
    def from_tuples(cls, rows: Sequence, is_ins: bool) -> "IndelStream":
        n = len(rows)
        pos = np.fromiter((r[0] for r in rows), np.int64, n)
        length = np.fromiter((r[1] for r in rows), np.int64, n)
        names = np.array([r[2] for r in rows]) if n else np.empty(0, "U1")
        _, rid = np.unique(names, return_inverse=True)
        kw = {}
        if is_ins:
            kw = dict(seq_len=np.fromiter((len(r[3]) for r in rows),
                                          np.int64, n))
        return cls(pos, length, rid.astype(np.int64), rows=list(rows), **kw)

    @classmethod
    def from_arrays(cls, pos, length, rid, names_table, seq_len=None,
                    seq_blob=None, seq_off=None) -> "IndelStream":
        return cls(np.asarray(pos, np.int64), np.asarray(length, np.int64),
                   np.asarray(rid, np.int64), names_table=names_table,
                   seq_len=seq_len, seq_blob=seq_blob, seq_off=seq_off)

    def select(self, keep: np.ndarray) -> "IndelStream":
        """Row-filtered copy (both storage modes)."""
        rows = None
        if self._rows is not None:
            rows = [r for r, k in zip(self._rows, keep) if k]
        return IndelStream(
            self.pos[keep], self.length[keep], self.rid[keep], rows=rows,
            names_table=self._names_table,
            seq_len=None if self.seq_len is None else self.seq_len[keep],
            seq_blob=self._seq_blob,
            seq_off=None if self._seq_off is None else self._seq_off[keep])


def _cluster_stream_dispatch(stream: IndelStream, read_count: int,
                             bias: int):
    """Dispatch the (async) device kernel; returns the jax output dict."""
    n = len(stream)
    if n == 0:
        return None
    cap = padded_size(n)
    pad = cap - n

    def padded(a, dtype):
        return jnp.asarray(np.concatenate(
            [a.astype(dtype), np.zeros(pad, dtype)]))

    return indel_cluster_structure(
        padded(stream.pos, np.int32), padded(stream.length, np.int32),
        padded(stream.rid, np.int32), jnp.int32(n),
        jnp.int32(bias), jnp.int32(read_count), cap)


def prefetch_counts(*states):
    """Start async device->host copies of every dispatched kernel's
    ``n_kept`` scalar BEFORE the compact phases block on them one kernel
    at a time. Through the remote-TPU tunnel each blocking scalar fetch
    pays a full round trip; pipelining the copies collapses the
    ~(2 + 2*n_chrom) serial round trips into roughly one."""

    def _start(h):
        if isinstance(h, dict) and "n_kept" in h:
            copy = getattr(h["n_kept"], "copy_to_host_async", None)
            if copy is not None:
                copy()

    for st in states:
        if st is None:
            continue
        if isinstance(st, dict) and "jobs" in st:
            for _, _, kind, h in st["jobs"]:
                if kind == "kernel":
                    _start(h)
        elif isinstance(st, dict):
            _start(st)  # raw kernel output (streaming early dispatch)
        elif isinstance(st, tuple) and len(st) in (2, 3) and \
                st[0] == "pending":
            _start(st[1])


def prefetch_to_host(*states):
    """Start async device->host copies for every dispatched kernel output
    held by the given resolver states (indel multi-states and pair
    states). The later blocking ``jax.device_get`` calls then find the
    bytes already on host, so transfers overlap host emission instead of
    serializing behind it — this matters through the remote-TPU tunnel
    where each fetch pays real latency."""
    import jax

    def _start(x):
        copy = getattr(x, "copy_to_host_async", None)
        if copy is not None:
            copy()

    for st in states:
        if st is None:
            continue
        if isinstance(st, dict) and "jobs" in st:
            handles = []
            for _, _, kind, h in st["jobs"]:
                if kind != "kernel" or h is None:
                    continue
                if isinstance(h, tuple):  # compacted: (n_kept, handle)
                    h = h[1]
                if h is not None:
                    handles.append(h)
        elif isinstance(st, tuple) and len(st) in (2, 3) and \
                st[0] == "pending" and st[1] is not None:
            h = st[1]
            if isinstance(h, tuple):  # compacted: (n_kept, handle)
                h = h[1]
            handles = [h] if h is not None else []
        else:
            continue
        for h in handles:
            jax.tree_util.tree_map(_start, h)


def _cluster_stream_compact(out):
    """Fetch n_kept and dispatch the on-device output compaction (async);
    returns (n_kept, compact_handle). Compacting before the host copy
    cuts the device->host bytes to the kept rows only — the tunnel runs
    at ~25 MB/s, so bytes are the cost."""
    import jax

    from cutesv_tpu.ops.indel_cluster import compact_cluster_outputs

    if out is None:
        return None
    if isinstance(out, tuple):
        return out  # already compacted
    nk = int(jax.device_get(out["n_kept"]))
    if nk == 0:
        return (0, None)
    cap_out = min(padded_size(nk), int(out["cid"].shape[0]))
    return (nk, compact_cluster_outputs(out["cid"], out["pos"],
                                        out["length"], out["stream_idx"],
                                        cap_out))


def _cluster_stream_fetch(out):
    """Fetch dispatched kernel outputs; accepts either the raw kernel
    handle or a (n_kept, compact_handle) pair from
    :func:`_cluster_stream_compact`."""
    import jax

    if out is None:
        return None
    if not isinstance(out, tuple):
        out = _cluster_stream_compact(out)
    nk, comp = out
    if nk == 0:
        return None
    got = jax.device_get(comp)
    packed = np.asarray(got["packed"])[:nk]
    sidx = (packed & np.uint32(0x7FFFFFFF)).astype(np.int64)
    cid = np.cumsum(packed >> np.uint32(31)).astype(np.int64) - 1
    return (cid,
            np.asarray(got["pos"])[:nk].astype(np.int64),
            np.asarray(got["length"])[:nk].astype(np.int64),
            sidx)


def _cluster_stream(stream: IndelStream, read_count: int, bias: int):
    """Run the device kernel; returns kept rows in allele-stream order as
    (cid, pos, length, stream_idx) numpy arrays."""
    return _cluster_stream_fetch(
        _cluster_stream_dispatch(stream, read_count, bias))


def _allele_slices(cid, length, threshold_gloab):
    """Exact allele segmentation of the kept stream + processing order
    (clusters in stream order, alleles by ascending support, stable)."""
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
    return first_row, support, order


def _as_stream(sigs, is_ins: bool) -> IndelStream:
    return sigs if isinstance(sigs, IndelStream) else \
        IndelStream.from_tuples(sigs, is_ins)


def _cipos_vectorized(values, first_row, support, aid, means):
    """Batched cal_CIPOS(np.std(slice), n) per allele.

    np.std's pairwise summation of squared deviations can differ from
    reduceat's sequential sum in the last ulp; that only matters when
    1.96*std/sqrt(n) sits within rounding distance of an integer (int()
    truncation boundary), so those rare alleles are recomputed with np.std
    itself. Returns the "-d,d" strings.
    """
    dev = values.astype(np.float64) - means[aid]
    sq = dev * dev
    sums = np.add.reduceat(sq, first_row)
    n = support.astype(np.float64)
    std = np.sqrt(sums / n)
    raw = 1.96 * std / np.sqrt(n)
    d = raw.astype(np.int64)
    # ulp-boundary guard: recompute exactly where truncation is ambiguous.
    # sums == 0 (singletons / identical values) is exact in both
    # algorithms, so only non-degenerate near-integer values are risky.
    risky = (np.abs(raw - np.round(raw)) < 1e-6) & (sums != 0)
    out = ["-%d,%d" % (x, x) for x in d]
    for a in np.nonzero(risky)[0]:
        lo = first_row[a]
        hi = first_row[a + 1] if a + 1 < len(first_row) else len(values)
        out[a] = cal_CIPOS(np.std(values[lo:hi]), int(support[a]))
    return out


def _finalize_vectorized(cid, pos, length, first_row, support):
    """Batched allele finalization for remain_reads_ratio == 1.

    Bit-identical to finalize_indel_allele: means of integers are exact in
    f64 regardless of summation order, so sum/n == np.mean over the picked
    permutation; the search anchor is the member minimizing
    (|pos - mean|, index-within-allele).
    Returns (bp_mean, len_mean, search_thr) arrays per allele.
    """
    nk = len(cid)
    n_alleles = len(first_row)
    aid = np.zeros(nk, np.int64)
    aid[first_row] = 1
    aid = np.cumsum(aid) - 1
    possum = np.bincount(aid, weights=pos.astype(np.float64),
                         minlength=n_alleles)
    lensum = np.bincount(aid, weights=length.astype(np.float64),
                         minlength=n_alleles)
    sup = support.astype(np.float64)
    bp_mean = possum / sup
    len_mean = lensum / sup
    # anchor: first member (by in-allele index) at min |pos - mean|
    dev = np.abs(pos.astype(np.float64) - bp_mean[aid])
    order = np.lexsort((np.arange(nk), dev, aid))
    o_aid = aid[order]
    first_of_allele = np.ones(nk, bool)
    first_of_allele[1:] = o_aid[1:] != o_aid[:-1]
    search_thr = np.zeros(n_alleles, pos.dtype)
    search_thr[o_aid[first_of_allele]] = pos[order[first_of_allele]]
    return bp_mean, len_mean, search_thr, aid


def resolve_del_device(sigs, chrom: str, read_count: int,
                       threshold_gloab: float, max_cluster_bias: int,
                       minimum_support_reads: int,
                       remain_reads_ratio: float, action: bool):
    """Device counterpart of models.host.resolve_del; identical outputs."""
    stream = _as_stream(sigs, is_ins=False)
    res = _cluster_stream(stream, read_count, max_cluster_bias)
    if res is None or len(res[0]) == 0:
        return [], []
    cid, pos, length, sidx = res
    return _emit_del(cid, pos, length, sidx, stream, chrom, threshold_gloab,
                     max_cluster_bias, minimum_support_reads,
                     remain_reads_ratio, action)


def _emit_del(cid, pos, length, sidx, stream, chrom, threshold_gloab,
              max_cluster_bias, minimum_support_reads, remain_reads_ratio,
              action, need_names=True):
    """Allele finalize + candidate build over kept DEL rows (allele-stream
    order) of one chromosome. ``need_names=False`` skips rendering the
    RNAMES column (only consumed under --report_readid)."""
    if remain_reads_ratio > 1:
        remain_reads_ratio = 1
    candidates: List[list] = []
    gt_jobs: List[dict] = []
    # densify cluster ids: sharded streams offset each shard's ids by
    # k*(shard_rows+2), so a plain -cid[0] shift would leave huge gaps and
    # _allele_slices' bincounts would allocate O(max_id) instead of
    # O(#clusters); ids are nondecreasing in allele-stream order
    cid = np.cumsum(np.diff(cid, prepend=cid[0]) != 0)
    first_row, support, order = _allele_slices(cid, length, threshold_gloab)
    fast = remain_reads_ratio == 1
    if fast:
        bp_v, len_v, thr_v, aid = _finalize_vectorized(cid, pos, length,
                                                       first_row, support)
        cipos_v = _cipos_vectorized(pos, first_row, support, aid, bp_v)
        cilen_v = _cipos_vectorized(length, first_row, support, aid, len_v)
        # int() truncation (all positive); python ints via tolist()
        # because str()/int() on numpy scalars is several times slower
        bp_i = bp_v.astype(np.int64).tolist()
        len_i = len_v.astype(np.int64).tolist()
        thr_i = thr_v.astype(np.int64).tolist()
    sup_l = support.tolist()
    fr_l = first_row.tolist()
    all_names = stream.names_of(sidx) if need_names else None
    all_keys = stream.keys_of(sidx)
    n_rows = len(cid)
    n_alleles = len(fr_l)
    # sub-threshold (noise) alleles vastly outnumber kept ones on real
    # corpora — filter in numpy so the python loop visits only emitters
    order = order[support[order] >= minimum_support_reads]
    for a in order.tolist():
        sup = sup_l[a]
        lo = fr_l[a]
        hi = fr_l[a + 1] if a + 1 < n_alleles else n_rows
        if fast:
            bp_s = str(bp_i[a])
            ln_s = str(-len_i[a])
            anchor = thr_i[a]
            cipos, cilen = cipos_v[a], cilen_v[a]
        else:
            al = finalize_indel_allele([int(p) for p in pos[lo:hi]],
                                       [int(v) for v in length[lo:hi]],
                                       sup, remain_reads_ratio)
            bp_s = str(int(al["breakpoint"]))
            ln_s = str(int(-al["signal_len"]))
            anchor = int(al["search_threshold"])
            cipos, cilen = al["cipos"], al["cilen"]
        names = ",".join(all_names[lo:hi]) if need_names else ""
        if action:
            gt_jobs.append(dict(
                window=(max(anchor - max_cluster_bias, 0),
                        anchor + max_cluster_bias),
                support=all_keys[lo:hi]))
            candidates.append([chrom, "DEL", bp_s, ln_s, str(sup),
                               cipos, cilen, None, None, None,
                               None, None, names])
        else:
            candidates.append([chrom, "DEL", bp_s, ln_s, str(sup),
                               cipos, cilen, ".", "./.",
                               ".,.,.", ".", ".", names])
    return candidates, gt_jobs


def resolve_ins_device(sigs, chrom: str, read_count: int,
                       threshold_gloab: float, max_cluster_bias: int,
                       minimum_support_reads: int,
                       remain_reads_ratio: float, action: bool):
    """Device counterpart of models.host.resolve_ins; identical outputs."""
    stream = _as_stream(sigs, is_ins=True)
    res = _cluster_stream(stream, read_count, max_cluster_bias)
    if res is None or len(res[0]) == 0:
        return [], []
    cid, pos, length, sidx = res
    return _emit_ins(cid, pos, length, sidx, stream, chrom, threshold_gloab,
                     max_cluster_bias, minimum_support_reads,
                     remain_reads_ratio, action)


def _emit_ins(cid, pos, length, sidx, stream, chrom, threshold_gloab,
              max_cluster_bias, minimum_support_reads, remain_reads_ratio,
              action, need_names=True):
    if remain_reads_ratio > 1:
        remain_reads_ratio = 1
    candidates: List[list] = []
    gt_jobs: List[dict] = []
    seq_fetch: List[tuple] = []  # (candidate idx, stream row, trunc len)
    cid = np.cumsum(np.diff(cid, prepend=cid[0]) != 0)  # densify (see _emit_del)
    first_row, support, order = _allele_slices(cid, length, threshold_gloab)
    fast = remain_reads_ratio == 1
    if fast:
        bp_v, len_v, thr_v, aid = _finalize_vectorized(cid, pos, length,
                                                       first_row, support)
        cipos_v = _cipos_vectorized(pos, first_row, support, aid, bp_v)
        cilen_v = _cipos_vectorized(length, first_row, support, aid, len_v)
        # int() truncation, all positive; python ints via tolist()
        len_i = len_v.astype(np.int64).tolist()
    sup_l = support.tolist()
    fr_l = first_row.tolist()
    all_names = stream.names_of(sidx) if need_names else None
    all_keys = stream.keys_of(sidx)
    row_seq_len = stream.seq_len[sidx] if len(sidx) else np.empty(0, np.int64)
    n_rows = len(cid)
    n_alleles = len(fr_l)
    order = order[support[order] >= minimum_support_reads]
    for a in order.tolist():
        sup = sup_l[a]
        lo = fr_l[a]
        hi = fr_l[a + 1] if a + 1 < n_alleles else n_rows
        if fast:
            isl = len_i[a]
            cipos, cilen = cipos_v[a], cilen_v[a]
        else:
            al = finalize_indel_allele([int(p) for p in pos[lo:hi]],
                                       [int(v) for v in length[lo:hi]],
                                       sup, remain_reads_ratio)
            isl = int(al["signal_len"])
            cipos, cilen = al["cipos"], al["cilen"]
        ok = np.nonzero(row_seq_len[lo:hi] >= isl)[0]
        if len(ok) == 0:
            continue
        k = lo + int(ok[0])
        breakpoint = int(pos[k])
        seq_fetch.append((len(candidates), int(sidx[k]), isl))
        names = ",".join(all_names[lo:hi]) if need_names else ""
        if action:
            gt_jobs.append(dict(window=(max(breakpoint - 1000, 0),
                                        breakpoint + 1000),
                                support=all_keys[lo:hi]))
            candidates.append([chrom, "INS", str(breakpoint),
                               str(isl), str(sup), cipos,
                               cilen, None, None, None, None, None,
                               names, None])
        else:
            candidates.append([chrom, "INS", str(breakpoint),
                               str(isl), str(sup), cipos,
                               cilen, ".", "./.", ".,.,.", ".", ".",
                               names, None])
    # ALT sequences in one batched blob read (one native span call per
    # chromosome, not one per allele)
    if seq_fetch:
        seqs = stream.seqs_of([r for _, r, _ in seq_fetch],
                              [l for _, _, l in seq_fetch])
        for (ci, _, _), s in zip(seq_fetch, seqs):
            candidates[ci][13] = s
    return candidates, gt_jobs


# ---------------------------------------------------------------------------
# DUP / INV device resolvers (ops/pair_cluster.py + host emission)
# ---------------------------------------------------------------------------

def _pair_cluster_start(k1, k2, aux, keys, read_count, bias, break_on_k2):
    """Dispatch the pair-cluster kernel (async); fetch with
    _pair_cluster_finish. Splitting dispatch from fetch lets the DUP and
    INV kernels run on-device while DEL/INS emission runs on host."""
    from cutesv_tpu.ops.pair_cluster import pair_cluster_structure

    n = len(k1)
    if n == 0:
        return None
    _, rid = np.unique(np.asarray(keys), return_inverse=True)
    cap = padded_size(n)
    pad = cap - n

    def padded(a, dtype):
        return jnp.asarray(np.concatenate(
            [np.asarray(a).astype(dtype), np.zeros(pad, dtype)]))

    return pair_cluster_structure(
        padded(k1, np.int32), padded(k2, np.int32),
        padded(aux, np.int32), padded(rid, np.int32), jnp.int32(n),
        jnp.int32(bias), jnp.int32(read_count), cap, bool(break_on_k2))


def _pair_cluster_compact(out):
    """Fetch n_kept and dispatch the pair-output compaction (async);
    returns (n_kept, packed_handle)."""
    import jax

    from cutesv_tpu.ops.pair_cluster import compact_pair_outputs

    if out is None or isinstance(out, tuple):
        return out
    nk = int(jax.device_get(out["n_kept"]))
    if nk == 0:
        return (0, None)
    cap_out = min(padded_size(nk), int(out["cid"].shape[0]))
    return (nk, compact_pair_outputs(out["cid"], out["stream_idx"],
                                     cap_out))


def _pair_cluster_finish(out):
    """Fetch a dispatched pair-cluster kernel; yields slices of
    kernel-order row indices (stream_idx) per kept cluster. Accepts the
    raw kernel handle or the (n_kept, packed) pair from
    :func:`_pair_cluster_compact`."""
    if out is None:
        return []
    import jax

    if not isinstance(out, tuple):
        out = _pair_cluster_compact(out)
    nk, comp = out
    if nk == 0:
        return []
    packed = np.asarray(jax.device_get(comp))[:nk]
    sidx = (packed & np.uint32(0x7FFFFFFF)).astype(np.int64)
    bounds = np.flatnonzero(packed[1:] >> np.uint32(31)) + 1
    slices = []
    lo = 0
    for hi in list(bounds) + [nk]:
        slices.append(sidx[lo:int(hi)])
        lo = int(hi)
    return slices


def _pair_cluster_slices(k1, k2, aux, keys, read_count, bias, break_on_k2):
    """Run the pair-cluster kernel synchronously."""
    return _pair_cluster_finish(_pair_cluster_start(
        k1, k2, aux, keys, read_count, bias, break_on_k2))


def _pair_cluster_slices_sharded(k1, k2, aux, keys, read_count, bias,
                                 break_on_k2, n_shards):
    """Sharded variant of _pair_cluster_slices: exact per-shard kernels
    over k1-gap-aligned cuts (a k1 gap > bias always opens a cluster, so
    no cluster spans devices). Falls back to the single-device kernel when
    no clean cut exists or too few devices are present."""
    import jax

    from cutesv_tpu.ops.pair_cluster import sharded_pair_cluster
    from cutesv_tpu.parallel import mesh as pmesh

    n = len(k1)
    if n == 0:
        return []
    devices = pmesh.pick_devices(n_shards)
    if n_shards <= 1 or devices is None or n < 4 * n_shards:
        return _pair_cluster_slices(k1, k2, aux, keys, read_count, bias,
                                    break_on_k2)
    cuts = _gap_cuts(np.asarray(k1, np.int64), n_shards, bias)
    if cuts is None:
        return _pair_cluster_slices(k1, k2, aux, keys, read_count, bias,
                                    break_on_k2)
    _, rid = np.unique(np.asarray(keys), return_inverse=True)
    bounds = [0] + cuts + [n]
    shard_rows = padded_size(max(bounds[i + 1] - bounds[i]
                                 for i in range(n_shards)))
    a_k1 = np.zeros((n_shards, shard_rows), np.int32)
    a_k2 = np.zeros((n_shards, shard_rows), np.int32)
    a_aux = np.zeros((n_shards, shard_rows), np.int32)
    a_rid = np.zeros((n_shards, shard_rows), np.int32)
    a_nv = np.zeros((n_shards, 1), np.int32)
    k1a = np.asarray(k1, np.int32)
    k2a = np.asarray(k2, np.int32)
    auxa = np.asarray(aux, np.int32)
    for k in range(n_shards):
        lo, hi = bounds[k], bounds[k + 1]
        m = hi - lo
        a_k1[k, :m] = k1a[lo:hi]
        a_k2[k, :m] = k2a[lo:hi]
        a_aux[k, :m] = auxa[lo:hi]
        a_rid[k, :m] = rid[lo:hi]
        a_nv[k, 0] = m
    mesh = pmesh.make_mesh(n_shards, devices=devices)
    fn = sharded_pair_cluster(mesh, bias, read_count, shard_rows,
                              bool(break_on_k2))
    cid_s, sidx_s, nk_s = jax.device_get(fn(
        jnp.asarray(a_k1), jnp.asarray(a_k2), jnp.asarray(a_aux),
        jnp.asarray(a_rid), jnp.asarray(a_nv)))
    # shards are stream-order contiguous, so concatenating per-shard
    # cluster slices in shard order reproduces the global kernel order
    slices = []
    for k in range(n_shards):
        nk = int(nk_s[k])
        if nk == 0:
            continue
        cid = cid_s[k, :nk]
        sidx = sidx_s[k, :nk].astype(np.int64) + bounds[k]
        bnds = np.flatnonzero(np.diff(cid)) + 1
        lo = 0
        for hi in list(bnds) + [nk]:
            slices.append(sidx[lo:int(hi)])
            lo = int(hi)
    return slices


def resolve_pair_start(sigs: Sequence, is_inv: bool, read_count: int,
                       max_cluster_bias: int, n_shards: int = 1):
    """Dispatch the DUP/INV pair-cluster kernel for one chromosome without
    fetching. Returns opaque state for resolve_pair_finish. The sharded
    path (n_shards > 1) runs synchronously — shard_map results come back
    as one fused call anyway."""
    if is_inv:
        aux = np.fromiter((0 if r[0] == "++" else 1 for r in sigs),
                          np.int64, len(sigs))
        k1 = [r[1] for r in sigs]
        k2 = [r[2] for r in sigs]
        keys = [r[3] for r in sigs]
    else:
        aux = np.zeros(len(sigs))
        k1 = [r[0] for r in sigs]
        k2 = [r[1] for r in sigs]
        keys = [r[2] for r in sigs]
    if n_shards > 1:
        slices = _pair_cluster_slices_sharded(
            k1, k2, aux, keys, read_count, max_cluster_bias, is_inv,
            n_shards)
        return ("done", slices)
    return ("pending", _pair_cluster_start(
        k1, k2, aux, keys, read_count, max_cluster_bias, is_inv))


def resolve_pair_compact(state):
    """Fetch n_kept + dispatch the output compaction for a pending pair
    state (run before prefetch_to_host so host copies move packed rows)."""
    kind, payload = state
    if kind != "pending":
        return state
    return ("pending", _pair_cluster_compact(payload))


def resolve_pair_finish(state, sigs: Sequence, is_inv: bool, chrom: str,
                        read_count: int, max_cluster_bias: int,
                        sv_size: int, max_size: int, action: bool,
                        names: Optional[Sequence[str]] = None):
    """Fetch a dispatched pair-cluster kernel and emit candidates;
    identical outputs to models.host.resolve_dup / resolve_inv."""
    from cutesv_tpu.models.host import dup_cluster_emit, inv_cluster_emit

    kind, payload = state
    slices = payload if kind == "done" else _pair_cluster_finish(payload)
    render = (lambda k: names[k]) if names is not None else (lambda k: k)
    candidates: List[list] = []
    gt_jobs: List[dict] = []
    emit = inv_cluster_emit if is_inv else dup_cluster_emit
    for sl in slices:
        cluster = [sigs[int(i)] for i in sl]
        emit(cluster, chrom, read_count, max_cluster_bias, sv_size,
             max_size, action, render, candidates, gt_jobs)
    return candidates, gt_jobs


def resolve_tra_start(sigs: Sequence, read_count: int,
                      max_cluster_bias: int, n_shards: int = 1):
    """Dispatch the TRA/BND cluster-structure kernel for one chromosome
    (resolution_TRA, cuteSV_resolveTRA.py:30-105, clustering half).

    TRA clustering is the pair-cluster kernel with k1=pos1, k2=pos2 and
    aux encoding (chr2, bnd_type) — the reference breaks clusters on
    chr2 change, type change or a pos1 gap, gates on raw size AND
    distinct support, and walks each cluster p2-sorted: exactly the
    kernel's contract. Returns opaque state for resolve_tra_finish."""
    n = len(sigs)
    if n == 0:
        return None
    from cutesv_tpu.models.host import _equality_codes

    ty = np.fromiter((ord(r[0][0]) for r in sigs), np.int64, n)
    p1 = np.fromiter((r[1] for r in sigs), np.int64, n)
    p2 = np.fromiter((r[3] for r in sigs), np.int64, n)
    c2 = _equality_codes([r[2] for r in sigs])
    rid = _equality_codes([r[4] for r in sigs])
    aux = c2 * 4 + (ty - ord("A"))
    arrs = (p1, p2, rid)
    if n_shards > 1:
        slices = _pair_cluster_slices_sharded(
            p1, p2, aux, rid, read_count, max_cluster_bias, False,
            n_shards)
        return ("done", slices, arrs)
    return ("pending", _pair_cluster_start(
        p1, p2, aux, rid, read_count, max_cluster_bias, False), arrs)


def resolve_tra_compact(state):
    """Fetch n_kept + dispatch output compaction for a pending TRA state
    (mirror of resolve_pair_compact)."""
    if state is None:
        return None
    kind, payload, arrs = state
    if kind != "pending":
        return state
    return ("pending", _pair_cluster_compact(payload), arrs)


def resolve_tra_finish(state, sigs: Sequence, chr_1: str, read_count: int,
                       overlap_size: float, max_cluster_bias: int,
                       tables, chrom_lengths, action: bool, gt_round: int,
                       names: Optional[Sequence[str]] = None,
                       jobs_out: Optional[list] = None):
    """Fetch a dispatched TRA cluster kernel and emit candidates;
    identical outputs to models.host.resolve_tra (the emission half is
    the shared _tra_emit_clusters)."""
    from cutesv_tpu.models.host import _tra_emit_clusters

    if state is None:
        return []
    kind, payload, (p1, p2, rid) = state
    slices = payload if kind == "done" else _pair_cluster_finish(payload)
    if not slices:
        return []
    order_rows = np.concatenate(slices)
    lens = np.fromiter((len(s) for s in slices), np.int64, len(slices))
    cids = np.repeat(np.arange(len(slices), dtype=np.int64), lens)
    return _tra_emit_clusters(
        sigs, order_rows, p1[order_rows], p2[order_rows], rid[order_rows],
        cids, lens, chr_1, read_count, overlap_size, max_cluster_bias,
        tables, chrom_lengths, action, gt_round, names, jobs_out=jobs_out)


def resolve_tra_device(sigs: Sequence, chr_1: str, read_count: int,
                       overlap_size: float, max_cluster_bias: int,
                       tables, chrom_lengths, action: bool, gt_round: int,
                       names: Optional[Sequence[str]] = None,
                       n_shards: int = 1):
    """Device counterpart of models.host.resolve_tra; identical outputs."""
    state = resolve_tra_start(sigs, read_count, max_cluster_bias, n_shards)
    return resolve_tra_finish(state, sigs, chr_1, read_count, overlap_size,
                              max_cluster_bias, tables, chrom_lengths,
                              action, gt_round, names)


def resolve_dup_device(sigs: Sequence, chrom: str, read_count: int,
                       max_cluster_bias: int, sv_size: int, max_size: int,
                       action: bool, names: Optional[Sequence[str]] = None,
                       n_shards: int = 1):
    """Device counterpart of models.host.resolve_dup; identical outputs.
    Kernel rows arrive pre-sorted by pos2 (stable), so the host emission's
    stable re-sort is a no-op."""
    state = resolve_pair_start(sigs, False, read_count, max_cluster_bias,
                               n_shards)
    return resolve_pair_finish(state, sigs, False, chrom, read_count,
                               max_cluster_bias, sv_size, max_size, action,
                               names)


def resolve_inv_device(sigs: Sequence, chrom: str, read_count: int,
                       max_cluster_bias: int, sv_size: int, max_size: int,
                       action: bool, names: Optional[Sequence[str]] = None,
                       n_shards: int = 1):
    """Device counterpart of models.host.resolve_inv; identical outputs."""
    state = resolve_pair_start(sigs, True, read_count, max_cluster_bias,
                               n_shards)
    return resolve_pair_finish(state, sigs, True, chrom, read_count,
                               max_cluster_bias, sv_size, max_size, action,
                               names)


# ---------------------------------------------------------------------------
# genome-batched DEL/INS resolution: one kernel dispatch covers many
# chromosomes. Positions are offset into disjoint ranges (separated by more
# than max_cluster_bias) so clusters can never span chromosomes; batches
# are capped so offset coordinates stay within int32.
# ---------------------------------------------------------------------------

_INT32_SAFE = 2_000_000_000


def _chrom_batches(streams, bias):
    """Group ordered (chrom, stream) pairs into int32-safe offset batches;
    yields lists of (chrom, stream, offset)."""
    batches = []
    cur = []
    cur_off = 0
    for chrom, stream in streams:
        span = (int(stream.pos[-1]) if len(stream) else 0) + bias + 2
        if cur and cur_off + span > _INT32_SAFE:
            batches.append(cur)
            cur = []
            cur_off = 0
        cur.append((chrom, stream, cur_off))
        cur_off += span
    if cur:
        batches.append(cur)
    return batches


class _Facade:
    """Concatenated view over per-chromosome streams for one genome batch:
    offset positions for the cluster kernel plus the (chrom, local-row)
    mapping the finish phase needs to route results back. Per-row
    sequence access stays on the member streams (emission reads them per
    chromosome)."""

    def __init__(self, members):
        self.pos = np.concatenate([s.pos + off for _, s, off in members])
        self.length = np.concatenate([s.length for _, s, _ in members])
        self.rid = np.concatenate([s.rid for _, s, _ in members])
        self._chrom = np.concatenate(
            [np.full(len(s), i, np.int64)
             for i, (_, s, _) in enumerate(members)])
        self._local = np.concatenate(
            [np.arange(len(s), dtype=np.int64) for _, s, _ in members])

    def __len__(self):
        return len(self.pos)


def resolve_indel_multi_start(streams, is_ins: bool, read_count: int,
                              max_cluster_bias: int, n_shards: int = 1,
                              early=None):
    """Phase 1 of the genome-batched DEL/INS resolver: dispatch the
    (async) cluster kernels for every int32-safe batch. Returns opaque
    state for :func:`resolve_indel_multi_finish`. Dispatching both SV
    types before fetching either overlaps device compute with host
    emission. ``early``: {chrom: kernel handle} dispatched during the
    streaming decode (validated by build_store_native) — those
    chromosomes become singleton jobs reusing the in-flight kernels."""
    out = {}
    jobs = []
    streams = [(c, _as_stream(s, is_ins)) for c, s in streams]
    # early kernels are exact single-device results, valid regardless of
    # n_shards — chromosomes without one still batch/shard below
    if early:
        rest = []
        for c, s in streams:
            h = early.get(c)
            if h is not None and len(s):
                members = [(c, s, 0)]
                jobs.append((members, _Facade(members), "kernel", h))
            else:
                rest.append((c, s))
        streams = rest
    for batch in _chrom_batches(streams, max_cluster_bias):
        members = [(c, s, off) for c, s, off in batch if len(s)]
        for c, s, off in batch:
            if not len(s):
                out[c] = ([], [])
        if not members:
            continue
        facade = _Facade(members)
        if n_shards > 1:
            # sharded path computes host-side cuts; runs eagerly
            jobs.append((members, facade, "sharded", None))
        else:
            jobs.append((members, facade, "kernel",
                         _cluster_stream_dispatch(facade, read_count,
                                                  max_cluster_bias)))
    return dict(out=out, jobs=jobs, is_ins=is_ins, read_count=read_count,
                max_cluster_bias=max_cluster_bias, n_shards=n_shards)


def resolve_indel_multi_compact(state) -> None:
    """Phase 1.5: fetch each dispatched kernel's n_kept and dispatch the
    on-device output compaction (async). Run for every state BEFORE
    prefetch_to_host so the host copies move compacted rows only."""
    state["jobs"] = [
        (members, facade, kind,
         _cluster_stream_compact(handle) if kind == "kernel" else handle)
        for members, facade, kind, handle in state["jobs"]]


def resolve_indel_multi_finish(state, threshold_gloab: float,
                               minimum_support_reads: int,
                               remain_reads_ratio: float, action: bool,
                               need_names: bool = True):
    """Phase 2: fetch kernel outputs and run the per-chromosome host
    emission; returns {chrom: (candidates, gt_jobs)}."""
    emit = _emit_ins if state["is_ins"] else _emit_del
    out = state["out"]
    read_count = state["read_count"]
    max_cluster_bias = state["max_cluster_bias"]
    for members, facade, kind, handle in state["jobs"]:
        if kind == "sharded":
            res = _cluster_stream_sharded(facade, read_count,
                                          max_cluster_bias,
                                          state["n_shards"])
        else:
            res = _cluster_stream_fetch(handle)
        if res is None or len(res[0]) == 0:
            for c, _, _ in members:
                out.setdefault(c, ([], []))
            continue
        cid, pos, length, sidx = res
        row_chrom = facade._chrom[sidx]
        offs = np.array([off for _, _, off in members], np.int64)
        pos = pos - offs[row_chrom]
        # kept rows are sorted by cluster; clusters never span chromosomes,
        # so each chromosome owns a contiguous slice
        bounds = np.flatnonzero(np.diff(row_chrom)) + 1
        lo = 0
        for hi in list(bounds) + [len(row_chrom)]:
            hi = int(hi)
            ci = int(row_chrom[lo])
            chrom, stream, _ = members[ci]
            local_sidx = facade._local[sidx[lo:hi]]
            out[chrom] = emit(cid[lo:hi], pos[lo:hi], length[lo:hi],
                              local_sidx, stream, chrom, threshold_gloab,
                              max_cluster_bias, minimum_support_reads,
                              remain_reads_ratio, action,
                              need_names=need_names)
            lo = hi
        for c, _, _ in members:
            out.setdefault(c, ([], []))
    return out


def resolve_indel_device_multi(streams, is_ins: bool, read_count: int,
                               threshold_gloab: float,
                               max_cluster_bias: int,
                               minimum_support_reads: int,
                               remain_reads_ratio: float, action: bool,
                               n_shards: int = 1):
    """Resolve DEL or INS across many chromosomes with one cluster-kernel
    dispatch per int32-safe batch. ``streams``: ordered (chrom, stream)
    pairs; returns {chrom: (candidates, gt_jobs)}, byte-identical to the
    per-chromosome resolvers."""
    state = resolve_indel_multi_start(streams, is_ins, read_count,
                                      max_cluster_bias, n_shards)
    return resolve_indel_multi_finish(state, threshold_gloab,
                                      minimum_support_reads,
                                      remain_reads_ratio, action)


# ---------------------------------------------------------------------------
# multi-device clustering: cut the merged stream at inter-cluster gaps so
# every device runs the exact local kernel (no cluster spans a shard)
# ---------------------------------------------------------------------------

def _gap_cuts(pos: np.ndarray, n_shards: int, bias: int):
    """Shard boundaries at positions where pos[i]-pos[i-1] > bias, chosen
    nearest to equal splits. Returns cut indices (len n_shards-1) or None
    when no valid gap exists near some split (caller falls back)."""
    n = len(pos)
    gaps = np.flatnonzero(np.diff(pos) > bias) + 1  # valid cut indices
    if len(gaps) < n_shards - 1:
        return None
    cuts = []
    for k in range(1, n_shards):
        target = k * n // n_shards
        j = int(np.searchsorted(gaps, target))
        cand = []
        if j < len(gaps):
            cand.append(gaps[j])
        if j > 0:
            cand.append(gaps[j - 1])
        cut = min(cand, key=lambda c: abs(int(c) - target))
        if cuts and cut <= cuts[-1]:
            return None  # degenerate split; fall back
        cuts.append(int(cut))
    return cuts


def _cluster_stream_sharded(stream, read_count: int, bias: int,
                            n_shards: int):
    """Sharded variant of _cluster_stream: exact per-shard kernels over
    gap-aligned cuts, concatenated back in order with shard-unique cluster
    ids. Falls back to the single-device kernel when a clean cut does not
    exist or too few devices are present."""
    import jax

    from cutesv_tpu.ops.indel_cluster import sharded_cluster_structure
    from cutesv_tpu.parallel import mesh as pmesh

    n = len(stream)
    if n == 0:
        return None
    devices = pmesh.pick_devices(n_shards)
    if n_shards <= 1 or devices is None or n < 4 * n_shards:
        return _cluster_stream(stream, read_count, bias)
    cuts = _gap_cuts(np.asarray(stream.pos), n_shards, bias)
    if cuts is None:
        return _cluster_stream(stream, read_count, bias)
    bounds = [0] + cuts + [n]
    shard_rows = padded_size(max(bounds[i + 1] - bounds[i]
                                 for i in range(n_shards)))
    pos = np.zeros((n_shards, shard_rows), np.int32)
    length = np.zeros((n_shards, shard_rows), np.int32)
    rid = np.zeros((n_shards, shard_rows), np.int32)
    nv = np.zeros((n_shards, 1), np.int32)
    for k in range(n_shards):
        lo, hi = bounds[k], bounds[k + 1]
        m = hi - lo
        pos[k, :m] = stream.pos[lo:hi]
        length[k, :m] = stream.length[lo:hi]
        rid[k, :m] = stream.rid[lo:hi]
        nv[k, 0] = m
    mesh = pmesh.make_mesh(n_shards, devices=devices)
    fn = sharded_cluster_structure(mesh, bias, read_count, shard_rows)
    cid_s, pos_s, len_s, sidx_s, nk_s = jax.device_get(fn(
        jnp.asarray(pos), jnp.asarray(length), jnp.asarray(rid),
        jnp.asarray(nv)))
    cids, poss, lens, sidxs = [], [], [], []
    for k in range(n_shards):
        nk = int(nk_s[k])
        if nk == 0:
            continue
        # shard-unique cluster ids + global stream indices
        cids.append(cid_s[k, :nk].astype(np.int64)
                    + k * (shard_rows + 2))
        poss.append(pos_s[k, :nk].astype(np.int64))
        lens.append(len_s[k, :nk].astype(np.int64))
        sidxs.append(sidx_s[k, :nk].astype(np.int64) + bounds[k])
    if not cids:
        return (np.empty(0, np.int64),) * 4
    return (np.concatenate(cids), np.concatenate(poss),
            np.concatenate(lens), np.concatenate(sidxs))
