"""End-to-end calling pipeline.

Single streaming pass over the BAM (replacing the reference's 4-pool
pickle-spill orchestration, cuteSV:992-1248) ->> signature store ->
per-chromosome resolution (host oracle or TPU device engine) -> genotype
fill -> VCF.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional

import numpy as np

from cutesv_tpu import extract, sigstore, vcf
from cutesv_tpu.config import Config
from cutesv_tpu.genotype import (assign_gt_del_ins, gl_table,
                                 support_inter_counts)
from cutesv_tpu.io.bam import BamReader
from cutesv_tpu.io.fasta import FastaFile
from cutesv_tpu.models import host as host_models

log = logging.getLogger("cutesv_tpu")


def load_bed_regions(path: Optional[str]) -> Optional[Dict[str, list]]:
    """Padded include regions per chrom (load_bed, cuteSV_genotype.py:704).

    The reference assigns regions to extraction tasks and tests reads
    against their task's regions; with streaming decode we test against all
    regions of the read's chromosome (equivalent unless a read is longer
    than a genome batch)."""
    if path is None:
        return None
    regions: Dict[str, list] = {}
    with open(path) as fh:
        for line in fh:
            seq = line.strip().split("\t")
            regions.setdefault(seq[0], []).append(
                (int(seq[1]) - 1000, int(seq[2]) + 1000))
    for chrom in regions:
        regions[chrom].sort()
    return regions


def decode_bam(cfg: Config):
    """Stream the BAM once, extracting signatures + read census.

    Uses the C++ decoder (native/bamdecode.cpp) unless ``cfg.decoder`` is
    "python" or the native library cannot be built; the Python path is the
    behavioral oracle."""
    with open(cfg.input, "rb") as probe:
        is_cram = probe.read(4) == b"CRAM"
    if cfg.decoder in ("native", "auto"):
        try:
            return _decode_bam_native(cfg, is_cram)
        except Exception as exc:
            from cutesv_tpu.io.native import NativeUnsupported
            if cfg.decoder == "native" and not isinstance(exc,
                                                          NativeUnsupported):
                raise
            if isinstance(exc, NativeUnsupported):
                log.info("native decoder: %s; using the python reader", exc)
            else:
                log.warning("native decoder unavailable; falling back to "
                            "the python decoder", exc_info=True)
    return _decode_bam_python(cfg)


def _n_cores() -> int:
    """Cores actually usable by this process: cgroup/taskset affinity
    (len(sched_getaffinity)) where available, os.cpu_count otherwise —
    a container pinned to 2 CPUs on a 64-core host must take the
    2-core tuning paths, not the wide-host ones."""
    try:
        return len(os.sched_getaffinity(0)) or 1
    except AttributeError:  # non-Linux
        return os.cpu_count() or 1


def _stream_dispatch_ok(cfg: Config, is_cram: bool,
                        for_distributed: bool = False) -> bool:
    """Streaming decode->dispatch overlap for plain single-process
    device-engine BAM runs: cluster kernels for completed chromosomes
    launch while later chromosomes still decode. Much of the resolve
    stage is tunnel round-trip *waiting*, not CPU, so the overlap pays
    even on a 2-core host (measured 3.3s -> 3.0s at 100Mb once decode
    reached the inflate floor); the snapshot sort/pad/upload work only
    contends when there is a single core. CUTESV_STREAM_DISPATCH=0
    forces it off; CUTESV_STREAM_DISPATCH=1 bypasses only the
    core-count heuristic — the structural gate (BAM input, device
    engine, single shard, non-distributed) always applies."""
    forced = os.environ.get("CUTESV_STREAM_DISPATCH")
    if forced is not None:
        if forced != "1":
            return False
    elif _n_cores() < 2:
        return False
    # n_shards > 1 is fine: early per-chromosome kernels are exact
    # single-device results the sharded resolver reuses as singleton
    # jobs. Multi-host runs overlap too since round 4 — their ranged
    # decode goes through _decode_sharded_streaming, which calls this
    # gate with for_distributed=True (the plain-run exclusion below is
    # about not taking the whole-file StreamingDecode path). Force
    # calling (-Ivcf) never consumes early kernels or tails, so its
    # decode runs plain — no mid-decode work to throw away.
    # CRAM overlaps too since round 5 (the CRAM front-end feeds the
    # same process_recs, so per-chromosome progress/snapshots work
    # unchanged) — but only the plain path: the RANGED streaming decode
    # plans BGZF block ranges, which is BAM-specific.
    if for_distributed and is_cram:
        return False
    return (cfg.engine in ("device", "auto")
            and (for_distributed or not cfg.distributed)
            and not getattr(cfg, "Ivcf", None))


class _NativeBlobView:
    """Lazy view over the native decoder's (append-only) INS sequence
    blob: slicing copies the span under the decoder's merge lock, so
    mid-decode emission can render ALT sequences without materializing
    the blob."""

    def __init__(self, sd):
        self._sd = sd

    def __getitem__(self, sl):
        return self._sd.ins_seq_spans([sl.start], [sl.stop - sl.start])

    def spans(self, offs, lens):
        """Batched span read (one lock acquisition + ctypes call)."""
        return self._sd.ins_seq_spans(offs, lens)


def _stream_tail_default(n_cores: int, n_refs: int) -> bool:
    """Whether the FULL mid-decode tail (emission + genotype) defaults
    on. Round-5 A/B: at 2 cores with few contigs the tail steals more
    from the inflate workers than the shortened post-decode tail
    returns (200 Mb/4-chrom: 4.48-4.58 s with vs 4.35-4.49 s without);
    at many contigs the serial post-decode tail dominates and the
    overlap wins (1 Gb/24-contig: 16.0 s vs 16.5 s, docs/SCALING.md);
    at >= 4 cores the tail is effectively free (round-3 measurement)."""
    return n_cores >= 4 or n_refs >= 8


def _stream_tail_emit(sd, cfg: Config, svtype: str, c: int, cols,
                      nk_comp, census_cache):
    """Mid-decode per-chromosome tail for DEL/INS: fetch the cluster
    kernel, run host emission and (under --genotype) the cover/genotype
    fill — all hidden under the remaining chromosomes' decode. Read
    identities are the decoder's interned name ids (one consistent
    space with the census snapshot); candidate chrom fields carry a
    placeholder patched after join. Byte-identical to the post-decode
    path (same _emit_* / _del_ins_apply functions; host cover counts
    equal the device kernel's). Results are only trusted once the
    chromosome's fingerprint validates against the final arrays."""
    from cutesv_tpu.genotype import cover_counts
    from cutesv_tpu.models import device as dm

    is_ins = svtype == "INS"
    res = dm._cluster_stream_fetch(nk_comp)
    if res is None:
        return ([], [])
    cid, pos, length, sidx = res
    if is_ins:
        live = ~(((cols["pos"] >> 1) == 0) & (cols["length"] == 0))
        stream = dm.IndelStream(
            (cols["pos"] >> 1)[live], cols["length"][live],
            cols["name_id"][live], seq_len=cols["seq_len"][live],
            seq_blob=_NativeBlobView(sd), seq_off=cols["seq_off"][live])
    else:
        live = ~((cols["pos"] == 0) & (cols["length"] == 0))
        stream = dm.IndelStream(cols["pos"][live], cols["length"][live],
                                cols["name_id"][live])
    emit = dm._emit_ins if is_ins else dm._emit_del
    thr = (cfg.diff_ratio_merging_INS if is_ins
           else cfg.diff_ratio_merging_DEL)
    bias = (cfg.max_cluster_bias_INS if is_ins
            else cfg.max_cluster_bias_DEL)
    cands, jobs = emit(cid, pos, length, sidx, stream, None, thr, bias,
                       min(cfg.min_support, 5), cfg.remain_reads_ratio,
                       cfg.genotype, need_names=False)
    if cfg.genotype and cands:
        census = census_cache.get(c)
        if census is None:
            s = sd.snapshot("CEN", c)
            census = census_cache[c] = dict(
                start=s["start"], end=s["end"],
                is_primary=s["is_primary"].astype(np.int8),
                name=s["name"])
        if len(census["start"]) == 0:
            return ([], [])  # the batched pass's empty-chrom contract
        prim = census["is_primary"] == 1
        covers = cover_counts([j["window"] for j in jobs],
                              census["start"][prim], census["end"][prim])
        _del_ins_apply(None, cands, jobs, census, [covers])
    return (cands, [])


def _streaming_poll_loop(sd, cfg: Config, tail_chrom_ok=None,
                         allow_done_tail: bool = True):
    """Shared poll/dispatch loop of the streaming decode paths: as each
    chromosome completes, snapshot its rows, sort/dedup them with the
    store's exact keys and dispatch its cluster kernel (plus, where
    eligible, the full mid-decode DEL/INS tail). Runs until the decode
    thread reports DONE; the caller joins and validates fingerprints.

    ``tail_chrom_ok(c)``: extra per-chromosome gate for the FULL tail
    (sharded decode excludes its possibly-partial range-start
    chromosome, whose local census may be missing a prefix another
    shard owns). ``allow_done_tail``: whether CUTESV_STREAM_TAIL=force
    may tail the final batch (never under a byte range — the range-end
    chromosome's census may be cut by the budget).

    Returns (handles, fingerprints, early_results) keyed (svtype,
    chrom_id)."""
    import time as _time

    from cutesv_tpu.models import device as device_models
    from cutesv_tpu.models.device import IndelStream
    from cutesv_tpu.utils.jaxsetup import setup_jax

    setup_jax()
    handles: Dict[tuple, object] = {}
    fingerprints: Dict[tuple, dict] = {}
    early_results: Dict[tuple, tuple] = {}
    census_cache: Dict[int, dict] = {}
    # full mid-decode tail (emission + genotype) needs rendered read
    # names nowhere; --report_readid does, so it keeps the kernel-only
    # overlap. CUTESV_STREAM_TAIL=0 forces the tail off.
    tail_env = os.environ.get("CUTESV_STREAM_TAIL")
    # CUTESV_STREAM_TAIL=1/0 forces the FULL tail on/off; "force"
    # additionally runs it for the final batch (tests: small fixtures
    # decode in one poll, so nothing completes mid-run). Default is
    # _stream_tail_default (n_refs is header-derived and only valid
    # once poll() >= 0, so the default resolves lazily below).
    tail_force = tail_env == "force" and allow_done_tail
    tail_ok = None
    tail_pref = not cfg.report_readid and tail_env != "0"
    tail_forced_on = tail_env in ("1", "force")
    done = set()
    # python work done INSIDE the decode window, split into the part
    # concurrent with the native walk (it steals host CPU from the
    # inflate workers — published so decode_s is fully decomposable)
    # and the DONE-batch part after the walk finished
    timing = {"overlap_work_s": 0.0, "done_tail_s": 0.0}
    while True:
        t_body0 = _time.time()
        p = sd.poll()
        finished = p == sd.DONE
        if tail_ok is None and (finished or p >= 0):
            tail_ok = tail_pref and (
                tail_forced_on
                or _stream_tail_default(os.cpu_count() or 2, sd.n_refs()))
        if finished:
            # the run finished: every remaining chromosome's rows are
            # final, so snapshot them too — their prepared columns
            # become the store streams (no global re-sort) and their
            # cluster kernels dispatch before the store is built
            p = sd.n_refs()
        pending = []
        for c in range(0, p):
            if c in done:
                continue
            done.add(c)
            for svtype, is_ins, bias in (
                    ("DEL", False, cfg.max_cluster_bias_DEL),
                    ("INS", True, cfg.max_cluster_bias_INS)):
                snap = sd.snapshot(svtype, c)
                if len(snap["pos"]) == 0:
                    continue
                fp, disp = sigstore.prepare_snapshot(snap, is_ins)
                stream = IndelStream(disp["pos"], disp["length"],
                                     disp["rid"])
                handle = device_models._cluster_stream_dispatch(
                    stream, cfg.min_support, bias)
                pending.append((svtype, c, "indel", handle))
                fingerprints[(svtype, c)] = fp
            for svtype, is_inv, bias in (
                    ("DUP", False, cfg.max_cluster_bias_DUP),
                    ("INV", True, cfg.max_cluster_bias_INV)):
                snap = sd.snapshot(svtype, c)
                if len(snap["pos"]) == 0:
                    continue
                fp, disp = sigstore.prepare_snapshot_pair(svtype, snap)
                handle = device_models._pair_cluster_start(
                    disp["k1"], disp["k2"], disp["aux"], disp["keys"],
                    cfg.min_support, bias, is_inv)
                pending.append((svtype, c, "pair", handle))
                fingerprints[(svtype, c)] = fp
        if finished and pending:
            # decode is over, so blocking scalar reads are no longer
            # hidden: start every n_kept copy async before the compact
            # phase blocks on any (one tunnel round trip, not 2*k)
            device_models.prefetch_counts(
                *[h for _, _, _, h in pending])
        for svtype, c, kind, handle in pending:
            # mid-decode, blocking here for n_kept and starting the
            # compaction + host copy is free (the decode runs on
            # native threads) — resolve later finds the rows local
            if kind == "pair":
                nk_comp = device_models._pair_cluster_compact(handle)
            else:
                nk_comp = device_models._cluster_stream_compact(handle)
            if nk_comp is not None and nk_comp[1] is not None:
                import jax
                jax.tree_util.tree_map(
                    lambda x: x.copy_to_host_async(), nk_comp[1])
            if (kind == "indel" and tail_ok
                    and (not finished or tail_force)
                    and (tail_chrom_ok is None or tail_chrom_ok(c))):
                # chromosomes completed before end-of-decode run the
                # FULL tail here (emission + genotype), hidden under
                # the remaining decode; the final batch keeps the
                # batched-kernel cover path (no decode left to hide
                # under, and one kernel call beats per-chrom sweeps)
                try:
                    early_results[(svtype, c)] = _stream_tail_emit(
                        sd, cfg, svtype, c,
                        fingerprints[(svtype, c)], nk_comp,
                        census_cache)
                    continue  # kernel consumed by the tail
                except Exception:
                    log.warning("streaming tail failed; falling back "
                                "to post-decode resolve",
                                exc_info=True)
            handles[(svtype, c)] = nk_comp
        timing["done_tail_s" if finished
               else "overlap_work_s"] += _time.time() - t_body0
        if finished:
            break
        _time.sleep(0.02)
    return handles, fingerprints, early_results, timing


def _attach_early_to_store(store, nd, handles, fingerprints,
                           early_results) -> None:
    """Keep the early kernels / full-tail results whose fingerprints
    validated against the (final or merged) arrays; patch the tails'
    chromosome-name placeholders."""
    valid = getattr(store, "early_valid", set())
    store.early_kernels = {
        (t, nd.chroms[c]): h for (t, c), h in handles.items()
        if (t, nd.chroms[c]) in valid}
    store.early_results = {}
    for (t, c), res in early_results.items():
        chrom = nd.chroms[c]
        if (t, chrom) not in valid:
            continue  # a late SA row invalidated the chromosome
        for cand in res[0]:
            cand[0] = chrom  # placeholder patched now the name is known
        store.early_results[(t, chrom)] = res
    n_early = len(handles) + len(early_results)
    log.info("streaming decode: %d early kernels + %d full tails "
             "validated of %d dispatched"
             % (len(store.early_kernels), len(store.early_results),
                n_early))


def _decode_bam_native_streaming(cfg: Config, bed_ids, is_cram=False):
    """Decode on a native thread; as each chromosome completes, snapshot
    its DEL/INS rows, sort/dedup them with the store's exact keys (local
    name/seq ranks are order-isomorphic to the final global ranks
    restricted to the same rows) and dispatch its cluster kernel. After
    the join, build_store_native validates each snapshot fingerprint
    against the final rows — a later read's SA tag can add signatures to
    an already-passed chromosome — and only validated chromosomes reuse
    the early kernels (resolve re-dispatches the rest)."""
    from cutesv_tpu.io import native as native_io

    t_n0 = time.time()
    sd = native_io.StreamingDecode(
        cfg.input, cfg, bed_ids,
        reference=cfg.reference if is_cram else None)
    try:
        handles, fingerprints, early_results, poll_timing = \
            _streaming_poll_loop(sd, cfg)
        nd = sd.join()
    finally:
        sd.free()
    t_n1 = time.time()
    _check_coordinate_sorted(nd.arrays["all_chr"], nd.arrays["all_start"],
                             nd.chroms)
    early_fp = {(t, nd.chroms[c]): fp
                for (t, c), fp in fingerprints.items()}
    store = sigstore.build_store_native(nd, cfg, early=early_fp)
    _attach_early_to_store(store, nd, handles, fingerprints, early_results)
    # decode_s decomposition for the bench artifact: native walk
    # (inflate+parse+poll overlap) vs python-side store build; walk_s is
    # the decoder-internal record-loop wall the inflate floor bounds
    store.decode_breakdown = {"native_s": round(t_n1 - t_n0, 3),
                              "store_s": round(time.time() - t_n1, 3),
                              "walk_s": round(nd.walk_s, 3),
                              # busy CORE-seconds across all threads —
                              # the auditable form of the inflate-floor
                              # argument (walls alone can't show it)
                              "inflate_core_s": round(nd.inflate_core_s, 3),
                              "records_core_s": round(nd.records_core_s, 3),
                              "overlap_work_s": round(
                                  poll_timing["overlap_work_s"], 3),
                              "done_tail_s": round(
                                  poll_timing["done_tail_s"], 3)}
    references = [(nd.chroms[i], int(nd.ref_lengths[i]))
                  for i in range(len(nd.ref_lengths))]
    return store, None, references, nd.n_records


def _shard_tail_gate(sd, range_start: int):
    """Full-tail gate for a ranged (sharded) streaming decode: the
    range-START chromosome may be missing a record prefix the
    predecessor shard owns, and the count fingerprints only audit
    signature streams — its local census could silently be short, so it
    never runs the mid-decode tail. Shard 0 (range_start <= 0) owns the
    file start, so its first chromosome is complete. (The range-END
    chromosome is excluded by allow_done_tail=False: it only completes
    at DONE.)"""
    def tail_chrom_ok(c):
        first, _last = sd.range_refids()
        return range_start <= 0 or c != first
    return tail_chrom_ok


def _decode_sharded_streaming(cfg: Config, bed_ids):
    """--distributed BAM decode WITH the mid-decode overlap (round-3
    verdict item 5): this host inflates only its block-aligned byte
    range through the streaming decoder, dispatching cluster kernels —
    and, where eligible, full DEL/INS tails — for chromosomes that
    complete inside the range while later blocks still decode. After
    the allgather+merge, each fingerprint (raw per-chromosome row
    count) is validated against the MERGED arrays, so any chromosome
    another shard contributed rows to (a range boundary cut, or a
    foreign read's SA tag) discards its early work and is re-resolved
    from the global sort. The local snapshot columns are remapped into
    the merged name-id / sequence-blob spaces before validation.

    Full tails additionally exclude the range-START chromosome (its
    local census may be missing a prefix the predecessor shard owns —
    the count fingerprints only audit signature streams, not the
    census) and the final DONE batch (the range-END chromosome's
    census can be cut by the uncompressed-length budget). Shard 0 owns
    the file start, so its first chromosome is complete."""
    import jax

    from cutesv_tpu.io import native as native_io
    from cutesv_tpu.parallel.distributed import (allgather_obj,
                                                 check_shard_boundaries,
                                                 merge_partial_decodes,
                                                 part_census_counts,
                                                 plan_shard_ranges)

    n = jax.process_count()
    k = jax.process_index()
    ranges = plan_shard_ranges(cfg.input, n)
    rng = ranges[k][:2]
    # Collective discipline: the allgather below must run EXACTLY ONCE on
    # every host, so a local streaming failure falls back to the plain
    # ranged decode BEFORE the exchange (same payload shape — this is
    # also why a host whose gate disables streaming pairs fine with
    # streaming hosts: decode_sharded performs the identical single
    # allgather). Failures AFTER the exchange must propagate — a second
    # allgather from a fallback would desync the pod.
    t_dec0 = time.time()
    try:
        sd = native_io.StreamingDecode(cfg.input, cfg, bed_ids,
                                       reference=None, byte_range=rng)
        try:
            handles, fingerprints, early_results, _pt = \
                _streaming_poll_loop(
                    sd, cfg, tail_chrom_ok=_shard_tail_gate(sd, rng[0]),
                    allow_done_tail=False)
            nd_local = sd.join()
        finally:
            sd.free()
    except Exception:
        log.warning("sharded streaming decode failed; ranged decode "
                    "without overlap", exc_info=True)
        handles, fingerprints, early_results = {}, {}, {}
        nd_local = native_io.decode(cfg.input, cfg, bed_ids,
                                    byte_range=rng)
    log.info("sharded decode: shard %d/%d decoded %d records in %.2fs "
             "(streaming)", k, n, nd_local.n_records,
             time.time() - t_dec0)
    parts = allgather_obj(nd_local)
    check_shard_boundaries(ranges, [(p.first_u, p.next_u) for p in parts])
    pcc = part_census_counts(parts)
    nd = merge_partial_decodes(parts)
    _check_coordinate_sorted(nd.arrays["all_chr"], nd.arrays["all_start"],
                             nd.chroms)
    remap = nd.part_name_remaps[k]
    blob_base = nd.part_blob_bases[k]
    early_fp = {}
    for (t, c), fp in fingerprints.items():
        fp = dict(fp)
        if "name_id" in fp:
            fp["name_id"] = remap[fp["name_id"]]
        if "seq_off" in fp:
            fp["seq_off"] = fp["seq_off"] + blob_base
        early_fp[(t, nd.chroms[c])] = fp
    store = sigstore.build_store_native(nd, cfg, early=early_fp)
    _attach_early_to_store(store, nd, handles, fingerprints, early_results)
    store.part_census_counts = pcc
    references = [(nd.chroms[i], int(nd.ref_lengths[i]))
                  for i in range(len(nd.ref_lengths))]
    return store, None, references, nd.n_records


def _decode_bam_native(cfg: Config, is_cram: bool = False):
    from cutesv_tpu.io import native as native_io
    bed_ids = None
    if cfg.include_bed is not None:
        bed = load_bed_regions(cfg.include_bed)
        # map chrom names to header ids via a cheap header-only read
        if is_cram:
            from cutesv_tpu.io.cram import CramReader
            header = CramReader(cfg.input, reference=cfg.reference or None)
        else:
            header = BamReader(cfg.input)
        name_to_id = {n: i for i, (n, _) in enumerate(header.references)}
        header.close()
        bc, bs, be = [], [], []
        for chrom, regions in bed.items():
            cid = name_to_id.get(chrom)
            if cid is None:
                continue
            for r0, r1 in regions:
                bc.append(cid)
                bs.append(r0)
                be.append(r1)
        if not bc:
            # no BED chrom matches the header (or the BED is empty): the
            # oracle path excludes EVERY read (bed.get(chrom, []) -> no
            # overlap); an empty region list would instead disable the
            # native filter entirely, so pass one impossible region to
            # keep it enabled-and-excluding
            bc, bs, be = [0], [-2], [-1]
        bed_ids = (np.array(bc, np.int32), np.array(bs, np.int64),
                   np.array(be, np.int64))
    if _stream_dispatch_ok(cfg, is_cram):
        try:
            return _decode_bam_native_streaming(cfg, bed_ids,
                                                is_cram=is_cram)
        except Exception:
            # a device/JAX failure during early dispatch is a streaming
            # problem, not a decoder problem: fall back to the plain
            # native decode instead of surfacing it to decode_bam's
            # python-reader fallback
            log.warning("streaming decode dispatch failed; decoding "
                        "without overlap", exc_info=True)
    if cfg.distributed:
        import jax
        if jax.process_count() > 1:
            # multi-host: inflate only this host's byte range (BGZF
            # blocks for BAM, containers for CRAM), then exchange the
            # (small) signature partials. BAM ranges stream: early
            # kernels/tails for chromosomes completed inside the range
            # overlap the remaining decode (validated post-merge)
            if _stream_dispatch_ok(cfg, is_cram, for_distributed=True):
                # no try/except here: _decode_sharded_streaming handles
                # local failures itself BEFORE its allgather; catching
                # after the collective and re-entering decode_sharded
                # would run a second, unpaired allgather and hang the pod
                return _decode_sharded_streaming(cfg, bed_ids)
            from cutesv_tpu.parallel.distributed import decode_sharded
            nd = decode_sharded(cfg, bed_ids, is_cram=is_cram)
            _check_coordinate_sorted(nd.arrays["all_chr"],
                                     nd.arrays["all_start"], nd.chroms)
            store = sigstore.build_store_native(nd, cfg)
            store.part_census_counts = getattr(
                nd, "part_census_counts", None)
            references = [(nd.chroms[i], int(nd.ref_lengths[i]))
                          for i in range(len(nd.ref_lengths))]
            return store, None, references, nd.n_records
    nd = native_io.decode(cfg.input, cfg, bed_ids,
                          reference=cfg.reference if is_cram else None)
    _check_coordinate_sorted(nd.arrays["all_chr"], nd.arrays["all_start"],
                             nd.chroms)
    store = sigstore.build_store_native(nd, cfg)
    references = [(nd.chroms[i], int(nd.ref_lengths[i]))
                  for i in range(len(nd.ref_lengths))]
    return store, None, references, nd.n_records


def _check_coordinate_sorted(chr_ids, starts, chrom_names) -> None:
    """Reject inputs that are not coordinate-sorted.

    The reference cannot even open such files (pysam.fetch needs a .bai,
    and indexing requires coordinate order, cuteSV:1013); we stream, so
    without this check an unsorted BAM would silently produce output
    whose order-sensitive pieces (the TRA count_coverage replay's
    fetch-order early exits, reads.sigs) differ from the sorted run."""
    ch = np.asarray(chr_ids)
    if len(ch) < 2:
        return
    st = np.asarray(starts)
    step = np.diff(ch)
    same = step == 0
    bad = np.flatnonzero(same & (np.diff(st) < 0))
    if len(bad):
        k = int(bad[0]) + 1
        raise ValueError(
            "input is not coordinate-sorted (%s:%d after %s:%d); "
            "sort it first, e.g. 'samtools sort'"
            % (chrom_names[int(ch[k])], int(st[k]),
               chrom_names[int(ch[k - 1])], int(st[k - 1])))
    run_starts = ch[np.r_[0, np.flatnonzero(step != 0) + 1]].tolist()
    if len(set(run_starts)) != len(run_starts):
        seen = set()
        rep = next(c for c in run_starts if c in seen or seen.add(c))
        raise ValueError(
            "input is not coordinate-sorted (%s appears in more than one "
            "block); sort it first, e.g. 'samtools sort'"
            % chrom_names[int(rep)])


def _decode_bam_python(cfg: Config):
    from cutesv_tpu.io.cram import open_alignment_file

    candidates = extract.new_candidate_dict()
    census_rows: List[tuple] = []
    allread_rows: List[tuple] = []
    bed = load_bed_regions(cfg.include_bed)
    reader = open_alignment_file(cfg.input, reference=cfg.reference or None)
    chrom_names = [n for n, _ in reader.references]
    chrom_lengths = {n: l for n, l in reader.references}
    n_records = 0
    prev_ref = -1
    prev_pos = -1
    seen_refs = set()
    for rec in reader:
        if rec.ref_id < 0 or rec.flag & 0x4:
            continue
        n_records += 1
        if rec.ref_id != prev_ref:
            if rec.ref_id in seen_refs:
                raise ValueError(
                    "input is not coordinate-sorted (%s appears in more "
                    "than one block); sort it first, e.g. 'samtools sort'"
                    % chrom_names[rec.ref_id])
            seen_refs.add(rec.ref_id)
            prev_ref = rec.ref_id
            prev_pos = rec.pos
        elif rec.pos < prev_pos:
            raise ValueError(
                "input is not coordinate-sorted (%s:%d after %s:%d); "
                "sort it first, e.g. 'samtools sort'"
                % (chrom_names[rec.ref_id], rec.pos,
                   chrom_names[rec.ref_id], prev_pos))
        else:
            prev_pos = rec.pos
        chrom = chrom_names[rec.ref_id]
        pos_start = rec.pos
        pos_end = rec.reference_end
        allread_rows.append((pos_start, pos_end,
                             1 if rec.flag in (0, 16) else 0,
                             rec.qname, chrom))
        if rec.flag in (256, 272):
            continue
        if bed is not None:
            regions = bed.get(chrom, [])
            if not any(pos_end > r0 and pos_start < r1
                       for r0, r1 in regions):
                continue
        extract.extract_read(rec, candidates, chrom, cfg.min_size,
                             cfg.min_mapq, cfg.max_split_parts,
                             cfg.min_read_len, cfg.min_siglength,
                             cfg.merge_del_threshold, cfg.merge_ins_threshold,
                             cfg.max_size)
        if rec.mapq >= cfg.min_mapq:
            census_rows.append((pos_start, pos_end,
                                1 if rec.flag in (0, 16) else 0,
                                rec.qname, chrom))
    reader.close()
    store = sigstore.build_store(candidates, census_rows, allread_rows,
                                 chrom_lengths)
    return store, candidates, reader.references, n_records


def _cover_fn(cfg: Config):
    if cfg.engine not in ("device", "auto"):
        return None
    import jax
    if cfg.n_shards > 1:
        # SV axis sharded over the genome mesh, reads replicated;
        # make_sharded_cover returns None when too few devices exist
        from cutesv_tpu.parallel.sharded_cover import make_sharded_cover
        cover = make_sharded_cover(cfg.n_shards)
        if cover is not None:
            return cover
    if jax.default_backend() in ("tpu", "axon"):
        # VMEM-resident Pallas kernel on TPU hardware
        from cutesv_tpu.ops.pallas_sweep import cover_counts_pallas
        return cover_counts_pallas
    from cutesv_tpu.ops.sweep import cover_counts_device
    return cover_counts_device


def _batched_cover_multi(specs, store, cfg: Config,
                         extra_blocks=()) -> None:
    """Cross-chromosome AND cross-SV-type cover-kernel batching shared by
    every genotype pass: windows and primary read intervals are offset
    into disjoint coordinate ranges so ONE dominance-count kernel
    sequence serves all chromosomes of all SV types — the census is
    uploaded once and the tunnel round-trip is paid once. Only the
    positional cover counting is batched; the support-interval
    intersection stays per chromosome — read names can carry primary
    alignments on several chromosomes, and each chromosome's genotype
    must only see its own (call_gt's per-chrom reads list,
    cuteSV_resolveINDEL.py:443-448). Candidates on chromosomes without
    census rows are dropped (the empty-chrom contract).

    ``specs``: list of (per_chrom, win_groups_fn, apply_fn) passes.
    ``win_groups_fn(jobs)`` returns one or more window lists (each the
    length of ``jobs``); ``apply_fn(chrom, cands, jobs, census, counts)``
    receives the per-group cover-count slices in the same order.

    ``extra_blocks``: additional (windows, starts, ends, sink) dicts
    counted in the SAME kernel call against their own interval sets —
    the TRA pass rides here (its intervals are the full read tables,
    not the census). Each sink(counts) receives its windows' counts."""
    state = dict(offset=0, windows=[], starts=[], ends=[], spans=[],
                 extras=[])

    def flush():
        if state["spans"] or state["extras"]:
            from cutesv_tpu.genotype import cover_counts
            cover = _cover_fn(cfg) or cover_counts
            allc = cover(state["windows"],
                         np.concatenate(state["starts"]),
                         np.concatenate(state["ends"]))
            for si, chrom, ranges in state["spans"]:
                per_chrom, _, apply_fn = specs[si]
                cands, jobs = per_chrom[chrom]
                counts = [allc[lo:lo + m] for lo, m in ranges]
                apply_fn(chrom, cands, jobs, store.census[chrom], counts)
            for lo, m, sink in state["extras"]:
                sink(allc[lo:lo + m])
        state.update(offset=0, windows=[], starts=[], ends=[], spans=[],
                     extras=[])

    # chromosome union in first-appearance order: each chromosome's
    # census is appended once, shared by every spec active on it
    chrom_order: List[str] = []
    seen = set()
    for per_chrom, _, _ in specs:
        for c in per_chrom:
            if per_chrom[c][1] and c not in seen:
                seen.add(c)
                chrom_order.append(c)

    for chrom in chrom_order:
        census = store.census.get(chrom)
        active = [si for si, (per_chrom, _, _) in enumerate(specs)
                  if per_chrom.get(chrom, (None, None))[1]]
        if census is None:
            for si in active:
                per_chrom = specs[si][0]
                per_chrom[chrom] = ([], per_chrom[chrom][1])
            continue
        wgs = {si: specs[si][1](specs[si][0][chrom][1]) for si in active}
        hi = int(census["end"].max()) if len(census["end"]) else 0
        for si in active:
            for g in wgs[si]:
                if g:
                    hi = max(hi, int(max(w[1] for w in g)))
        span = hi + 2
        if span > 1_000_000_000:
            # a single chromosome beyond the int32-safe coordinate budget
            # (the kernels double coordinates): count its covers exactly
            # on host instead of wrapping int32 on device
            from cutesv_tpu.genotype import cover_counts
            prim_h = census["is_primary"] == 1
            for si in active:
                per_chrom, _, apply_fn = specs[si]
                cands, jobs = per_chrom[chrom]
                counts = [np.asarray(cover_counts(
                    g, census["start"][prim_h], census["end"][prim_h]))
                    for g in wgs[si]]
                apply_fn(chrom, cands, jobs, census, counts)
            continue
        if state["offset"] + span > 1_000_000_000:
            # kernels scale coords x2; keep 2*coord in int32
            flush()
        offset = state["offset"]
        prim = census["is_primary"] == 1
        for si in active:
            ranges = []
            for g in wgs[si]:
                lo = len(state["windows"])
                state["windows"].extend((a + offset, b + offset)
                                        for a, b in g)
                ranges.append((lo, len(g)))
            state["spans"].append((si, chrom, ranges))
        state["starts"].append(census["start"][prim] + offset)
        state["ends"].append(census["end"][prim] + offset)
        state["offset"] = offset + span
    for blk in extra_blocks:
        wins, starts, ends, sink = (blk["windows"], blk["starts"],
                                    blk["ends"], blk["sink"])
        if not wins:
            sink(np.zeros(0, np.int64))
            continue
        hi = int(ends.max()) + 2 if len(ends) else 0
        hi = max(hi, max(e for _, e in wins) + 2)
        if hi > 1_000_000_000 or len(wins) * 32 < len(starts):
            # host sweep when forced by the int32 budget — or when this
            # block's PRIVATE interval set dwarfs its window count: an
            # extra block ships its own intervals (the specs' censuses
            # are shared across window groups, these are not), so
            # answering few windows via the device kernel pays an
            # upload+sort of the whole table for counts a host
            # searchsorted gets in O(m log n). TRA blocks (two windows
            # per candidate over full read tables) sit squarely here.
            from cutesv_tpu.genotype import cover_counts
            sink(np.asarray(cover_counts(wins, starts, ends)))
            continue
        if state["offset"] + hi > 1_000_000_000:
            flush()
        off = state["offset"]
        lo = len(state["windows"])
        state["windows"].extend((a + off, b + off) for a, b in wins)
        state["extras"].append((lo, len(wins), blk["sink"]))
        state["starts"].append(starts + off)
        state["ends"].append(ends + off)
        state["offset"] = off + hi
    flush()


def _batched_cover_pass(per_chrom: Dict[str, tuple], store, cfg: Config,
                        win_groups_fn, apply_fn) -> None:
    """Single-pass form of :func:`_batched_cover_multi`."""
    _batched_cover_multi([(per_chrom, win_groups_fn, apply_fn)], store,
                         cfg)


def _del_ins_apply(chrom, cands, jobs, census, counts):
    covers = counts[0]
    supports = [set(j["support"]) for j in jobs]
    inter = _support_inter_counts(census, jobs, supports)
    drs = (np.asarray(covers, np.int64)
           - np.asarray(inter, np.int64)).tolist()
    table = gl_table()
    for i, (cand, job) in enumerate(zip(cands, jobs)):
        dr = drs[i]
        dv = len(supports[i])
        gt, pl, gq, qual = table.lookup(dr, dv)
        cand[7] = str(dr)
        cand[8] = str(gt)
        cand[9] = str(pl)
        cand[10] = str(gq)
        cand[11] = str(qual)


def _del_ins_cover_spec(per_chrom: Dict[str, tuple]):
    return (per_chrom, lambda jobs: [[j["window"] for j in jobs]],
            _del_ins_apply)


def _support_inter_counts(census, jobs, supports=None) -> np.ndarray:
    """#(support reads whose primary alignment on THIS chromosome covers
    the window) per job; identities are integer ranks.
    ``supports``: optional precomputed [set(j["support"])] to share with
    the caller's DV counting."""
    if supports is None:
        supports = [set(j["support"]) for j in jobs]
    return support_inter_counts(census, supports,
                                [[j["window"] for j in jobs]])


def _fill_gt_del_ins(cands: List[list], jobs: List[dict], store, chrom,
                     cfg: Config) -> List[list]:
    """call_gt for DEL/INS (cuteSV_resolveINDEL.py:441-479)."""
    if chrom not in store.census:
        return []
    windows = [j["window"] for j in jobs]
    supports = [j["support"] for j in jobs]
    rows = assign_gt_del_ins(windows, supports, store.census[chrom],
                             cover_fn=_cover_fn(cfg))
    for cand, (dv, dr, gt, pl, gq, qual) in zip(cands, rows):
        cand[7] = str(dr)
        cand[8] = str(gt)
        cand[9] = str(pl)
        cand[10] = str(gq)
        cand[11] = str(qual)
    return cands


def _two_window_inter_counts(census, jobs) -> np.ndarray:
    """#(support entries whose primary alignment covers window1 OR
    window2) per job. Rank-identity censuses answer via the shared
    searchsorted table; string censuses via a per-census cached dict
    (last primary per name wins in both)."""
    n_sv = len(jobs)
    name_col = census["name"]
    if (isinstance(name_col, np.ndarray)
            and np.issubdtype(name_col.dtype, np.integer)):
        return support_inter_counts(census,
                                    [j["support"] for j in jobs],
                                    [[j["window1"] for j in jobs],
                                     [j["window2"] for j in jobs]])
    name_iv = census.get("_prim_iv")
    if name_iv is None:
        prim = census["is_primary"] == 1
        p_start = census["start"][prim]
        p_end = census["end"][prim]
        p_names = [census["name"][i] for i in np.nonzero(prim)[0]]
        name_iv = {n: (p_start[k], p_end[k])
                   for k, n in enumerate(p_names)}
        census["_prim_iv"] = name_iv
    inters = np.zeros(n_sv, np.int64)
    for i, job in enumerate(jobs):
        (s1, e1), (s2, e2) = job["window1"], job["window2"]
        inter = 0
        for name in job["support"]:
            iv = name_iv.get(name)
            if iv is None:
                continue
            if ((iv[0] <= s1 and iv[1] >= e1)
                    or (iv[0] <= s2 and iv[1] >= e2)):
                inter += 1
        inters[i] = inter
    return inters


def _two_window_apply(cands, jobs, census, c1, c2, ch, idxs) -> None:
    """Host half of the DUP/INV genotype: union of the two breakpoint
    window covers minus support reads covering either window
    (cuteSV_resolveDUP.py:137-160, cuteSV_resolveINV.py:208-230)."""
    dr_i, gt_i, pl_i, gq_i, qual_i = idxs
    table = gl_table()
    unions = (np.asarray(c1, np.int64) + np.asarray(c2, np.int64)
              - np.asarray(ch, np.int64)).tolist()
    inters = _two_window_inter_counts(census, jobs)
    for cand, job, union, inter in zip(cands, jobs, unions, inters):
        dr = union - int(inter)
        gt, pl, gq, qual = table.lookup(dr, len(job["support"]))
        cand[dr_i] = str(dr)
        cand[gt_i] = str(gt)
        cand[pl_i] = str(pl)
        cand[gq_i] = str(gq)
        cand[qual_i] = str(qual)


def _two_window_groups(jobs):
    w1 = [j["window1"] for j in jobs]
    w2 = [j["window2"] for j in jobs]
    hull = [(min(a[0], b[0]), max(a[1], b[1])) for a, b in zip(w1, w2)]
    return [w1, w2, hull]


def _two_windows_cover_spec(per_chrom: Dict[str, tuple], idxs):
    return (per_chrom, _two_window_groups,
            lambda chrom, cands, jobs, census, counts: _two_window_apply(
                cands, jobs, census, counts[0], counts[1], counts[2],
                idxs))


def _fill_gt_two_windows_batched(per_chrom: Dict[str, tuple], store,
                                 cfg: Config, idxs) -> None:
    """call_gt for DUP/INV, all chromosomes in one cover pass."""
    _batched_cover_multi([_two_windows_cover_spec(per_chrom, idxs)],
                         store, cfg)


def _fill_gt_two_windows(cands: List[list], jobs: List[dict], store, chrom,
                         cfg: Config, dr_i: int, gt_i: int, pl_i: int,
                         gq_i: int, qual_i: int) -> List[list]:
    """call_gt for DUP/INV, one chromosome at a time (host-engine path);
    delegates to the batched pass with a single-chromosome dict."""
    one = {chrom: (cands, jobs)}
    _fill_gt_two_windows_batched(one, store, cfg,
                                 (dr_i, gt_i, pl_i, gq_i, qual_i))
    return one[chrom][0]


def _tra_cover_prepare(per_chrom: Dict[str, tuple], store, cfg: Config):
    """Batched TRA genotyping (call_gt_tra, cuteSV_resolveTRA.py:260-309),
    riding the shared cover-kernel call: returns (extra_blocks, finalize)
    for :func:`_batched_cover_multi` — the strict covering counts for
    every candidate's two breakpoint windows count in the SAME kernel
    dispatch as the DEL/INS/DUP/INV genotype windows. The reference's
    early-exit semantics — the gt_round iteration cap and the
    threshold_ref_count bound, both order-sensitive — are detected with
    cheap searchsorted prechecks, and only candidates that could hit them
    (or whose read tables carry ambiguous primary names) replay the exact
    per-candidate host loop. Byte-identical to the inline path."""
    from cutesv_tpu.genotype import (call_gt_tra, gl_table,
                                     support_inter_counts,
                                     threshold_ref_count)

    jobs: List[dict] = []
    for chrom, (cands, js) in per_chrom.items():
        for j in js:
            j["chr1"] = chrom
            jobs.append(j)
    if not jobs:
        return [], lambda: None
    tables = store.read_tables
    lengths = store.chrom_lengths
    bias = cfg.max_cluster_bias_TRA

    # fast path requires globally-unambiguous primary names (each name has
    # at most one primary record across all tables): then row counts equal
    # distinct-name counts and the two windows' covering sets are disjoint
    names_ok = getattr(store, "_tra_prim_unique", None)
    if names_ok is None:
        parts = [np.asarray(t.names)[np.asarray(t.prim) == 1]
                 for t in tables.values()]
        total = sum(len(p) for p in parts)
        cat = (np.concatenate(parts) if total
               else np.array([], np.int64))
        names_ok = bool(len(np.unique(cat)) == total)
        store._tra_prim_unique = names_ok

    # cached on the store: a pipeline run calls this once, but the
    # tables (and these derived views) are also what -Ivcf replays hit
    info: Dict[str, Optional[dict]] = getattr(store, "_tra_tinfo", None)
    if info is None:
        info = store._tra_tinfo = {}

    def tinfo(chrom):
        if chrom in info:
            return info[chrom]
        t = tables.get(chrom)
        if t is None:
            info[chrom] = None
        else:
            starts = np.asarray(t.start)
            prim = np.asarray(t.prim) == 1
            ps = starts[prim]
            pe = np.asarray(t.end)[prim]
            # file order on a coordinate-sorted BAM IS start order, so
            # the precheck's sorted-starts view needs no re-sort
            if starts.size < 2 or np.all(starts[1:] >= starts[:-1]):
                as_sorted = starts
            else:
                as_sorted = np.sort(starts)
            info[chrom] = dict(ps=ps, pe=pe,
                               # ALL rows, not just primaries: the
                               # gt_round cap fires on a primary's fetch
                               # POSITION among every overlapping row
                               # (secondary/supplementary included), so
                               # the conservative no-cap precheck needs
                               # the total overlap count
                               as_sorted=as_sorted,
                               ae_sorted=np.sort(np.asarray(t.end)),
                               census=dict(start=starts,
                                           end=np.asarray(t.end),
                                           is_primary=np.asarray(t.prim),
                                           name=np.asarray(t.names)))
        return info[chrom]

    # per-job windows; group (job, which-window) pairs by chromosome
    win_by_chrom: Dict[str, List[tuple]] = {}
    resolvable = np.zeros(len(jobs), bool)
    for k, j in enumerate(jobs):
        if j["chr1"] not in lengths or j["chr2"] not in lengths:
            continue
        resolvable[k] = True
        for which, (chrom, pos) in enumerate(
                ((j["chr1"], j["pos1"]), (j["chr2"], j["pos2"]))):
            s = max(int(pos) - bias, 0)
            e = min(int(pos) + bias, lengths[chrom])
            win_by_chrom.setdefault(chrom, []).append((k, which, s, e))

    # ---- covering counts ride the SHARED cover-kernel call -------------
    # strict covering (start < s and end > e, count_coverage's test) is
    # the kernel's non-strict test on the (s-1, e+1) window
    covers = np.zeros((len(jobs), 2), np.int64)
    inters = np.zeros((len(jobs), 2), np.int64)
    overlaps = np.zeros((len(jobs), 2), np.int64)
    blocks = []

    def make_sink(ks, ws):
        def sink(counts):
            covers[ks, ws] = np.asarray(counts, np.int64)
        return sink

    for chrom, wl in win_by_chrom.items():
        ti = tinfo(chrom)
        if ti is None or len(ti["ps"]) == 0:
            continue
        m = len(wl)
        ks = np.fromiter((k for k, _, _, _ in wl), np.int64, m)
        ws = np.fromiter((w for _, w, _, _ in wl), np.int64, m)
        ss = np.fromiter((s for _, _, s, _ in wl), np.int64, m)
        es = np.fromiter((e for _, _, _, e in wl), np.int64, m)
        # searchsorted precheck inputs: ALL rows overlapping the fetch
        # window (#start < e minus #end <= s). count_coverage's
        # iteration cap fires when a primary row's position among every
        # fetched row reaches gt_round, so fewer than gt_round TOTAL
        # overlapping rows is the conservative no-cap guarantee (a
        # primary-only count misses caps behind secondary pileups)
        overlaps[ks, ws] = (
            np.searchsorted(ti["as_sorted"], es, "left")
            - np.searchsorted(ti["ae_sorted"], ss, "right"))
        shifted = np.stack([ss - 1, es + 1], axis=1)
        blocks.append(dict(
            windows=list(map(tuple, shifted.tolist())),
            starts=ti["ps"], ends=ti["pe"], sink=make_sink(ks, ws)))
        # support-covering counts (vectorized; strict via shifted window)
        supports = [jobs[k]["support"] for k, _, _, _ in wl]
        inter = support_inter_counts(ti["census"], supports,
                                     [shifted.tolist()])
        inters[ks, ws] = np.asarray(inter, np.int64)

    def finalize():
        # fast path or exact replay, after the kernel filled ``covers``
        table = gl_table()
        stats = dict(fast=0, replay=0, unresolvable=0)
        for k, j in enumerate(jobs):
            cand = j["cand"]
            if not resolvable[k]:
                # SA-tag contig absent from the header (call_gt_tra's
                # degraded "unresolvable" genotype)
                dr, gt, gl, gq, qual = ".", "./.", ".,.,.", ".", "."
                stats["unresolvable"] += 1
            else:
                support = j["support"]
                up_bound = threshold_ref_count(len(support))
                c1, c2 = int(covers[k, 0]), int(covers[k, 1])
                fast = (names_ok
                        and int(overlaps[k, 0]) < cfg.gt_round
                        and int(overlaps[k, 1]) < cfg.gt_round
                        and c1 < up_bound and c1 + c2 < up_bound)
                if fast:
                    dr = ((c1 - int(inters[k, 0]))
                          + (c2 - int(inters[k, 1])))
                    gt, gl, gq, qual = table.lookup(dr, len(support))
                    stats["fast"] += 1
                else:
                    _, dr, gt, gl, gq, qual = call_gt_tra(
                        tables, lengths, j["pos1"], j["pos2"], j["chr1"],
                        j["chr2"], support, bias, cfg.gt_round)
                    stats["replay"] += 1
            cand[6] = str(dr)
            cand[7] = str(gt)
            cand[8] = str(gl)
            cand[9] = str(gq)
            cand[10] = str(qual)
        store.tra_cover_stats = stats

    return blocks, finalize


def _tra_cover_pass(per_chrom: Dict[str, tuple], store, cfg: Config) -> None:
    """Standalone form of the batched TRA genotype pass (tests / host
    callers); the pipeline rides the shared cover call instead."""
    blocks, finalize = _tra_cover_prepare(per_chrom, store, cfg)
    _batched_cover_multi([], store, cfg, extra_blocks=blocks)
    finalize()


def resolve_all(store: sigstore.SigStore, cfg: Config) -> Dict[str, List]:
    """Cluster + genotype every chromosome; returns chrom -> candidate rows
    in the reference's DEL, INS, INV, DUP, TRA submission order."""
    action = cfg.genotype
    results: Dict[str, List] = {}
    # resolution-side sentinel filter (the reference's seeded cluster loops
    # silently discard (0,0)-coordinate rows; stage 2 keeps them)
    sig = {t: {c: sigstore.drop_sentinel_rows(t, s)
               for c, s in store.sigs[t].items()}
           for t in sigstore.SVTYPES}
    names = store.names  # rank -> string (native decode); None on oracle path
    # engine=host always means the numpy oracle — including on native
    # (rank-identity) stores, whose columnar streams are materialized to
    # tuple rows below; auto/device run the JAX kernels
    use_device = cfg.engine != "host"
    if use_device:
        from cutesv_tpu.utils.jaxsetup import setup_jax
        setup_jax()

        from cutesv_tpu.models import device as device_models
    else:
        resolve_del = host_models.resolve_del
        resolve_ins = host_models.resolve_ins
        resolve_dup = host_models.resolve_dup
        resolve_inv = host_models.resolve_inv

    def add(chrom, rows):
        if rows:
            results.setdefault(chrom, []).extend(rows)

    min_sup5 = min(cfg.min_support, 5)
    if use_device:
        # every cluster kernel dispatches (async) before any is fetched:
        # DEL/INS as one genome-batched call per int32-safe chromosome
        # batch, DUP/INV per chromosome — device compute overlaps host
        # emission and dispatch latency is paid once, not per stage
        early_k = getattr(store, "early_kernels", None) or {}
        # chromosomes whose FULL tail (emission + genotype) already ran
        # during the streaming decode skip resolution entirely
        early_res = getattr(store, "early_results", None) or {}
        del_state = device_models.resolve_indel_multi_start(
            [(c, s) for c, s in sig["DEL"].items()
             if ("DEL", c) not in early_res], False, cfg.min_support,
            cfg.max_cluster_bias_DEL, n_shards=cfg.n_shards,
            early={c: h for (t, c), h in early_k.items() if t == "DEL"})
        ins_state = device_models.resolve_indel_multi_start(
            [(c, s) for c, s in sig["INS"].items()
             if ("INS", c) not in early_res], True, cfg.min_support,
            cfg.max_cluster_bias_INS, n_shards=cfg.n_shards,
            early={c: h for (t, c), h in early_k.items() if t == "INS"})
        def pair_state(svtype, chrom, sigs, is_inv, bias):
            # reuse the streaming decode's early pair kernel (already
            # compacted + host-copying) when its fingerprint validated
            h = early_k.get((svtype, chrom))
            if h is not None:
                return ("pending", h)
            return device_models.resolve_pair_start(
                sigs, is_inv, cfg.min_support, bias, cfg.n_shards)

        inv_states = {
            chrom: pair_state("INV", chrom, sigs, True,
                              cfg.max_cluster_bias_INV)
            for chrom, sigs in sig["INV"].items()}
        dup_states = {
            chrom: pair_state("DUP", chrom, sigs, False,
                              cfg.max_cluster_bias_DUP)
            for chrom, sigs in sig["DUP"].items()}
        tra_states = {
            chrom: device_models.resolve_tra_start(
                sigs, cfg.min_support, cfg.max_cluster_bias_TRA,
                cfg.n_shards)
            for chrom, sigs in sig["TRA"].items()}
        device_models.prefetch_counts(
            del_state, ins_state, *inv_states.values(),
            *dup_states.values(), *tra_states.values())
        device_models.resolve_indel_multi_compact(del_state)
        device_models.resolve_indel_multi_compact(ins_state)
        inv_states = {c: device_models.resolve_pair_compact(s)
                      for c, s in inv_states.items()}
        dup_states = {c: device_models.resolve_pair_compact(s)
                      for c, s in dup_states.items()}
        tra_states = {c: device_models.resolve_tra_compact(s)
                      for c, s in tra_states.items()}
        device_models.prefetch_to_host(
            del_state, ins_state, *inv_states.values(),
            *dup_states.values(), *tra_states.values())
        del_res = device_models.resolve_indel_multi_finish(
            del_state, cfg.diff_ratio_merging_DEL, min_sup5,
            cfg.remain_reads_ratio, action,
            need_names=cfg.report_readid)
        ins_res = device_models.resolve_indel_multi_finish(
            ins_state, cfg.diff_ratio_merging_INS, min_sup5,
            cfg.remain_reads_ratio, action,
            need_names=cfg.report_readid)
        for (t, c), res in early_res.items():
            (del_res if t == "DEL" else ins_res)[c] = res
    else:
        def rows_of(sigs):
            # native columnar stream -> resolver tuple rows
            return sigs.tuples() if hasattr(sigs, "tuples") else sigs
        del_res = {
            chrom: resolve_del(rows_of(sigs), chrom, cfg.min_support,
                               cfg.diff_ratio_merging_DEL,
                               cfg.max_cluster_bias_DEL, min_sup5,
                               cfg.remain_reads_ratio, action, names=names)
            for chrom, sigs in sig["DEL"].items()}
        ins_res = {
            chrom: resolve_ins(rows_of(sigs), chrom, cfg.min_support,
                               cfg.diff_ratio_merging_INS,
                               cfg.max_cluster_bias_INS, min_sup5,
                               cfg.remain_reads_ratio, action, names=names)
            for chrom, sigs in sig["INS"].items()}
    inv_res, dup_res = {}, {}
    for chrom, sigs in sig["INV"].items():
        if use_device:
            inv_res[chrom] = device_models.resolve_pair_finish(
                inv_states[chrom], sigs, True, chrom, cfg.min_support,
                cfg.max_cluster_bias_INV, cfg.min_size, cfg.max_size,
                action, names=names)
        else:
            inv_res[chrom] = resolve_inv(
                sigs, chrom, cfg.min_support, cfg.max_cluster_bias_INV,
                cfg.min_size, cfg.max_size, action, names=names)
    for chrom, sigs in sig["DUP"].items():
        if use_device:
            dup_res[chrom] = device_models.resolve_pair_finish(
                dup_states[chrom], sigs, False, chrom, cfg.min_support,
                cfg.max_cluster_bias_DUP, cfg.min_size, cfg.max_size,
                action, names=names)
        else:
            dup_res[chrom] = resolve_dup(
                sigs, chrom, cfg.min_support, cfg.max_cluster_bias_DUP,
                cfg.min_size, cfg.max_size, action, names=names)
    # TRA resolution happens BEFORE the cover pass so its genotype
    # windows ride the same kernel call (candidates/logs still emit in
    # the reference's DEL,INS,INV,DUP,TRA order below)
    tra_batch = action and use_device and store.names is not None
    tra_res: Dict[str, tuple] = {}
    tra_out: Dict[str, list] = {}
    for chrom, sigs_t in sig["TRA"].items():
        if use_device:
            jobs_t: Optional[list] = [] if tra_batch else None
            tra_out[chrom] = device_models.resolve_tra_finish(
                tra_states.get(chrom), sigs_t, chrom, cfg.min_support,
                cfg.diff_ratio_filtering_TRA, cfg.max_cluster_bias_TRA,
                store.read_tables, store.chrom_lengths, action,
                cfg.gt_round, names=names, jobs_out=jobs_t)
            if tra_batch:
                tra_res[chrom] = (tra_out[chrom], jobs_t)
        else:
            tra_out[chrom] = host_models.resolve_tra(
                sigs_t, chrom, cfg.min_support,
                cfg.diff_ratio_filtering_TRA, cfg.max_cluster_bias_TRA,
                store.read_tables, store.chrom_lengths, action,
                cfg.gt_round, names=names)
    # ONE read-support cover pass for every SV type and chromosome: the
    # census uploads once and the kernel round-trip is paid once
    specs = []
    filled = False
    if action and use_device and store.names is not None:
        specs.append(_del_ins_cover_spec(del_res))
        specs.append(_del_ins_cover_spec(ins_res))
        filled = True
    if action and use_device:
        specs.append(_two_windows_cover_spec(inv_res, (5, 6, 8, 9, 10)))
        specs.append(_two_windows_cover_spec(dup_res, (5, 6, 7, 8, 9)))
    tra_finalize = None
    tra_blocks = []
    if tra_batch:
        tra_blocks, tra_finalize = _tra_cover_prepare(tra_res, store, cfg)
    if specs or tra_blocks:
        _batched_cover_multi(specs, store, cfg, extra_blocks=tra_blocks)
    if tra_finalize is not None:
        tra_finalize()
    for chrom in sig["DEL"]:
        cands, jobs = del_res[chrom]
        if action and not filled:
            cands = _fill_gt_del_ins(cands, jobs, store, chrom, cfg)
        log.info("Finished %s:%s." % (chrom, "DEL"))
        add(chrom, cands)
    for chrom in sig["INS"]:
        cands, jobs = ins_res[chrom]
        if action and not filled:
            cands = _fill_gt_del_ins(cands, jobs, store, chrom, cfg)
        log.info("Finished %s:%s." % (chrom, "INS"))
        add(chrom, cands)
    for chrom in sig["INV"]:
        cands, jobs = inv_res[chrom]
        if action and not use_device:
            cands = _fill_gt_two_windows(cands, jobs, store, chrom,
                                         cfg, 5, 6, 8, 9, 10)
        log.info("Finished %s:%s." % (chrom, "INV"))
        add(chrom, cands)
    for chrom in sig["DUP"]:
        cands, jobs = dup_res[chrom]
        if action and not use_device:
            cands = _fill_gt_two_windows(cands, jobs, store, chrom,
                                         cfg, 5, 6, 7, 8, 9)
        log.info("Finished %s:%s." % (chrom, "DUP"))
        add(chrom, cands)
    for chrom in sig["TRA"]:
        log.info("Finished %s:%s." % (chrom, "TRA/BND"))
        add(chrom, tra_out[chrom])
    return results


def _filter_store_chroms(store: sigstore.SigStore, keep) -> sigstore.SigStore:
    """Shallow copy of the store with signature streams restricted to the
    chromosomes ``keep(chrom)`` selects. Census/read tables stay complete:
    TRA genotyping replays coverage on the mate chromosome too."""
    out = sigstore.SigStore(
        sigs={t: {c: v for c, v in per.items() if keep(c)}
              for t, per in store.sigs.items()},
        census=store.census, read_tables=store.read_tables,
        chrom_lengths=store.chrom_lengths, names=store.names)
    # early kernels / full-tail results follow their chromosome's owner
    # (a dropped chromosome's early work is simply unused on this host)
    for attr in ("early_kernels", "early_results"):
        src = getattr(store, attr, None)
        if src:
            setattr(out, attr, {(t, c): v for (t, c), v in src.items()
                                if keep(c)})
    return out


def _gather_results(results: Dict[str, List]):
    """Multi-host merge: allgather each host's per-chromosome candidate
    rows onto every process; host 0 returns the merged dict, other hosts
    return None and skip the VCF emit (reference stage-4 is serial too,
    cuteSV:1218-1247)."""
    import jax

    from cutesv_tpu.parallel.distributed import allgather_obj

    parts = allgather_obj(results)
    if jax.process_index() != 0:
        return None
    merged: Dict[str, List] = {}
    for part in parts:
        for chrom, rows in part.items():
            merged.setdefault(chrom, []).extend(rows)
    return merged


def run_pipeline(cfg: Config, argv: Optional[List[str]] = None) -> dict:
    """Full discovery run; returns stage timing + counters."""
    argv = argv if argv is not None else []
    # input validation up front (cuteSV:999-1011)
    if not os.path.isfile(cfg.reference):
        raise FileNotFoundError(
            "[Errno 2] No such file: '%s'" % cfg.reference)
    if not os.path.isfile(cfg.input):
        raise FileNotFoundError("[Errno 2] No such file: '%s'" % cfg.input)
    ckpt = os.path.join(cfg.work_dir, "sigstore.pickle") if cfg.work_dir \
        else None
    if cfg.work_dir and not cfg.resume:
        # refuse to clobber a previous run's signature artifacts
        # (cuteSV:1005-1011); --resume reuses them instead
        for item in list(sigstore.SVTYPES) + ["sigstore"]:
            for suffix in (".sigs", ".pickle"):
                path = os.path.join(cfg.work_dir, item + suffix)
                if os.path.exists(path) and not (
                        item == "sigstore" and suffix == ".sigs"):
                    raise FileExistsError(
                        "[Errno 2] File exists: '%s' "
                        "(use --resume to reuse, or clean the work dir)"
                        % path)
    dist_active = False
    if cfg.distributed:
        from cutesv_tpu.parallel.distributed import init_distributed
        dist_active = init_distributed(cfg.coordinator, cfg.num_processes,
                                       cfg.process_id)
    stats = {}
    t0 = time.time()
    # open + index the reference FASTA on a side thread: the emitter needs
    # it only after resolve, and the open cost is page-in/IO wait that
    # hides completely under the decode stage
    fasta_box: List = []

    def _open_fasta():
        try:
            fasta_box.append(FastaFile(cfg.reference))
        except BaseException as exc:  # re-raised at emit time
            fasta_box.append(exc)

    import threading
    fasta_thread = threading.Thread(target=_open_fasta, daemon=True)
    fasta_thread.start()
    if cfg.resume and ckpt and os.path.exists(ckpt):
        log.info("Resuming from signature checkpoint %s" % ckpt)
        store = sigstore.load_store(cfg.work_dir)
        candidates = None
        references = [(c, l) for c, l in store.chrom_lengths.items()]
        n_records = -1
    else:
        store, candidates, references, n_records = decode_bam(cfg)
    stats["decode_s"] = time.time() - t0
    bd = getattr(store, "decode_breakdown", None)
    if bd:
        stats.update(bd)
    stats["n_records"] = n_records
    stats["n_sigs"] = {t: sum(len(v) for v in store.sigs[t].values())
                       for t in sigstore.SVTYPES}
    log.info("Decoded %d records; signatures: %s"
             % (n_records, " ".join("%s=%d" % kv
                                    for kv in stats["n_sigs"].items())))

    if cfg.work_dir:
        os.makedirs(cfg.work_dir, exist_ok=True)
        if cfg.retain_work_dir and not cfg.resume:
            sigstore.save_store(store, cfg.work_dir)
        if cfg.write_old_sigs:
            if candidates is not None:
                sigstore.write_old_sigs(store, cfg.work_dir, candidates)
            else:
                sigstore.write_old_sigs_native(store, cfg.work_dir)

    if dist_active:
        # every host decoded the input; this host resolves only its
        # chromosome bucket (SURVEY §2.5 TPU-native equivalent: genome
        # bins over the pod, host 0 merges). Bucketing is size-aware
        # greedy LPT over census+signature rows — identical on every
        # host, no communication needed.
        import jax

        from cutesv_tpu.parallel.distributed import (
            assign_chroms_by_decode_range, assign_chroms_lpt)
        pcc = getattr(store, "part_census_counts", None)
        # part counts must match the CURRENT topology (a --resume with a
        # different --num_processes would otherwise idle the new hosts)
        if pcc and len(pcc) == jax.process_count():
            # range-affine: resolve each chromosome on the host whose
            # decode range produced it, so the mid-decode full tails
            # land in their own host's bucket (ranges split compressed
            # bytes ~equally, so this is also ~load-balanced)
            assign = assign_chroms_by_decode_range(
                pcc, store, jax.process_count())
        else:
            assign = assign_chroms_lpt(store, jax.process_count())
        store = _filter_store_chroms(
            store, lambda c: assign.get(c, 0) == jax.process_index())
    t1 = time.time()
    if cfg.profile and cfg.work_dir:
        import jax
        trace_dir = os.path.join(cfg.work_dir, "jax_trace")
        with jax.profiler.trace(trace_dir):
            results = resolve_all(store, cfg)
        log.info("Profiler trace written to %s" % trace_dir)
    else:
        results = resolve_all(store, cfg)
    if dist_active:
        results = _gather_results(results)
        if results is None:  # non-emitter host: done after the gather
            stats["resolve_s"] = time.time() - t1
            stats["n_calls"] = 0
            stats["emit_s"] = 0.0
            stats["total_s"] = time.time() - t0
            return stats
    stats["resolve_s"] = time.time() - t1
    stats["n_calls"] = sum(len(v) for v in results.values())

    t2 = time.time()
    fasta_thread.join()
    fasta = fasta_box[0]
    if isinstance(fasta, BaseException):
        raise fasta
    per_chrom = {}
    for chrom, rows in results.items():
        if chrom not in fasta:
            raise KeyError(
                "No corresponding contig in reference with %s." % chrom)
        per_chrom[chrom] = vcf.format_chrom_records(
            cfg, rows, fasta.fetch_lazy(chrom), chrom)
    vcf.write_vcf(cfg.output, cfg, per_chrom, references, argv)
    stats["emit_s"] = time.time() - t2
    stats["total_s"] = time.time() - t0
    return stats
