"""Streaming decode -> early cluster-kernel dispatch.

Timing-dependent mid-decode snapshots need multi-chunk inputs, so these
tests exercise the machinery deterministically: snapshots taken once the
native thread finishes are byte-equal to partial ones for chromosomes
without late SA-tag rows, which is exactly the case the fingerprint
validation certifies.
"""
import random

import numpy as np

from cutesv_tpu import sigstore
from cutesv_tpu.config import Config
from cutesv_tpu.pipeline import run_pipeline
from tests import simdata


def _two_chrom_fixture(tmp_path, seed=11):
    rng = random.Random(seed)
    ref = simdata.make_reference(rng, {"chrA": 90_000, "chrB": 90_000})
    plans = []
    rid = 0
    for cid, cname in ((0, "chrA"), (1, "chrB")):
        chrom = ref[cname]
        for start in range(0, 87_000, 300):
            rid += 1
            q = "s%05d" % rid
            if 27_350 <= start <= 29_500:
                plans.append(simdata.read_with_del(
                    chrom, cid, start, 30_000, 150,
                    start + 3000 - 30_150, q))
            elif 57_000 <= start <= 59_500 and rid % 2 == 0:
                plans.append(simdata.read_with_ins(
                    chrom, cid, start, 60_000,
                    simdata.random_seq(rng, 90), 3000 - (60_000 - start),
                    q))
            else:
                plans.append(simdata.plain_read(chrom, cid, start, 3000, q))
    bam = tmp_path / "st.bam"
    fa = tmp_path / "st.fa"
    simdata.write_bam(str(bam), [("chrA", 90_000), ("chrB", 90_000)], plans)
    simdata.write_ref_fasta(str(fa), ref)
    return str(bam), str(fa)


def test_streaming_pipeline_identical(tmp_path, monkeypatch):
    """Forced-on streaming path gives a byte-identical VCF to the plain
    native path (on small inputs the poll loop usually sees DONE at once;
    this still drives the full orchestration incl. validation)."""
    bam, fa = _two_chrom_fixture(tmp_path)
    outs = {}
    for label, flag in (("stream", "1"), ("plain", "0")):
        monkeypatch.setenv("CUTESV_STREAM_DISPATCH", flag)
        out = tmp_path / ("o_%s.vcf" % label)
        wd = tmp_path / ("w_%s" % label)
        wd.mkdir()
        cfg = Config(input=bam, reference=fa, output=str(out),
                     work_dir=str(wd), genotype=True, min_support=3,
                     engine="device", decoder="native")
        run_pipeline(cfg, ["x"])
        outs[label] = [ln for ln in out.read_text().splitlines()
                       if not ln.startswith("##")]
    assert outs["stream"] == outs["plain"]
    assert sum(1 for ln in outs["stream"] if not ln.startswith("#")) >= 4


def test_streaming_identical_on_unsorted_bam(tmp_path, monkeypatch):
    """Coordinate-UNSORTED BAMs are rejected with a clear message by both
    the streaming and plain decode paths (session 6): the reference
    cannot even open them (pysam.fetch needs a coordinate-sorted index),
    and accepting them made the order-sensitive pieces (TRA
    count_coverage replay order, reads.sigs) silently differ from the
    sorted run. The stale-snapshot fingerprint logic this fixture used
    to exercise is covered by
    test_snapshot_prepare_validation_and_early_resolve."""
    import random as _random

    rng = _random.Random(3)
    ref = simdata.make_reference(rng, {"chrA": 90_000, "chrB": 90_000})
    plans = []
    rid = 0
    for cid, cname in ((0, "chrA"), (1, "chrB")):
        chrom = ref[cname]
        for start in range(0, 87_000, 400):
            rid += 1
            q = "u%05d" % rid
            if 27_350 <= start <= 29_500:
                plans.append(simdata.read_with_del(
                    chrom, cid, start, 30_000, 150,
                    start + 3000 - 30_150, q))
            else:
                plans.append(simdata.plain_read(chrom, cid, start, 3000, q))
    rng.shuffle(plans)
    bam = tmp_path / "un.bam"
    fa = tmp_path / "un.fa"
    # sort=False preserves the shuffle: the BAM on disk is genuinely
    # coordinate-unsorted, so the decoder's progress counter over-reports
    # completed chromosomes
    simdata.write_bam(str(bam), [("chrA", 90_000), ("chrB", 90_000)],
                      plans, sort=False)
    simdata.write_ref_fasta(str(fa), ref)
    import pytest

    for label, flag in (("stream", "1"), ("plain", "0")):
        monkeypatch.setenv("CUTESV_STREAM_DISPATCH", flag)
        out = tmp_path / ("u_%s.vcf" % label)
        wd = tmp_path / ("uw_%s" % label)
        wd.mkdir()
        cfg = Config(input=str(bam), reference=str(fa), output=str(out),
                     work_dir=str(wd), genotype=True, min_support=3,
                     engine="device", decoder="native")
        with pytest.raises(ValueError, match="not coordinate-sorted"):
            run_pipeline(cfg, ["x"])


def test_snapshot_prepare_validation_and_early_resolve(tmp_path):
    """Snapshots prepared with local ranks must validate against the
    final store and drive the early-kernel resolve path to identical
    candidates; a tampered (stale) snapshot must be rejected."""
    from cutesv_tpu.io import native as nio
    from cutesv_tpu.models import device as dm
    from cutesv_tpu.pipeline import resolve_all

    bam, fa = _two_chrom_fixture(tmp_path)
    cfg = Config(input=bam, reference=fa, output="x.vcf",
                 work_dir=str(tmp_path), genotype=True, min_support=3,
                 engine="device", decoder="native")
    sd = nio.StreamingDecode(bam, cfg)
    while sd.poll() != sd.DONE:
        pass
    snaps = {}
    for c in (0, 1):
        for t, is_ins in (("DEL", False), ("INS", True)):
            snap = sd.snapshot(t, c)
            if len(snap["pos"]):
                snaps[(t, c)] = snap
    nd = sd.join()
    assert snaps, "fixture must produce DEL/INS signatures"

    prepared = {k: sigstore.prepare_snapshot(v, k[0] == "INS")
                for k, v in snaps.items()}
    early_fp = {(t, nd.chroms[c]): fp
                for (t, c), (fp, _) in prepared.items()}
    store = sigstore.build_store_native(nd, cfg, early=early_fp)
    # full-file snapshots must all validate
    assert store.early_valid == set(early_fp)

    # the early dispatch path must reproduce the normal resolve exactly
    bias = {"DEL": cfg.max_cluster_bias_DEL, "INS": cfg.max_cluster_bias_INS}
    store.early_kernels = {
        (t, nd.chroms[c]): dm._cluster_stream_dispatch(
            dm.IndelStream(disp["pos"], disp["length"], disp["rid"]),
            cfg.min_support, bias[t])
        for (t, c), (_, disp) in prepared.items()}
    with_early = resolve_all(store, cfg)
    store.early_kernels = {}
    without = resolve_all(store, cfg)
    assert with_early == without

    # a stale snapshot (one row short, as if a later read's SA tag added a
    # signature after the early dispatch) must NOT validate
    (t0, c0), snap0 = next(iter(snaps.items()))
    stale = {k: v[:-1] for k, v in snap0.items()}
    fp_stale, _ = sigstore.prepare_snapshot(stale, t0 == "INS")
    store2 = sigstore.build_store_native(
        nd, cfg, early={(t0, nd.chroms[c0]): fp_stale})
    assert (t0, nd.chroms[c0]) not in store2.early_valid
    sd.free()


def test_streaming_full_tail_identical(tmp_path, monkeypatch, caplog):
    """The mid-decode per-chromosome tail (kernel fetch + emission +
    genotype, round-3) must produce byte-identical VCFs to the plain
    path — and BOTH the DEL and INS tails (the INS one renders ALT
    sequences through the native blob view) must actually fire. Small
    fixtures decode in one poll, so CUTESV_STREAM_TAIL=force runs the
    tail for the final batch too."""
    import logging

    from cutesv_tpu.pipeline import run_pipeline as rp

    bam, fa = _two_chrom_fixture(tmp_path)
    outs = {}
    for label, env in (("tail", "force"), ("plain", "0")):
        monkeypatch.setenv("CUTESV_STREAM_TAIL", env)
        monkeypatch.setenv("CUTESV_STREAM_DISPATCH", "1")
        out = tmp_path / ("t_%s.vcf" % label)
        wd = tmp_path / ("tw_%s" % label)
        wd.mkdir()
        cfg = Config(input=bam, reference=fa, output=str(out),
                     work_dir=str(wd), genotype=True, min_support=3,
                     engine="device", decoder="native")
        with caplog.at_level(logging.INFO, logger="cutesv_tpu"):
            caplog.clear()
            stats = rp(cfg, ["x"])
        assert stats["n_calls"] > 0
        if label == "tail":
            msg = next(m for m in caplog.messages if "full tails" in m)
            n_tails = int(msg.split("+")[1].split()[0])
            assert n_tails >= 2, msg  # DEL and INS tails both fired
        outs[label] = out.read_text().split("#CHROM")[-1]
    assert outs["tail"] == outs["plain"]
    # the INS tail rendered a real ALT sequence, not a placeholder
    assert any("\tINS\t" not in line and "cuteSV.INS." in line
               and len(line.split("\t")[4]) > 10
               for line in outs["tail"].splitlines())


def test_streaming_tail_invalidated_fingerprint_falls_back(
        tmp_path, monkeypatch):
    """A chromosome whose fingerprint fails validation (late SA row
    semantics) must DISCARD its early tail results and resolve normally
    — output identical to the plain path."""
    from cutesv_tpu import sigstore as ss
    from cutesv_tpu.pipeline import run_pipeline as rp

    bam, fa = _two_chrom_fixture(tmp_path)
    orig = ss.prepare_snapshot

    def corrupt(snap, is_ins):
        cols, disp = orig(snap, is_ins)
        cols = dict(cols, n_raw=cols["n_raw"] + 1)  # will never validate
        return cols, disp

    outs = {}
    for label, env, patch in (("bad", "force", True), ("plain", "0",
                                                       False)):
        monkeypatch.setenv("CUTESV_STREAM_TAIL", env)
        monkeypatch.setenv("CUTESV_STREAM_DISPATCH", "1")
        if patch:
            monkeypatch.setattr(ss, "prepare_snapshot", corrupt)
        else:
            monkeypatch.setattr(ss, "prepare_snapshot", orig)
        out = tmp_path / ("f_%s.vcf" % label)
        wd = tmp_path / ("fw_%s" % label)
        wd.mkdir()
        cfg = Config(input=bam, reference=fa, output=str(out),
                     work_dir=str(wd), genotype=True, min_support=3,
                     engine="device", decoder="native")
        rp(cfg, ["x"])
        outs[label] = out.read_text().split("#CHROM")[-1]
    assert outs["bad"] == outs["plain"]


def test_streaming_full_tail_identical_no_genotype(tmp_path, monkeypatch):
    from cutesv_tpu.pipeline import run_pipeline as rp
    from tests.test_e2e_alltypes import _build

    bam, fa = _build(tmp_path)
    outs = {}
    for label, env in (("tail", "force"), ("plain", "0")):
        monkeypatch.setenv("CUTESV_STREAM_TAIL", env)
        monkeypatch.setenv("CUTESV_STREAM_DISPATCH", "1")
        out = tmp_path / ("n_%s.vcf" % label)
        wd = tmp_path / ("nw_%s" % label)
        wd.mkdir()
        cfg = Config(input=str(bam), reference=str(fa), output=str(out),
                     work_dir=str(wd), genotype=False, min_support=3,
                     engine="device", decoder="native")
        rp(cfg, ["x"])
        outs[label] = out.read_text().split("#CHROM")[-1]
    assert outs["tail"] == outs["plain"]


def test_pair_snapshot_early_resolve_identical(tmp_path):
    """DUP/INV streaming snapshots: the early pair-cluster kernels must
    validate against the final store and resolve to identical candidates
    (round-2 verdict item 1a: overlap extended beyond DEL/INS)."""
    from cutesv_tpu.io import native as nio
    from cutesv_tpu.models import device as dm
    from cutesv_tpu.pipeline import resolve_all
    from tests.test_e2e_alltypes import _build

    bam, fa = _build(tmp_path)
    cfg = Config(input=str(bam), reference=str(fa), output="x.vcf",
                 work_dir=str(tmp_path), genotype=True, min_support=3,
                 engine="device", decoder="native")
    sd = nio.StreamingDecode(str(bam), cfg)
    while sd.poll() != sd.DONE:
        pass
    snaps = {}
    for c in range(sd.n_refs()):
        for t in ("DUP", "INV"):
            snap = sd.snapshot(t, c)
            if len(snap["pos"]):
                snaps[(t, c)] = snap
    nd = sd.join()
    assert any(t == "DUP" for t, _ in snaps) and \
        any(t == "INV" for t, _ in snaps), "fixture must carry DUP+INV"

    bias = {"DUP": cfg.max_cluster_bias_DUP,
            "INV": cfg.max_cluster_bias_INV}
    prepared = {k: sigstore.prepare_snapshot_pair(k[0], v)
                for k, v in snaps.items()}
    early_fp = {(t, nd.chroms[c]): fp
                for (t, c), (fp, _) in prepared.items()}
    store = sigstore.build_store_native(nd, cfg, early=early_fp)
    assert set(early_fp) <= store.early_valid

    store.early_kernels = {
        (t, nd.chroms[c]): dm._pair_cluster_compact(
            dm._pair_cluster_start(d["k1"], d["k2"], d["aux"], d["keys"],
                                   cfg.min_support, bias[t], t == "INV"))
        for (t, c), (_, d) in prepared.items()}
    with_early = resolve_all(store, cfg)
    store.early_kernels = {}
    without = resolve_all(store, cfg)
    assert with_early == without
    assert any(with_early.values())
    sd.free()


def test_stream_tail_default_predicate():
    """Round-5 adaptive default: the FULL mid-decode tail is on where it
    measured faster (>=4 cores, or >=8 contigs where the serial
    post-decode tail dominates) and off at few-core/few-contig shapes
    where it steals more from the inflate workers than it returns."""
    from cutesv_tpu.pipeline import _stream_tail_default
    assert not _stream_tail_default(2, 4)     # bench shape: off
    assert _stream_tail_default(2, 24)        # human layout: on
    assert _stream_tail_default(2, 8)
    assert _stream_tail_default(4, 1)         # wide host: on
    assert _stream_tail_default(16, 4)
    assert not _stream_tail_default(3, 7)
