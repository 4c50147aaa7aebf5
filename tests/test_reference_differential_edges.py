"""Targeted edge differentials closing the coverage gaps tests/refcov.py
measured in the randomized reference-differential campaign.

Each case here is CRAFTED to drive a specific reference branch the random
generators never reached (tests/refcov.py prints the live list), and
asserts exact parity on it: extraction cases run the reference's
parse_read vs our extract_read vs the native C++ decoder three-way;
resolver/genotype/emission/force-calling cases reuse the
test_reference_differential harness over hand-built stores and VCFs.
"""
import os
import random
import sys
import types

import numpy as np
import pytest

from cutesv_tpu import pipeline
from cutesv_tpu.config import Config
from cutesv_tpu.genotype import ReadTable
from cutesv_tpu.io.bam import BamReader, BamWriter
from cutesv_tpu.sigstore import SigStore

from test_reference_differential import (  # noqa: F401 (fixtures)
    REF_SRC, _canon, _run_reference, _write_ref_store, ref, refmain,
    _PysamView)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_SRC, "cuteSV")),
    reason="reference tree not mounted")

REFS = [("chr1", 1_000_000), ("chr2", 1_000_000)]


# ---------------------------------------------------------------------------
# Crafted split-read extraction: each case hits one analysis_split_read
# arm the random SA fuzzer missed (cuteSV:228-233, 243-249, 344-348,
# 360-367, 384-390, 414-420, 452-457) or the trailing-hardclip shift
# (cuteSV:649,654). Three-way: reference parse_read / our extract_read /
# native decoder.
# ---------------------------------------------------------------------------


def _sa(chrom, pos0, strand, cigar, mapq=60):
    return "%s,%d,%s,%s,%d,0;" % (chrom, pos0 + 1, strand, cigar, mapq)


def _write_split_bam(path, qlen, pos, cigar, sa_entries, flag=0,
                     chrom_id=0, seed=7):
    rng = random.Random(seed)
    seq = "".join(rng.choice("ACGT") for _ in range(qlen))
    tags = {"SA": "".join(sa_entries)} if sa_entries else {}
    with BamWriter(path, REFS) as w:
        w.write("edge_read", flag, chrom_id, pos, 60, cigar, seq, tags)


def _extract_all_ways(bam_path, refmain, **params):
    """(reference, ours, native) candidate dicts for one BAM."""
    import cutesv_tpu.extract as extract
    from cutesv_tpu.io import native as native_io
    from test_native_decoder import _native_tuples

    cfg = Config(input=bam_path, min_support=3, **{
        k: v for k, v in params.items() if hasattr(Config, k)})
    p = dict(sv_size=params.get("min_size", cfg.min_size),
             min_mapq=params.get("min_mapq", cfg.min_mapq),
             max_split_parts=params.get("max_split_parts",
                                        cfg.max_split_parts),
             min_read_len=params.get("min_read_len", cfg.min_read_len),
             min_siglength=params.get("min_siglength", cfg.min_siglength),
             merge_del_threshold=params.get("merge_del_threshold",
                                            cfg.merge_del_threshold),
             merge_ins_threshold=params.get("merge_ins_threshold",
                                            cfg.merge_ins_threshold),
             max_size=params.get("max_size", cfg.max_size))
    ours = extract.new_candidate_dict()
    theirs = extract.new_candidate_dict()
    reader = BamReader(bam_path)
    chrom_names = [x for x, _ in reader.references]
    for rec in reader:
        if rec.ref_id < 0 or rec.flag & 4 or rec.flag in (256, 272):
            continue
        chrom = chrom_names[rec.ref_id]
        extract.extract_read(rec, ours, chrom, p["sv_size"], p["min_mapq"],
                             p["max_split_parts"], p["min_read_len"],
                             p["min_siglength"], p["merge_del_threshold"],
                             p["merge_ins_threshold"], p["max_size"])
        refmain.parse_read(_PysamView(rec), theirs, chrom, p["sv_size"],
                           p["min_mapq"], p["max_split_parts"],
                           p["min_read_len"], p["min_siglength"],
                           p["merge_del_threshold"],
                           p["merge_ins_threshold"], p["max_size"])
    reader.close()
    nd = native_io.decode(bam_path, cfg, None)
    native = _native_tuples(nd)
    return theirs, ours, native


def _assert_three_way(theirs, ours, native, expect_nonempty):
    for t in ("DEL", "INS", "DUP", "INV", "TRA"):
        assert ours[t] == theirs[t], t
        assert native[t] == theirs[t], t
    for t in expect_nonempty:
        assert theirs[t], "case failed to reach the targeted %s arm" % t


def test_two_segment_collinear_ins(refmain, tmp_path):
    """2-segment read-gap INS (cuteSV:243-249): read bases in excess of
    the reference gap between two collinear segments."""
    bam = str(tmp_path / "a.bam")
    # e1=[0,2000,10000,12000], e2=[2100,4000,12050,13950]: delta=50 INS
    _write_split_bam(bam, 6000, 10000, [(0, 2000), (4, 4000)],
                     [_sa("chr1", 12050, "+", "2100S1900M2000S")])
    theirs, ours, native = _extract_all_ways(bam, refmain)
    _assert_three_way(theirs, ours, native, ["INS"])
    assert theirs["INS"][0][0] == (12050 + 12000) / 2
    assert theirs["INS"][0][1] == 50


def test_two_segment_dup_overlap_ins(refmain, tmp_path):
    """2-segment reference-overlap with read-gap >= overlap: duplicated
    read bases emit an INS instead of a DUP (cuteSV:226-233), and the
    collinear INS rule fires too (cuteSV:243-249)."""
    bam = str(tmp_path / "b.bam")
    # e1=[0,2000,10000,12000], e2=[2500,4500,11900,13900]:
    # overlap=100 <= read gap 500 -> INS arm; then delta=600 INS again
    _write_split_bam(bam, 6000, 10000, [(0, 2000), (4, 4000)],
                     [_sa("chr1", 11900, "+", "2500S2000M1500S")])
    theirs, ours, native = _extract_all_ways(bam, refmain)
    _assert_three_way(theirs, ours, native, ["INS"])
    assert len(theirs["INS"]) == 2  # both arms fired
    assert theirs["DUP"] == []


def test_triple_middle_dup(refmain, tmp_path):
    """Collinear triple with a backward reference jump between segments
    2 and 3 -> DUP (cuteSV:342-348)."""
    bam = str(tmp_path / "c.bam")
    # e1=[0,1000,1000,2000] e2=[1100,2500,2100,3500] e3=[2600,4000,3300,4700]
    _write_split_bam(bam, 6000, 1000, [(0, 1000), (4, 5000)],
                     [_sa("chr1", 2100, "+", "1100S1400M3500S"),
                      _sa("chr1", 3300, "+", "2600S1400M2000S")])
    theirs, ours, native = _extract_all_ways(bam, refmain)
    _assert_three_way(theirs, ours, native, ["DUP"])
    assert (3300, 3500) == tuple(theirs["DUP"][0][:2])


def test_triple_collinear_ins_with_window_guard(refmain, tmp_path):
    """Collinear triple emitting the (e1,e2) INS under the ele_3 window
    guard (cuteSV:360-367) AND the trailing-pair INS of the final window
    (cuteSV:384-390)."""
    bam = str(tmp_path / "d.bam")
    # e1=[0,1000,1000,2000] e2=[1060,2000,2010,2950] e3=[2100,3000,3000,3900]
    _write_split_bam(bam, 6000, 1000, [(0, 1000), (4, 5000)],
                     [_sa("chr1", 2010, "+", "1060S940M4000S"),
                      _sa("chr1", 3000, "+", "2100S900M3000S")])
    theirs, ours, native = _extract_all_ways(bam, refmain)
    _assert_three_way(theirs, ours, native, ["INS"])
    poses = sorted(r[0] for r in theirs["INS"])
    assert poses == [(2010 + 2000) / 2, (3000 + 2950) / 2]


def test_mixed_strand_tail_ins(refmain, tmp_path):
    """++- window: the same-strand pair analysed in read orientation
    emits its INS (cuteSV:412-420)."""
    bam = str(tmp_path / "e.bam")
    # e1,e2 as above; e3 = [2100->? use later read span] strand '-'
    # '-' SA with first_clip=3000,last_clip=2100 -> [2100, 3000] read span
    _write_split_bam(bam, 6000, 1000, [(0, 1000), (4, 5000)],
                     [_sa("chr1", 2010, "+", "1060S940M4000S"),
                      _sa("chr1", 5000, "-", "3000S900M2100S")])
    theirs, ours, native = _extract_all_ways(bam, refmain)
    _assert_three_way(theirs, ours, native, ["INS"])
    assert theirs["INS"][0][0] == (2010 + 2000) / 2


def test_ins_within_translocation(refmain, tmp_path):
    """First/last-segment INS recovery across a translocated middle
    segment (cuteSV:439-457)."""
    bam = str(tmp_path / "f.bam")
    # e1=[0,1000,1000,2000,chr1] e2=[1050,2050,7000,8000,chr2]
    # e3=[2100,3000,2010,2910,chr1]: dis_ref=10, dis_read=1100, excess=1090
    _write_split_bam(bam, 6000, 1000, [(0, 1000), (4, 5000)],
                     [_sa("chr2", 7000, "+", "1050S1000M3950S"),
                      _sa("chr1", 2010, "+", "2100S900M3000S")])
    theirs, ours, native = _extract_all_ways(bam, refmain)
    _assert_three_way(theirs, ours, native, ["INS", "TRA"])
    assert (2000, 1090) == tuple(theirs["INS"][0][:2])


def test_trailing_hardclip_shift(refmain, tmp_path):
    """Trailing hard clips replace the soft-clip length for the primary
    segment (cuteSV:648-654) and shift nothing else; leading+trailing H
    with an SA tag."""
    bam = str(tmp_path / "g.bam")
    rng = random.Random(3)
    # 500H 2000M 60D 2000M 3500H ; qlen = 4000
    seq = "".join(rng.choice("ACGT") for _ in range(4000))
    with BamWriter(bam, REFS) as w:
        w.write("hc_read", 0, 0, 10000, 60,
                [(5, 500), (0, 2000), (2, 60), (0, 2000), (5, 3500)], seq,
                {"SA": _sa("chr1", 20000, "+", "4500S1000M2500S")})
    theirs, ours, native = _extract_all_ways(bam, refmain)
    _assert_three_way(theirs, ours, native, ["DEL"])


# ---------------------------------------------------------------------------
# Resolver edges: sentinel-shaped rows, min_support=1 flush paths, TRA
# multi-chr2 flush, INV mid-stream sub-cluster flush, remain_reads_ratio
# clamp (cuteSV_resolveINDEL.py:46-47,64,80-88; resolveDUP.py:38,52-60;
# resolveINV.py:59,74-82,126-163; resolveTRA.py:42-58,67-91).
# ---------------------------------------------------------------------------


def _store_case(sigs, n_reads=12, hi=120_000, extra_names=()):
    rng = random.Random(11)
    rows = sorted(
        [(0, hi, 1, "r%d" % i) for i in range(1, n_reads + 1)]
        + [(0, hi, 1, n) for n in extra_names])
    chroms = {c for per in sigs.values() for c in per}
    for per in sigs.get("TRA", {}).values():  # mate chroms need tables too
        chroms.update(r[2] for r in per)
    chroms = sorted(chroms)
    reads, census, tables, lengths = {}, {}, {}, {}
    for chrom in chroms:
        reads[chrom] = [r + (chrom,) for r in rows]
        census[chrom] = dict(
            start=np.array([r[0] for r in rows], np.int64),
            end=np.array([r[1] for r in rows], np.int64),
            is_primary=np.array([r[2] for r in rows], np.int8),
            name=[r[3] for r in rows])
        tables[chrom] = ReadTable([r[0] for r in rows],
                                  [r[1] for r in rows],
                                  [r[2] for r in rows],
                                  [r[3] for r in rows])
        lengths[chrom] = 1_000_000
    for t in ("DEL", "INS", "DUP", "INV", "TRA"):
        sigs.setdefault(t, {})
    return sigs, reads, census, tables, lengths


def _run_both(ref, tmp_path, sigs_dict, cfg_kw, engine="host",
              action=True):
    sigs, reads, census, tables, lengths = sigs_dict
    index = _write_ref_store(str(tmp_path), sigs, reads)
    cfg = Config(input="x.bam", reference="x.fa", output="o.vcf",
                 work_dir=str(tmp_path), genotype=action, engine=engine,
                 decoder="python", **cfg_kw)
    expected = _run_reference(ref, str(tmp_path), sigs, index, lengths,
                              tables, action, cfg)
    store = SigStore(sigs=sigs, census=census, read_tables=tables,
                     chrom_lengths=lengths, names=None)
    got = pipeline.resolve_all(store, cfg)
    drop = engine == "device"
    expected = _canon({c: r for c, r in expected.items() if r},
                      drop_names=drop)
    got = _canon({c: r for c, r in got.items() if r}, drop_names=drop)
    assert got == expected
    return expected


@pytest.mark.parametrize("engine", ["host", "device"])
def test_zero_zero_rows_are_sentinel_shaped(ref, tmp_path, engine):
    """Rows whose sentinel-checked coordinates are (0,0) are silently
    discarded by the reference's restart idiom — they must not poison the
    allele-split threshold (DEL mean) or support counts, for any type."""
    case = _store_case({
        "DEL": {"chr1": [(0, 0, "ra"), (0, 0, "rb"),
                         (20, 100, "r1"), (25, 170, "r2"),
                         (30, 240, "r3"), (31, 310, "r4")]},
        "INS": {"chr1": [(0, 0, "rc", ""), (0, 0, "rd", "ACGT"),
                         (40, 60, "r1", "A" * 60), (45, 62, "r2", "C" * 62),
                         (50, 61, "r3", "G" * 61), (52, 63, "r4", "T" * 63)]},
        "DUP": {"chr1": [(0, 0, "ra"), (0, 0, "re"),
                         (60, 5100, "r1"), (66, 5110, "r2"),
                         (70, 5090, "r3"), (75, 5105, "r4")]},
        "INV": {"chr1": [("++", 0, 0, "ra"),
                         ("++", 80, 6200, "r1"), ("++", 88, 6190, "r2"),
                         ("++", 90, 6210, "r3"), ("++", 95, 6205, "r4"),
                         ("--", 0, 0, "rb")]},
        "TRA": {"chr1": [("A", 0, "chr2", 0, "ra"), ("A", 0, "chr2", 0, "rb"),
                         ("A", 30, "chr2", 7000, "r1"),
                         ("A", 36, "chr2", 7010, "r2"),
                         ("A", 40, "chr2", 6995, "r3"),
                         ("A", 44, "chr2", 7005, "r4")]}},
        extra_names=["ra", "rb", "rc", "rd", "re"])
    exp = _run_both(ref, tmp_path, case, dict(min_support=4), engine=engine)
    # the poisoned-threshold DEL call must exist (guards case relevance)
    assert any(r[1] == "DEL" for rows in exp.values() for r in rows)


def test_min_support_one_sentinel_flush(ref, tmp_path):
    """read_count=1: the seeded cluster reaches the flush length gate with
    the sentinel as its only element (the `pass` arms,
    cuteSV_resolveINDEL.py:63-64,87-88 and per-type analogs), including a
    chromosome whose stream is entirely sentinel-shaped."""
    case = _store_case({
        "DEL": {"chr1": [(500, 40, "r1")],
                "chr2": [(0, 0, "ra")]},
        "INS": {"chr1": [(700, 50, "r1", "A" * 50)]},
        "DUP": {"chr1": [(900, 6000, "r1")]},
        "INV": {"chr1": [("++", 1000, 7000, "r1")]},
        "TRA": {"chr1": [("B", 1200, "chr2", 3000, "r1")]}},
        extra_names=["ra"])
    _run_both(ref, tmp_path, case, dict(min_support=1))


def test_tra_multi_chr2_flush_and_remain_ratio_clamp(ref, tmp_path):
    """One chr1 TRA block spanning several chr2 groups exercises the
    chr2-change flush (cuteSV_resolveTRA.py:41-59); remain_reads_ratio
    above 1 must clamp to 1 (cuteSV_resolveINDEL.py:46-47,252-253)."""
    tra = []
    for chr2, base in (("chr2", 5000), ("chr3", 9000), ("chr4", 2000)):
        for k in range(5):
            tra.append(("C", 100 + 7 * k, chr2, base + 11 * k, "r%d" % (k + 1)))
    tra.sort(key=lambda r: (r[2], r[0], r[1], r[3], r[4]))
    case = _store_case({
        "DEL": {"chr1": [(20 + i, 100 + (i % 3), "r%d" % (i + 1))
                         for i in range(8)]},
        "INS": {"chr1": [(40 + i, 60 + (i % 4), "r%d" % (i + 1), "A" * 64)
                         for i in range(8)]},
        "TRA": {"chr1": tra}})
    exp = _run_both(ref, tmp_path, case,
                    dict(min_support=4, remain_reads_ratio=1.5))
    # TRA rows carry the breakend ALT in column 1; one per chr2 group
    assert sum("[" in str(r[1]) or "]" in str(r[1])
               for rows in exp.values() for r in rows) == 3


def test_inv_mid_stream_subcluster_flush(ref, tmp_path):
    """An INV cluster whose bp2 values split into two sub-clusters emits
    the FIRST sub-cluster mid-stream (cuteSV_resolveINV.py:124-163), not
    only at the final flush."""
    rows = ([("++", 100 + 3 * k, 6000 + 5 * k, "r%d" % (k + 1))
             for k in range(5)]
            + [("++", 118 + 3 * k, 40_000 + 5 * k, "r%d" % (k + 6))
               for k in range(5)])
    rows.sort(key=lambda r: (r[0], r[1], r[2], r[3]))
    case = _store_case({"INV": {"chr1": rows}})
    exp = _run_both(ref, tmp_path, case, dict(min_support=4))
    assert sum(r[1] == "INV" for rows in exp.values() for r in rows) == 2


# ---------------------------------------------------------------------------
# Genotype-layer edges: the cal_GL closed form over the full rescaled grid
# (incl. the hardcoded (3,1)/(6,2) shortcuts, cuteSV_genotype.py:34-37, and
# the >100-read rescale, :25-31), the TRA coverage early-exit at the
# threshold_ref_count upper bound (:70,:88), overlap_cover's read-start==
# sv-end skip and late overlap-set creation (:119,:121), and call_gt on an
# empty candidate list (cuteSV_resolveINDEL.py:443-444).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def refgen(ref):
    sys.path.insert(0, REF_SRC)
    try:
        import cuteSV.cuteSV_genotype as rgen
        yield rgen
    finally:
        try:  # at interpreter shutdown sys may already be torn down
            sys.path.remove(REF_SRC)
        except Exception:
            pass


def test_cal_gl_grid_matches_reference(refgen):
    """Exhaustive (DR, DV) differential: our precomputed GL table vs the
    reference's cal_GL over the full <=100-read grid plus rescale
    triggers."""
    from cutesv_tpu.genotype import gl_table

    table = gl_table()
    pairs = [(dr, dv) for dr in range(0, 101, 1) for dv in range(0, 101, 7)]
    pairs += [(3, 1), (6, 2), (0, 0), (350, 50), (120, 480), (1000, 1),
              (1, 1000), (101, 0), (0, 101), (57, 62)]
    for dr, dv in pairs:
        gt, pl, gq, qual = refgen.cal_GL(dr, dv)
        ours = table.lookup(dr, dv)
        assert ours == (gt, pl, gq, qual), (dr, dv)


def test_tra_coverage_upper_bound_early_exit(ref, tmp_path):
    """A TRA cluster with 16 support reads sets up_bound = 5*16
    (threshold_ref_count:70); 90 fully-covering census reads trip the
    early exit (count_coverage:86-89) in both implementations."""
    n_sup = 16
    tra = [("A", 5000 + 2 * k, "chr2", 40_000 + 3 * k, "s%02d" % k)
           for k in range(n_sup)]
    case = _store_case({"TRA": {"chr1": tra}})
    sigs, reads, census, tables, lengths = case
    # dense covering reads around pos1 5000 on chr1 (fetch window is
    # pos1 +- max_cluster_bias): strict covers of [4950, 5100)
    rows = sorted([(1000 + 3 * k, 9000 + k, 1, "c%03d" % k)
                   for k in range(90)]
                  + [(0, 120_000, 1, "s%02d" % k) for k in range(n_sup)])
    reads["chr1"] = [r + ("chr1",) for r in rows]
    census["chr1"] = dict(
        start=np.array([r[0] for r in rows], np.int64),
        end=np.array([r[1] for r in rows], np.int64),
        is_primary=np.array([r[2] for r in rows], np.int8),
        name=[r[3] for r in rows])
    tables["chr1"] = ReadTable([r[0] for r in rows], [r[1] for r in rows],
                               [r[2] for r in rows], [r[3] for r in rows])
    exp = _run_both(ref, tmp_path, (sigs, reads, census, tables, lengths),
                    dict(min_support=8))
    assert any("[" in str(r[1]) for rows_ in exp.values() for r in rows_)


def test_overlap_cover_boundary_and_late_overlap(ref, tmp_path):
    """DEL genotype window whose census has (a) no reads open at the
    window start but reads starting inside (overlap-set creation on a
    read-left event, cuteSV_genotype.py:120-122) and (b) a read starting
    exactly at the window end (the == skip, :118-119)."""
    dels = [(5000, 80, "r%d" % (k + 1)) for k in range(4)]
    case = _store_case({"DEL": {"chr1": dels}}, n_reads=0)
    sigs, reads, census, tables, lengths = case
    # window = (5000-200, 5000+200) with default DEL bias 200
    rows = sorted([
        (4900, 30_000, 1, "r1"),   # starts inside the window (late overlap)
        (4950, 30_000, 1, "r2"),
        (5200, 30_000, 1, "rX"),   # read start == window end: skipped
        (5150, 30_000, 1, "r3"),
        (6000, 30_000, 1, "r4"),
    ])
    reads["chr1"] = [r + ("chr1",) for r in rows]
    census["chr1"] = dict(
        start=np.array([r[0] for r in rows], np.int64),
        end=np.array([r[1] for r in rows], np.int64),
        is_primary=np.array([r[2] for r in rows], np.int8),
        name=[r[3] for r in rows])
    tables["chr1"] = ReadTable([r[0] for r in rows], [r[1] for r in rows],
                               [r[2] for r in rows], [r[3] for r in rows])
    exp = _run_both(ref, tmp_path, (sigs, reads, census, tables, lengths),
                    dict(min_support=4, max_cluster_bias_DEL=200))
    assert any(r[1] == "DEL" for rows_ in exp.values() for r in rows_)


def test_call_gt_on_empty_candidates(ref, tmp_path):
    """All alleles fail support (4 sigs from ONE read dedup to 1):
    resolution still calls call_gt with zero candidates
    (cuteSV_resolveINDEL.py:441-444)."""
    dels = [(5000 + k, 60 + k, "r1") for k in range(4)]
    case = _store_case({"DEL": {"chr1": dels}})
    exp = _run_both(ref, tmp_path, case, dict(min_support=4))
    assert exp == {}


# ---------------------------------------------------------------------------
# Emission edges (generate_output, cuteSV_genotype.py:242-468): ungenotyped
# runs (the i[11]=='.' PASS arms), emission-time size filters (:263-266,
# :315-316,:351-352), the AF='.' fallback on unparseable DR, the BND
# REF-base 'N' fallback for out-of-contig positions (:429-443), and the
# 1000-line batch pickle flush (:459-461).
# ---------------------------------------------------------------------------


def _emit_both(ref, tmp_path, rows, genotype, seed=0, contig_len=150_000):
    """Reference generate_output + SVID merge vs our emitter on the exact
    same candidate rows; returns the (equal) VCF body lines."""
    import pickle

    import cuteSV.cuteSV_genotype as rgen

    from cutesv_tpu import vcf as ourvcf
    from cutesv_tpu.io.fasta import FastaFile
    from test_reference_differential import _FakeFastaFile, _random_genome

    rng = random.Random(seed)
    genome = _random_genome(rng, sorted(rows), contig_len)
    cfg = Config(input="x.bam", reference="x.fa", output="o.vcf",
                 work_dir=str(tmp_path), genotype=genotype, engine="host",
                 decoder="python", min_support=4)
    fa_token = os.path.join(str(tmp_path), "fa_token")
    _FakeFastaFile.registry[fa_token] = genome
    sys.modules["pysam"].FastaFile = _FakeFastaFile
    args_ns = types.SimpleNamespace(
        genotype=genotype, max_size=cfg.max_size, min_size=cfg.min_size,
        report_readid=False, ignore_sequence=False)
    resdir = os.path.join(str(tmp_path), "results")
    if not os.path.isdir(resdir):
        os.mkdir(resdir)
    for chrom in sorted(rows):
        rgen.generate_output(args_ns, [list(r) for r in rows[chrom]],
                             fa_token, chrom, str(tmp_path) + os.sep)
    svid = {"INS": 0, "DEL": 0, "BND": 0, "DUP": 0, "INV": 0}
    expected = []
    for chrom in sorted(rows):
        with open(os.path.join(resdir, "%s.pickle" % chrom), "rb") as fh:
            while True:
                try:
                    lines = pickle.load(fh)
                except EOFError:
                    break
                for svtype, line in lines:
                    expected.append(line.replace("<SVID>",
                                                 str(svid[svtype])))
                    svid[svtype] += 1
    fa_path = os.path.join(str(tmp_path), "ref.fa")
    with open(fa_path, "w") as fh:
        for c in sorted(genome):
            fh.write(">%s\n" % c)
            s = genome[c]
            for k in range(0, len(s), 70):
                fh.write(s[k:k + 70] + "\n")
    fasta = FastaFile(fa_path)
    per_chrom = {c: ourvcf.format_chrom_records(
        cfg, [list(r) for r in rows[c]], fasta.fetch_lazy(c), c)
        for c in rows}
    out = os.path.join(str(tmp_path), "our.vcf")
    ourvcf.write_vcf(out, cfg, per_chrom,
                     [(c, contig_len) for c in sorted(genome)], ["t"])
    got = [l + "\n" for l in open(out).read().splitlines()
           if not l.startswith("#")]
    assert got == expected
    return expected


def _resolver_rows(ref, tmp_path, action, seed=0):
    from test_reference_differential import _build_case
    sigs, reads, census, tables, lengths = _build_case(800 + seed)
    index = _write_ref_store(str(tmp_path), sigs, reads)
    cfg = Config(input="x.bam", reference="x.fa", output="o.vcf",
                 work_dir=str(tmp_path), genotype=action, engine="host",
                 decoder="python", min_support=4)
    rows = _run_reference(ref, str(tmp_path), sigs, index, lengths,
                          tables, action, cfg)
    return {c: r for c, r in rows.items() if r}


def test_emission_ungenotyped_run(ref, tmp_path):
    """Full emission differential over action=False resolver rows: the
    QUAL=='.' PASS arms and no-AF assembly for every SV type."""
    rows = _resolver_rows(ref, tmp_path, action=False)
    assert sum(len(r) for r in rows.values()) > 10
    body = _emit_both(ref, tmp_path, rows, genotype=False)
    assert all("\tPASS\t" in l for l in body)
    assert not any(";AF=" in l for l in body)


def test_emission_size_filters_af_fallback_bnd_n_and_batching(ref,
                                                              tmp_path):
    """Mutated resolver rows: out-of-range DEL/INS/INV sizes are dropped
    at emission time, '.'-genotyped rows under --genotype fall back to
    AF=. with PASS, a BND whose position exceeds the contig takes the 'N'
    REF fallback, and >1000 rows per chromosome cross the batch flush."""
    rows = _resolver_rows(ref, tmp_path, action=True)
    chrom = max(rows, key=lambda c: len(rows[c]))
    base = [list(r) for r in rows[chrom]]
    dels = [r for r in base if r[1] == "DEL"]
    inss = [r for r in base if r[1] == "INS"]
    bnds = [r for r in base if "[" in str(r[1]) or "]" in str(r[1])]
    assert dels and inss and bnds
    crafted = []
    tiny_del = list(dels[0]); tiny_del[3] = "-5"          # < min_size
    huge_del = list(dels[0]); huge_del[3] = "-200000"     # > max_size
    huge_ins = list(inss[0]); huge_ins[3] = "200000"
    dotted = list(dels[0])
    dotted[7], dotted[8], dotted[9], dotted[10], dotted[11] = (
        ".", "./.", ".,.,.", ".", ".")                    # AF=. + PASS
    far_bnd = list(bnds[0])
    far_bnd[2] = 149_990 + 500                            # beyond contig
    crafted += [tiny_del, huge_del, huge_ins, dotted, far_bnd]
    # batch flush: >1000 rows on one chromosome
    for k in range(1100):
        r = list(dels[0])
        r[2] = str(10_000 + 3 * k)
        crafted.append(r)
    body = _emit_both(ref, tmp_path, {chrom: base + crafted},
                      genotype=True)
    assert any(";AF=." in l for l in body)            # dotted row fell back
    assert not any("SVLEN=-5;" in l or "SVLEN=-200000;" in l
                   or "SVLEN=200000;" in l for l in body)  # size-dropped
    assert any("\t150490\t" in l for l in body)       # far BND emitted ('N')
    assert len(body) > 1100                           # batch flush crossed


# ---------------------------------------------------------------------------
# Force-calling edges (cuteSV_forcecalling.py): parse_record variants over
# pysam-typed records (:41-101), the multi-allelic KMeans accept arms for
# DEL and INS (:326-361,:435-472), the allele-window fallbacks
# (:309-317,:417-426,:487-493), empty match returns (:168,:211,:233),
# dispatch bucketing (:497-513,:563), missing-reads chromosomes
# (:582-583), read_range arms (:631-641), and non-SV-type skips (:531).
# ---------------------------------------------------------------------------

from test_reference_differential import _canon_fc, reffc  # noqa: F401,E402


def test_fc_parse_record_variants(reffc, tmp_path):
    """Function-level differential of parse_record vs our text parser over
    pysam-typed records: svlen from allele lengths, END fallback chains,
    CHR2/STRANDS(tuple)/SEQ INFO handling, TRA/NA svtypes, malformed BND
    ALT."""
    from cutesv_tpu.forcecalling import parse_vcf_records

    cases = [
        # (ref, alts, info) — pysam-typed info on the reference side
        ("ACGTACGTA", "A", {"SVTYPE": "DEL"}),                 # svlen=|8|
        ("A", "ACGTAC", {"SVTYPE": "INS"}),                    # svlen=5
        ("N", "<INS>", {"SVTYPE": "INS", "SVLEN": 120,
                        "SEQ": "T" * 120}),                    # SEQ->alts
        ("N", "<DEL>", {"SVTYPE": "DEL", "SVLEN": ("80",),
                        "SEQ": "G" * 80}),                     # SEQ->ref
        ("N", "<INS>", {"SVTYPE": "INS", "SVLEN": "90"}),      # end=start+len
        ("N", "N[chr2:7000[", {"SVTYPE": "TRA"}),              # TRA svtype
        ("N", "N]chr2:7000]", {"SVTYPE": "BND",
                               "CHR2": "chrM", "END": "9000"}),  # CHR2 wins
        ("N", "<INV>", {"SVTYPE": "INV", "SVLEN": "400",
                        "STRANDS": ("++", "--")}),             # tuple strand
        ("N", "<DUP>", {"SVTYPE": "DUP", "SVLEN": "300",
                        "STRAND": "-+"}),
        ("N", "<CNV>", {"SVTYPE": "CNV", "SVLEN": "500"}),     # NA
        ("N", "N", {"SVTYPE": "BND"}),                         # malformed ALT
    ]
    vcf_lines = ["##fileformat=VCFv4.2\n",
                 "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"]
    expected = []
    for k, (ref_a, alt, info) in enumerate(cases):
        rec = types.SimpleNamespace(
            chrom="chr1", pos=1000 * (k + 1), id="v%d" % k, ref=ref_a,
            alts=(alt,), info=info)
        expected.append(reffc.fc.parse_record(rec))
        def render(v):
            if isinstance(v, tuple):
                return ",".join(str(x) for x in v)
            return str(v)
        info_s = ";".join("%s=%s" % (k2, render(v)) for k2, v in info.items())
        vcf_lines.append("chr1\t%d\tv%d\t%s\t%s\t.\tPASS\t%s\n"
                         % (1000 * (k + 1), k, ref_a, alt, info_s))
    path = os.path.join(str(tmp_path), "rec.vcf")
    with open(path, "w") as fh:
        fh.writelines(vcf_lines)
    got = list(parse_vcf_records(path))
    assert len(got) == len(expected)
    for ours, theirs in zip(got, expected):
        assert tuple(ours) == tuple(theirs), theirs


def _fc_case(ref, reffc, tmp_path, records, sigs, read_rows_by_chrom,
             read_range=500, sigs_index_none=False):
    """Hand-written ivcf + crafted sig store through both force callers."""
    import pickle
    from dataclasses import replace

    from cutesv_tpu import forcecalling

    for t in ("DEL", "INS", "DUP", "INV", "TRA"):
        sigs.setdefault(t, {})
    reads, census, tables, lengths = {}, {}, {}, {}
    all_chroms = sorted(set(read_rows_by_chrom)
                        | {c for per in sigs.values() for c in per}
                        | {r.split("\t")[0] for r in records})
    for chrom in all_chroms:
        rows = sorted(read_rows_by_chrom.get(chrom, []))
        if rows:
            reads[chrom] = [r + (chrom,) for r in rows]
        census[chrom] = dict(
            start=np.array([r[0] for r in rows], np.int64),
            end=np.array([r[1] for r in rows], np.int64),
            is_primary=np.array([r[2] for r in rows], np.int8),
            name=[r[3] for r in rows])
        tables[chrom] = ReadTable([r[0] for r in rows],
                                  [r[1] for r in rows],
                                  [r[2] for r in rows],
                                  [r[3] for r in rows])
        lengths[chrom] = 1_000_000
    index = _write_ref_store(str(tmp_path), sigs, reads)
    ivcf = os.path.join(str(tmp_path), "in.vcf")
    with open(ivcf, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for r in records:
            fh.write(r + "\n")
    fa_path = os.path.join(str(tmp_path), "ref.fa")
    with open(fa_path, "w") as fh:
        for c in all_chroms:
            fh.write(">%s\nACGT\n" % c)
    cfg = Config(input="x.bam", reference=fa_path, output="o.vcf",
                 work_dir=str(tmp_path), genotype=True, engine="host",
                 decoder="python", min_support=4, read_range=read_range,
                 Ivcf=ivcf)
    bias = {"INS": cfg.max_cluster_bias_INS, "DEL": cfg.max_cluster_bias_DEL,
            "DUP": cfg.max_cluster_bias_DUP, "INV": cfg.max_cluster_bias_INV,
            "TRA": cfg.max_cluster_bias_TRA}
    gloab = {"INS": cfg.diff_ratio_merging_INS,
             "DEL": cfg.diff_ratio_merging_DEL}
    idx_arg = index
    if sigs_index_none:
        with open(os.path.join(str(tmp_path), "sigindex.pickle"),
                  "wb") as fh:
            pickle.dump(index, fh)
        idx_arg = None
    expected = reffc.fc.force_calling_chrom(
        ivcf, str(tmp_path) + os.sep, bias, gloab, cfg.gt_round,
        cfg.read_range, 2, idx_arg)
    store = SigStore(sigs=sigs, census=census, read_tables=tables,
                     chrom_lengths=lengths, names=None)
    got = forcecalling.force_call(cfg, ["t"], store=store)["result"]
    expected = _canon_fc({c: r for c, r in expected.items() if r})
    got = _canon_fc({c: r for c, r in got.items() if r})
    assert got == expected
    return expected


def test_fc_multiallele_kmeans_and_fallbacks(ref, reffc, tmp_path):
    """Duplicate-position records trigger the KMeans bimodal split; both
    accept arms (front/back) exercised for DEL and INS, plus the
    allele_idx==-1 window filter and the empty-allele fallback."""
    ins_seq = lambda n: "A" * n
    del_sigs = (
        [(4998 + k, 100, "d%02d" % k) for k in range(6)]
        + [(5001 + k, 130, "d%02d" % (k + 6)) for k in range(6)]
        # pos 12000: one allele [120,170] whose mean fails the 0.7 ratio
        + [(12000, 120, "e1"), (12003, 170, "e2")]
        # pos 21000 has NO nearby sigs; these sit far beyond 2*bias
        + [(26000, 90, "f1")])
    ins_sigs = (
        [(7998 + k, 100, "i%02d" % k, ins_seq(100)) for k in range(6)]
        + [(8001 + k, 130, "i%02d" % (k + 6), ins_seq(130))
           for k in range(6)]
        + [(15000, 120, "g1", ins_seq(120)), (15003, 170, "g2",
                                              ins_seq(170))]
        + [(18000, 300, "h1", ins_seq(300)), (18004, 300, "h2",
                                              ins_seq(300))])
    del_sigs.sort()
    ins_sigs.sort()
    records = [
        "chr1\t5000\tm0\tN\t<DEL>\t.\tPASS\tSVTYPE=DEL;SVLEN=-100;END=5100",
        "chr1\t5000\tm1\tN\t<DEL>\t.\tPASS\tSVTYPE=DEL;SVLEN=-130;END=5130",
        "chr1\t8000\tm2\tN\t<INS>\t.\tPASS\tSVTYPE=INS;SVLEN=100;END=8000",
        "chr1\t8000\tm3\tN\t<INS>\t.\tPASS\tSVTYPE=INS;SVLEN=130;END=8000",
        "chr1\t12000\tm4\tN\t<DEL>\t.\tPASS\tSVTYPE=DEL;SVLEN=-100;END=12100",
        "chr1\t15000\tm5\tN\t<INS>\t.\tPASS\tSVTYPE=INS;SVLEN=100;END=15000",
        "chr1\t18000\tm6\tN\t<INS>\t.\tPASS\tSVTYPE=INS;SVLEN=100;END=18000",
        "chr1\t21000\tm7\tN\t<DEL>\t.\tPASS\tSVTYPE=DEL;SVLEN=-100;END=21100",
        "chr1\t23000\tm8\tN\t<DUP>\t.\tPASS\tSVTYPE=DUP;SVLEN=400;END=23400",
        "chr2\t3000\tm9\tN\t<INS>\t.\tPASS\tSVTYPE=INS;SVLEN=50;END=3000",
        "chr1\t25000\tmA\tN\t<CNV>\t.\tPASS\tSVTYPE=CNV;SVLEN=500;END=25500",
    ]
    rows = [(100 + 7 * k, 40_000 + k, 1, "c%03d" % k) for k in range(40)]
    exp = _fc_case(ref, reffc, tmp_path,
                   records, {"DEL": {"chr1": del_sigs},
                             "INS": {"chr1": ins_sigs}},
                   {"chr1": rows, "chr2": rows})
    out_ids = [r[9] for rows_ in exp.values() for r in rows_]
    assert len(out_ids) == 10  # CNV skipped, everything else regenotyped


def test_fc_dispatch_buckets_and_missing_reads(ref, reffc, tmp_path):
    """reads_count >=10000 starts a new dispatch bucket; a bucket whose
    chromosomes carry no SVs is skipped; a chromosome with SVs but no
    reads at all dispatches into bucket 0 and regenotypes against an
    empty census; sigs_index=None reloads from sigindex.pickle."""
    records = [
        "chr1\t5000\tv0\tN\t<DEL>\t.\tPASS\tSVTYPE=DEL;SVLEN=-100;END=5100",
        "chrNR\t7000\tv1\tN\t<INS>\t.\tPASS\tSVTYPE=INS;SVLEN=80;END=7000",
    ]
    del_sigs = [(4998 + k, 100, "d%02d" % k) for k in range(6)]
    ins_sigs = [(7000 + k, 80, "n%02d" % k, "A" * 80) for k in range(5)]
    rows_small = [(100 + 7 * k, 40_000 + k, 1, "c%03d" % k)
                  for k in range(40)]
    rows_big1 = [(50 + k, 30_000 + k, 1, "b%05d" % k) for k in range(10_010)]
    rows_big2 = [(60 + k, 31_000 + k, 1, "B%05d" % k) for k in range(10_020)]
    exp = _fc_case(ref, reffc, tmp_path, records,
                   {"DEL": {"chr1": del_sigs}, "INS": {"chrNR": ins_sigs}},
                   {"chr1": rows_small, "chrB1": rows_big1,
                    "chrB2": rows_big2},
                   sigs_index_none=True)
    assert sum(len(r) for r in exp.values()) == 2


def test_fc_read_range_arms(ref, reffc, tmp_path):
    """read_range < 500 uses the +-max_cluster_bias DEL search window
    (solve_fc:634-635) instead of the svlen/5-trimmed window."""
    records = [
        "chr1\t5000\tv0\tN\t<DEL>\t.\tPASS\tSVTYPE=DEL;SVLEN=-800;END=5800",
    ]
    del_sigs = [(4995 + 2 * k, 800 + k, "d%02d" % k) for k in range(6)]
    rows = [(4000 + 11 * k, 20_000 + k, 1, "c%03d" % k) for k in range(60)]
    for rr in (300, 500):
        d = tmp_path / ("rr%d" % rr)
        d.mkdir()
        exp = _fc_case(ref, reffc, d, records,
                       {"DEL": {"chr1": list(del_sigs)}},
                       {"chr1": list(rows)}, read_range=rr)
        assert sum(len(r) for r in exp.values()) == 1


# ---------------------------------------------------------------------------
# Final batch: INV mid-stream sub-cluster flush done right (the resolution
# loop's bp2 break is SIGNED, so the bimodal bp2 must DESCEND in stream
# order, cuteSV_resolveINV.py:56), sentinel tails for the remaining types,
# the TRA iteration-cap low-primary-ratio early exit
# (cuteSV_genotype.py:86-91), the INS allele-window fallback
# (cuteSV_forcecalling.py:417-426), literal '<TRA>' ALT seq rebuilding
# (solve_fc:668-669), generate_pvcf edge rows, and load_bed.
# ---------------------------------------------------------------------------


def test_inv_mid_stream_subcluster_flush_fixed(ref, tmp_path):
    """bp1 ascends while bp2 goes HIGH then LOW: the resolution loop's
    signed bp2-gap check keeps one semi cluster, and the bp2-sorted
    sub-clustering flushes the low group mid-stream
    (cuteSV_resolveINV.py:124-163)."""
    rows = ([("++", 100 + 3 * k, 40_000 + 5 * k, "r%d" % (k + 1))
             for k in range(5)]
            + [("++", 115 + 3 * k, 6_000 + 5 * k, "r%d" % (k + 6))
               for k in range(5)])
    case = _store_case({"INV": {"chr1": rows}})
    exp = _run_both(ref, tmp_path, case, dict(min_support=4))
    assert sum(r[1] == "INV" for rows_ in exp.values() for r in rows_) == 2


def test_sentinel_tails_all_types(ref, tmp_path):
    """min_support=1 with sentinel-shaped rows as entire streams or at
    flush boundaries: INS final-flush pass (resolveINDEL:298), DUP
    final-flush pass (resolveDUP:60), INV restart + final pass
    (resolveINV:74-82), TRA chr2-change flush pass and final pass with a
    real (0,0) row (resolveTRA:44-45,90-91)."""
    case = _store_case({
        "INS": {"chr2": [(0, 0, "ra", "")]},
        "DUP": {"chr2": [(0, 0, "ra")]},
        "INV": {"chr1": [("++", 0, 0, "ra"), ("++", 5, 400, "r1")],
                "chr2": [("--", 0, 0, "rb")]},
        "TRA": {"chr1": [("A", 0, "chr2", 0, "r1"),
                         ("A", 100, "chr3", 5000, "r2")],
                "chr2": [("A", 0, "chr4", 0, "rz")]}},
        extra_names=["ra", "rb", "rz"])
    _run_both(ref, tmp_path, case, dict(min_support=1))


def test_tra_iteration_cap_low_primary_ratio(ref, tmp_path):
    """count_coverage hits gt_round with <=20% primaries -> status=1 via
    the iteration-cap arm (cuteSV_genotype.py:86-88), counting only the
    reads seen so far."""
    tra = [("B", 5000 + 2 * k, "chr2", 40_000 + 3 * k, "s%d" % k)
           for k in range(4)]
    case = _store_case({"TRA": {"chr1": tra}}, n_reads=0)
    sigs, reads, census, tables, lengths = case
    # 200 supplementaries + 12 primaries overlap the pos1 window; at
    # gt_round=40 the primary ratio is ~0.05 <= 0.2
    rows = sorted(
        [(4000 + k, 9000 + k, 0, "sup%03d" % k) for k in range(200)]
        + [(4500 + 17 * k, 9500 + k, 1, "pri%02d" % k) for k in range(12)]
        + [(0, 120_000, 1, "s%d" % k) for k in range(4)])
    reads["chr1"] = [r + ("chr1",) for r in rows]
    census["chr1"] = dict(
        start=np.array([r[0] for r in rows], np.int64),
        end=np.array([r[1] for r in rows], np.int64),
        is_primary=np.array([r[2] for r in rows], np.int8),
        name=[r[3] for r in rows])
    tables["chr1"] = ReadTable([r[0] for r in rows], [r[1] for r in rows],
                               [r[2] for r in rows], [r[3] for r in rows])
    exp = _run_both(ref, tmp_path, (sigs, reads, census, tables, lengths),
                    dict(min_support=4, gt_round=40))
    assert any("]" in str(r[1]) for rows_ in exp.values() for r in rows_)


def test_fc_ins_allele_window_fallback_and_literal_tra(ref, reffc,
                                                       tmp_path):
    """INS with no allele within the 0.7 mean ratio falls back to the
    0.7-window filter over the last allele (find_in_indel_list:417-426);
    a literal '<TRA>' ALT rebuilds seq as chr2:pos (solve_fc:668-669)."""
    records = [
        "chr1\t5000\tv0\tN\t<INS>\t.\tPASS\tSVTYPE=INS;SVLEN=100;END=5000",
        "chr1\t9000\tv1\tN\t<TRA>\t.\tPASS\tSVTYPE=TRA;CHR2=chr2;END=7700",
    ]
    # merged allele [140,175] (bias 0.3*140=42 >= 35): mean 157.5 fails
    # 0.7 vs target 100; window [70,142.86] keeps only 140
    ins_sigs = [(5000, 140, "g1", "A" * 140), (5004, 175, "g2", "A" * 175)]
    tra_sigs = [("A", 8995 + 3 * k, "chr2", 7700 + 2 * k, "t%d" % k)
                for k in range(4)]
    rows = [(100 + 7 * k, 40_000 + k, 1, "c%03d" % k) for k in range(30)]
    exp = _fc_case(ref, reffc, tmp_path, records,
                   {"INS": {"chr1": ins_sigs}, "TRA": {"chr1": tra_sigs}},
                   {"chr1": rows, "chr2": rows})
    rows_out = [r for rows_ in exp.values() for r in rows_]
    assert any(r[13] == "chr2:7700" for r in rows_out)  # literal <TRA> seq


def test_fc_pvcf_edge_rows(ref, reffc, tmp_path):
    """generate_pvcf edges on identical crafted rows through both
    emitters: empty rows are skipped (:485-486), '.'-QUAL rows take PASS
    (:487-488), over-max sizes are dropped per type (:492-493,:533-535,
    :572-573,:602-603), zero-read AF falls back to '.' (:515-516 etc.),
    and a nonzero BND SVLEN is echoed (:640-641)."""
    from cutesv_tpu import forcecalling
    from cutesv_tpu.io.fasta import FastaFile

    records = [
        "chr1\t4000\tw0\tN\t<INS>\t.\tPASS\tSVTYPE=INS;SVLEN=120;END=4000",
        "chr1\t5000\tw1\tN\t<INS>\t.\tPASS\tSVTYPE=INS;SVLEN=200000;END=5000",
        "chr1\t6000\tw2\tN\t<DEL>\t.\tPASS\tSVTYPE=DEL;SVLEN=-200000;END=206000",
        "chr1\t7000\tw3\tN\t<DUP>\t.\tPASS\tSVTYPE=DUP;SVLEN=200000;END=207000",
        "chr1\t8000\tw4\tN\t<INV>\t.\tPASS\tSVTYPE=INV;SVLEN=200000;END=208000",
        "chr1\t9000\tw5\tN\tN]chr2:7700]\t.\tPASS\tSVTYPE=BND;SVLEN=150",
    ]
    ins_sigs = [(4000 + k, 120, "i%d" % k, "A" * 120) for k in range(4)]
    # no covering reads anywhere near 4000: RE>0 but DR=0 still yields AF;
    # zero-zero AF comes from w5 (no TRA sigs, no reads at 9000)
    rows = [(100, 300, 1, "c0")]
    exp = _fc_case(ref, reffc, tmp_path, records,
                   {"INS": {"chr1": ins_sigs}},
                   {"chr1": rows, "chr2": rows})
    merged = []
    for c in sorted(exp):
        merged.extend(exp[c])
    merged.append([])  # the empty-row skip (:485-486)
    genome = {"chr1": "ACGTACGTAC" * 2000, "chr2": "ACGT" * 5000}
    from test_reference_differential import _FakeFastaFile
    fa_token = os.path.join(str(tmp_path), "fa_token2")
    _FakeFastaFile.registry[fa_token] = genome
    sys.modules["pysam"].FastaFile = _FakeFastaFile
    args_ns = types.SimpleNamespace(genotype=True, max_size=100_000,
                                    min_size=30, report_readid=False,
                                    ignore_sequence=False)
    exp_lines = reffc.gen.generate_pvcf(args_ns, merged, fa_token, "chr1")
    fa_path = os.path.join(str(tmp_path), "ref2.fa")
    with open(fa_path, "w") as fh:
        for c in sorted(genome):
            fh.write(">%s\n%s\n" % (c, genome[c]))
    cfg = Config(input="x.bam", reference=fa_path, output="o.vcf",
                 work_dir=str(tmp_path), genotype=True, min_support=4)
    fasta = FastaFile(fa_path)
    our_lines = forcecalling.generate_pvcf_lines(cfg, merged,
                                                 fasta.fetch_lazy("chr1"))
    assert our_lines == exp_lines
    body = "".join(exp_lines)
    assert "SVLEN=150" in body          # BND SVLEN echoed
    assert ";AF=." in body              # zero-read AF fallback
    assert "w1" not in body and "w2" not in body  # size-dropped
    assert "w3" not in body and "w4" not in body


def test_load_bed_matches_reference(refgen, tmp_path):
    """load_bed (cuteSV_genotype.py:704-726) vs our load_bed_regions: the
    same +-1000 padding and per-chrom (start,end) sort; the reference's
    per-task assignment equals overlap-filtering our per-chrom lists."""
    from cutesv_tpu.pipeline import load_bed_regions

    bed = os.path.join(str(tmp_path), "r.bed")
    with open(bed, "w") as fh:
        fh.write("chr1\t5000\t9000\n")
        fh.write("chr1\t1000\t2000\n")
        fh.write("chr2\t50\t70\n")
        fh.write("chr1\t5000\t5100\n")
    tasks = [["chr1", 0, 6000], ["chr1", 6000, 12_000], ["chr2", 0, 9000],
             ["chr3", 0, 5000]]
    ref_regions = refgen.load_bed(bed, tasks)
    ours = load_bed_regions(bed)
    for i, task in enumerate(tasks):
        chrom, lo, hi = task
        mine = [r for r in ours.get(chrom, [])
                if (lo <= r[0] < hi) or r[0] <= lo < r[1]]
        assert sorted(ref_regions[i]) == sorted(mine), task
    assert refgen.load_bed(None, tasks) is None


def test_call_gt_reads_less_chromosome_drops_candidates(ref, tmp_path):
    """A chromosome with DEL/DUP/INV signatures but NO census/read rows:
    call_gt returns [] and the resolution's candidates are DISCARDED for
    that chromosome (cuteSV_resolveINDEL.py:443-444, resolveDUP.py:139-140,
    resolveINV.py:211-212)."""
    case = _store_case({
        "DEL": {"chrX": [(20 + i, 100, "r%d" % (i + 1)) for i in range(5)],
                "chr1": [(40 + i, 90, "r%d" % (i + 1)) for i in range(5)]},
        "DUP": {"chrX": [(60 + i, 5100 + i, "r%d" % (i + 1))
                         for i in range(5)]},
        "INV": {"chrX": [("++", 80 + i, 6200 + i, "r%d" % (i + 1))
                         for i in range(5)]}})
    sigs, reads, census, tables, lengths = case
    # strip chrX's reads entirely (census + read table + pickle rows)
    del reads["chrX"], census["chrX"], tables["chrX"]
    exp = _run_both(ref, tmp_path, (sigs, reads, census, tables, lengths),
                    dict(min_support=4))
    assert set(exp) == {"chr1"}  # chrX candidates silently dropped


def test_inv_mid_stream_flush_ungenotyped(ref, tmp_path):
    """The INV mid-stream sub-cluster flush in a --genotype-off run takes
    the action=False emission arm (cuteSV_resolveINV.py:144-156)."""
    rows = ([("++", 100 + 3 * k, 40_000 + 5 * k, "r%d" % (k + 1))
             for k in range(5)]
            + [("++", 115 + 3 * k, 6_000 + 5 * k, "r%d" % (k + 6))
               for k in range(5)])
    case = _store_case({"INV": {"chr1": rows}})
    exp = _run_both(ref, tmp_path, case, dict(min_support=4), action=False)
    assert sum(r[1] == "INV" for rows_ in exp.values() for r in rows_) == 2


def test_emission_missing_contig_raises_both(ref, reffc, tmp_path):
    """generate_output/generate_pvcf raise on a chromosome missing from
    the reference FASTA (cuteSV_genotype.py:255-258,474-477); our
    pipeline raises the same message."""
    from test_reference_differential import _FakeFastaFile

    fa_token = os.path.join(str(tmp_path), "fa_missing")
    _FakeFastaFile.registry[fa_token] = {"chr1": "ACGT" * 100}

    class _Raising(_FakeFastaFile):
        def fetch(self, chrom):
            if chrom not in self.seqs:
                raise KeyError(chrom)
            return self.seqs[chrom]

    _Raising.registry = _FakeFastaFile.registry
    sys.modules["pysam"].FastaFile = _Raising
    args_ns = types.SimpleNamespace(genotype=False, max_size=100_000,
                                    min_size=30, report_readid=False,
                                    ignore_sequence=False)
    os.mkdir(os.path.join(str(tmp_path), "results"))
    with pytest.raises(Exception, match="No corresponding contig"):
        reffc.gen.generate_output(args_ns, [], fa_token, "chrZ",
                                  str(tmp_path) + os.sep)
    with pytest.raises(Exception, match="No corresponding contig"):
        reffc.gen.generate_pvcf(args_ns, [], fa_token, "chrZ")
    # our pipeline-level guard carries the same message (pipeline.py)
    from cutesv_tpu.io.fasta import FastaFile
    fa_path = os.path.join(str(tmp_path), "one.fa")
    with open(fa_path, "w") as fh:
        fh.write(">chr1\nACGT\n")
    fasta = FastaFile(fa_path)
    assert "chrZ" not in fasta


def test_emission_dotted_and_far_rows_all_types(ref, tmp_path):
    """'.'-genotyped DUP/INV/BND rows under --genotype (AF=. fallbacks,
    cuteSV_genotype.py:328-329,:378-379,:413-414), DUP/INV emission-time
    max_size drops (:315-316,:351-352), and a C/D-type BND beyond the
    contig end (:437-442)."""
    rows = _resolver_rows(ref, tmp_path, action=True, seed=3)
    chrom = max(rows, key=lambda c: len(rows[c]))
    base = [list(r) for r in rows[chrom]]
    dups = [r for r in base if r[1] == "DUP"]
    invs = [r for r in base if r[1] == "INV"]
    bnds = [r for r in base if "[" in str(r[1]) or "]" in str(r[1])]
    cd_bnds = [r for r in bnds if str(r[1])[0] in "[]"]
    assert dups and invs and bnds
    crafted = []
    for src_row, qual_i, dr_i in ((dups[0], 9, 5), (invs[0], 10, 5),
                                  (bnds[0], 10, 6)):
        r = list(src_row)
        r[dr_i] = "."
        r[qual_i] = "."
        crafted.append(r)
    huge_dup = list(dups[0]); huge_dup[3] = "200000"
    huge_inv = list(invs[0]); huge_inv[3] = "200000"
    crafted += [huge_dup, huge_inv]
    if cd_bnds:
        far = list(cd_bnds[0])
    else:  # synthesize a C-type from an existing BND row
        far = list(bnds[0])
        far[1] = "[chr1:5000[N"
    far[2] = 149_990 + 700
    crafted.append(far)
    body = _emit_both(ref, tmp_path, {chrom: base + crafted},
                      genotype=True, seed=3)
    assert sum(";AF=." in l for l in body) >= 3
    assert any("\t150691\t" in l for l in body)  # C/D BND pos+1, REF 'N'


def test_fc_pvcf_dotted_rows_all_types(ref, reffc, tmp_path):
    """generate_pvcf '.'-QUAL rows (PASS arm, :487-488) and AF=.
    fallbacks for INS/DEL/DUP/INV (:515-516,:553-554,:583-584,:615-616)
    on identical crafted rows through both emitters."""
    from cutesv_tpu import forcecalling
    from cutesv_tpu.io.fasta import FastaFile

    dotted_assign = [4, ".", "./.", ".,.,.", ".", "."]
    rows = [
        ["chr1", 4000, "./.", "INS", 4000, "-2,2", "-3,3", dotted_assign,
         "ra,rb", "p0", "N", "A" * 50, ".", "A" * 50, 50],
        ["chr1", 5000, "./.", "DEL", 5060, "-2,2", "-3,3", dotted_assign,
         "ra,rb", "p1", "N", "<DEL>", ".", "<DEL>", 60],
        ["chr1", 6000, "./.", "DUP", 6500, ".", ".", dotted_assign,
         "ra,rb", "p2", "N", "<DUP>", ".", "<DUP>", 500],
        ["chr1", 7000, "./.", "INV", 7700, ".", ".", dotted_assign,
         "ra,rb", "p3", "N", "<INV>", "++", "<INV>", 700],
    ]
    genome = {"chr1": "ACGTACGTAC" * 2000}
    from test_reference_differential import _FakeFastaFile
    fa_token = os.path.join(str(tmp_path), "fa_token3")
    _FakeFastaFile.registry[fa_token] = genome
    sys.modules["pysam"].FastaFile = _FakeFastaFile
    args_ns = types.SimpleNamespace(genotype=True, max_size=100_000,
                                    min_size=30, report_readid=False,
                                    ignore_sequence=False)
    exp_lines = reffc.gen.generate_pvcf(args_ns, rows, fa_token, "chr1")
    fa_path = os.path.join(str(tmp_path), "ref3.fa")
    with open(fa_path, "w") as fh:
        fh.write(">chr1\n%s\n" % genome["chr1"])
    cfg = Config(input="x.bam", reference=fa_path, output="o.vcf",
                 work_dir=str(tmp_path), genotype=True, min_support=4)
    fasta = FastaFile(fa_path)
    our_lines = forcecalling.generate_pvcf_lines(cfg, rows,
                                                 fasta.fetch_lazy("chr1"))
    assert our_lines == exp_lines
    assert len(exp_lines) == 4
    assert all("\tPASS\t" in l and ";AF=." in l for l in exp_lines)


def test_fc_parse_to_int_pysam_typed(reffc):
    """parse_to_int over pysam-typed values: None->0 and list unwrap
    (cuteSV_forcecalling.py:27-34), matching our _first_int where a text
    VCF can express the same value."""
    from cutesv_tpu.forcecalling import _first_int

    assert reffc.fc.parse_to_int(None) == 0 == _first_int(None)
    assert reffc.fc.parse_to_int(["7"]) == 7 == _first_int("7")
    assert reffc.fc.parse_to_int(("8", "9")) == 8 == _first_int("8,9")
    assert reffc.fc.parse_to_int("12") == 12 == _first_int("12")
    assert reffc.fc.parse_to_int(5) == 5 == _first_int(5)


def test_tra_iteration_cap_high_primary_ratio_ungenotypes(ref, tmp_path):
    """count_coverage hitting gt_round with >20% primaries returns
    status=-1 and the TRA row is emitted ungenotyped ('./.', DR '.',
    cuteSV_resolveTRA.py:275-281) — the only path that leaves a
    genotyped run with dotted TRA fields."""
    tra = [("B", 5000 + 2 * k, "chr2", 40_000 + 3 * k, "s%d" % k)
           for k in range(4)]
    case = _store_case({"TRA": {"chr1": tra}}, n_reads=0)
    sigs, reads, census, tables, lengths = case
    # many primaries overlapping the pos1 window but none covering it
    # (they start inside): iteration hits gt_round with ratio 1.0
    rows = sorted(
        [(4960 + k % 80, 9000 + k, 1, "p%03d" % k) for k in range(80)]
        + [(0, 120_000, 1, "s%d" % k) for k in range(4)])
    reads["chr1"] = [r + ("chr1",) for r in rows]
    census["chr1"] = dict(
        start=np.array([r[0] for r in rows], np.int64),
        end=np.array([r[1] for r in rows], np.int64),
        is_primary=np.array([r[2] for r in rows], np.int8),
        name=[r[3] for r in rows])
    tables["chr1"] = ReadTable([r[0] for r in rows], [r[1] for r in rows],
                               [r[2] for r in rows], [r[3] for r in rows])
    exp = _run_both(ref, tmp_path, (sigs, reads, census, tables, lengths),
                    dict(min_support=4, gt_round=30))
    rows_out = [r for rows_ in exp.values() for r in rows_]
    assert any(r[7] == "./." for r in rows_out), rows_out
