"""Differential parity against the ACTUAL reference implementation.

The reference tree (read-only at /root/reference) is pure Python; its
resolver/genotype modules import cleanly once ``pysam`` is stubbed (only
TRA genotyping touches pysam at runtime, via an AlignmentFile we fake
over the same read tables our engine replays). These tests build one
randomized signature store, feed it to BOTH implementations — the
reference's resolution_*/call_gt executing unmodified, and our
resolve_all — and require exactly equal candidate rows.

This is the strongest parity oracle available in this environment: no
re-derived behavior, the reference code itself runs. Skipped when the
reference tree is absent.
"""
import os
import pickle
import random
import sys
import types

import numpy as np
import pytest

from cutesv_tpu import pipeline
from cutesv_tpu.config import Config
from cutesv_tpu.genotype import ReadTable
from cutesv_tpu.sigstore import SigStore

from test_device_parity import (_random_del_stream, _random_dup_stream,
                                _random_ins_stream, _random_inv_stream)

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_SRC, "cuteSV")),
    reason="reference tree not mounted")


class _FakeRead(types.SimpleNamespace):
    pass


class _FakeAlignmentFile:
    """pysam.AlignmentFile stand-in over our ReadTable dict: fetch yields
    records overlapping [s, e) in coordinate order — what htslib produces
    on a coordinate-sorted indexed BAM."""

    registry = {}

    def __init__(self, path):
        self.tables, self.lengths = self.registry[path]

    def get_reference_length(self, chrom):
        return self.lengths[chrom]

    def fetch(self, chrom, s, e):
        t = self.tables.get(chrom)
        if t is None:
            return
        for i in t.fetch_idx(s, e):
            yield _FakeRead(flag=0 if int(t.prim[i]) == 1 else 256,
                            reference_start=int(t.start[i]),
                            reference_end=int(t.end[i]),
                            query_name=t.names[i])

    def close(self):
        pass


@pytest.fixture(scope="module")
def ref():
    if "pysam" not in sys.modules:
        stub = types.ModuleType("pysam")
        stub.AlignmentFile = _FakeAlignmentFile
        stub.FastaFile = None
        sys.modules["pysam"] = stub
    else:
        sys.modules["pysam"].AlignmentFile = _FakeAlignmentFile
    sys.path.insert(0, REF_SRC)
    try:
        import cuteSV.cuteSV_resolveDUP as rdup
        import cuteSV.cuteSV_resolveINDEL as rindel
        import cuteSV.cuteSV_resolveINV as rinv
        import cuteSV.cuteSV_resolveTRA as rtra
        ns = types.SimpleNamespace(indel=rindel, dup=rdup, inv=rinv,
                                   tra=rtra)
        yield ns
    finally:
        try:  # at interpreter shutdown sys may already be torn down
            sys.path.remove(REF_SRC)
        except Exception:
            pass


def _write_ref_store(tmp, sigs, reads_by_chrom):
    """Write the reference's stage-2 output: one pickle per type with
    per-chromosome byte offsets (cuteSV:817-857). Rows are stored in the
    full extraction layout (…, TYPE, chrom) — the resolvers index prefix
    fields only, while force calling's parse_sigs_chrom reads seq[-1]."""
    index = {}
    for t in ("DEL", "INS", "DUP", "INV", "TRA"):
        idx = {}
        with open(os.path.join(tmp, "%s.pickle" % t), "wb") as fh:
            off = 0
            for chrom, rows in sigs.get(t, {}).items():
                full = [tuple(r) + (t, chrom) for r in rows]
                blob = pickle.dumps(full)
                fh.write(blob)
                idx[chrom] = off
                off += len(blob)
        index[t] = idx
    idx = {}
    counts = {}
    with open(os.path.join(tmp, "reads.pickle"), "wb") as fh:
        off = 0
        for chrom, rows in reads_by_chrom.items():
            blob = pickle.dumps(rows)
            fh.write(blob)
            idx[chrom] = off
            counts[chrom] = len(rows)
            off += len(blob)
    index["reads"] = idx
    index["reads_count"] = counts
    return index


def _random_tra_stream(rng, chr2_names, n_sites=15):
    rows = []
    pos = 0
    for _ in range(n_sites):
        pos += rng.randrange(2000, 9000)
        chr2 = rng.choice(chr2_names)
        ty = rng.choice("ABCD")
        p2 = rng.randrange(1000, 80_000)
        for _ in range(rng.randrange(1, 10)):
            rows.append((ty, pos + rng.randrange(-60, 60), chr2,
                         p2 + rng.randrange(-60, 60),
                         "r%04d" % rng.randrange(600)))
    rows.sort(key=lambda r: (r[2], r[0], r[1], r[3], r[4]))
    out = []
    for r in rows:
        if not out or out[-1] != r:
            out.append(r)
    return out


def _random_reads(rng, lo, hi, n):
    """Census/read-table rows covering [lo, hi): mix of primaries and
    supplementaries, coordinate-sorted. At most ONE primary row per name
    (a well-formed BAM has one flag-0/16 record per template; the
    reference's set-based overlap_cover and our interval counts only
    agree under that invariant), repeated names allowed for
    supplementaries."""
    rows = []
    prim_seen = set()
    for _ in range(n):
        s = rng.randrange(lo, hi)
        e = s + rng.randrange(500, 20_000)
        name = "r%04d" % rng.randrange(600)
        prim = 1 if rng.random() < 0.8 and name not in prim_seen else 0
        if prim:
            prim_seen.add(name)
        rows.append((s, e, prim, name))
    rows.sort(key=lambda r: r[0])
    return rows


def _build_case(seed):
    """One randomized two-chromosome store in both representations."""
    rng = random.Random(seed)
    chroms = ["chr1", "chr2"]
    sigs = {
        "DEL": {"chr1": _random_del_stream(rng),
                "chr2": _random_del_stream(rng, n_sites=10)},
        "INS": {"chr1": _random_ins_stream(rng)},
        "DUP": {"chr1": _random_dup_stream(rng)},
        "INV": {"chr1": _random_inv_stream(rng)},
        "TRA": {"chr1": _random_tra_stream(rng, ["chr2"]),
                "chr2": _random_tra_stream(rng, ["chr1"], n_sites=6)},
    }
    reads, census, tables = {}, {}, {}
    lengths = {}
    for chrom in chroms:
        rows = _random_reads(rng, 0, 120_000, 400)
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
    return sigs, reads, census, tables, lengths


def _run_reference(ref, tmp, sigs, index, lengths, tables, action, cfg):
    """Drive the reference per (type, chrom) exactly as main_ctrl does
    (cuteSV:1113-1189), merging per chromosome in submission order."""
    prefix = tmp + os.sep
    bam_token = os.path.join(tmp, "fake.bam")
    _FakeAlignmentFile.registry[bam_token] = (tables, lengths)
    out = {}

    def add(chrom, rows):
        out.setdefault(chrom, []).extend(rows)

    for chrom in index["DEL"]:
        _, rows = ref.indel.resolution_DEL(
            prefix, chrom, "DEL", cfg.min_support,
            cfg.diff_ratio_merging_DEL, cfg.max_cluster_bias_DEL,
            min(cfg.min_support, 5), bam_token, action, cfg.gt_round,
            cfg.remain_reads_ratio, index)
        add(chrom, rows)
    for chrom in index["INS"]:
        _, rows = ref.indel.resolution_INS(
            prefix, chrom, "INS", cfg.min_support,
            cfg.diff_ratio_merging_INS, cfg.max_cluster_bias_INS,
            min(cfg.min_support, 5), bam_token, action, cfg.gt_round,
            cfg.remain_reads_ratio, index)
        add(chrom, rows)
    for chrom in index["INV"]:
        _, rows = ref.inv.resolution_INV(
            prefix, chrom, "INV", cfg.min_support,
            cfg.max_cluster_bias_INV, cfg.min_size, bam_token, action,
            cfg.max_size, cfg.gt_round, index)
        add(chrom, rows)
    for chrom in index["DUP"]:
        _, rows = ref.dup.resolution_DUP(
            prefix, chrom, cfg.min_support, cfg.max_cluster_bias_DUP,
            cfg.min_size, bam_token, action, cfg.max_size, cfg.gt_round,
            index)
        add(chrom, rows)
    for chrom in index["TRA"]:
        _, rows = ref.tra.resolution_TRA(
            prefix, chrom, cfg.min_support, cfg.diff_ratio_filtering_TRA,
            cfg.max_cluster_bias_TRA, bam_token, action, cfg.gt_round,
            index)
        add(chrom, rows)
    return out


def _canon(results, drop_names=False):
    """Sort the RNAMES csv of DUP/INV/TRA rows on both sides before
    comparing: the reference accumulates those support ids in a Python
    ``set`` (cuteSV_resolveDUP.py:96, resolveINV, resolveTRA), so its own
    emission order is PYTHONHASHSEED-dependent — not a parity surface.
    DEL/INS keep their (deterministic) list order and are compared
    exactly."""
    out = {}
    for chrom, rows in results.items():
        canon_rows = []
        for r in rows:
            r = list(r)
            if r[1] not in ("DEL", "INS"):
                r[-1] = ",".join(sorted(str(r[-1]).split(",")))
            elif drop_names:
                # device engine materializes RNAMES only under
                # --report_readid (the emitter reads them only then)
                idx = 12
                r[idx] = ""
            canon_rows.append(r)
        out[chrom] = canon_rows
    return out


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("action", [False, True])
@pytest.mark.parametrize("engine", ["host", "device"])
def test_resolvers_match_reference(ref, tmp_path, seed, action, engine):
    """host engine: oracle resolvers; device engine: the JAX cluster/
    genotype kernels themselves against the reference code."""
    sigs, reads, census, tables, lengths = _build_case(seed)
    index = _write_ref_store(str(tmp_path), sigs, reads)
    cfg = Config(input="x.bam", reference="x.fa", output="o.vcf",
                 work_dir=str(tmp_path), genotype=action, engine=engine,
                 decoder="python", min_support=4)
    expected = _run_reference(ref, str(tmp_path), sigs, index, lengths,
                              tables, action, cfg)

    store = SigStore(sigs=sigs, census=census, read_tables=tables,
                     chrom_lengths=lengths, names=None)
    got = pipeline.resolve_all(store, cfg)

    # normalize: drop empty chromosomes on both sides
    drop = engine == "device" and not cfg.report_readid
    expected = _canon({c: r for c, r in expected.items() if r},
                      drop_names=drop)
    got = _canon({c: r for c, r in got.items() if r}, drop_names=drop)
    assert got == expected


@pytest.mark.parametrize("seed", [2])
def test_resolvers_match_reference_device_readid(ref, tmp_path, seed):
    """Device engine with --report_readid: RNAMES materialized and
    compared exactly."""
    sigs, reads, census, tables, lengths = _build_case(seed)
    index = _write_ref_store(str(tmp_path), sigs, reads)
    cfg = Config(input="x.bam", reference="x.fa", output="o.vcf",
                 work_dir=str(tmp_path), genotype=True, engine="device",
                 decoder="python", min_support=4, report_readid=True)
    expected = _run_reference(ref, str(tmp_path), sigs, index, lengths,
                              tables, True, cfg)
    store = SigStore(sigs=sigs, census=census, read_tables=tables,
                     chrom_lengths=lengths, names=None)
    got = pipeline.resolve_all(store, cfg)
    expected = _canon({c: r for c, r in expected.items() if r})
    got = _canon({c: r for c, r in got.items() if r})
    assert got == expected


@pytest.mark.parametrize("seed", [3, 7])
def test_resolvers_match_reference_nondefault_params(ref, tmp_path, seed):
    """Non-default clustering/genotype knobs through both stacks."""
    sigs, reads, census, tables, lengths = _build_case(100 + seed)
    index = _write_ref_store(str(tmp_path), sigs, reads)
    cfg = Config(input="x.bam", reference="x.fa", output="o.vcf",
                 work_dir=str(tmp_path), genotype=True, engine="host",
                 decoder="python", min_support=3, remain_reads_ratio=0.6,
                 diff_ratio_merging_DEL=0.4, diff_ratio_merging_INS=0.25,
                 max_cluster_bias_DEL=150, max_cluster_bias_INS=80,
                 max_cluster_bias_INV=400, max_cluster_bias_DUP=300,
                 max_cluster_bias_TRA=30, diff_ratio_filtering_TRA=0.5,
                 min_size=25, max_size=80_000, gt_round=40)
    expected = _run_reference(ref, str(tmp_path), sigs, index, lengths,
                              tables, True, cfg)
    store = SigStore(sigs=sigs, census=census, read_tables=tables,
                     chrom_lengths=lengths, names=None)
    got = pipeline.resolve_all(store, cfg)
    expected = _canon({c: r for c, r in expected.items() if r})
    got = _canon({c: r for c, r in got.items() if r})
    assert got == expected


class _FakeFastaFile:
    """pysam.FastaFile stand-in: fetch(chrom) returns the full contig."""

    registry = {}

    def __init__(self, path):
        self.seqs = self.registry[path]

    def fetch(self, chrom):
        return self.seqs[chrom]

    def close(self):
        pass


def _random_genome(rng, chroms, n):
    """Uppercase genome with IUPAC ambiguity codes sprinkled in (the
    emitters must agree on the RYSWKMBDHV->ACCAGACAAA translation)."""
    alphabet = "ACGT" * 10 + "RYSWKMBDHV"
    return {c: "".join(rng.choice(alphabet) for _ in range(n))
            for c in chroms}


@pytest.mark.parametrize("seed", [0, 4])
@pytest.mark.parametrize("report_readid,ignore_sequence",
                         [(False, False), (True, False), (False, True)])
def test_vcf_emission_matches_reference(ref, tmp_path, seed, report_readid,
                                        ignore_sequence):
    """generate_output + the stage-5 SVID merge (cuteSV_genotype.py:242-468,
    cuteSV:1225-1237) vs our vcf emitter, on rows produced by the REFERENCE
    resolvers — full VCF body equality."""
    import cuteSV.cuteSV_genotype as rgen

    from cutesv_tpu import vcf as ourvcf
    from cutesv_tpu.io.fasta import FastaFile

    sigs, reads, census, tables, lengths = _build_case(300 + seed)
    index = _write_ref_store(str(tmp_path), sigs, reads)
    cfg = Config(input="x.bam", reference="x.fa", output="o.vcf",
                 work_dir=str(tmp_path), genotype=True, engine="host",
                 decoder="python", min_support=4,
                 report_readid=report_readid,
                 ignore_sequence=ignore_sequence)
    rows = _run_reference(ref, str(tmp_path), sigs, index, lengths,
                          tables, True, cfg)
    rows = {c: r for c, r in rows.items() if r}

    rng = random.Random(seed)
    genome = _random_genome(rng, sorted(rows), 140_000)

    # --- reference side: fake FastaFile + per-chrom pickles + SVID merge
    fa_token = os.path.join(str(tmp_path), "ref_token.fa")
    _FakeFastaFile.registry[fa_token] = genome
    sys.modules["pysam"].FastaFile = _FakeFastaFile
    args_ns = types.SimpleNamespace(
        genotype=True, max_size=cfg.max_size, min_size=cfg.min_size,
        report_readid=report_readid, ignore_sequence=ignore_sequence)
    os.mkdir(os.path.join(str(tmp_path), "results"))
    for chrom in sorted(rows):
        rgen.generate_output(args_ns, [list(r) for r in rows[chrom]],
                             fa_token, chrom, str(tmp_path) + os.sep)
    svid = {"INS": 0, "DEL": 0, "BND": 0, "DUP": 0, "INV": 0}
    expected = []
    for chrom in sorted(rows):
        with open(os.path.join(str(tmp_path), "results",
                               "%s.pickle" % chrom), "rb") as fh:
            while True:
                try:
                    lines = pickle.load(fh)
                except EOFError:
                    break
                for svtype, line in lines:
                    expected.append(line.replace("<SVID>",
                                                 str(svid[svtype])))
                    svid[svtype] += 1

    # --- our side: real FASTA file through our reader + write_vcf
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
    contigs = [(c, 140_000) for c in sorted(genome)]
    ourvcf.write_vcf(out, cfg, per_chrom, contigs, ["t"])
    got = [l + "\n" for l in open(out).read().splitlines()
           if not l.startswith("#")]
    assert got == expected


# ---------------------------------------------------------------------------
# Extraction differential: the reference's parse_read/organize_split_signal/
# analysis_* state machine executing unmodified over our decoded records.
# ---------------------------------------------------------------------------

_REVCOMP = str.maketrans("ACGTUacgtuRYKMBVDHrykmbvdhNnSsWw",
                         "TGCAAtgcaaYRMKVBHDyrmkvbhdNnSsWw")


class _StubSeq:
    """Bio.Seq.Seq stand-in for the one method the reference calls:
    str(Seq(x).reverse_complement()) — standard IUPAC complement."""

    def __init__(self, s):
        self.s = str(s)

    def reverse_complement(self):
        return _StubSeq(self.s.translate(_REVCOMP)[::-1])

    def __str__(self):
        return self.s


class _StubCigar:
    """cigar.Cigar stand-in: items() yields (count:int, op:str)."""

    def __init__(self, s):
        self.s = s

    def items(self):
        import re
        return [(int(n), op)
                for n, op in re.findall(r"(\d+)([MIDNSHP=XB])", self.s)]


@pytest.fixture(scope="module")
def refmain():
    """Load the reference's main `cuteSV` script (no .py suffix) with
    pysam/cigar/Bio stubbed; only pure-python extraction entry points are
    exercised."""
    import importlib.machinery
    import importlib.util

    if "pysam" not in sys.modules:
        stub = types.ModuleType("pysam")
        stub.AlignmentFile = _FakeAlignmentFile
        stub.FastaFile = _FakeFastaFile
        sys.modules["pysam"] = stub
    # BAM CIGAR op constants (the script builds its op tables from these)
    for name, val in (("CMATCH", 0), ("CINS", 1), ("CDEL", 2),
                      ("CREF_SKIP", 3), ("CSOFT_CLIP", 4),
                      ("CHARD_CLIP", 5), ("CPAD", 6), ("CEQUAL", 7),
                      ("CDIFF", 8), ("CBACK", 9)):
        setattr(sys.modules["pysam"], name, val)
    if "cigar" not in sys.modules:
        m = types.ModuleType("cigar")
        m.Cigar = _StubCigar
        sys.modules["cigar"] = m
    if "Bio" not in sys.modules:
        bio = types.ModuleType("Bio")
        seqmod = types.ModuleType("Bio.Seq")
        seqmod.Seq = _StubSeq
        bio.Seq = seqmod
        sys.modules["Bio"] = bio
        sys.modules["Bio.Seq"] = seqmod
    path = os.path.join(REF_SRC, "cuteSV", "cuteSV")
    loader = importlib.machinery.SourceFileLoader("ref_cutesv_main", path)
    spec = importlib.util.spec_from_loader("ref_cutesv_main", loader)
    sys.path.insert(0, REF_SRC)
    try:
        mod = importlib.util.module_from_spec(spec)
        loader.exec_module(mod)
        yield mod
    finally:
        try:  # at interpreter shutdown sys may already be torn down
            sys.path.remove(REF_SRC)
        except Exception:
            pass


class _PysamView:
    """Duck-typed pysam AlignedSegment over our BamRecord."""

    def __init__(self, rec):
        self._r = rec

    @property
    def query_length(self):
        return self._r.query_length

    @property
    def flag(self):
        return self._r.flag

    @property
    def mapq(self):
        return self._r.mapq

    @property
    def reference_start(self):
        return self._r.pos

    @property
    def reference_end(self):
        return self._r.reference_end

    @property
    def cigar(self):
        return self._r.cigar

    cigartuples = cigar

    @property
    def query_sequence(self):
        return self._r.seq

    @property
    def query_name(self):
        return self._r.qname

    def get_tags(self):
        return list(self._r.tags.items())


@pytest.mark.parametrize("seed", range(8))
def test_extraction_matches_reference(refmain, tmp_path, seed):
    """Random BAMs (noisy CIGARs, dense multi-segment SA tags, reverse
    strands, hardclips, name collisions) through the reference's
    parse_read and our extract_read: identical candidate streams for all
    five SV types."""
    from test_native_decoder import _make_random_bam

    import cutesv_tpu.extract as extract
    from cutesv_tpu.io.bam import BamReader

    rng = random.Random(500 + seed)
    bam = tmp_path / "x.bam"
    _make_random_bam(str(bam), rng, n_reads=250)
    cfg = Config(input=str(bam), min_support=3)

    ours = extract.new_candidate_dict()
    theirs = {"DEL": [], "INS": [], "DUP": [], "INV": [], "TRA": []}
    reader = BamReader(str(bam))
    chrom_names = [x for x, _ in reader.references]
    for rec in reader:
        if rec.ref_id < 0 or rec.flag & 4 or rec.flag in (256, 272):
            continue
        chrom = chrom_names[rec.ref_id]
        extract.extract_read(rec, ours, chrom, cfg.min_size, cfg.min_mapq,
                             cfg.max_split_parts, cfg.min_read_len,
                             cfg.min_siglength, cfg.merge_del_threshold,
                             cfg.merge_ins_threshold, cfg.max_size)
        refmain.parse_read(_PysamView(rec), theirs, chrom, cfg.min_size,
                           cfg.min_mapq, cfg.max_split_parts,
                           cfg.min_read_len, cfg.min_siglength,
                           cfg.merge_del_threshold, cfg.merge_ins_threshold,
                           cfg.max_size)
    reader.close()
    total = 0
    for t in ("DEL", "INS", "DUP", "INV", "TRA"):
        assert ours[t] == theirs[t], t
        total += len(theirs[t])
    assert total > 50  # the case must actually exercise the machine


@pytest.mark.parametrize("seed", [1, 5])
def test_extraction_matches_reference_strict_params(refmain, tmp_path,
                                                    seed):
    """Non-default extraction knobs (min_siglength, merge thresholds,
    split-part cap, mapq/readlen floors, max_size cap)."""
    from test_native_decoder import _make_random_bam

    import cutesv_tpu.extract as extract
    from cutesv_tpu.io.bam import BamReader

    rng = random.Random(700 + seed)
    bam = tmp_path / "x.bam"
    _make_random_bam(str(bam), rng, n_reads=250)

    ours = extract.new_candidate_dict()
    theirs = {"DEL": [], "INS": [], "DUP": [], "INV": [], "TRA": []}
    reader = BamReader(str(bam))
    chrom_names = [x for x, _ in reader.references]
    params = dict(sv_size=50, min_mapq=10, max_split_parts=3,
                  min_read_len=800, min_siglength=25,
                  merge_del_threshold=150, merge_ins_threshold=20,
                  max_size=5000)
    for rec in reader:
        if rec.ref_id < 0 or rec.flag & 4 or rec.flag in (256, 272):
            continue
        chrom = chrom_names[rec.ref_id]
        extract.extract_read(rec, ours, chrom, params["sv_size"],
                             params["min_mapq"], params["max_split_parts"],
                             params["min_read_len"],
                             params["min_siglength"],
                             params["merge_del_threshold"],
                             params["merge_ins_threshold"],
                             params["max_size"])
        refmain.parse_read(_PysamView(rec), theirs, chrom,
                           params["sv_size"], params["min_mapq"],
                           params["max_split_parts"],
                           params["min_read_len"], params["min_siglength"],
                           params["merge_del_threshold"],
                           params["merge_ins_threshold"],
                           params["max_size"])
    reader.close()
    for t in ("DEL", "INS", "DUP", "INV", "TRA"):
        assert ours[t] == theirs[t], t


# ---------------------------------------------------------------------------
# Force-calling differential: the reference's force_calling_chrom/solve_fc
# (VariantFile faked over the same VCF text, sklearn KMeans real) and
# generate_pvcf vs our force_call + generate_pvcf_lines.
# ---------------------------------------------------------------------------


class _FakeVariantRecord(types.SimpleNamespace):
    pass


class _FakeVariantFile:
    """pysam.VariantFile stand-in over a VCF text file: records expose
    chrom/pos/id/ref/alts/info with string-typed INFO values (the
    reference normalizes via parse_to_int)."""

    def __init__(self, path, mode="r"):
        self.path = path

    def fetch(self):
        with open(self.path) as fh:
            for line in fh:
                if line.startswith("#") or not line.strip():
                    continue
                f = line.rstrip("\n").split("\t")
                info = {}
                for kv in f[7].split(";"):
                    if "=" in kv:
                        k, v = kv.split("=", 1)
                        info[k] = v
                    else:
                        info[kv] = True
                yield _FakeVariantRecord(
                    chrom=f[0], pos=int(f[1]), id=f[2], ref=f[3],
                    alts=tuple(f[4].split(",")), info=info)

    def close(self):
        pass


class _SerialPool:
    """multiprocessing.Pool stand-in running map_async in-process. The
    reference's force_calling_chrom forks a real Pool
    (cuteSV_forcecalling.py:555-567); forking a JAX-threaded pytest
    process can deadlock the child, and the serial form is
    deterministic with identical results (each map_async gets a
    single-element list)."""

    def __init__(self, processes=None):
        pass

    def map_async(self, fn, iterable):
        res = [fn(x) for x in iterable]
        return types.SimpleNamespace(get=lambda: res)

    def close(self):
        pass

    def join(self):
        pass


@pytest.fixture(scope="module")
def reffc(ref):
    sys.modules["pysam"].VariantFile = _FakeVariantFile
    if getattr(sys.modules["pysam"], "FastaFile", None) is None:
        sys.modules["pysam"].FastaFile = _FakeFastaFile
    sys.path.insert(0, REF_SRC)
    try:
        import cuteSV.cuteSV_forcecalling as rfc
        import cuteSV.cuteSV_genotype as rgen
        rfc.Pool = _SerialPool
        yield types.SimpleNamespace(fc=rfc, gen=rgen)
    finally:
        try:  # at interpreter shutdown sys may already be torn down
            sys.path.remove(REF_SRC)
        except Exception:
            pass


def _canon_fc(result):
    """Canonicalize the rname csv (index 8): the reference gathers support
    ids in sets for the non-indel paths."""
    out = {}
    for chrom, rows in result.items():
        canon = []
        for r in rows:
            r = list(r)
            r[8] = ",".join(sorted(str(r[8]).split(",")))
            canon.append(r)
        out[chrom] = canon
    return out


@pytest.mark.parametrize("seed", [0, 4, 9])
def test_force_calling_matches_reference(ref, reffc, tmp_path, seed):
    import re as _re
    from dataclasses import replace

    from cutesv_tpu import forcecalling
    from cutesv_tpu import vcf as ourvcf
    from cutesv_tpu.io.fasta import FastaFile

    sigs, reads, census, tables, lengths = _build_case(400 + seed)
    index = _write_ref_store(str(tmp_path), sigs, reads)
    cfg = Config(input="x.bam", reference="x.fa", output="o.vcf",
                 work_dir=str(tmp_path), genotype=True, engine="host",
                 decoder="python", min_support=4)

    # discovery rows from the REFERENCE resolvers -> a discovery VCF via
    # our (emission-differential-proven) emitter
    disc = _run_reference(ref, str(tmp_path), sigs, index, lengths,
                          tables, True, cfg)
    disc = {c: r for c, r in disc.items() if r}
    rng = random.Random(seed)
    genome = _random_genome(rng, sorted(lengths), 140_000)
    fa_path = os.path.join(str(tmp_path), "ref.fa")
    with open(fa_path, "w") as fh:
        for c in sorted(genome):
            fh.write(">%s\n" % c)
            s = genome[c]
            for k in range(0, len(s), 70):
                fh.write(s[k:k + 70] + "\n")
    fasta = FastaFile(fa_path)
    per_chrom = {c: ourvcf.format_chrom_records(
        cfg, [list(r) for r in disc[c]], fasta.fetch_lazy(c), c)
        for c in disc}
    ivcf = os.path.join(str(tmp_path), "disc.vcf")
    contigs = [(c, 140_000) for c in sorted(genome)]
    ourvcf.write_vcf(ivcf, cfg, per_chrom, contigs, ["t"])
    # N-normalize base-leading type-A/B breakend ALTs: the reference's
    # parse_record mis-parses a leading REF base (it assumes 'N...'),
    # which our parser deliberately fixes (documented deviation in
    # parse_vcf_records) — out of scope for this differential
    lines = []
    for line in open(ivcf):
        if not line.startswith("#"):
            f = line.split("\t")
            f[4] = _re.sub(r"^[A-Z](\[|\])", r"N\1", f[4])
            line = "\t".join(f)
        lines.append(line)
    with open(ivcf, "w") as fh:
        fh.writelines(lines)

    bias = {"INS": cfg.max_cluster_bias_INS,
            "DEL": cfg.max_cluster_bias_DEL,
            "DUP": cfg.max_cluster_bias_DUP,
            "INV": cfg.max_cluster_bias_INV,
            "TRA": cfg.max_cluster_bias_TRA}
    gloab = {"INS": cfg.diff_ratio_merging_INS,
             "DEL": cfg.diff_ratio_merging_DEL}
    expected = reffc.fc.force_calling_chrom(
        ivcf, str(tmp_path) + os.sep, bias, gloab, cfg.gt_round,
        cfg.read_range, 2, index)

    store = SigStore(sigs=sigs, census=census, read_tables=tables,
                     chrom_lengths=lengths, names=None)
    cfg_fc = replace(cfg, Ivcf=ivcf, reference=fa_path)
    got = forcecalling.force_call(cfg_fc, ["t"], store=store)["result"]

    expected = _canon_fc({c: r for c, r in expected.items() if r})
    got = _canon_fc({c: r for c, r in got.items() if r})
    assert got == expected

    # pvcf emission over the regenotyped rows (report_readid off: RNAMES
    # order inside rows is reference-set-nondeterministic)
    fa_token = os.path.join(str(tmp_path), "fa_token")
    _FakeFastaFile.registry[fa_token] = genome
    sys.modules["pysam"].FastaFile = _FakeFastaFile
    args_ns = types.SimpleNamespace(genotype=True, max_size=cfg.max_size,
                                    min_size=cfg.min_size,
                                    report_readid=False,
                                    ignore_sequence=False)
    for chrom in sorted(got):
        exp_lines = reffc.gen.generate_pvcf(args_ns, expected[chrom],
                                            fa_token, chrom)
        our_lines = forcecalling.generate_pvcf_lines(
            cfg_fc, got[chrom], fasta.fetch_lazy(chrom))
        assert our_lines == exp_lines, chrom


# ---------------------------------------------------------------------------
# eval_sim differential: the reference's benchmark scorer (pure stdlib)
# vs tools/eval_sim on synthetic truth beds + callsets.
# ---------------------------------------------------------------------------


def _truth_and_calls(tmp, seed):
    """Random VISOR-format truth bed + LASeR zygosity bed + a cuteSV-style
    callset VCF containing jittered hits, misses, and FPs."""
    rng = random.Random(seed)
    truth_lines = []
    call_lines = ["#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                  "\tS\n"]
    zyg = {"chr1": 95.0, "chr2": 50.0}  # hom / het

    def vcf_line(chrom, pos, svtype, end, svlen, gt, alt=None):
        info = "PRECISE;SVTYPE=%s;SVLEN=%d;END=%d;RE=9" % (svtype, svlen,
                                                           end)
        alt = alt or "<%s>" % svtype
        return ("%s\t%d\tid\tN\t%s\t20\tPASS\t%s\tGT:DR:DV\t%s:3:9\n"
                % (chrom, pos, alt, info, gt))

    pos = 10_000
    for k in range(60):
        chrom = "chr1" if k % 2 == 0 else "chr2"
        ty = ("deletion", "insertion", "inversion",
              "tandem duplication")[k % 4]
        svlen = rng.randrange(60, 900)
        start, end = pos, pos + svlen
        if ty == "insertion":
            seq = "".join(rng.choice("ACGT") for _ in range(svlen))
            truth_lines.append("%s\t%d\t%d\t%s\t%s\t0\n"
                               % (chrom, start, end, ty, seq))
        else:
            truth_lines.append("%s\t%d\t%d\t%s\tNone\t0\n"
                               % (chrom, start, end, ty))
        r = rng.random()
        want_gt = "1/1" if chrom == "chr1" else "0/1"
        if r < 0.5:  # hit, right GT
            call_lines.append(vcf_line(
                chrom, start + rng.randrange(-200, 200),
                {"deletion": "DEL", "insertion": "INS",
                 "inversion": "INV",
                 "tandem duplication": "DUP"}[ty],
                end, svlen + rng.randrange(-10, 10), want_gt))
        elif r < 0.7:  # hit, wrong GT
            call_lines.append(vcf_line(
                chrom, start, {"deletion": "DEL", "insertion": "INS",
                               "inversion": "INV",
                               "tandem duplication": "DUP"}[ty],
                end, svlen, "0/1" if want_gt == "1/1" else "1/1"))
        elif r < 0.8:  # near-miss: bad size ratio
            call_lines.append(vcf_line(
                chrom, start, {"deletion": "DEL", "insertion": "INS",
                               "inversion": "INV",
                               "tandem duplication": "DUP"}[ty],
                end, max(30, svlen // 3), want_gt))
        pos += rng.randrange(3000, 9000)
    # reciprocal translocations (BND mode)
    for k in range(8):
        strand1 = rng.choice(["forward", "reverse"])
        strand2 = rng.choice(["forward", "reverse"])
        s1 = 400_000 + k * 7000
        s2 = 500_000 + k * 9000
        truth_lines.append(
            "chr1\t%d\t%d\treciprocal translocation\th1:chr2:%d:%s:%s\t0\n"
            % (s1, s1 + 2000, s2, strand1, strand2))
        if rng.random() < 0.7:
            alt = "N[chr2:%d[" % s2 if strand1 == "forward" \
                else "N]chr2:%d]" % s2
            call_lines.append(vcf_line("chr1", s1 + rng.randrange(-300,
                                                                  300),
                                       "BND", 0, 0, "0/1", alt=alt))
    # FPs with no truth counterpart
    for k in range(10):
        call_lines.append(vcf_line("chr2", 800_000 + k * 5000, "DEL",
                                   800_400 + k * 5000, 400, "0/1"))
    ans = os.path.join(tmp, "truth.bed")
    gt = os.path.join(tmp, "zyg.bed")
    vcf_p = os.path.join(tmp, "calls.vcf")
    with open(ans, "w") as fh:
        fh.writelines(truth_lines)
    with open(gt, "w") as fh:
        for c, cov in zyg.items():
            fh.write("%s\t0\t1000000\t%.1f\n" % (c, cov))
    with open(vcf_p, "w") as fh:
        fh.writelines(call_lines)
    return ans, gt, vcf_p


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("mode", ["IID", "DUP", "BND"])
def test_eval_sim_matches_reference(tmp_path, seed, mode):
    sys.path.insert(0, REF_SRC)
    try:
        import benchmarks.eval_sim as reval
    finally:
        try:  # at interpreter shutdown sys may already be torn down
            sys.path.remove(REF_SRC)
        except Exception:
            pass
    from cutesv_tpu.tools import eval_sim as oureval

    ans_p, gt_p, vcf_p = _truth_and_calls(str(tmp_path), seed)
    modes = {"IID": ["INS", "INV", "DEL"], "DUP": ["INS", "DUP"],
             "BND": ["BND"]}[mode]

    r_ans = reval.load_ans(ans_p)
    r_gt = reval.load_gt(gt_p)
    r_call, r_ab = reval.load_callset(vcf_p, modes)
    reval.eval(r_call, r_ans, 0.7, 1000, 1, r_gt)

    o_ans = oureval.load_ans(ans_p)
    o_gt = oureval.load_gt(gt_p)
    o_call, o_ab = oureval.load_callset(vcf_p, modes)
    oureval.evaluate(o_call, o_ans, 0.7, 1000, 1, o_gt)

    assert o_ab == r_ab
    assert o_gt == r_gt
    assert o_call == r_call   # mutated in place: match levels per row
    assert o_ans == r_ans
    for res in (1, 2):
        summary = oureval.statistics(o_call, o_ans, 1, res)
        for svtype in r_call:
            tp = sum(1 for e in r_call[svtype] if e[-1] >= res)
            assert summary[("call", svtype)] == (tp, len(r_call[svtype]))
        for svtype in r_ans:
            slot = {"INS": 2, "BND": 4}.get(svtype, 3) + 1
            fn = sum(1 for e in r_ans[svtype] if e[slot] >= res)
            assert summary[("ans", svtype)] == (fn, len(r_ans[svtype]))


# ---------------------------------------------------------------------------
# eval_BND / eval_trio differentials (pure-stdlib reference scripts).
# ---------------------------------------------------------------------------


def _random_bnd_vcf(tmp, name, rng, numeric_chroms):
    """Callset VCF with BND records across all four ALT forms, TRA
    symbolic records with CHR2/END, and a sample column."""
    chroms = ["1", "2", "3"] if numeric_chroms else ["chr1", "chr2", "chrX"]
    lines = ["#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"]
    for k in range(40):
        c1, c2 = rng.sample(chroms, 2)
        p1 = rng.randrange(1000, 900_000)
        p2 = rng.randrange(1000, 900_000)
        gt = rng.choice(["0/1", "1/1", "./."])
        if True:
            # (no symbolic <TRA> rows: the reference's load_callset
            # IndexErrors on bracket-less ALTs, eval_BND.py:61 — our
            # graceful handling of them is out of differential scope)
            form = rng.randrange(4)
            alt = ("N[%s:%d[" % (c2, p2), "N]%s:%d]" % (c2, p2),
                   "[%s:%d[N" % (c2, p2), "]%s:%d]N" % (c2, p2))[form]
            lines.append("%s\t%d\tid%d\tN\t%s\t10\tPASS\t"
                         "SVTYPE=BND;RE=5\tGT:DR:DV\t%s:3:5\n"
                         % (c1, p1, k, alt, gt))
    path = os.path.join(tmp, name)
    with open(path, "w") as fh:
        fh.writelines(lines)
    return path


@pytest.mark.parametrize("seed", [0, 2])
@pytest.mark.parametrize("numeric", [False, True])
def test_eval_bnd_matches_reference(tmp_path, caplog, seed, numeric):
    import logging as _logging

    sys.path.insert(0, REF_SRC)
    try:
        import benchmarks.eval_BND as rbnd
    finally:
        try:  # at interpreter shutdown sys may already be torn down
            sys.path.remove(REF_SRC)
        except Exception:
            pass
    from cutesv_tpu.tools import compare

    rng = random.Random(800 + seed)
    base_p = _random_bnd_vcf(str(tmp_path), "base.vcf", rng, numeric)
    # comp: jittered copies of some base records + extras
    comp_rng = random.Random(900 + seed)
    comp_p = _random_bnd_vcf(str(tmp_path), "comp.vcf", comp_rng, numeric)
    with open(base_p) as fh, open(comp_p, "a") as out:
        for line in fh:
            if not line.startswith("#") and comp_rng.random() < 0.5:
                f = line.split("\t")
                f[1] = str(int(f[1]) + comp_rng.randrange(-800, 800))
                out.write("\t".join(f))

    ref_comp = rbnd.load_callset(comp_p)
    ref_base = rbnd.load_callset(base_p)
    fp_ref, total_ref = rbnd.eval(ref_comp, ref_base, 1000)
    # loaded rows (incl. the ']]N'->'N[[' collapse in the non-swap
    # branch) must match field-for-field
    from cutesv_tpu.tools import compare as _cmp
    for path, ref_rows in ((comp_p, ref_comp), (base_p, ref_base)):
        ours = _cmp.load_callset(path, bnd_numeric_swap=True)
        assert ([r[:6] for r in ours.get("BND", [])]
                == [r[:6] for r in ref_rows.get("BND", [])])

    with caplog.at_level(_logging.INFO):
        compare.eval_bnd([base_p, comp_p])
    got = {}
    for rec in caplog.records:
        m = rec.getMessage()
        if m.startswith("False positive in BND:"):
            got["fp"] = int(m.rsplit(" ", 1)[1])
        if m.startswith("Total amount of BND:"):
            got["total"] = int(m.rsplit(" ", 1)[1])
    assert got == {"fp": fp_ref, "total": total_ref}


def _random_trio_vcf(tmp, name, rng, base_sites):
    """Callset over shared sites: each member independently includes a
    site with jitter and a random GT."""
    lines = ["#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"]
    for k, (chrom, pos, svtype, svlen) in enumerate(base_sites):
        if rng.random() < 0.75:
            gt = rng.choice(["0/1", "1/1", "1/1"])
            p = pos + rng.randrange(-300, 300)
            ln = max(40, svlen + rng.randrange(-20, 20))
            if svtype == "BND":
                alt = "N[chr9:%d[" % (pos * 2)
                lines.append("chr%s\t%d\tid%d\tN\t%s\t10\tPASS\t"
                             "SVTYPE=BND;RE=5\tGT:DR:DV\t%s:3:5\n"
                             % (chrom, p, k, alt, gt))
            else:
                lines.append("chr%s\t%d\tid%d\tN\t<%s>\t10\tPASS\t"
                             "SVTYPE=%s;SVLEN=%d;END=%d;RE=5\tGT:DR:DV\t"
                             "%s:3:5\n" % (chrom, p, k, svtype, svtype,
                                           ln, p + ln, gt))
    path = os.path.join(tmp, name)
    with open(path, "w") as fh:
        fh.writelines(lines)
    return path


@pytest.mark.parametrize("seed", [1, 6])
def test_eval_trio_matches_reference(tmp_path, caplog, seed):
    import logging as _logging

    sys.path.insert(0, REF_SRC)
    try:
        import benchmarks.eval_trio as rtrio
    finally:
        try:  # at interpreter shutdown sys may already be torn down
            sys.path.remove(REF_SRC)
        except Exception:
            pass
    from cutesv_tpu.tools import compare

    rng = random.Random(seed)
    sites = []
    pos = 20_000
    for k in range(80):
        sites.append((rng.choice("12"), pos,
                      rng.choice(["DEL", "INS", "INV", "DUP", "BND"]),
                      rng.randrange(60, 800)))
        pos += rng.randrange(4000, 9000)
    mp = _random_trio_vcf(str(tmp_path), "MP.vcf", rng, sites)
    fp = _random_trio_vcf(str(tmp_path), "FP.vcf", rng, sites)
    f1 = _random_trio_vcf(str(tmp_path), "F1.vcf", rng, sites)

    child = rtrio.load_callset(f1)
    father = rtrio.load_callset(mp)
    mother = rtrio.load_callset(fp)
    rtrio.eva_record(child, father, 0.7, 1000, ["hom"])
    rtrio.eva_record(child, mother, 0.7, 1000, ["hom"])
    rtrio.eva_record(father, child, 0.7, 1000, ["hom", "het"])
    rtrio.eva_record(mother, child, 0.7, 1000, ["hom", "het"])
    expected = {}
    for svtype in ["DEL", "INS", "INV", "BND", "DUP", "ALL"]:
        for label, cs, gts in (("F1", child, ["hom", "het"]),
                               ("MP", father, ["hom"]),
                               ("FP", mother, ["hom"])):
            rec, true = rtrio.statistics_true_possitive(cs, svtype, gts)
            expected[(label, svtype)] = (rec, true)

    with caplog.at_level(_logging.INFO):
        compare.eval_trio([mp, fp, f1])
    got = {}
    for rec in caplog.records:
        m = rec.getMessage()
        if "-" in m and ": " in m and m.count("\t") == 2:
            head, rest = m.split(": ", 1)
            label, svtype = head.rsplit("-", 1)
            n_rec, n_true, _ = rest.split("\t")
            got[(label, svtype)] = (int(n_rec), int(n_true))
    assert got == expected


# ---------------------------------------------------------------------------
# eval_forcecalling differential: population statistics + callset AF
# comparison write identical output files.
# ---------------------------------------------------------------------------


def _population_vcf(tmp, name, rng, n_samples=100, with_stats=True):
    lines = ["#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
             + "".join("\tS%d" % i for i in range(n_samples)) + "\n"]
    pos = 5_000
    for k in range(50):
        svtype = rng.choice(["DEL", "INS", "DUP", "BND"])
        svlen = rng.randrange(20, 900)  # some below the 50 bp floor
        # leading key required: the reference splits on ";SVTYPE="
        info = "PRECISE;SVTYPE=%s;SVLEN=%d;END=%d" % (svtype, svlen,
                                                      pos + svlen)
        if with_stats:
            info += ";AF=%.4f;HWE=%.6f;ExcHet=%.6f" % (
                rng.random(), rng.choice([0.5, 1e-8, 0.02]),
                rng.choice([0.8, 1e-9, 0.3]))
        else:
            info += ";AF=%.4f" % rng.random()
        gts = []
        for _ in range(n_samples):
            gts.append(rng.choice(["0/1:3:5", "1/1:0:9", "./.:.:.",
                                   "0/0:9:0"]))
        lines.append("chr%d\t%d\tid%d\tN\t<%s>\t10\tPASS\t%s\tGT:DR:DV\t%s\n"
                     % (rng.randrange(1, 3), pos, k, svtype, info,
                        "\t".join(gts)))
        pos += rng.randrange(2000, 7000)
    path = os.path.join(tmp, name)
    with open(path, "w") as fh:
        fh.writelines(lines)
    return path


@pytest.mark.parametrize("seed", [0, 5])
def test_eval_forcecalling_matches_reference(tmp_path, seed):
    sys.path.insert(0, REF_SRC)
    try:
        import benchmarks.eval_forcecalling as rfceval
    finally:
        try:  # at interpreter shutdown sys may already be torn down
            sys.path.remove(REF_SRC)
        except Exception:
            pass
    from cutesv_tpu.tools import eval_forcecalling as ourfceval

    rng = random.Random(seed)
    pop = _population_vcf(str(tmp_path), "pop.vcf", rng)
    base = _population_vcf(str(tmp_path), "base.vcf",
                           random.Random(seed + 1), with_stats=True)

    a1 = os.path.join(str(tmp_path), "ref_pop.txt")
    b1 = os.path.join(str(tmp_path), "our_pop.txt")
    rfceval.population_statistic(pop, a1)
    ourfceval.population_statistic(pop, b1)
    assert open(b1).read() == open(a1).read()

    a2 = os.path.join(str(tmp_path), "ref_cmp.txt")
    b2 = os.path.join(str(tmp_path), "our_cmp.txt")
    rfceval.compare_callsets(pop, base, a2)
    ourfceval.compare_callsets(pop, base, b2)
    assert open(b2).read() == open(a2).read()

    # CMRG preprocessing: explicit-allele truth VCF -> SVTYPE/SVLEN INFO
    cmrg = os.path.join(str(tmp_path), "cmrg.vcf")
    with open(cmrg, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
                 "\tFORMAT\tS\n")
        for k in range(20):
            ref_a = "".join(rng.choice("ACGT")
                            for _ in range(rng.randrange(1, 300)))
            alt_a = "".join(rng.choice("ACGT")
                            for _ in range(rng.randrange(1, 300)))
            fh.write("chr1\t%d\tv%d\t%s\t%s\t30\tPASS\t.\tGT\t0/1\n"
                     % (1000 + 500 * k, k, ref_a, alt_a))
    a3 = os.path.join(str(tmp_path), "ref_cmrg.vcf")
    b3 = os.path.join(str(tmp_path), "our_cmrg.vcf")
    rfceval.pre_cmrg(cmrg, a3)
    ourfceval.pre_cmrg(cmrg, b3)
    assert open(b3).read() == open(a3).read()


# ---------------------------------------------------------------------------
# multi_platform (3-way concordance) differential: our N-way concordance
# must reproduce the reference's per-pattern counts.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [2, 7])
def test_concordance_matches_multi_platform(tmp_path, caplog, seed):
    import logging as _logging

    sys.path.insert(0, REF_SRC)
    try:
        import benchmarks.multi_platform as rmp
    finally:
        try:  # at interpreter shutdown sys may already be torn down
            sys.path.remove(REF_SRC)
        except Exception:
            pass
    from cutesv_tpu.tools import compare

    rng = random.Random(seed)
    sites = []
    pos = 30_000
    for k in range(70):
        sites.append((rng.choice("12"), pos,
                      rng.choice(["DEL", "INS", "INV", "DUP", "BND"]),
                      rng.randrange(60, 700)))
        pos += rng.randrange(4000, 9000)
    paths = [_random_trio_vcf(str(tmp_path), "p%d.vcf" % i,
                              rng, sites) for i in range(3)]

    cs = [rmp.load_callset(p) for p in paths]
    rmp.eva_record(cs[0], cs[1], 0.7, 1000, 0, 0)
    rmp.eva_record(cs[0], cs[2], 0.7, 1000, 1, 0)
    rmp.eva_record(cs[1], cs[2], 0.7, 1000, 1, 1)
    expected = {}
    for idx, callset in enumerate(cs):
        for svtype in callset:
            pat = {}
            total = 0
            for chrom in callset[svtype]:
                for row in callset[svtype][chrom]:
                    total += 1
                    key = "%d%d" % tuple(row[-1])
                    pat[key] = pat.get(key, 0) + 1
            expected[(idx, svtype)] = (total, pat)

    with caplog.at_level(_logging.INFO):
        compare.concordance(paths)
    got = {}
    cur = None
    for rec in caplog.records:
        m = rec.getMessage()
        if m.startswith("Callset "):
            continue
        if " total of callset " in m:
            svtype, rest = m.split(" total of callset ")
            idx_s, total_s = rest.split(":\t")
            cur = (int(idx_s), svtype)
            got[cur] = (int(total_s), {})
        elif m.strip().startswith("shared-with["):
            key = m.split("[")[1].split("]")[0]
            got[cur][1][key] = int(m.rsplit("\t", 1)[1])
    # drop all-zero patterns on both sides for comparison
    def norm(d):
        return {k: ( t, {p: n for p, n in pat.items() if n} )
                for k, (t, pat) in d.items()}
    assert norm(got) == norm(expected)


# ---------------------------------------------------------------------------
# vcf2bedpe differential (pyvcf faked with raw-string INFO/QUAL).
# ---------------------------------------------------------------------------


class _FakePyvcfReader:
    """Minimal pyvcf Reader: CHROM/POS(int)/ID/ALT/QUAL plus typed-enough
    INFO (ints where the reference does arithmetic)."""

    def __init__(self, fileobj):
        self.fh = fileobj

    def __iter__(self):
        for line in self.fh:
            if line.startswith("#"):
                continue
            f = line.rstrip("\n").split("\t")
            info = {}
            for kv in f[7].split(";"):
                if "=" in kv:
                    k, v = kv.split("=", 1)
                    try:
                        info[k] = int(v)
                    except ValueError:
                        info[k] = v
                else:
                    info[kv] = True
            yield types.SimpleNamespace(CHROM=f[0], POS=int(f[1]),
                                        ID=f[2], ALT=[f[4]],
                                        QUAL=f[5], INFO=info)


@pytest.mark.parametrize("seed", [3])
def test_vcf2bedpe_matches_reference(tmp_path, seed):
    if "vcf" not in sys.modules:
        m = types.ModuleType("vcf")
        m.Reader = _FakePyvcfReader
        sys.modules["vcf"] = m
    sys.path.insert(0, REF_SRC)
    try:
        import benchmarks.vcf2bedpe as rbedpe
    finally:
        try:  # at interpreter shutdown sys may already be torn down
            sys.path.remove(REF_SRC)
        except Exception:
            pass
    from cutesv_tpu.tools import vcf2bedpe as ourbedpe

    rng = random.Random(seed)
    lines = ["#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"]
    pos = 9_000
    for k in range(40):
        svtype = rng.choice(["DEL", "INS", "INV", "DUP", "BND"])
        if svtype == "BND":
            alt = rng.choice(["N[chr9:%d[", "N]chr9:%d]", "[chr9:%d[N",
                              "]chr9:%d]N"]) % rng.randrange(1000, 500000)
            info = "PRECISE;SVTYPE=BND;RE=%d" % rng.randrange(3, 40)
        else:
            ln = rng.randrange(60, 900)
            alt = "<%s>" % svtype
            info = "PRECISE;SVTYPE=%s;SVLEN=%d;END=%d;RE=%d" % (
                svtype, ln, pos + ln, rng.randrange(3, 40))
        lines.append("chr%s\t%d\tcuteSV.%s.%d\tN\t%s\t%.1f\tPASS\t%s\t"
                     "GT:DR:DV\t0/1:3:9\n"
                     % (rng.choice("12"), pos, svtype, k, alt,
                        rng.random() * 100, info))
        pos += rng.randrange(2000, 8000)
    vcf_p = os.path.join(str(tmp_path), "in.vcf")
    with open(vcf_p, "w") as fh:
        fh.writelines(lines)

    ref_out = os.path.join(str(tmp_path), "ref.bedpe")
    our_out = os.path.join(str(tmp_path), "our.bedpe")
    rbedpe.main_ctrl(types.SimpleNamespace(vcf=vcf_p, bedpe=ref_out))
    ourbedpe.convert(vcf_p, our_out)
    assert open(our_out).read() == open(ref_out).read()


@pytest.mark.parametrize("seed", [4])
def test_concordance_matches_sta_venn(tmp_path, caplog, seed):
    """4-way Venn counts (sta_venn.py): each callset's per-pattern counts
    over the other three, in index order, equal our concordance's."""
    import logging as _logging

    sys.path.insert(0, REF_SRC)
    try:
        import benchmarks.sta_venn as rsv
    finally:
        try:  # at interpreter shutdown sys may already be torn down
            sys.path.remove(REF_SRC)
        except Exception:
            pass
    from cutesv_tpu.tools import compare

    rng = random.Random(seed)
    sites = []
    pos = 30_000
    for k in range(60):
        sites.append((rng.choice("12"), pos,
                      rng.choice(["DEL", "INS", "INV", "DUP", "BND"]),
                      rng.randrange(60, 700)))
        pos += rng.randrange(4000, 9000)
    paths = [_random_trio_vcf(str(tmp_path), "v%d.vcf" % i, rng, sites)
             for i in range(4)]

    cs = [rsv.load_callset(p) for p in paths]
    # all 6 pairs; each callset's slots index the other three in order
    # (sta_venn.py:167-172)
    rsv.eva_record(cs[0], cs[1], 0.7, 1000, 0, 0)
    rsv.eva_record(cs[0], cs[2], 0.7, 1000, 1, 0)
    rsv.eva_record(cs[0], cs[3], 0.7, 1000, 2, 0)
    rsv.eva_record(cs[1], cs[2], 0.7, 1000, 1, 1)
    rsv.eva_record(cs[1], cs[3], 0.7, 1000, 2, 1)
    rsv.eva_record(cs[2], cs[3], 0.7, 1000, 2, 2)
    expected = {}
    for idx, callset in enumerate(cs):
        for svtype in callset:
            pat = {}
            total = 0
            for chrom in callset[svtype]:
                for row in callset[svtype][chrom]:
                    total += 1
                    key = "%d%d%d" % tuple(row[-1])
                    pat[key] = pat.get(key, 0) + 1
            expected[(idx, svtype)] = (total,
                                       {k: n for k, n in pat.items() if n})

    with caplog.at_level(_logging.INFO):
        compare.concordance(paths)
    got = {}
    cur = None
    for rec in caplog.records:
        m = rec.getMessage()
        if " total of callset " in m:
            svtype, rest = m.split(" total of callset ")
            idx_s, total_s = rest.split(":\t")
            cur = (int(idx_s), svtype)
            got[cur] = (int(total_s), {})
        elif m.strip().startswith("shared-with["):
            key = m.split("[")[1].split("]")[0]
            n = int(m.rsplit("\t", 1)[1])
            if n:
                got[cur][1][key] = n
    assert got == expected


# ---------------------------------------------------------------------------
# diploid_calling differential (pyvcf faked: list-valued RNAMES, int INFO
# where the reference does %d, PASS -> []).
# ---------------------------------------------------------------------------


class _FakePyvcfDCReader:
    def __init__(self, fileobj):
        self.fh = fileobj

    def __iter__(self):
        for line in self.fh:
            if line.startswith("#"):
                continue
            f = line.rstrip("\n").split("\t")
            info = {}
            for kv in f[7].split(";"):
                if "=" in kv:
                    k, v = kv.split("=", 1)
                    if k == "RNAMES":
                        info[k] = v.split(",")
                    else:
                        try:
                            info[k] = int(v)
                        except ValueError:
                            info[k] = v
                else:
                    info[kv] = True
            yield types.SimpleNamespace(
                CHROM=f[0], POS=int(f[1]), ID=f[2], REF=f[3],
                ALT=[f[4]], QUAL=f[5],
                FILTER=[] if f[6] == "PASS" else [f[6]], INFO=info)


@pytest.mark.parametrize("seed", [6])
def test_diploid_calling_matches_reference(tmp_path, seed):
    import importlib.machinery
    import importlib.util

    if "vcf" not in sys.modules:
        sys.modules["vcf"] = types.ModuleType("vcf")
    sys.modules["vcf"].Reader = _FakePyvcfDCReader
    path = os.path.join(REF_SRC, "cuteSV", "diploid_calling.py")
    loader = importlib.machinery.SourceFileLoader("ref_diploid", path)
    spec = importlib.util.spec_from_loader("ref_diploid", loader)
    rdc = importlib.util.module_from_spec(spec)
    loader.exec_module(rdc)
    from cutesv_tpu.tools import diploid_calling as ourdc

    rng = random.Random(seed)
    lines = ["##fileformat=VCFv4.2\n",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"]
    pos = 8_000
    for k in range(40):
        svtype = rng.choice(["DEL", "INS", "DUP", "INV"])
        ln = rng.randrange(60, 900)
        names = []
        for _ in range(rng.randrange(1, 6)):
            hap = rng.choice(["cutesvh1", "cutesvh2", "ctg"])
            names.append("%s_%d_%d" % (hap, k, rng.randrange(100)))
        lines.append("chr%s\t%d\tcuteSV.%s.%d\tN\t<%s>\t%.1f\t%s\t"
                     "PRECISE;SVTYPE=%s;SVLEN=%d;END=%d;RE=%d;RNAMES=%s\t"
                     "GT:DR:DV\t0/1:3:9\n"
                     % (rng.choice("12"), pos, svtype, k, svtype,
                        rng.random() * 100, rng.choice(["PASS", "q5"]),
                        svtype, ln if svtype != "DEL" else -ln, pos + ln,
                        rng.randrange(3, 30), ",".join(names)))
        pos += rng.randrange(2000, 8000)
    invcf = os.path.join(str(tmp_path), "in.vcf")
    with open(invcf, "w") as fh:
        fh.writelines(lines)

    ref_out = os.path.join(str(tmp_path), "ref.vcf")
    our_out = os.path.join(str(tmp_path), "our.vcf")
    rdc.main_ctrl(types.SimpleNamespace(invcf=invcf, outvcf=ref_out))
    ourdc.convert(invcf, our_out)
    assert open(our_out).read() == open(ref_out).read()


# ---------------------------------------------------------------------------
# cmp_NA19240 differential: faithful caller-flavored loaders + scoring.
# ---------------------------------------------------------------------------


def _na_caller_vcf(tmp, name, rng, sites, flavor):
    lines = ["#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"]
    for k, (chrom, pos, svtype, svlen) in enumerate(sites):
        if rng.random() > 0.8:
            continue
        p = pos + rng.randrange(-400, 400)
        ln = max(30, svlen + rng.randrange(-30, 30))
        info = "PRECISE;SVTYPE=%s;SVLEN=%d;END=%d;RE=%d" % (
            svtype, ln, p + ln, rng.randrange(3, 30))
        if flavor in ("svim", "base"):
            svid = "svim.%s.%d" % (svtype, k)
        else:
            svid = "cuteSV.%s.%d" % (svtype, k)
        lines.append("%s\t%d\t%s\tN\t<%s>\t30\tPASS\t%s\tGT:DR:DV\t"
                     "0/1:3:9\n" % (chrom, p, svid, svtype, info))
    path = os.path.join(tmp, name)
    with open(path, "w") as fh:
        fh.writelines(lines)
    return path


@pytest.mark.parametrize("seed", [2, 8])
def test_cmp_na19240_matches_reference(tmp_path, caplog, seed):
    import logging as _logging

    sys.path.insert(0, REF_SRC)
    try:
        import benchmarks.cmp_NA19240 as rna
    finally:
        try:  # at interpreter shutdown sys may already be torn down
            sys.path.remove(REF_SRC)
        except Exception:
            pass
    from cutesv_tpu.tools import compare

    rng = random.Random(seed)
    sites = []
    pos = 40_000
    for k in range(120):
        # INV runs back-to-back sometimes (exercises the run-dedup);
        # sizes straddle the 50/100000 filter
        svtype = rng.choice(["DEL", "INS", "INV", "DUP", "INV"])
        sites.append((rng.choice(["1", "2"]), pos, svtype,
                      rng.choice([40, 120, 800, 120000])))
        pos += rng.randrange(2500, 8000)
    base_p = _na_caller_vcf(str(tmp_path), "base.vcf", rng, sites, "base")
    c_cute = _na_caller_vcf(str(tmp_path), "cute.vcf", rng, sites,
                            "cutesv")
    c_sni = _na_caller_vcf(str(tmp_path), "sni.vcf", rng, sites,
                           "sniffles")
    c_pbsv = _na_caller_vcf(str(tmp_path), "pbsv.vcf", rng, sites, "pbsv")
    c_svim = _na_caller_vcf(str(tmp_path), "svim.vcf", rng, sites, "svim")

    # reference pipeline: fresh loads, flags 1..4 in caller order
    base_ref = rna.load_base(base_p)
    expected = []
    for flag, (loader, path) in enumerate(
            ((rna.load_cuteSV, c_cute), (rna.load_sniffles, c_sni),
             (rna.load_pbsv, c_pbsv), (rna.load_svim, c_svim)), start=1):
        call = loader(path)
        rna.cmp_callsets(base_ref, call, flag, 0.7, 1000)
        tp_b = total_b = tp_c = total_c = 0
        for svtype in ("INS", "DEL", "INV"):
            for chrom in base_ref.get(svtype, {}):
                for i in base_ref[svtype][chrom]:
                    total_b += 1
                    tp_b += i[3] == flag
            for chrom in call.get(svtype, {}):
                for i in call[svtype][chrom]:
                    total_c += 1
                    tp_c += i[3] == flag
        expected.append((tp_b, total_b, tp_c, total_c))

    with caplog.at_level(_logging.INFO):
        compare.cmp_na19240([base_p, "cutesv:" + c_cute,
                             "sniffles:" + c_sni, "pbsv:" + c_pbsv,
                             "svim:" + c_svim])
    got = []
    cur = {}
    for rec in caplog.records:
        m = rec.getMessage()
        if m.startswith("Camp count:"):
            cur["total_c"] = int(m.rsplit(" ", 1)[1])
        elif m.startswith("TP-call count:"):
            cur["tp_c"] = int(m.rsplit(" ", 1)[1])
        elif m.startswith("Recall:"):
            cur["recall"] = m.rsplit(" ", 1)[1]
        elif m.startswith("F-measure:"):
            got.append(dict(cur))
            cur = {}
    assert len(got) == 4
    for (tp_b, total_b, tp_c, total_c), g in zip(expected, got):
        assert g["total_c"] == total_c
        assert g["tp_c"] == tp_c
        assert g["recall"] == "%.2f" % (100.0 * tp_b / total_b)
