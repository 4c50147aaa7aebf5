"""Edge cases: empty inputs, boundary positions, filtered-out data."""
import random

import pytest

from cutesv_tpu.config import Config
from cutesv_tpu.io.bam import BamReader, BamWriter
from cutesv_tpu.pipeline import run_pipeline
from tests import simdata


def _run(tmp_path, plans, refs, seqs, **cfg_kw):
    bam, fa, out = tmp_path / "e.bam", tmp_path / "e.fa", tmp_path / "e.vcf"
    simdata.write_bam(str(bam), refs, plans)
    simdata.write_ref_fasta(str(fa), seqs)
    kw = dict(input=str(bam), reference=str(fa), output=str(out),
              work_dir=str(tmp_path), genotype=True, min_support=2)
    kw.update(cfg_kw)
    run_pipeline(Config(**kw), [])
    return [l for l in out.read_text().splitlines()
            if not l.startswith("#")]


def test_empty_bam(tmp_path):
    rng = random.Random(0)
    seqs = simdata.make_reference(rng, {"chr1": 5_000})
    for decoder in ("python", "native"):
        body = _run(tmp_path / decoder if False else tmp_path, [],
                    [("chr1", 5_000)], seqs, decoder=decoder)
        assert body == []


def test_all_low_mapq(tmp_path):
    rng = random.Random(1)
    seqs = simdata.make_reference(rng, {"c": 30_000})
    chrom = seqs["c"]
    plans = [simdata.read_with_del(chrom, 0, start, 15_000, 80,
                                   3000 - (15_000 - start), "m%d" % i)
             for i, start in enumerate(range(12_100, 14_700, 250))]
    for p in plans:
        p.mapq = 5  # below min_mapq=20: no signatures, no census
    body = _run(tmp_path, plans, [("c", 30_000)], seqs, decoder="python")
    assert body == []


def test_sv_near_chrom_start(tmp_path):
    """DEL whose genotype window clips at position 0."""
    rng = random.Random(2)
    seqs = simdata.make_reference(rng, {"c": 20_000})
    chrom = seqs["c"]
    plans = [simdata.read_with_del(chrom, 0, 0, 400 + (i % 3), 100,
                                   2500, "s%d" % i) for i in range(6)]
    body = _run(tmp_path, plans, [("c", 20_000)], seqs)
    assert len(body) == 1
    f = body[0].split("\t")
    assert f[1] in ("400", "401")


def test_cram_rejected(tmp_path):
    cram = tmp_path / "x.cram"
    cram.write_bytes(b"CRAM\x03\x00rest")
    with pytest.raises(ValueError, match="CRAM input is not supported"):
        BamReader(str(cram))


def test_secondary_only_chrom(tmp_path):
    """Records with flag 256 are census-excluded but counted in the read
    table; no calls emerge."""
    rng = random.Random(3)
    seqs = simdata.make_reference(rng, {"c": 20_000})
    chrom = seqs["c"]
    plans = [simdata.read_with_del(chrom, 0, 1000, 5_000, 80, 2000,
                                   "x%d" % i) for i in range(5)]
    for p in plans:
        p.flag = 256
    body = _run(tmp_path, plans, [("c", 20_000)], seqs, decoder="python")
    assert body == []


def test_include_bed_filter(tmp_path):
    """Reads outside the (±1000-padded) BED regions produce no signatures;
    both decoders agree."""
    rng = random.Random(4)
    seqs = simdata.make_reference(rng, {"c": 60_000})
    chrom = seqs["c"]
    plans = []
    # two DEL sites; BED keeps only the first
    for i, start in enumerate(range(12_100, 14_700, 250)):
        plans.append(simdata.read_with_del(chrom, 0, start, 15_000, 80,
                                           3000 - (15_000 - start),
                                           "a%d" % i))
    for i, start in enumerate(range(42_100, 44_700, 250)):
        plans.append(simdata.read_with_del(chrom, 0, start, 45_000, 80,
                                           3000 - (45_000 - start),
                                           "b%d" % i))
    bed = tmp_path / "regions.bed"
    bed.write_text("c\t14000\t16000\n")
    bodies = {}
    for decoder in ("python", "native"):
        bam = tmp_path / ("i_%s.bam" % decoder)
        fa = tmp_path / ("i_%s.fa" % decoder)
        out = tmp_path / ("i_%s.vcf" % decoder)
        simdata.write_bam(str(bam), [("c", 60_000)], plans)
        simdata.write_ref_fasta(str(fa), seqs)
        cfg = Config(input=str(bam), reference=str(fa), output=str(out),
                     work_dir=str(tmp_path), genotype=True, min_support=3,
                     include_bed=str(bed), decoder=decoder,
                     engine="host" if decoder == "python" else "device")
        run_pipeline(cfg, [])
        bodies[decoder] = [l for l in out.read_text().splitlines()
                           if not l.startswith("#")]
    assert bodies["python"] == bodies["native"]
    assert len(bodies["python"]) == 1
    assert bodies["python"][0].split("\t")[1] == "15000"


def test_include_bed_no_matching_chrom(tmp_path):
    """A BED whose contig names match nothing in the header (or an empty
    BED) excludes EVERY read on both decode paths — the native filter
    must not silently degrade to 'no filtering'."""
    rng = random.Random(5)
    seqs = simdata.make_reference(rng, {"c": 30_000})
    chrom = seqs["c"]
    plans = [simdata.read_with_del(chrom, 0, 1000 + 200 * i, 9_000, 80,
                                   4000, "n%d" % i) for i in range(6)]
    for bed_text in ("chrc\t1\t29000\n", ""):  # wrong name / empty BED
        bed = tmp_path / "nomatch.bed"
        bed.write_text(bed_text)
        bodies = {}
        for decoder in ("python", "native"):
            bam = tmp_path / ("n_%s.bam" % decoder)
            fa = tmp_path / ("n_%s.fa" % decoder)
            out = tmp_path / ("n_%s.vcf" % decoder)
            simdata.write_bam(str(bam), [("c", 30_000)], plans)
            simdata.write_ref_fasta(str(fa), seqs)
            cfg = Config(input=str(bam), reference=str(fa),
                         output=str(out), work_dir=str(tmp_path),
                         genotype=True, min_support=3,
                         include_bed=str(bed), decoder=decoder,
                         engine="host" if decoder == "python"
                         else "device")
            run_pipeline(cfg, [])
            bodies[decoder] = [l for l in out.read_text().splitlines()
                               if not l.startswith("#")]
        assert bodies["python"] == bodies["native"] == []


def test_unsorted_bam_rejected_both_decoders(tmp_path):
    """Unsorted inputs are rejected with a clear message by BOTH decode
    paths: the reference cannot even open them (pysam.fetch requires a
    coordinate-sorted index, cuteSV:1013); we stream, so without the
    guard an unsorted BAM would silently produce output whose
    order-sensitive pieces differ from the sorted run."""
    import random

    import pytest

    from cutesv_tpu.config import Config
    from cutesv_tpu.io.bam import BamWriter
    from cutesv_tpu.pipeline import _decode_bam_native, _decode_bam_python

    refs = [("chr1", 100_000), ("chr2", 100_000)]
    rng = random.Random(0)

    def write(path, order):
        with BamWriter(path, refs) as w:
            for ref_id, pos in order:
                seq = "".join(rng.choice("ACGT") for _ in range(600))
                w.write("r%d_%d" % (ref_id, pos), 0, ref_id, pos, 60,
                        [(0, 600)], seq)

    # descending position within a chromosome
    bad1 = str(tmp_path / "bad1.bam")
    write(bad1, [(0, 5000), (0, 9000), (0, 7000)])
    # chromosome appearing in two blocks
    bad2 = str(tmp_path / "bad2.bam")
    write(bad2, [(0, 5000), (1, 1000), (0, 6000)])
    ok = str(tmp_path / "ok.bam")
    write(ok, [(0, 5000), (0, 9000), (1, 1000)])

    for path in (bad1, bad2):
        cfg = Config(input=path, min_support=3)
        with pytest.raises(ValueError, match="not coordinate-sorted"):
            _decode_bam_python(cfg)
        with pytest.raises(ValueError, match="not coordinate-sorted"):
            _decode_bam_native(cfg)
    cfg = Config(input=ok, min_support=3)
    assert _decode_bam_python(cfg)[3] == 3
    assert _decode_bam_native(cfg)[3] == 3


def test_mapped_record_without_cigar(tmp_path):
    """A mapped record that passes --min_mapq but carries no CIGAR: the
    reference crashes on read.cigartuples[0] (cuteSV:614); both our
    decoders raise a designed error instead (python ValueError, native
    status 6) — previously the native decoder silently treated it as
    signature-free, an engine-dependent divergence. Low-mapq CIGAR-less
    records flow through both decoders (the reference never touches
    their cigar either)."""
    import random

    import pytest

    from cutesv_tpu.config import Config
    from cutesv_tpu.io.bam import BamWriter
    from cutesv_tpu.pipeline import _decode_bam_native, _decode_bam_python

    rng = random.Random(0)

    def write(path, nocigar_mapq):
        with BamWriter(path, [("chr1", 100_000)]) as w:
            seq = "".join(rng.choice("ACGT") for _ in range(600))
            w.write("good", 0, 0, 1000, 60, [(0, 600)], seq)
            w.write("nocigar", 0, 0, 2000, nocigar_mapq, [], seq)

    bad = str(tmp_path / "bad.bam")
    write(bad, 60)
    cfg = Config(input=bad, min_support=3, engine="host")
    with pytest.raises(ValueError, match="no CIGAR"):
        _decode_bam_python(cfg)
    with pytest.raises(IOError, match="without a CIGAR"):
        _decode_bam_native(cfg)

    lowq = str(tmp_path / "lowq.bam")
    write(lowq, 0)  # below --min_mapq: tolerated, like the reference
    cfg = Config(input=lowq, min_support=3, engine="host")
    assert _decode_bam_python(cfg)[3] == 2
    assert _decode_bam_native(cfg)[3] == 2
