"""CRAM 3.0 reader/writer round-trips and pipeline integration."""
import random

import pytest

from cutesv_tpu.config import Config
from cutesv_tpu.io.bam import BamReader
from cutesv_tpu.io.cram import CramReader, CramWriter, open_alignment_file
from tests import simdata
from tests.simdata import ReadPlan


def _fixture(tmp_path):
    rng = random.Random(9)
    seqs = simdata.make_reference(rng, {"chr1": 60_000, "chr2": 30_000})
    c1 = seqs["chr1"]
    plans = []
    for i, start in enumerate(range(0, 56_000, 400)):
        plans.append(simdata.plain_read(c1, 0, start, 3000, "p%04d" % i))
    for i, start in enumerate(range(17_400, 19_700, 250)):
        plans.append(simdata.read_with_del(c1, 0, start, 20_000, 120,
                                           3000 - (20_120 - start),
                                           "d%02d" % i))
    for i, start in enumerate(range(37_100, 39_000, 250)):
        plans.append(simdata.read_with_ins(
            c1, 0, start, 40_000, simdata.random_seq(rng, 80),
            3000 - (40_000 - start), "i%02d" % i))
    # split read with SA tag + soft clip, on chr2 too
    plans.append(ReadPlan("sa01", 1, 5_000, [(0, 1000), (4, 1000)],
                          seqs["chr2"][5_000:6_000] + "A" * 1000,
                          tags={"SA": "chr2,8001,+,1000S1000M,60,0;",
                                "NM": 3}))
    bam = tmp_path / "rt.bam"
    fa = tmp_path / "rt.fa"
    simdata.write_bam(str(bam), [("chr1", 60_000), ("chr2", 30_000)], plans)
    simdata.write_ref_fasta(str(fa), seqs)
    return bam, fa


def test_cram_roundtrip_records(tmp_path):
    bam, fa = _fixture(tmp_path)
    cram = tmp_path / "rt.cram"
    with BamReader(str(bam)) as r:
        refs = r.references
        records = list(r)
    with CramWriter(str(cram), refs) as w:
        for rec in records:
            w.write(rec)
    with CramReader(str(cram), reference=str(fa)) as cr:
        assert cr.references == refs
        back = list(cr)
    assert len(back) == len(records)
    for a, b in zip(records, back):
        assert a.qname == b.qname
        assert a.flag == b.flag
        assert a.ref_id == b.ref_id
        assert a.pos == b.pos
        assert a.mapq == b.mapq
        assert a.cigar == b.cigar
        assert a.seq == b.seq
        assert a.tags.get("SA") == b.tags.get("SA")


def test_pipeline_on_cram_equals_bam(tmp_path):
    from cutesv_tpu.pipeline import run_pipeline

    bam, fa = _fixture(tmp_path)
    cram = tmp_path / "pipe.cram"
    with BamReader(str(bam)) as r:
        refs = r.references
        with CramWriter(str(cram), refs) as w:
            for rec in r:
                w.write(rec)
    outs = {}
    for label, path in (("bam", bam), ("cram", cram)):
        out = tmp_path / ("out_%s.vcf" % label)
        cfg = Config(input=str(path), reference=str(fa), output=str(out),
                     work_dir=str(tmp_path), genotype=True, min_support=3,
                     decoder="python", engine="host")
        run_pipeline(cfg, ["c"])
        outs[label] = [l for l in out.read_text().splitlines()
                       if not l.startswith("#")]
    assert outs["bam"] == outs["cram"]
    assert len(outs["bam"]) >= 2  # the DEL and INS at least


def test_open_alignment_file_dispatch(tmp_path):
    bam, fa = _fixture(tmp_path)
    cram = tmp_path / "d.cram"
    with BamReader(str(bam)) as r:
        refs = r.references
        with CramWriter(str(cram), refs) as w:
            for rec in r:
                w.write(rec)
    assert isinstance(open_alignment_file(str(bam)), BamReader)
    assert isinstance(open_alignment_file(str(cram), reference=str(fa)),
                      CramReader)
