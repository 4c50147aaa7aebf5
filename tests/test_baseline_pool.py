"""The pool-parallel python baseline (cutesv_tpu/tools/baseline_pool.py)
must reproduce the single-process python pipeline byte-for-byte: it is
bench.py's ``vs_baseline_pool`` denominator, standing in for the
reference's multiprocessing.Pool architecture (cuteSV:1058-1236)."""
import re

from cutesv_tpu.config import Config
from cutesv_tpu.pipeline import run_pipeline
from cutesv_tpu.tools import baseline_pool
from tests.test_e2e_alltypes import _build


def _strip_volatile(text: str) -> str:
    # fileDate has second resolution; runs seconds apart must still match.
    # ONLY that line is dropped — everything else (incl. CommandLine,
    # blank lines and the trailing newline) stays byte-exact, preserving
    # the module's byte-for-byte contract
    return re.sub(r"^##fileDate[^\n]*\n", "", text, count=1,
                  flags=re.MULTILINE)


def _cfg(bam, fa, out, wd):
    return Config(input=str(bam), reference=str(fa), output=str(out),
                  work_dir=str(wd), genotype=True, min_support=3,
                  engine="host", decoder="python")


def test_chrom_index_points_at_first_records(tmp_path):
    bam, fa = _build(tmp_path)
    idx = baseline_pool.build_chrom_index(str(bam), cache=False)
    assert [c for c, _ in idx["chroms"]] == ["chr1", "chr2"]
    assert set(idx["voffs"]) == {"0", "1"}
    for cid_s, (coff, uoff) in idx["voffs"].items():
        it = baseline_pool._iter_from(str(bam), coff, uoff)
        rec = next(it)
        assert rec.ref_id == int(cid_s)
        # really the FIRST record of that chromosome: minimal start pos
        starts = [rec.pos] + [r.pos for r in it if r.ref_id == rec.ref_id]
        assert rec.pos == min(starts)


def test_index_cache_roundtrip(tmp_path):
    bam, fa = _build(tmp_path)
    fresh = baseline_pool.build_chrom_index(str(bam))
    cached = baseline_pool.build_chrom_index(str(bam))
    assert fresh == cached
    assert (tmp_path / "all.bam.pooledidx.json").exists()


def test_pooled_equals_single_process(tmp_path):
    bam, fa = _build(tmp_path)
    ref_out = tmp_path / "ref.vcf"
    run_pipeline(_cfg(bam, fa, ref_out, tmp_path / "wd1"), ["argv"])
    want = ref_out.read_text()
    assert "SVTYPE=" in want
    for n_procs in (1, 2, 3):
        out = tmp_path / ("pool%d.vcf" % n_procs)
        stats = baseline_pool.run_pool_baseline(
            _cfg(bam, fa, out, tmp_path / ("wdp%d" % n_procs)), ["argv"],
            n_procs=n_procs)
        assert _strip_volatile(out.read_text()) == _strip_volatile(want)
        assert stats["n_calls"] > 0
        assert stats["n_records"] > 0


def test_iter_from_mid_block_offset(tmp_path):
    """Virtual offsets with a nonzero within-block component decode from
    the record boundary, not the block start."""
    bam, fa = _build(tmp_path)
    idx = baseline_pool.build_chrom_index(str(bam), cache=False)
    coff, uoff = idx["voffs"]["1"]
    assert uoff >= 0
    recs = list(baseline_pool._iter_from(str(bam), coff, uoff))
    assert recs and recs[0].ref_id == 1
    # the stream is a clean record chain to EOF
    for r in recs:
        assert isinstance(r.flag, int)
