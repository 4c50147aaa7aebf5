"""Sharded (byte-range) native decode: block-aligned ranges over the
compressed BAM, record-boundary discovery by validated chaining, exact
cross-shard boundary agreement, and a merge that reproduces the
whole-file decode bit-for-bit (VERDICT #2; reference counterpart:
density-adaptive interval tasks, cuteSV:1026-1076)."""
import numpy as np
import pytest

from cutesv_tpu.config import Config
from cutesv_tpu.io import native as nio
from cutesv_tpu.parallel.distributed import (check_shard_boundaries,
                                             merge_partial_decodes,
                                             plan_shard_ranges)
from tests.test_e2e_alltypes import _build


def _decode_whole_and_parts(bam, cfg, n):
    whole = nio.decode(str(bam), cfg, None)
    ranges = plan_shard_ranges(str(bam), n)
    parts = [nio.decode(str(bam), cfg, None, byte_range=(start, ulen))
             for start, ulen, _ in ranges]
    return whole, ranges, parts


@pytest.mark.parametrize("n", [2, 4, 7])
def test_sharded_decode_union_bit_identical(tmp_path, n):
    bam, fa = _build(tmp_path)
    cfg = Config(input=str(bam), reference=str(fa), min_support=3)
    whole, ranges, parts = _decode_whole_and_parts(bam, cfg, n)
    # disjoint coverage: every shard reports where it stopped, and it
    # must equal where its successor started
    check_shard_boundaries(ranges, [(p.first_u, p.next_u) for p in parts])
    assert sum(p.n_records for p in parts) == whole.n_records
    assert any(p.n_records for p in parts[1:]), "split degenerated"
    merged = merge_partial_decodes(parts)
    assert merged.names == whole.names
    assert np.array_equal(merged.name_rank, whole.name_rank)
    assert merged.chroms == whole.chroms
    assert merged.ins_seq_blob == whole.ins_seq_blob
    assert set(merged.arrays) == set(whole.arrays)
    for key in whole.arrays:
        assert np.array_equal(merged.arrays[key], whole.arrays[key]), key


def test_native_block_scan_matches_python(tmp_path):
    """The native mmap BGZF block-table scan equals the python oracle,
    and malformed input falls back to the python scanner's designed
    errors."""
    from cutesv_tpu.io import bgzf as bg
    from cutesv_tpu.io import native as nio

    bam, fa = _build(tmp_path)
    nat = nio.scan_bgzf_native(str(bam))
    assert nat is not None
    orig = nio.scan_bgzf_native
    try:
        nio.scan_bgzf_native = lambda path: None
        py = bg.scan_block_table(str(bam))
    finally:
        nio.scan_bgzf_native = orig
    assert np.array_equal(py[0], nat[0])
    assert np.array_equal(py[1], nat[1])
    bad = tmp_path / "bad.bam"
    bad.write_bytes(b"\x1f\x8bgarbage-not-a-block-header" * 4)
    assert nio.scan_bgzf_native(str(bad)) is None
    with pytest.raises(ValueError):
        bg.scan_block_table(str(bad))


def test_boundary_mismatch_is_fatal(tmp_path):
    bam, fa = _build(tmp_path)
    cfg = Config(input=str(bam), reference=str(fa), min_support=3)
    whole, ranges, parts = _decode_whole_and_parts(bam, cfg, 2)
    reports = [(p.first_u, p.next_u) for p in parts]
    bad = [(reports[0][0], reports[0][1] + 8)] + reports[1:]
    with pytest.raises(RuntimeError, match="boundary mismatch"):
        check_shard_boundaries(ranges, bad)


def test_sharded_store_identical(tmp_path):
    """The merged partials feed build_store_native to the exact same
    store (spot check: VCF-level identity via the resolvers)."""
    from cutesv_tpu import sigstore

    bam, fa = _build(tmp_path)
    cfg = Config(input=str(bam), reference=str(fa), genotype=True,
                 min_support=3, engine="host")
    whole, ranges, parts = _decode_whole_and_parts(bam, cfg, 4)
    merged = merge_partial_decodes(parts)
    s1 = sigstore.build_store_native(whole, cfg)
    s2 = sigstore.build_store_native(merged, cfg)
    from cutesv_tpu.pipeline import resolve_all
    r1 = resolve_all(s1, cfg)
    r2 = resolve_all(s2, cfg)
    assert r1 == r2 and r1


def _bam_to_cram(bam, cram, max_slice=40):
    from cutesv_tpu.io.bam import BamReader
    from cutesv_tpu.io.cram import CramWriter

    with BamReader(str(bam)) as r:
        refs = r.references
        with CramWriter(str(cram), refs, max_slice=max_slice) as w:
            for rec in r:
                w.write(rec)
    return refs


@pytest.mark.parametrize("n", [2, 3, 5])
def test_cram_sharded_decode_union_bit_identical(tmp_path, n):
    """CRAM sharded decode: container-aligned ranges, every shard still
    reads the SAM header container, boundary chain contiguous, merge
    bit-identical to the whole-file decode (round-2 verdict weak #4)."""
    from cutesv_tpu.parallel.distributed import plan_cram_shard_ranges

    bam, fa = _build(tmp_path)
    cram = tmp_path / "in.cram"
    _bam_to_cram(bam, cram, max_slice=40)  # several containers
    cfg = Config(input=str(cram), reference=str(fa), min_support=3)
    whole = nio.decode(str(cram), cfg, None, reference=str(fa))
    ranges = plan_cram_shard_ranges(str(cram), n)
    parts = [nio.decode(str(cram), cfg, None, reference=str(fa),
                        byte_range=(start, clen))
             for start, clen, _ in ranges]
    check_shard_boundaries(ranges, [(p.first_u, p.next_u) for p in parts])
    assert sum(p.n_records for p in parts) == whole.n_records
    assert sum(1 for p in parts if p.n_records) >= min(n, 2), \
        "split degenerated"
    merged = merge_partial_decodes(parts)
    assert merged.names == whole.names
    assert np.array_equal(merged.name_rank, whole.name_rank)
    assert merged.ins_seq_blob == whole.ins_seq_blob
    for key in whole.arrays:
        assert np.array_equal(merged.arrays[key], whole.arrays[key]), key


def test_cram_more_shards_than_containers(tmp_path):
    from cutesv_tpu.parallel.distributed import plan_cram_shard_ranges

    bam, fa = _build(tmp_path)
    cram = tmp_path / "in.cram"
    _bam_to_cram(bam, cram, max_slice=100_000)  # one data container
    cfg = Config(input=str(cram), reference=str(fa), min_support=3)
    whole = nio.decode(str(cram), cfg, None, reference=str(fa))
    ranges = plan_cram_shard_ranges(str(cram), 4)
    assert sum(1 for _, clen, _ in ranges if clen == -1) >= 1
    parts = [nio.decode(str(cram), cfg, None, reference=str(fa),
                        byte_range=(start, clen))
             for start, clen, _ in ranges]
    check_shard_boundaries(ranges, [(p.first_u, p.next_u) for p in parts])
    assert sum(p.n_records for p in parts) == whole.n_records
    merged = merge_partial_decodes(parts)
    for key in whole.arrays:
        assert np.array_equal(merged.arrays[key], whole.arrays[key]), key


def test_more_shards_than_blocks(tmp_path):
    """A tiny BAM (fewer BGZF blocks than shards) must not duplicate
    records: empty shards own nothing (ulen -1), and the union still
    equals the whole-file decode."""
    import random

    from tests import simdata

    rng = random.Random(9)
    ref = simdata.make_reference(rng, {"chr1": 20_000})
    plans = [simdata.plain_read(ref["chr1"], 0, s, 2000, "t%03d" % i)
             for i, s in enumerate(range(0, 17_000, 600))]
    plans.append(simdata.read_with_del(ref["chr1"], 0, 8_000, 9_000, 120,
                                       2000, "d1"))
    bam = tmp_path / "tiny.bam"
    simdata.write_bam(str(bam), [("chr1", 20_000)], plans)
    cfg = Config(min_support=1)
    whole, ranges, parts = _decode_whole_and_parts(bam, cfg, 6)
    check_shard_boundaries(ranges, [(p.first_u, p.next_u) for p in parts])
    assert sum(p.n_records for p in parts) == whole.n_records
    merged = merge_partial_decodes(parts)
    for key in whole.arrays:
        assert np.array_equal(merged.arrays[key], whole.arrays[key]), key
    assert merged.names == whole.names
