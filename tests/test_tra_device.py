"""TRA device path parity: the pair-cluster kernel + batched cover pass
must be byte-identical to the host resolver's inline genotype replay
(resolution_TRA + call_gt_tra, cuteSV_resolveTRA.py:30-309), including
the order-sensitive early exits (gt_round iteration cap,
threshold_ref_count bound) and ambiguous-primary-name tables that force
the exact per-candidate replay."""
import random
from types import SimpleNamespace

import numpy as np
import pytest

from cutesv_tpu.config import Config
from cutesv_tpu.genotype import ReadTable
from cutesv_tpu.models import host as host_models
from cutesv_tpu.pipeline import _tra_cover_pass


def _make_tables(rng, lengths, n_rows, dup_name=False):
    tables = {}
    next_name = [0]
    for chrom, length in lengths.items():
        starts = np.sort(rng.integers(0, length - 600, n_rows))
        ends = starts + rng.integers(300, 20_000, n_rows)
        ends = np.minimum(ends, length)
        prim = (rng.random(n_rows) < 0.8).astype(np.int8)
        names = np.arange(next_name[0], next_name[0] + n_rows,
                          dtype=np.int64)
        if dup_name and n_rows > 3:
            names[2] = names[1]       # one name with two rows
            prim[1] = prim[2] = 1     # ... both primary (ambiguous)
        next_name[0] += n_rows
        tables[chrom] = ReadTable(starts, ends, prim, names)
    return tables, next_name[0]


def _make_sigs(rng, lengths, n_clusters, per_cluster, name_ceiling):
    """TRA rows (type, pos1, chr2, pos2, rid) in store sort order."""
    rows = []
    chroms = list(lengths)
    for _ in range(n_clusters):
        ty = "ABCD"[rng.integers(0, 4)]
        chr2 = chroms[rng.integers(0, len(chroms))]
        p1 = int(rng.integers(5_000, lengths["chr1"] - 5_000))
        p2 = int(rng.integers(5_000, lengths[chr2] - 5_000))
        for k in range(per_cluster):
            rows.append((ty, p1 + int(rng.integers(0, 40)), chr2,
                         p2 + int(rng.integers(0, 40)),
                         int(rng.integers(0, name_ceiling))))
    rows.sort(key=lambda r: (r[2], r[0], r[1], r[3], r[4]))
    return rows


@pytest.mark.parametrize("seed,gt_round,dup_name", [
    (1, 500, False),    # plain: fast path everywhere
    (2, 3, False),      # tiny gt_round: iteration cap fires -> replay
    (3, 500, True),     # ambiguous primary names -> full replay
    (4, 10, False),
    (5, 2, True),
])
def test_tra_batched_cover_matches_inline(seed, gt_round, dup_name):
    from cutesv_tpu.models import device as device_models

    rng = np.random.default_rng(seed)
    lengths = {"chr1": 2_000_000, "chr2": 1_500_000}
    # dense tables so threshold_ref_count / gt_round caps genuinely fire
    tables, n_names = _make_tables(rng, lengths, 400, dup_name=dup_name)
    sigs = _make_sigs(rng, lengths, 12, 6, n_names)
    names = ["r%06d" % i for i in range(n_names)]
    rc, ratio, bias = 3, 0.6, 5_000

    inline = host_models.resolve_tra(
        sigs, "chr1", rc, ratio, bias, tables, lengths, True, gt_round,
        names=names)

    state = device_models.resolve_tra_start(sigs, rc, bias)
    jobs = []
    cands = device_models.resolve_tra_finish(
        state, sigs, "chr1", rc, ratio, bias, tables, lengths, True,
        gt_round, names=names, jobs_out=jobs)
    store = SimpleNamespace(read_tables=tables, chrom_lengths=lengths,
                            names=names, census={})
    cfg = Config(engine="host", gt_round=gt_round,
                 max_cluster_bias_TRA=bias, min_support=rc)
    _tra_cover_pass({"chr1": (cands, jobs)}, store, cfg)
    assert cands == inline
    assert len(cands) > 0 or len(inline) == 0
    # the matrix must exercise BOTH halves: ambiguous names force the
    # exact replay everywhere; the plain wide-gt_round case must ride
    # the vectorized fast path
    stats = store.tra_cover_stats
    if dup_name:
        assert stats["fast"] == 0 and stats["replay"] > 0
    elif gt_round == 500:
        assert stats["replay"] == 0 and stats["fast"] > 0


def test_tra_device_no_action_matches_host():
    from cutesv_tpu.models import device as device_models

    rng = np.random.default_rng(7)
    lengths = {"chr1": 2_000_000, "chr2": 1_500_000}
    tables, n_names = _make_tables(rng, lengths, 100)
    sigs = _make_sigs(rng, lengths, 8, 5, n_names)
    names = ["r%06d" % i for i in range(n_names)]
    host = host_models.resolve_tra(
        sigs, "chr1", 3, 0.6, 5_000, tables, lengths, False, 500,
        names=names)
    dev = device_models.resolve_tra_device(
        sigs, "chr1", 3, 0.6, 5_000, tables, lengths, False, 500,
        names=names)
    assert dev == host


def test_tra_secondary_pileup_triggers_replay():
    """The gt_round iteration cap fires on a primary row's fetch
    POSITION among ALL overlapping rows (secondary/supplementary
    included, count_coverage cuteSV_genotype.py:72-93): a window with
    many non-primary rows before its one primary must route through the
    exact replay, not the fast path (round-3 review finding)."""
    from cutesv_tpu.models import device as device_models

    lengths = {"chr1": 1_000_000, "chr2": 1_000_000}
    # chr1 window around 50_000: 40 secondaries first, then 1 primary
    n_sec = 40
    starts = [49_000 + i for i in range(n_sec)] + [48_500]
    ends = [52_000 + i for i in range(n_sec)] + [56_000]
    prim = [0] * n_sec + [1]
    names = list(range(n_sec + 1))
    t1 = ReadTable(np.array(starts), np.array(ends),
                   np.array(prim, np.int8), np.array(names, np.int64))
    t2 = ReadTable(np.array([58_000, 59_000]), np.array([62_000, 63_000]),
                   np.array([1, 1], np.int8),
                   np.array([100, 101], np.int64))
    tables = {"chr1": t1, "chr2": t2}
    sigs = sorted([("A", 50_000 + i, "chr2", 60_000 + i, 200 + i)
                   for i in range(5)],
                  key=lambda r: (r[2], r[0], r[1], r[3], r[4]))
    all_names = ["r%03d" % i for i in range(300)]
    gt_round = 5
    inline = host_models.resolve_tra(
        sigs, "chr1", 3, 0.6, 1_000, tables, lengths, True, gt_round,
        names=all_names)
    state = device_models.resolve_tra_start(sigs, 3, 1_000)
    jobs = []
    cands = device_models.resolve_tra_finish(
        state, sigs, "chr1", 3, 0.6, 1_000, tables, lengths, True,
        gt_round, names=all_names, jobs_out=jobs)
    store = SimpleNamespace(read_tables=tables, chrom_lengths=lengths,
                            names=all_names, census={})
    cfg = Config(engine="host", gt_round=gt_round,
                 max_cluster_bias_TRA=1_000, min_support=3)
    _tra_cover_pass({"chr1": (cands, jobs)}, store, cfg)
    assert cands == inline
    assert len(cands) >= 1
    # only one primary overlaps, but 41 total rows do: the cap CAN fire,
    # so the pass must have replayed, not fast-pathed
    assert store.tra_cover_stats["replay"] >= 1


def test_tra_missing_mate_chrom_unresolvable():
    """SA-tag contig absent from the header: the batched pass must fill
    call_gt_tra's degraded genotype, not crash (call_gt_tra's early
    return, genotype.py)."""
    from cutesv_tpu.models import device as device_models

    rng = np.random.default_rng(11)
    lengths = {"chr1": 2_000_000}
    tables, n_names = _make_tables(rng, lengths, 100)
    names = ["r%06d" % i for i in range(n_names)]
    sigs = sorted(
        [("A", 50_000 + i, "chrUn", 70_000 + i, i % n_names)
         for i in range(8)],
        key=lambda r: (r[2], r[0], r[1], r[3], r[4]))
    inline = host_models.resolve_tra(
        sigs, "chr1", 3, 0.6, 5_000, tables, lengths, True, 500,
        names=names)
    state = device_models.resolve_tra_start(sigs, 3, 5_000)
    jobs = []
    cands = device_models.resolve_tra_finish(
        state, sigs, "chr1", 3, 0.6, 5_000, tables, lengths, True, 500,
        names=names, jobs_out=jobs)
    store = SimpleNamespace(read_tables=tables, chrom_lengths=lengths,
                            names=names, census={})
    cfg = Config(engine="host", max_cluster_bias_TRA=5_000, min_support=3)
    _tra_cover_pass({"chr1": (cands, jobs)}, store, cfg)
    assert cands == inline
    assert len(cands) >= 1
    assert cands[0][7] == "./."
