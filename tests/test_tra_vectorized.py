"""Parity: the array-at-a-time TRA resolver / count_coverage replay vs
their per-row loop oracles (round-1 implementations) on randomized
streams, including genotype action on/off, string and rank read ids,
and unsorted read tables (which must take the exact full-scan path)."""
import random

import numpy as np

from cutesv_tpu.genotype import ReadTable, count_coverage_replay
from cutesv_tpu.models.host import resolve_tra, resolve_tra_oracle


def _loop_replay(table, s, e, read_count, up_bound, itround):
    """Reference loop (cuteSV_genotype.py:72-93) over the original
    full-scan fetch — the behavioral oracle for the vectorized replay."""
    status = 0
    iteration = 0
    primary_num = 0
    idx = np.nonzero((table.start < e) & (table.end > s))[0]
    for i in idx:
        iteration += 1
        if table.prim[i] != 1:
            continue
        primary_num += 1
        if table.start[i] < s and table.end[i] > e:
            read_count.add(table.names[i])
            if len(read_count) >= up_bound:
                status = 1
                break
        if iteration >= itround:
            if float(primary_num / iteration) <= 0.2:
                status = 1
            else:
                status = -1
            break
    return status


def _random_table(rng, n, sorted_starts=True, name_pool=200):
    starts = [rng.randrange(0, 5000) for _ in range(n)]
    if sorted_starts:
        starts.sort()
    ends = [s + rng.randrange(1, 3000) for s in starts]
    prim = [1 if rng.random() < 0.8 else 0 for _ in range(n)]
    names = ["r%03d" % rng.randrange(name_pool) for _ in range(n)]
    return ReadTable(starts, ends, prim, names)


def test_replay_parity_fuzz():
    rng = random.Random(7)
    for case in range(300):
        n = rng.randrange(0, 120)
        table = _random_table(rng, n, sorted_starts=rng.random() < 0.7)
        s = rng.randrange(0, 6000)
        e = s + rng.randrange(1, 2500)
        up_bound = rng.randrange(1, 25)
        itround = rng.choice([1, 3, 10, 50, 500])
        seed = {"r%03d" % rng.randrange(50)
                for _ in range(rng.randrange(0, 5))}
        got_set, ora_set = set(seed), set(seed)
        got = count_coverage_replay(table, s, e, got_set, up_bound, itround)
        ora = _loop_replay(table, s, e, ora_set, up_bound, itround)
        assert got == ora, case
        assert got_set == ora_set, case


def _random_sigs(rng, n, as_ranks):
    rows = []
    for _ in range(n):
        rows.append((rng.choice("ABCD"),
                     rng.randrange(0, 3000),
                     rng.choice(["chr2", "chr3", "chrX"]),
                     rng.randrange(0, 3000),
                     rng.randrange(40) if as_ranks
                     else "q%02d" % rng.randrange(40)))
    rows.sort(key=lambda r: (r[2], r[0], r[1], r[3], r[4]))
    return rows


def test_resolve_tra_parity_fuzz():
    rng = random.Random(11)
    chrom_lengths = {"chr1": 10_000, "chr2": 10_000, "chr3": 10_000,
                     "chrX": 10_000}
    for case in range(150):
        as_ranks = rng.random() < 0.5
        sigs = _random_sigs(rng, rng.randrange(0, 200), as_ranks)
        names = (["name%02d" % k for k in range(40)] if as_ranks else None)
        tables = {c: _random_table(rng, rng.randrange(0, 150))
                  for c in ("chr1", "chr2", "chr3")}  # chrX absent: empty
        action = rng.random() < 0.7
        read_count = rng.choice([1, 2, 3, 5])
        bias = rng.choice([10, 50, 200])
        overlap = rng.choice([0.3, 0.6, 0.9])
        gt_round = rng.choice([5, 50, 500])
        got = resolve_tra(sigs, "chr1", read_count, overlap, bias, tables,
                          chrom_lengths, action, gt_round, names=names)
        ora = resolve_tra_oracle(sigs, "chr1", read_count, overlap, bias,
                                 tables, chrom_lengths, action, gt_round,
                                 names=names)
        assert got == ora, case


def test_resolve_tra_unknown_mate_contig():
    # SA-tag contig absent from chrom_lengths degrades, on both paths
    sigs = [("A", 100, "chrUn", 200, "q1"), ("A", 103, "chrUn", 202, "q2"),
            ("A", 105, "chrUn", 205, "q3")]
    tables = {"chr1": ReadTable([50], [500], [1], ["q9"])}
    got = resolve_tra(sigs, "chr1", 3, 0.6, 50, tables, {"chr1": 10_000},
                      True, 500)
    ora = resolve_tra_oracle(sigs, "chr1", 3, 0.6, 50, tables,
                             {"chr1": 10_000}, True, 500)
    assert got == ora and len(got) == 1 and got[0][7] == "./."
