import math
import random

import numpy as np

from cutesv_tpu.genotype import (MAX_READS, ReadTable, cal_CIPOS, cal_GL,
                                 count_coverage_replay, cover_counts,
                                 gl_table, rescale_read_counts,
                                 threshold_ref_count)


def test_cal_gl_shortcuts():
    assert cal_GL(3, 1) == ("0/1", "3,3,24", 3, 3.0)
    assert cal_GL(6, 2) == ("0/1", "3,3,45", 3, 3.0)


def test_cal_gl_known_values():
    gt, pl, gq, qual = cal_GL(10, 0)
    assert gt == "0/0"
    gt, pl, gq, qual = cal_GL(0, 10)
    assert gt == "1/1"
    gt, pl, gq, qual = cal_GL(10, 10)
    assert gt == "0/1"
    # 0/1 GLs satisfy PL[1] == min
    pls = [int(x) for x in pl.split(",")]
    assert pls[1] == min(pls)


def test_rescale():
    assert rescale_read_counts(50, 50) == (50, 50)
    assert rescale_read_counts(300, 100) == (75, 25)
    assert rescale_read_counts(0, 250) == (0, 100)


def test_gl_table_matches_scalar():
    table = gl_table()
    rng = random.Random(3)
    for _ in range(200):
        c0 = rng.randrange(0, 400)
        c1 = rng.randrange(0, 400)
        assert table.lookup(c0, c1) == cal_GL(c0, c1)


def test_threshold_ref_count():
    assert threshold_ref_count(1) == 20
    assert threshold_ref_count(2) == 40
    assert threshold_ref_count(4) == 36
    assert threshold_ref_count(10) == 70
    assert threshold_ref_count(50) == 250


def test_cal_cipos():
    assert cal_CIPOS(0.0, 5) == "-0,0"
    assert cal_CIPOS(10.0, 4) == "-9,9"


def test_cover_counts_vs_bruteforce():
    rng = random.Random(11)
    starts = np.array([rng.randrange(0, 1000) for _ in range(300)])
    ends = starts + np.array([rng.randrange(1, 500) for _ in range(300)])
    svs = []
    for _ in range(80):
        s = rng.randrange(0, 1200)
        svs.append((s, s + rng.randrange(1, 300)))
    got = cover_counts(svs, starts, ends)
    for i, (s, e) in enumerate(svs):
        expect = int(np.sum((starts <= s) & (ends >= e)))
        assert got[i] == expect


def test_cover_counts_matches_reference_sweep():
    """The reference's overlap_cover sweep (cuteSV_genotype.py:95-159)
    computes cover = reads alive at both SV endpoints under the endpoint
    ordering (pos, type) with sv_right=0 < read_left=1 < read_right=2 <
    sv_left=3. That reduces to start<=s and end>=e; verify on adversarial
    boundary ties."""
    starts = np.array([10, 10, 20, 30, 5])
    ends = np.array([30, 20, 40, 50, 10])
    svs = [(10, 30), (10, 20), (20, 30), (25, 30)]

    def ref_sweep(svs_list, reads_list):
        sort_list = []
        for idx, (s, e, *_rest) in enumerate(reads_list):
            sort_list.append([s, 1, idx])
            sort_list.append([e, 2, idx])
        for idx, (s, e) in enumerate(svs_list):
            sort_list.append([s, 3, idx])
            sort_list.append([e, 0, idx])
        sort_list.sort(key=lambda x: (x[0], x[1]))
        read_set, svs_set = set(), set()
        cover = {}
        for node in sort_list:
            if node[1] == 1:
                read_set.add(node[2])
            elif node[1] == 2:
                read_set.remove(node[2])
            elif node[1] == 3:
                svs_set.add(node[2])
                cover[node[2]] = set(read_set)
            else:
                svs_set.remove(node[2])
                cover[node[2]] &= set(read_set)
        return [len(cover[i]) for i in range(len(svs_list))]

    reads = [(int(s), int(e)) for s, e in zip(starts, ends)]
    expect = ref_sweep(svs, reads)
    got = cover_counts(svs, starts, ends)
    assert list(got) == expect


def test_count_coverage_replay_early_exit():
    # 10 primary reads covering [100, 200); up_bound small -> status 1
    n = 10
    table = ReadTable([50] * n, [500] * n, [1] * n,
                      ["r%d" % i for i in range(n)])
    rc = set()
    status = count_coverage_replay(table, 100, 200, rc, 3, 500)
    assert status == 1
    assert len(rc) == 3

    # itround cap with mostly-secondary records -> status 1 (low primary
    # fraction)
    prim = [1 if i % 10 == 0 else 0 for i in range(100)]
    table2 = ReadTable([50] * 100, [500] * 100, prim,
                       ["s%d" % i for i in range(100)])
    rc2 = set()
    status2 = count_coverage_replay(table2, 100, 200, rc2, 1000, 50)
    assert status2 == 1

    # itround cap with all-primary -> status -1
    table3 = ReadTable([150] * 100, [160] * 100, [1] * 100,
                       ["t%d" % i for i in range(100)])
    rc3 = set()
    status3 = count_coverage_replay(table3, 100, 200, rc3, 1000, 50)
    assert status3 == -1


def test_batched_cover_pass_int32_flush():
    """The shared cross-chromosome cover batcher must flush and restart
    offsets when cumulative spans would leave int32 (coords are scaled x2
    inside the kernels); per-chromosome results must equal unbatched."""
    import numpy as np

    from cutesv_tpu.config import Config
    from cutesv_tpu.pipeline import _batched_cover_pass

    class Store:
        census = {}

    cfg = Config(input="x", reference="y", output="z", engine="host")
    rng = np.random.default_rng(3)
    per_chrom = {}
    expect = {}
    from cutesv_tpu.genotype import cover_counts
    for k in range(3):  # each chrom spans ~600M -> chrom 2 forces a flush
        chrom = "c%d" % k
        starts = np.sort(rng.integers(0, 600_000_000, size=50))
        ends = starts + rng.integers(1_000, 2_000_000, size=50)
        Store.census[chrom] = {
            "start": starts, "end": ends,
            "is_primary": np.ones(50, np.int64),
            "name": np.arange(50),
        }
        jobs = [{"window": (int(s), int(s) + 5_000)}
                for s in rng.integers(0, 599_000_000, size=7)]
        cands = [[None] for _ in jobs]
        per_chrom[chrom] = (cands, jobs)
        expect[chrom] = cover_counts([j["window"] for j in jobs],
                                     starts, ends)

    got = {}

    def apply(chrom, cands, jobs, census, counts):
        got[chrom] = np.asarray(counts[0])

    _batched_cover_pass(per_chrom, Store, cfg,
                        lambda jobs: [[j["window"] for j in jobs]], apply)
    assert set(got) == set(expect)
    for chrom in expect:
        assert np.array_equal(got[chrom], np.asarray(expect[chrom])), chrom


def test_batched_cover_multi_specs_match_single_passes():
    """One multi-spec pass (several SV types, disjoint chromosome sets,
    multi-window groups) must reproduce what separate per-type passes
    compute, including the int32 flush splitting specs mid-stream."""
    import numpy as np

    from cutesv_tpu.config import Config
    from cutesv_tpu.genotype import cover_counts
    from cutesv_tpu.pipeline import _batched_cover_multi

    class Store:
        census = {}

    cfg = Config(input="x", reference="y", output="z", engine="host")
    rng = np.random.default_rng(7)
    chroms = ["c%d" % k for k in range(4)]
    for chrom in chroms:
        starts = np.sort(rng.integers(0, 500_000_000, size=40))
        ends = starts + rng.integers(1_000, 2_000_000, size=40)
        Store.census[chrom] = {
            "start": starts, "end": ends,
            "is_primary": (np.arange(40) % 3 != 0).astype(np.int64),
            "name": np.arange(40),
        }

    def make_jobs(chrom_list, n_groups, seed):
        r = np.random.default_rng(seed)
        per_chrom = {}
        for chrom in chrom_list:
            jobs = []
            for s in r.integers(0, 499_000_000, size=5):
                j = {"window": (int(s), int(s) + 4_000)}
                for g in range(1, n_groups):
                    o = int(r.integers(0, 100_000))
                    j["w%d" % g] = (int(s) + o, int(s) + o + 4_000)
                jobs.append(j)
            per_chrom[chrom] = ([[None] for _ in jobs], jobs)
        return per_chrom

    # spec A: one window group on chroms 0-2; spec B: three groups on
    # chroms 1-3 (different chromosome set and group count)
    pcA = make_jobs(chroms[:3], 1, 11)
    pcB = make_jobs(chroms[1:], 3, 22)

    def groups_a(jobs):
        return [[j["window"] for j in jobs]]

    def groups_b(jobs):
        return [[j["window"] for j in jobs],
                [j["w1"] for j in jobs], [j["w2"] for j in jobs]]

    got = {}

    def apply_for(tag):
        def apply(chrom, cands, jobs, census, counts):
            got[(tag, chrom)] = [np.asarray(c) for c in counts]
        return apply

    _batched_cover_multi([(pcA, groups_a, apply_for("A")),
                          (pcB, groups_b, apply_for("B"))], Store, cfg)

    for tag, pc, gfn in (("A", pcA, groups_a), ("B", pcB, groups_b)):
        for chrom, (cands, jobs) in pc.items():
            census = Store.census[chrom]
            prim = census["is_primary"] == 1
            for k, ws in enumerate(gfn(jobs)):
                exp = cover_counts(ws, census["start"][prim],
                                   census["end"][prim])
                assert np.array_equal(got[(tag, chrom)][k],
                                      np.asarray(exp)), (tag, chrom, k)


def test_batched_cover_giant_chromosome_host_fallback():
    """A chromosome beyond the int32-safe coordinate budget (the device
    kernels double coordinates) is counted on host, exactly."""
    import random

    from cutesv_tpu.config import Config
    from cutesv_tpu.pipeline import _batched_cover_pass
    from cutesv_tpu.sigstore import SigStore

    rng = random.Random(5)
    n = 300
    starts = np.sort(np.array(
        [rng.randrange(0, 2_000_000_000) for _ in range(n)], np.int64))
    ends = starts + np.array(
        [rng.randrange(5_000, 40_000) for _ in range(n)], np.int64)
    census = dict(start=starts, end=ends,
                  is_primary=np.array([1] * n, np.int8),
                  name=["r%03d" % i for i in range(n)])
    store = SigStore(census={"giant": census})
    jobs = []
    cands = []
    for _ in range(40):
        s = rng.randrange(0, 2_000_000_000)
        jobs.append(dict(window=(s, s + rng.randrange(100, 30_000)),
                         support=[]))
        cands.append([None] * 12)
    got = {}

    def apply(chrom, cands_, jobs_, census_, counts):
        got["counts"] = np.asarray(counts[0], np.int64)

    cfg = Config(input="x", reference="x", output="x", work_dir="x",
                 engine="device")
    _batched_cover_pass({"giant": (cands, jobs)}, store, cfg,
                        lambda js: [[j["window"] for j in js]], apply)
    exp = [int(np.sum((starts <= s) & (ends >= e)))
           for s, e in (j["window"] for j in jobs)]
    assert got["counts"].tolist() == exp


def test_assign_gt_giant_chromosome_host_fallback():
    """The per-chromosome genotype path (assign_gt_del_ins) must apply
    the same int32-coordinate-budget guard as the batched pass: beyond
    2^30 bp the device cover kernel would double-and-wrap int32, so the
    exact host sweep runs instead."""
    from cutesv_tpu.genotype import assign_gt_del_ins

    rng = random.Random(7)
    n = 200
    starts = np.sort(np.array([rng.randrange(0, 2_000_000_000)
                               for _ in range(n)], np.int64))
    ends = starts + np.array([rng.randrange(5_000, 40_000)
                              for _ in range(n)], np.int64)
    census = {"start": starts, "end": ends,
              "is_primary": np.ones(n, np.int8),
              "name": np.arange(n, dtype=np.int64)}

    def exploding_cover(*a):  # the device kernel must NOT be called
        raise AssertionError("device cover kernel used beyond int32 budget")

    windows = []
    for _ in range(25):
        s = rng.randrange(0, 1_990_000_000)
        windows.append((s, s + rng.randrange(100, 30_000)))
    rows = assign_gt_del_ins(windows, [set() for _ in windows], census,
                             cover_fn=exploding_cover)
    exp = [int(np.sum((starts <= s) & (ends >= e))) for s, e in windows]
    assert [r[1] for r in rows] == exp  # DR == exact host cover counts


def test_assign_gt_ranks_duplicate_support_keys():
    """Duplicate read ranks in a support collection count once (DV and
    the covers intersection), matching the string-identity path — and DR
    can never go negative from double-counting."""
    from cutesv_tpu.genotype import assign_gt_del_ins

    census = {"start": np.array([100, 500], np.int64),
              "end": np.array([9_000, 9_500], np.int64),
              "is_primary": np.array([1, 1], np.int8),
              "name": np.array([7, 8], np.int64)}
    # both primaries cover the window; support lists rank 7 three times
    rows_dup = assign_gt_del_ins([(1000, 2000)], [[7, 7, 7]], census)
    rows_set = assign_gt_del_ins([(1000, 2000)], [{7}], census)
    assert rows_dup == rows_set
    dv, dr = rows_dup[0][0], rows_dup[0][1]
    assert (dv, dr) == (1, 1)

    # string-identity census agrees
    census_s = {"start": census["start"], "end": census["end"],
                "is_primary": census["is_primary"],
                "name": ["r7", "r8"]}
    rows_s = assign_gt_del_ins([(1000, 2000)], [["r7", "r7", "r7"]],
                               census_s)
    assert rows_s[0][:2] == [1, 1]
    assert rows_s[0] == rows_dup[0]


def test_make_sharded_cover_too_few_devices():
    """make_sharded_cover with more shards than any backend has devices
    returns None (callers fall back to a serial kernel) instead of
    building an undersized mesh."""
    from cutesv_tpu.parallel.sharded_cover import make_sharded_cover

    assert make_sharded_cover(512) is None


def test_call_gt_tra_unknown_contig_degrades():
    """An SA-tag contig absent from the BAM header: the reference would
    kill the whole chromosome task (bare except, cuteSV:1193); ours
    degrades that breakend's genotype to the unresolvable form."""
    from cutesv_tpu.genotype import ReadTable, call_gt_tra

    tables = {"chr1": ReadTable([100], [900], [1], ["r1"])}
    out = call_gt_tra(tables, {"chr1": 10_000}, 500, 777, "chr1",
                      "chrUnknown", {"r1"}, 50, 500)
    assert out == (1, ".", "./.", ".,.,.", ".", ".")


def test_cover_counts_vectorized_equals_fenwick():
    """The searchsorted identity (cover = #start<=s - #end<e + #inside)
    must equal the Fenwick sweep oracle, including reads SHORTER than
    the windows (the inside term) and boundary ties."""
    import numpy as np

    from cutesv_tpu.genotype import _cover_counts_fenwick, cover_counts

    rng = np.random.default_rng(7)
    for trial in range(20):
        n_r = int(rng.integers(1, 400))
        n_sv = int(rng.integers(1, 60))
        starts = rng.integers(0, 1000, n_r)
        lens = rng.integers(1, 120, n_r)  # many reads shorter than windows
        ends = starts + lens
        wins = []
        for _ in range(n_sv):
            s = int(rng.integers(0, 1000))
            wins.append((s, s + int(rng.integers(1, 200))))
        got = cover_counts(wins, starts, ends)
        want = _cover_counts_fenwick(wins, starts, ends)
        assert np.array_equal(got, want), (trial, got, want)
    # exact boundary semantics: start <= s (inclusive), end >= e (inclusive)
    assert cover_counts([(10, 20)], np.array([10]), np.array([20]))[0] == 1
    assert cover_counts([(10, 20)], np.array([11]), np.array([20]))[0] == 0
    assert cover_counts([(10, 20)], np.array([10]), np.array([19]))[0] == 0
