#!/usr/bin/env python
"""BND-storm micro-benchmark, three-way (round-3 verdict item 2):

  1. round-1 per-row loop + full-table fetch scans (resolve_tra_oracle
     with ReadTable._window forced off),
  2. the numpy host path (resolve_tra, inline count_coverage replay),
  3. the TPU device path: pair-cluster kernel
     (resolve_tra_start/compact/finish) + batched cover-kernel
     genotyping with exact early-exit replay (_tra_cover_pass) — the
     production --engine device composition.

Synthesizes a cancer/ONT-like breakend storm — many TRA clusters against
several mate chromosomes over a dense read census with rank-identity
names (the native store's shape) — and reports all three wall times.
Outputs must be identical across the three arms.

Usage: python tools/bench_tra.py [n_sigs] [census_rows]
Env: CUTESV_TRA_BENCH_PLATFORM=cpu to skip the real-chip attach.
"""
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def build_storm(n_sigs: int, census_rows: int, seed: int = 1):
    from cutesv_tpu.genotype import ReadTable

    rng = random.Random(seed)
    # scale the genome with the census so coverage stays ONT/HiFi-like
    # (~30x): a fixed genome would push cover counts past the
    # reference's threshold_ref_count cap at every site, turning the
    # whole run into the exact-replay slow path on both arms (capped at
    # 990 Mb to stay inside the cover kernel's int32 coordinate budget)
    chrom_len = min(990_000_000,
                    max(200_000_000, census_rows * 22_500 // 30))
    mates = ["chr2", "chr3", "chr5", "chr11", "chr17", "chr22"]
    tables = {}
    chrom_lengths = {"chr1": chrom_len}
    names = []
    for c in mates:
        chrom_lengths[c] = chrom_len
    chr1_names = None
    for c in ["chr1"] + mates:
        n = census_rows if c == "chr1" else census_rows // 4
        starts = sorted(rng.randrange(0, chrom_len - 60_000)
                        for _ in range(n))
        ends = [s + rng.randrange(5_000, 40_000) for s in starts]
        prim = [1 if rng.random() < 0.8 else 0 for _ in range(n)]
        # rank-identity names, globally unique primaries (the native
        # store's invariant, which enables the batched TRA fast path)
        rids = []
        for _ in range(n):
            rids.append(len(names))
            names.append("q%07d" % len(names))
        tables[c] = ReadTable(starts, ends, prim, rids)
        if c == "chr1":
            chr1_names = rids

    # ~10 sigs per breakend site, jittered inside the 50bp TRA bias;
    # support rids reference real chr1 reads
    sigs = []
    n_sites = max(1, n_sigs // 10)
    for s in range(n_sites):
        t = rng.choice("ABCD")
        c2 = rng.choice(mates)
        p1 = rng.randrange(10_000, chrom_len - 10_000)
        p2 = rng.randrange(10_000, chrom_len - 10_000)
        for k in range(10):
            sigs.append((t, p1 + rng.randrange(0, 30),
                         c2, p2 + rng.randrange(0, 30),
                         rng.choice(chr1_names)))
    sigs.sort(key=lambda r: (r[2], r[0], r[1], r[3], r[4]))
    return sigs, tables, chrom_lengths, names


def run_device(sigs, tables, chrom_lengths, names, args):
    """The production device composition: cluster kernel + shared
    batched cover genotyping (pipeline's tra_batch path)."""
    from cutesv_tpu.config import Config
    from cutesv_tpu.models import device as dm
    from cutesv_tpu.pipeline import _tra_cover_pass
    from cutesv_tpu.sigstore import SigStore

    chrom, min_sup, ratio, bias, _, _, action, gt_round = args
    state = dm.resolve_tra_start(sigs, min_sup, bias)
    dm.prefetch_counts(state)
    state = dm.resolve_tra_compact(state)
    dm.prefetch_to_host(state)
    jobs = []
    cands = dm.resolve_tra_finish(state, sigs, chrom, min_sup, ratio,
                                  bias, tables, chrom_lengths, action,
                                  gt_round, names=names, jobs_out=jobs)
    if action:
        store = SigStore(sigs={}, census={}, read_tables=tables,
                         chrom_lengths=chrom_lengths, names=names)
        cfg = Config(min_support=min_sup, max_cluster_bias_TRA=bias,
                     gt_round=gt_round, genotype=True, engine="device")
        _tra_cover_pass({chrom: (cands, jobs)}, store, cfg)
    return cands


def main():
    if os.environ.get("CUTESV_TRA_BENCH_PLATFORM"):
        import jax
        jax.config.update("jax_platforms",
                          os.environ["CUTESV_TRA_BENCH_PLATFORM"])
    n_sigs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    census = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000

    from cutesv_tpu.models.host import resolve_tra, resolve_tra_oracle

    sigs, tables, chrom_lengths, names = build_storm(n_sigs, census)
    args = ("chr1", 3, 0.6, 50, tables, chrom_lengths, True, 500)

    # warm: device attach + the shape ladder's kernel compiles land
    # here, not in the timing (production pays them once per process,
    # then every chromosome reuses the compiled buckets)
    run_device(sigs, tables, chrom_lengths, names, args)

    # interleaved min-of-3 for the two production arms: this VM's CPU
    # speed drifts between windows (same discipline as bench.py)
    dev_runs, host_runs = [], []
    for _ in range(3):
        t0 = time.time()
        dev = run_device(sigs, tables, chrom_lengths, names, args)
        dev_runs.append(time.time() - t0)
        t0 = time.time()
        fast = resolve_tra(sigs, *args, names=names)
        host_runs.append(time.time() - t0)
    dt_dev, dt_fast = min(dev_runs), min(host_runs)

    # round-1 behavior: per-row loops + full-table fetch scans
    for t in tables.values():
        t._sorted = False
    t0 = time.time()
    slow = resolve_tra_oracle(sigs, *args, names=names)
    dt_slow = time.time() - t0
    for t in tables.values():
        t._sorted = None

    assert fast == slow, "numpy host diverges from the loop oracle"
    assert dev == fast, "device path diverges from the numpy host"
    print("BND storm: %d sigs, %d emitted candidates, census %d rows"
          % (len(sigs), len(fast), census))
    print("device(kernel+batched cover): %.3fs   numpy host: %.3fs   "
          "round-1 loop: %.3fs" % (dt_dev, dt_fast, dt_slow))
    print("device vs host: %.2fx   host vs loop: %.1fx"
          % (dt_fast / max(dt_dev, 1e-9), dt_slow / max(dt_fast, 1e-9)))


if __name__ == "__main__":
    main()
