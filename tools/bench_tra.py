#!/usr/bin/env python
"""BND-storm micro-benchmark: the array-at-a-time TRA resolver + sorted-
window count_coverage replay vs the round-1 per-row loop + full-table
scan (kept as resolve_tra_oracle; the old fetch is reproduced by forcing
ReadTable._window off).

Synthesizes a cancer/ONT-like breakend storm — many TRA clusters against
several mate chromosomes over a dense read census — and reports both
implementations' wall time and the speedup. Outputs must be identical.

Usage: python tools/bench_tra.py [n_sigs] [census_rows]
"""
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from cutesv_tpu.genotype import ReadTable  # noqa: E402
from cutesv_tpu.models.host import (resolve_tra,  # noqa: E402
                                    resolve_tra_oracle)


def build_storm(n_sigs: int, census_rows: int, seed: int = 1):
    rng = random.Random(seed)
    chrom_len = 200_000_000
    mates = ["chr2", "chr3", "chr5", "chr11", "chr17", "chr22"]
    # ~10 sigs per breakend site, jittered inside the 50bp TRA bias
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
                         "q%07d" % rng.randrange(2_000_000)))
    sigs.sort(key=lambda r: (r[2], r[0], r[1], r[3], r[4]))

    tables = {}
    chrom_lengths = {"chr1": chrom_len}
    for c in mates:
        chrom_lengths[c] = chrom_len
    for c in ["chr1"] + mates:
        n = census_rows if c == "chr1" else census_rows // 4
        starts = sorted(rng.randrange(0, chrom_len - 60_000)
                        for _ in range(n))
        ends = [s + rng.randrange(5_000, 40_000) for s in starts]
        prim = [1 if rng.random() < 0.8 else 0 for _ in range(n)]
        names = ["q%07d" % rng.randrange(2_000_000) for _ in range(n)]
        tables[c] = ReadTable(starts, ends, prim, names)
    return sigs, tables, chrom_lengths


def main():
    n_sigs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    census = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    sigs, tables, chrom_lengths = build_storm(n_sigs, census)
    args = ("chr1", 3, 0.6, 50, tables, chrom_lengths, True, 500)

    t0 = time.time()
    fast = resolve_tra(sigs, *args)
    dt_fast = time.time() - t0

    # round-1 behavior: per-row loops + full-table fetch scans
    for t in tables.values():
        t._sorted = False
    t0 = time.time()
    slow = resolve_tra_oracle(sigs, *args)
    dt_slow = time.time() - t0

    assert fast == slow, "implementations diverge"
    print("BND storm: %d sigs, %d emitted candidates, census %d rows"
          % (len(sigs), len(fast), census))
    print("vectorized: %.3fs   round-1 loop: %.3fs   speedup: %.1fx"
          % (dt_fast, dt_slow, dt_slow / max(dt_fast, 1e-9)))


if __name__ == "__main__":
    main()
