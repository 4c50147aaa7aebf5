#!/usr/bin/env python
"""Real-chip kernel-efficiency benchmark (round-4 verdict item 4).

Measures the three device kernels the pipeline dispatches — the DEL/INS
cluster-structure kernel, the DUP/INV pair-cluster kernel, and the
genotype cover kernel — at realistic volume (>= 1 M signature rows,
>= 1 M census rows), and states each against a same-hardware roofline
measured in the same session with the same methodology:

  * streaming roofline: achieved bytes/s of a jitted elementwise
    copy-add at the kernel's working-set size (the HBM-bound ceiling
    for memory-bound work)
  * sort roofline: achieved rows/s of a bare device lexsort-2 at the
    same row count (the cluster kernels are sort-dominated, so the
    honest ceiling is "how fast can this chip sort these rows at all")
  * compare roofline: achieved compares/s of the bare tile
    compare+reduce that IS the cover kernel's inner loop

Measurement discipline for the remote-tunnel chip: per-call
block_until_ready measured FASTER than the tunnel round trip (it was
timing dispatch, and identical repeated dispatches can be served
without re-execution), so every rep uses a DIFFERENT input (one
element varied) and completion is forced by fetching a small
data-dependent reduction of every rep's full output to the host. The
readback RTTs are included, making every number conservative rather
than inflated.

Prints one JSON line; run on the real chip (default backend). Results
are recorded in docs/KERNELS.md.

Reference being characterized: the reference has no device kernels —
its equivalents are the per-chromosome python loops of
cuteSV_resolveINDEL/DUP/INV.py and the overlap_cover sweep
(cuteSV_genotype.py:95-159).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("KBENCH_REPS", "8"))
N_ROWS = int(os.environ.get("KBENCH_ROWS", str(1 << 20)))
N_READS = int(os.environ.get("KBENCH_READS", str(1 << 20)))
N_SV = int(os.environ.get("KBENCH_SV", str(1 << 15)))
RTT_S = 0.0  # measured in main(); subtracted from small measurements


def _timed(step, n_reps=None):
    """Per-call seconds of ``step(i) -> small device array`` where the
    return value depends on the rep's FULL computation. Warm on i=0,
    then time n_reps distinct calls with one host readback each (the
    readback is the completion proof); best of 3 windows."""
    import jax

    n_reps = n_reps or REPS
    jax.device_get(step(0))  # warm/compile
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(n_reps):
            jax.device_get(step(1 + w * n_reps + i))
        best = min(best, (time.perf_counter() - t0) / n_reps)
    return best


def bench_rtt():
    """Round-trip floor of the dispatch+readback pattern itself (a
    trivial computation on 8 elements): subtracted from the small
    measurements so they report device time, not tunnel latency."""
    import jax
    import jax.numpy as jnp

    x = jnp.arange(8, dtype=jnp.int32)
    f = jax.jit(lambda a, k: (a + k).sum())

    def step(i):
        return f(x, jnp.int32(i))

    return _timed(step)


def bench_stream_roofline(nbytes, rtt):
    """HBM streaming ceiling: 16 DEPENDENT transposes of an int32
    matrix inside one jit (dependent non-fusible memory passes — an
    elementwise chain would fuse into a single pass) -> bytes/s moved
    (read + write per pass)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    side = int(np.sqrt(nbytes // 4))
    x = jnp.asarray(np.arange(side * side, dtype=np.int32)
                    .reshape(side, side))
    K = 16

    @jax.jit
    def f(a, k):
        def body(i, m):
            return m.T + (k + i)
        return lax.fori_loop(0, K, body, a).sum(dtype=jnp.int32)

    def step(i):
        return f(x, jnp.int32(i))

    dt = max(_timed(step) - rtt, 1e-9)
    return 2.0 * side * side * 4 * K / dt


def bench_sort_roofline(n, rtt):
    """Bare 2-key device lexsort at n rows: 4 DEPENDENT sorts chained
    inside one jit (sorts cannot fuse) -> rows/s per sort."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    k1 = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    k2 = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
    K = 4

    @jax.jit
    def f(a, b, k):
        def body(i, ab):
            a, b = ab
            perm = jnp.lexsort((b, a ^ (k + i)))
            return a[perm], b[perm]
        a, b = lax.fori_loop(0, K, body, (a, b))
        return a[:: max(1, n // 7)].sum()

    def step(i):
        return f(k1, k2, jnp.int32(i))

    dt = max(_timed(step) - rtt, 1e-9) / K
    return n / dt


def make_indel_stream(n, seed=0):
    rng = np.random.default_rng(seed)
    n_loci = max(1, n // 40)
    loci = np.sort(rng.integers(0, 200_000_000, size=n_loci))
    pos = np.sort(loci[rng.integers(0, n_loci, size=n)]
                  + rng.integers(-60, 60, size=n)).astype(np.int32)
    length = rng.integers(30, 5000, size=n).astype(np.int32)
    rid = rng.integers(0, n // 4, size=n).astype(np.int32)
    return pos, length, rid


def bench_indel_cluster(n):
    import jax
    import jax.numpy as jnp

    from cutesv_tpu.ops.indel_cluster import indel_cluster_structure

    pos, length, rid = make_indel_stream(n)
    jpos, jlen, jrid = (jnp.asarray(pos), jnp.asarray(length),
                        jnp.asarray(rid))

    @jax.jit
    def step_fn(pos, length, rid, k):
        out = indel_cluster_structure(pos + k, length, rid,
                                      jnp.int32(n - 64), jnp.int32(200),
                                      jnp.int32(10), n)
        return sum(jnp.asarray(v).sum(dtype=jnp.int64)
                   for v in out.values()
                   if hasattr(v, "sum"))

    def step(i):
        return step_fn(jpos, jlen, jrid, jnp.int32(i))

    dt = max(_timed(step) - RTT_S, 1e-9)
    return {"rows": n, "s": round(dt, 4), "rows_per_s": round(n / dt),
            "bytes_per_s": round(3 * 4 * n / dt)}


def bench_pair_cluster(n):
    import jax
    import jax.numpy as jnp

    from cutesv_tpu.ops.pair_cluster import pair_cluster_structure

    pos, length, rid = make_indel_stream(n, seed=1)
    k1, k2 = jnp.asarray(pos), jnp.asarray(pos + length)
    aux = jnp.zeros(n, jnp.int32)
    jrid = jnp.asarray(rid)

    @jax.jit
    def step_fn(k1, k2, aux, rid, k):
        out = pair_cluster_structure(k1 + k, k2 + k, aux, rid,
                                     jnp.int32(n - 64), jnp.int32(200),
                                     jnp.int32(10), n, False)
        return sum(jnp.asarray(v).sum(dtype=jnp.int64)
                   for v in out.values()
                   if hasattr(v, "sum"))

    def step(i):
        return step_fn(k1, k2, aux, jrid, jnp.int32(i))

    dt = max(_timed(step) - RTT_S, 1e-9)
    return {"rows": n, "s": round(dt, 4), "rows_per_s": round(n / dt),
            "bytes_per_s": round(4 * 4 * n / dt)}


def bench_cover(n_sv, n_reads):
    """End-to-end cover_counts_device (incl. host padding + upload) plus
    the bare device compare ceiling at the same tile shape."""
    import jax.numpy as jnp

    from cutesv_tpu.ops import sweep

    rng = np.random.default_rng(2)
    starts = np.sort(rng.integers(0, 200_000_000, n_reads))
    ends = starts + rng.integers(5_000, 25_000, n_reads)
    s = np.sort(rng.integers(0, 200_000_000, n_sv))

    def e2e(i):
        wins = list(zip((s + i).astype(float), (s + i + 2000).astype(float)))
        return sweep.cover_counts_device(wins, starts, ends)

    e2e(0)  # warm
    best = float("inf")
    for w in range(2):
        t0 = time.perf_counter()
        e2e(1 + w)
        best = min(best, time.perf_counter() - t0)
    sp = -(-n_sv // sweep._SV_CHUNK) * sweep._SV_CHUNK
    rp = -(-n_reads // sweep._READ_CHUNK) * sweep._READ_CHUNK
    compares = float(sp) * rp

    # bare compare+reduce ceiling at the kernel's own tile shape, same
    # varied-input + readback discipline
    st_t = jnp.asarray(np.resize(starts.astype(np.int32),
                                 sweep._READ_CHUNK
                                 ).reshape(-1, sweep._READ_TILE))
    en_t = jnp.asarray(np.resize(ends.astype(np.int32),
                                 sweep._READ_CHUNK
                                 ).reshape(-1, sweep._READ_TILE))
    sv_s = jnp.asarray(np.resize((2 * s).astype(np.int32),
                                 sweep._SV_CHUNK))
    sv_e = jnp.asarray(np.resize((2 * s + 4000).astype(np.int32),
                                 sweep._SV_CHUNK))

    # chain K dependent tile scans inside one jit so the per-iteration
    # cost is far above the RTT-subtraction noise floor (a single scan
    # is ~RTT-sized, making the subtracted residual unstable)
    import jax
    from jax import lax

    K = 8

    @jax.jit
    def bare_k(sv_s, sv_e, st_t, en_t, k):
        def body(i, tot):
            return tot + sweep._cover_scan(sv_s + k + i, sv_e + k + i,
                                           st_t, en_t)
        return lax.fori_loop(
            0, K, body,
            jnp.zeros(sv_s.shape[0], jnp.int32)).sum()

    def bare_step(i):
        return bare_k(sv_s, sv_e, st_t, en_t, jnp.int32(i))

    dt_bare = max(_timed(bare_step) - RTT_S, 1e-9) / K
    bare_cps = sweep._SV_CHUNK * float(sweep._READ_CHUNK) / dt_bare
    return {"n_sv": n_sv, "n_reads": n_reads, "s": round(best, 4),
            "compares_per_s": round(compares / best),
            "bare_tile_compares_per_s": round(bare_cps),
            "efficiency_vs_bare_tile": round(compares / best / bare_cps,
                                             3)}


def main():
    import jax

    backend = jax.default_backend()
    out = {"backend": backend,
           "device": str(jax.devices()[0]),
           "n_rows": N_ROWS,
           "methodology": "varied inputs + data-dependent readback per "
                          "rep (includes tunnel RTT; conservative)"}
    t0 = time.time()
    global RTT_S
    RTT_S = bench_rtt()
    out["rtt_s"] = round(RTT_S, 4)
    out["stream_roofline_bytes_per_s"] = round(
        bench_stream_roofline(128 << 20, RTT_S))
    out["sort_roofline_rows_per_s"] = round(
        bench_sort_roofline(N_ROWS, RTT_S))
    ic = bench_indel_cluster(N_ROWS)
    pc = bench_pair_cluster(N_ROWS)
    cv = bench_cover(N_SV, N_READS)
    out["indel_cluster"] = ic
    out["pair_cluster"] = pc
    out["cover"] = cv
    # the cluster kernels are sort-dominated (three lexsorts + segment
    # reductions); state them against the bare-sort ceiling
    out["indel_cluster"]["vs_sort_roofline"] = round(
        ic["rows_per_s"] / out["sort_roofline_rows_per_s"], 3)
    out["pair_cluster"]["vs_sort_roofline"] = round(
        pc["rows_per_s"] / out["sort_roofline_rows_per_s"], 3)
    out["total_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
