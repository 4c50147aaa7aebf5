#!/usr/bin/env python
"""End-to-end benchmark: reads/s through the full calling pipeline.

Builds (and caches) a synthetic long-read dataset — 20x coverage of a
random genome with planted DEL/INS SVs, HiFi-like noise indels above and
below the signature threshold — then times:

  * the TPU engine (native C++ decode -> device cluster/genotype kernels)
  * the reference-equivalent Python pipeline (python decode + host
    resolvers), standing in for cuteSV's per-read Python hot loops

Prints ONE JSON line: {"metric", "value" (reads/s), "unit", "vs_baseline"}.

Env knobs: BENCH_MB (genome Mb, default 100), BENCH_BASELINE=0 to skip the
slow baseline and reuse the last measured rate from the cache.
"""
import json
import os
import sys
import time

# keep glibc from mmap/munmap-ing every large numpy buffer: this VM
# intermittently services first-touch of NEW pages at ~25 MB/s (hypervisor
# memory pressure), while re-writing already-mapped heap pages stays at
# memory speed. Heap reuse sidesteps the tax; glibc only reads these at
# startup, so re-exec once if unset.
if os.environ.get("MALLOC_MMAP_THRESHOLD_") is None:
    env = dict(os.environ,
               MALLOC_MMAP_THRESHOLD_="1073741824",
               MALLOC_TRIM_THRESHOLD_="1073741824")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache")

READ_LEN = int(os.environ.get("BENCH_READ_LEN", "20000"))
COVERAGE = 20


def _codes_to_str(codes):
    return (np.frombuffer(b"ACGT", np.uint8)[codes]).tobytes().decode()


def _revcomp_codes(codes):
    return (3 - codes)[::-1]


def _sa(chrom, pos0, strand, cig):
    return "%s,%d,%s,%s,60,0;" % (chrom, pos0 + 1, strand, cig)


def build_dataset(genome_mb: int, seed: int = 0):
    """Synthesize ref.fa + sim.bam under CACHE; returns paths.

    All-type corpus ("at2"): CIGAR DEL/INS carriers + HiFi-like noise
    indels, SA-tag split-read junction reads (with their supplementary
    records) for DUP / INV (both ++ and -- signatures) / cross-chrom BND,
    mixed mapq (some reads below min_mapq), secondary alignments, and
    stray sub-min_support junction noise -- every resolver and the
    split-read state machine contribute to the headline number
    (round-1 verdict: the old CIGAR-only corpus exercised neither).

    Deliberately self-contained rather than delegating to
    tools/simulate.py: the exact byte layout here keys the on-disk
    dataset cache and the recorded baseline rates -- changing the
    generator would silently invalidate cross-round bench comparisons
    (which is why the tag carries the corpus revision).
    """
    os.makedirs(CACHE, exist_ok=True)
    tag = "g%dmb4chr_c%dx_at2" % (genome_mb, COVERAGE)
    if READ_LEN != 20000:
        tag += "_rl%d" % READ_LEN
    bam = os.path.join(CACHE, "sim_%s.bam" % tag)
    fa = os.path.join(CACHE, "ref_%s.fa" % tag)
    meta = os.path.join(CACHE, "meta_%s.json" % tag)
    if os.path.exists(bam) and os.path.exists(fa) and os.path.exists(meta):
        return bam, fa, json.load(open(meta))
    from cutesv_tpu.io.bam import BamWriter

    rng = np.random.default_rng(seed)
    n_chroms = 4
    n = genome_mb * 1_000_000 // n_chroms  # per chromosome
    chrom_names = ["chr%d" % (i + 1) for i in range(n_chroms)]

    # reference first: junction reads need the partner chromosome's bases
    refs = [rng.integers(0, 4, size=n, dtype=np.uint8)
            for _ in range(n_chroms)]

    # ---- plant SV sites -------------------------------------------------
    # every 50 kb cycling DEL,INS,DUP,INV; TRA every 500 kb (offset 25 kb)
    junctions = {c: [] for c in range(n_chroms)}
    n_sv_total = 0

    def jread(qname, cid, pos, cig, seq_codes, tags, flag=0):
        junctions[cid].append((pos, qname, flag, cig,
                               _codes_to_str(seq_codes), tags))

    def dup_pair(qname, cid, p, L, jit):
        """Tandem-dup junction: primary 1000M1000S at p+L-1000 with a
        backward SA jump to p -> DUP sig (p+jit, p+L+jit)."""
        chrom = chrom_names[cid]
        ref = refs[cid]
        a, b = p + L - 1000 + jit, p + jit
        seq = np.concatenate([ref[a:a + 1000], ref[b:b + 1000]])
        jread(qname, cid, a, [(0, 1000), (4, 1000)], seq,
              {"SA": _sa(chrom, b, "+", "1000S1000M")})
        jread(qname, cid, b, [(4, 1000), (0, 1000)], seq,
              {"SA": _sa(chrom, a, "+", "1000M1000S")}, flag=2048)

    def inv_pair(qname, cid, x, L, jit, form):
        """Inversion junction; form '++' -> sig (x+jit, x+L+jit) strand ++,
        form '--' -> same breakpoints strand --."""
        chrom = chrom_names[cid]
        ref = refs[cid]
        if form == "++":
            a = x - 1000 + jit            # primary: [a, a+1000) '+'
            b = x + L - 1000 + jit        # SA: [b, b+1000) '-'
            seq = np.concatenate([ref[a:a + 1000],
                                  _revcomp_codes(ref[b:b + 1000])])
            jread(qname, cid, a, [(0, 1000), (4, 1000)], seq,
                  {"SA": _sa(chrom, b, "-", "1000M1000S")})
            jread(qname, cid, b, [(0, 1000), (4, 1000)],
                  _revcomp_codes(seq),
                  {"SA": _sa(chrom, a, "+", "1000M1000S")}, flag=2064)
        else:
            a = x + jit                   # SA: [a, a+1000) '-'
            b = x + L + jit               # primary: [b, b+1000) '+'
            seq = np.concatenate([_revcomp_codes(ref[a:a + 1000]),
                                  ref[b:b + 1000]])
            jread(qname, cid, b, [(4, 1000), (0, 1000)], seq,
                  {"SA": _sa(chrom, a, "-", "1000S1000M")})
            jread(qname, cid, a, [(4, 1000), (0, 1000)],
                  _revcomp_codes(seq),
                  {"SA": _sa(chrom, b, "+", "1000S1000M")}, flag=2064)

    def tra_pair(qname, cid_a, p, cid_b, q, jit):
        """Cross-chromosome breakend: chrA [p-1000,p) '+' then chrB
        [q, q+1000) '+'."""
        a = p - 1000 + jit
        b = q + jit
        seq = np.concatenate([refs[cid_a][a:a + 1000],
                              refs[cid_b][b:b + 1000]])
        jread(qname, cid_a, a, [(0, 1000), (4, 1000)], seq,
              {"SA": _sa(chrom_names[cid_b], b, "+", "1000S1000M")})
        jread(qname, cid_b, b, [(4, 1000), (0, 1000)], seq,
              {"SA": _sa(chrom_names[cid_a], a, "+", "1000M1000S")},
              flag=2048)

    sv_loci_by_chrom = {c: [] for c in range(n_chroms)}
    for cid in range(n_chroms):
        p = 100_000
        k = 0
        while p < n - 100_000:
            t = ("DEL", "INS", "DUP", "INV")[k % 4]
            if t in ("DEL", "INS"):
                svlen = int(rng.integers(60, 400))
                sv_loci_by_chrom[cid].append((p, t, svlen))
            elif t == "DUP":
                L = int(rng.integers(500, 2000))
                for i in range(10):
                    dup_pair("%s_dupJ%06d_%02d" % (chrom_names[cid], p, i),
                             cid, p, L, i * 7)
            else:  # INV: 5 ++ reads and 5 -- reads at the same locus
                L = int(rng.integers(1000, 5000))
                for i in range(5):
                    inv_pair("%s_invP%06d_%02d" % (chrom_names[cid], p, i),
                             cid, p, L, i * 7, "++")
                    inv_pair("%s_invM%06d_%02d" % (chrom_names[cid], p, i),
                             cid, p, L, i * 7, "--")
            n_sv_total += 1
            k += 1
            p += 50_000
        # TRA to the next chromosome, every 500 kb at offset 25 kb
        q0 = 525_000
        while q0 < n - 100_000:
            cid_b = (cid + 1) % n_chroms
            for i in range(10):
                tra_pair("%s_traJ%06d_%02d" % (chrom_names[cid], q0, i),
                         cid, q0, cid_b, q0 + 137, i * 3)
            n_sv_total += 1
            q0 += 500_000
        # stray sub-min_support junction noise every ~200 kb
        s0 = 137_500
        while s0 < n - 100_000:
            dup_pair("%s_strayJ%06d" % (chrom_names[cid], s0), cid, s0,
                     777, 0)
            s0 += 200_000
    for cid in range(n_chroms):
        junctions[cid].sort(key=lambda r: r[0])

    step = READ_LEN // COVERAGE
    n_reads = 0
    with BamWriter(bam, [(c, n) for c in chrom_names]) as w, \
            open(fa, "w") as fa_out:
      for chrom_id, chrom_name in enumerate(chrom_names):
        ref_codes = refs[chrom_id]
        sv_loci = sv_loci_by_chrom[chrom_id]
        ins_seqs = {p: rng.integers(0, 4, size=l, dtype=np.uint8)
                    for p, t, l in sv_loci if t == "INS"}
        extras = junctions[chrom_id]
        ei = 0

        ridx = 0
        for start in range(0, n - READ_LEN, step):
            # interleave junction records at their coordinate-sorted slot
            while ei < len(extras) and extras[ei][0] <= start:
                jp, jq, jf, jc, js, jt = extras[ei]
                w.write(jq, jf, chrom_id, jp, 60, jc, js, jt)
                n_reads += 1
                ei += 1
            ridx += 1
            qname = "%s_r%06d" % (chrom_name, ridx)
            carrier = ridx % 2 == 0
            # mixed mapq + occasional secondary alignments
            mapq = 60
            if ridx % 13 == 0:
                mapq = 10        # below min_mapq: decoded, census-excluded
            elif ridx % 11 == 0:
                mapq = 20        # exactly at the default min_mapq gate
            flag = 256 if ridx % 37 == 0 else 0
            # collect events inside the read: planted SVs (if carrier) and
            # noise indels
            events = []  # (ref_pos, kind, len)
            if carrier:
                for p, t, l in sv_loci:
                    if start + 500 < p < start + READ_LEN - 500:
                        events.append((p, t, l))
            # noise: ~6 small (1-9 bp, below min_siglength) + ~5 medium
            # (10-30 bp) indels per read -- HiFi-like signature density
            for _ in range(6):
                off = int(rng.integers(600, READ_LEN - 600))
                events.append((start + off, "DEL" if rng.random() < 0.5
                               else "INS", int(rng.integers(1, 9))))
            for _ in range(5):
                off = int(rng.integers(600, READ_LEN - 600))
                events.append((start + off, "DEL" if rng.random() < 0.5
                               else "INS", int(rng.integers(10, 30))))
            events.sort()
            # build cigar + seq
            cigar = []
            chunks = []
            cur = start
            ref_remaining = READ_LEN
            for p, t, l in events:
                if p <= cur or p >= start + ref_remaining - 50:
                    continue
                m = p - cur
                cigar.append((0, m))
                chunks.append(ref_codes[cur:p])
                if t == "DEL":
                    cigar.append((2, l))
                    cur = p + l
                else:
                    cigar.append((1, l))
                    chunks.append(ins_seqs.get(
                        p, rng.integers(0, 4, size=l, dtype=np.uint8)))
                    cur = p
            end = start + READ_LEN
            cigar.append((0, end - cur))
            chunks.append(ref_codes[cur:end])
            seq = _codes_to_str(np.concatenate(chunks))
            w.write(qname, flag, chrom_id, start, mapq, cigar, seq)
            n_reads += 1
        while ei < len(extras):
            jp, jq, jf, jc, js, jt = extras[ei]
            w.write(jq, jf, chrom_id, jp, 60, jc, js, jt)
            n_reads += 1
            ei += 1

        fa_out.write(">%s\n" % chrom_name)
        s = _codes_to_str(ref_codes)
        for i in range(0, n, 10_000):
            fa_out.write(s[i:i + 10_000] + "\n")
    info = {"n_reads": n_reads, "n_sv": n_sv_total}
    json.dump(info, open(meta, "w"))
    return bam, fa, info


def run_once(bam, fa, engine, decoder, outdir):
    from cutesv_tpu.config import Config
    from cutesv_tpu.pipeline import run_pipeline

    out = os.path.join(outdir, "bench_%s_%s.vcf" % (engine, decoder))
    cfg = Config(input=bam, reference=fa, output=out, work_dir=outdir,
                 genotype=True, min_support=3, engine=engine,
                 decoder=decoder)
    t0 = time.time()
    stats = run_pipeline(cfg, ["bench"])
    dt = time.time() - t0
    return dt, stats, out


def run_pool_once(bam, fa, outdir):
    """Pool-parallel python baseline: the reference's multiprocessing
    architecture (Pool over chromosome decode tasks / type merges /
    per-chrom resolve+emit, cuteSV:1058-1236) over the same python
    oracle stack the 1-process baseline times. Its one-time virtual
    offset index (the .bai equivalent) is built+cached untimed."""
    from cutesv_tpu.config import Config
    from cutesv_tpu.tools import baseline_pool

    baseline_pool.build_chrom_index(bam)  # cached; untimed like .bai
    out = os.path.join(outdir, "bench_pool.vcf")
    cfg = Config(input=bam, reference=fa, output=out, work_dir=outdir,
                 genotype=True, min_support=3, engine="host",
                 decoder="python")
    t0 = time.time()
    stats = baseline_pool.run_pool_baseline(cfg, ["bench"])
    dt = time.time() - t0
    return dt, stats, out


def ont_lane(outdir):
    """Secondary ONT-density lane (round-4 verdict item 2): the messy
    stress corpus (ONT-like noise density, lognormal read lengths,
    coverage waves, chimeras, clip storms — tools/simulate.py
    simulate_messy) through the same interleaved native-vs-pooled
    protocol. The north-star metric is ONT-shaped (BASELINE.json:
    'HG002 ONT reads/s per chip'); this lane reports the ratio on an
    ONT-shaped corpus next to the stable HiFi-like headline.

    Returns the artifact sub-dict, or None when skipped
    (BENCH_ONT=0)."""
    if os.environ.get("BENCH_ONT", "1") == "0":
        return None
    genome_mb = int(os.environ.get("BENCH_ONT_MB", "200"))
    prefix = os.path.join(CACHE, "messy_%dmb_v1" % genome_mb)
    bam, fa, meta = prefix + ".bam", prefix + ".fa", prefix + ".meta.json"
    if not (os.path.exists(bam) and os.path.exists(fa)
            and os.path.exists(meta)):
        from cutesv_tpu.tools.simulate import simulate_messy
        info = simulate_messy(prefix, float(genome_mb), n_chroms=2, seed=7)
        json.dump({"n_reads": info["n_reads"]}, open(meta, "w"))
    n_reads = json.load(open(meta))["n_reads"]
    from cutesv_tpu.tools import baseline_pool
    baseline_pool.build_chrom_index(bam)  # cached; untimed like .bai
    rate_file = prefix + ".poolrate.json"
    budget = int(os.environ.get("BENCH_ONT_TIMEOUT", "240"))
    native_runs, pool_runs = [], []
    vcf_native = vcf_pool = None
    run_once(bam, fa, "device", "native", outdir)  # warm (jit/attach)
    # BENCH_ONT_TIMEOUT gates whether further pooled-baseline reps
    # START; the hard stop for a stalled run is the caller's whole-lane
    # SIGALRM budget (a nested alarm here would cancel the outer one —
    # alarms don't stack)
    spent0 = time.time()
    for rep in range(2):
        dt_n, _, vcf_native = run_once(bam, fa, "device", "native", outdir)
        native_runs.append(dt_n)
        if time.time() - spent0 < budget:
            dt_p, _, vcf_pool = run_pool_once(bam, fa, outdir)
            pool_runs.append(dt_p)
    if pool_runs:
        pool_rate = n_reads / min(pool_runs)
        json.dump({"rate_pool": pool_rate, "nprocs": os.cpu_count()},
                  open(rate_file, "w"))
    elif os.path.exists(rate_file):
        pool_rate = json.load(open(rate_file)).get("rate_pool")
    else:
        pool_rate = None

    def _body(path):
        return open(path).read().split("#CHROM")[-1]

    identical = (_body(vcf_native) == _body(vcf_pool)
                 if vcf_pool else None)
    rate = n_reads / min(native_runs)
    return {
        "metric": "messy %dMb ONT-density end-to-end calling reads/s"
                  % genome_mb,
        "value": round(rate, 1),
        "unit": "reads/s",
        "vs_baseline_pool": (round(rate / pool_rate, 2)
                             if pool_rate else None),
        "corpus_id": _corpus_id(bam),
        "native_runs_s": [round(t, 2) for t in native_runs],
        "baseline_pool_runs_s": [round(t, 2) for t in pool_runs],
        "outputs_identical": identical,
    }


def cram_lane(outdir, bam, fa, n_reads, bam_wall_s):
    """CRAM-path lane (round-4 verdict item 4 of 'what's weak'): the
    ~4,700 lines of CRAM decode had zero performance numbers. Re-encode
    the bench corpus as reference-based CRAM 3.0 and a 3.1 twin with the
    in-repo writer (one-time, cached next to the BAM), run the native
    end-to-end pipeline on each, and report walls against the BAM lane
    measured in the same session. Reference capability matched:
    transparent CRAM input via pysam (cuteSV:1013)."""
    if os.environ.get("BENCH_CRAM", "1") == "0":
        return None
    out = {"vs_bam_wall_s": round(bam_wall_s, 2)}
    for ver, tagv in (((3, 0), "30"), ((3, 1), "31")):
        key = "cram%s" % tagv
        try:
            _cram_twin(out, key, ver, tagv, outdir, bam, fa, n_reads,
                       bam_wall_s)
        except TimeoutError:
            # the lane shares ONE SIGALRM budget: a cold-cache encode of
            # the second twin must not discard the first twin's
            # already-measured numbers — record the partial result
            out[key + "_error"] = "lane budget exceeded"
            break
    return out


def _cram_twin(out, key, ver, tagv, outdir, bam, fa, n_reads, bam_wall_s):
    """Encode (cached) + measure one CRAM twin; fills out[key+...]."""
    cram = bam[:-4] + ".v%s.cram" % tagv
    if not os.path.exists(cram):
        from cutesv_tpu.io.bam import BamReader
        from cutesv_tpu.io.cram import CramWriter
        from cutesv_tpu.io.fasta import FastaFile
        ff = FastaFile(fa)
        ref_seqs = {c: ff.fetch(c) for c in ff.references}
        t0 = time.time()
        # encode to a tmp path and publish atomically: the lane runs
        # under a SIGALRM budget, and a truncated .cram left at the
        # cached path would poison every later bench run
        tmp = "%s.tmp.%d" % (cram, os.getpid())  # pid-suffixed: two
        # concurrent bench runs must not truncate each other's
        # in-flight encode (each publishes atomically; last wins whole)
        try:
            with BamReader(bam) as r:
                with CramWriter(tmp, r.references, version=ver,
                                max_slice=10000, ref_seqs=ref_seqs) as w:
                    for rec in r:
                        w.write(rec)
            os.replace(tmp, cram)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        print("bench: encoded %s in %.1fs" % (cram, time.time() - t0),
              file=sys.stderr)
    walls = []
    best_stats = None
    for rep in range(2):
        dt, stats, _ = run_once(cram, fa, "device", "native", outdir)
        if not walls or dt < min(walls):
            best_stats = stats  # decode_s pairs with the min wall
        walls.append(dt)
    out[key + "_wall_s"] = round(min(walls), 2)
    out[key + "_vs_bam"] = round(min(walls) / bam_wall_s, 2)
    if best_stats and "decode_s" in best_stats:
        out[key + "_decode_s"] = round(best_stats["decode_s"], 2)
    out[key + "_reads_per_s"] = round(n_reads / min(walls), 1)


def _corpus_id(bam):
    """Cheap content id for the bench corpus: size + blake2 of the first
    and last MiB (full-file hashing would dominate small bench runs)."""
    import hashlib
    h = hashlib.blake2b(digest_size=8)
    size = os.path.getsize(bam)
    with open(bam, "rb") as fh:
        h.update(fh.read(1 << 20))
        fh.seek(max(0, size - (1 << 20)))
        h.update(fh.read(1 << 20))
    h.update(str(size).encode())
    return h.hexdigest()


def main():
    # 200 Mb default: the remote-TPU tunnel adds O(1s) weather noise
    # per run, which amortizes better over the longer corpus
    genome_mb = int(os.environ.get("BENCH_MB", "200"))
    bam, fa, info = build_dataset(genome_mb)
    n_reads = info["n_reads"]
    outdir = os.path.join(CACHE, "out")
    os.makedirs(outdir, exist_ok=True)

    rate_file = os.path.join(
        CACHE, "baseline_rate_%dmb_at2%s.json"
        % (genome_mb, "" if READ_LEN == 20000 else "_rl%d" % READ_LEN))
    do_baseline = os.environ.get("BENCH_BASELINE", "1") != "0" or \
        not os.path.exists(rate_file)

    # warm once: jit compile + remote-device attach + the VM's first-touch
    # page-population tax all land here, not in the measured runs
    dt_w, _, _ = run_once(bam, fa, "device", "native", outdir)

    # INTERLEAVED min-of-3 for BOTH paths (native, baseline, native, ...):
    # this VM's CPU speed drifts by up to 2x between measurement windows,
    # so timing the two paths in disjoint windows moved the ratio by +-50%
    # between rounds. Interleaving samples both paths across the same
    # weather; min-of-3 then compares like with like.
    import signal

    def _bail(sig, frame):
        raise TimeoutError()

    signal.signal(signal.SIGALRM, _bail)
    budget = int(os.environ.get("BENCH_BASELINE_TIMEOUT", "400"))
    native_runs = []
    base_runs = []
    pool_runs = []
    best_stats = None
    vcf_native = vcf_py = vcf_pool = None
    base_spent = 0.0
    for rep in range(3):
        dt_n, stats_n, vcf_native = run_once(bam, fa, "device", "native",
                                             outdir)
        if not native_runs or dt_n < min(native_runs):
            best_stats = stats_n
        native_runs.append(dt_n)
        # more baseline reps only while the total baseline budget holds
        # (one rep of each always runs so the ratios never fall back to
        # stale cached rates just because the budget is tight); the
        # POOLED baseline interleaves in the same weather window as the
        # 1-process one so both ratios compare like with like
        for runs, fn in ((base_runs,
                          lambda: run_once(bam, fa, "host", "python",
                                           outdir)),
                         (pool_runs,
                          lambda: run_pool_once(bam, fa, outdir))):
            expected = runs[-1] if runs else 0.0
            if do_baseline and (not runs
                                or base_spent + expected <= budget):
                t0 = time.time()
                signal.alarm(max(30, budget - int(base_spent)))
                try:
                    dt_b, _, out_vcf = fn()
                    runs.append(dt_b)
                    if runs is base_runs:
                        vcf_py = out_vcf
                    else:
                        vcf_pool = out_vcf
                except TimeoutError:
                    do_baseline = False
                finally:
                    base_spent += time.time() - t0
                    signal.alarm(0)

    dt_native = min(native_runs)
    identical = None
    baseline_provenance = "skipped"

    def _body(path):
        return open(path).read().split("#CHROM")[-1]

    if base_runs:
        base_rate = n_reads / min(base_runs)
        rates = {"rate": base_rate}
        if pool_runs:
            rates["rate_pool"] = n_reads / min(pool_runs)
            rates["nprocs"] = os.cpu_count()  # pool width the rate was
            #                    measured at; echoed when cache is reused
        json.dump(rates, open(rate_file, "w"))
        baseline_provenance = "fresh (interleaved min-of-%d)" % len(
            base_runs)
        if vcf_py is not None:
            identical = _body(vcf_native) == _body(vcf_py)
            if vcf_pool is not None:
                identical = identical and _body(vcf_pool) == _body(vcf_py)
    cached_pool_rate = None
    cached_pool_nprocs = None
    if not base_runs and os.path.exists(rate_file):
        cached = json.load(open(rate_file))
        base_rate = cached["rate"]
        # keep the cached POOL RATE for the ratio but do NOT synthesize a
        # wall-time entry in baseline_pool_runs_s — that array reports
        # measured runs only
        cached_pool_rate = cached.get("rate_pool")
        cached_pool_nprocs = cached.get("nprocs")
        baseline_provenance = "cached"
    elif not base_runs:
        base_rate = float("nan")
    pool_rate = (n_reads / min(pool_runs) if pool_runs
                 else cached_pool_rate)

    # measured decompression lower bound of THIS corpus on THIS host:
    # the decode stage cannot beat it, so the JSON carries the evidence
    # for how much of the wall is irreducible inflate
    floor_s = None
    try:
        from cutesv_tpu.io.native import get_lib
        lib = get_lib()
        # same worker count the decode stage's inflate uses (min of the
        # CLI default threads and hw, or the explicit override), so the
        # floor really is a lower bound for decode_s on any host
        env_it = int(os.environ.get("CUTESV_INFLATE_THREADS", "0"))
        nthr = env_it if env_it > 0 else min(
            16, max(2, os.cpu_count() or 1))
        f1 = float(lib.bamdecode_inflate_floor(bam.encode(), nthr))
        f2 = float(lib.bamdecode_inflate_floor(bam.encode(), nthr))
        cands = [x for x in (f1, f2) if x > 0]
        floor_s = round(min(cands), 2) if cands else None
    except Exception:
        pass

    rate = n_reads / dt_native
    result = {
        "metric": "synthetic %dMb 4-chrom %dx all-SV-type end-to-end calling "
                  "reads/s (native+TPU vs reference-equivalent python)" % (
                      genome_mb, COVERAGE),
        "value": round(rate, 1),
        "unit": "reads/s",
        # the HEADLINE ratio is vs the POOL-PARALLEL baseline — the
        # reference's own multiprocessing architecture (round-3 verdict:
        # a 1-process denominator overstates the ratio on multi-core
        # hosts); the 1-process ratio is reported alongside
        "vs_baseline": round(rate / (pool_rate or base_rate), 2),
        "vs_baseline_1p": round(rate / base_rate, 2),
        "vs_baseline_pool": (round(rate / pool_rate, 2)
                             if pool_rate else None),
        "baseline_pool_nprocs": (os.cpu_count() if pool_runs
                                 else cached_pool_nprocs),
        "corpus_id": _corpus_id(bam),
        "native_runs_s": [round(t, 2) for t in native_runs],
        "baseline_runs_s": [round(t, 2) for t in base_runs],
        "baseline_pool_runs_s": [round(t, 2) for t in pool_runs],
        "baseline_provenance": baseline_provenance,
        "stages_s": {k: round(best_stats[k], 2)
                     for k in ("decode_s", "native_s", "walk_s", "store_s",
                               "inflate_core_s", "records_core_s",
                               "overlap_work_s", "done_tail_s",
                               "resolve_s", "emit_s")
                     if best_stats and k in best_stats},
        "inflate_floor_s": floor_s,
        "outputs_identical": identical,
    }
    # fraction-of-achievable framing (round-4 verdict): on an N-core host
    # the native wall cannot beat inflate_floor_s + the post-decode tail,
    # so the maximum achievable pooled ratio is bounded — publish it so
    # the headline reads as a fraction of the host's bound, not of 10x
    if floor_s and best_stats and "decode_s" in best_stats:
        tail_s = max(0.0, dt_native - best_stats["decode_s"])
        denom = pool_rate and (n_reads / pool_rate)
        if denom:
            result["floor_bound_ratio"] = round(denom / (floor_s + tail_s), 2)
            if result.get("vs_baseline_pool"):
                result["achieved_fraction_of_bound"] = round(
                    result["vs_baseline_pool"]
                    / result["floor_bound_ratio"], 2)
    # secondary lanes, each under a hard SIGALRM budget: the driver only
    # records the final JSON line, so a lane that hangs (cold corpus
    # cache, pathological host) must abort rather than starve the
    # headline of its artifact
    def _lane(fn, budget):
        signal.alarm(budget)
        try:
            return fn()
        except TimeoutError:
            return {"error": "lane budget (%ds) exceeded" % budget}
        except Exception as e:
            return {"error": repr(e)}
        finally:
            signal.alarm(0)

    # ONT-density lane (separate corpus, separate ratio; the headline
    # above stays keyed to the stable at2 corpus)
    ont = _lane(lambda: ont_lane(outdir),
                int(os.environ.get("BENCH_ONT_LANE_BUDGET", "420")))
    if ont is not None:
        result["ont"] = ont

    # CRAM-path lane: same corpus re-encoded as CRAM 3.0/3.1, walls
    # against the BAM lane's best native wall from this session
    cram = _lane(lambda: cram_lane(outdir, bam, fa, n_reads, dt_native),
                 int(os.environ.get("BENCH_CRAM_LANE_BUDGET", "420")))
    if cram is not None:
        result["cram"] = cram

    print(json.dumps(result))
    # extra context on stderr (driver records stdout json only)
    print("native: %.2fs (%d calls)  baseline_1p: %.1f reads/s  "
          "baseline_pool: %s reads/s  outputs_identical=%s  warm=%.2fs"
          % (dt_native, best_stats["n_calls"], base_rate,
             ("%.1f" % pool_rate) if pool_rate else "n/a", identical,
             dt_w),
          file=sys.stderr)


if __name__ == "__main__":
    main()
