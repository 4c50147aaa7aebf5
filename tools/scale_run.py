"""Genome-scale pipeline measurement harness.

Runs the full native+device discovery pipeline on a corpus produced by
``cutesv_tpu.tools.simulate`` (e.g. the 3.1 Gb ``--human_layout`` human-
scale corpus) and prints one JSON line with the measurements the scale
story needs (docs/MEMORY.md): wall, per-stage split, calls, peak RSS and
its anonymous component.

Peak-RSS methodology (same as the round-3 1 Gb row): ``VmHWM`` of the
pipeline process counts the mmap'd input BAM's touched pages (clean,
file-backed, reclaimable — the round-3 reader maps the input read-only),
so the working-set figure reported is ``VmHWM - mapped input size``,
labelled ``anon_est_gb``.  ``rss_anon_end_gb`` (``/proc/self/status
RssAnon`` at pipeline end, before teardown) is reported as a cross-check
— it is an end-state, not a peak, but the store/census arrays that
dominate anonymous memory are still alive at that point.

Usage:
  python tools/scale_run.py PREFIX [--runs 2] [--min_support 10]

The reference claim being matched: scalability to real (human) genomes,
/root/reference/README.md:41; its own runs use multiprocessing pools +
pickle spills (cuteSV:1058-1236) where this pipeline is single-pass
in-RAM.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _proc_status():
    out = {}
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith(("VmHWM", "VmRSS", "RssAnon", "RssFile")):
                k, v = line.split(":", 1)
                out[k] = int(v.strip().split()[0]) * 1024  # kB -> bytes
    return out


def run_child(prefix: str, min_support: int) -> None:
    """Executed in a fresh process per run (clean VmHWM)."""
    from cutesv_tpu.config import Config
    from cutesv_tpu.pipeline import run_pipeline

    bam = prefix + ".bam"
    fa = prefix + ".fa"
    outdir = prefix + "_work"
    if os.path.isdir(outdir):
        shutil.rmtree(outdir)
    os.makedirs(outdir)
    cfg = Config(input=bam, reference=fa,
                 output=os.path.join(outdir, "scale.vcf"), work_dir=outdir,
                 genotype=True, min_support=min_support,
                 engine="device", decoder="native")
    t0 = time.time()
    stats = run_pipeline(cfg, ["scale_run"])
    wall = time.time() - t0
    st = _proc_status()
    rec = {
        "wall_s": round(wall, 2),
        "decode_s": round(stats.get("decode_s", 0.0), 2),
        "native_s": round(stats.get("native_s", 0.0), 2),
        "walk_s": round(stats.get("walk_s", 0.0), 2),
        "store_s": round(stats.get("store_s", 0.0), 2),
        "resolve_s": round(stats.get("resolve_s", 0.0), 2),
        "emit_s": round(stats.get("emit_s", 0.0), 2),
        "n_records": stats.get("n_records"),
        "n_calls": stats.get("n_calls"),
        "vm_hwm_gb": round(st.get("VmHWM", 0) / 1e9, 2),
        "rss_anon_end_gb": round(st.get("RssAnon", 0) / 1e9, 2),
        "bam_gb": round(os.path.getsize(bam) / 1e9, 2),
        "fa_gb": round(os.path.getsize(fa) / 1e9, 2),
    }
    # mapped-input correction: the decode maps the BAM; the emitter maps
    # the FASTA. Touched pages of both ride VmHWM.
    rec["anon_est_gb"] = round(
        max(0.0, rec["vm_hwm_gb"] - rec["bam_gb"] - rec["fa_gb"]), 2)
    print("SCALE_RUN " + json.dumps(rec), flush=True)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("prefix", help="simulate output prefix (PREFIX.bam/.fa)")
    p.add_argument("--runs", type=int, default=2,
                   help="run count; run 1 is cold (page cache), last is warm")
    p.add_argument("--min_support", type=int, default=10)
    p.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = p.parse_args(argv)
    if args.child:
        run_child(args.prefix, args.min_support)
        return 0
    results = []
    for i in range(args.runs):
        t0 = time.time()
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), args.prefix,
             "--child", "--min_support", str(args.min_support)]).returncode
        if rc != 0:
            print("scale_run: child failed rc=%d" % rc, file=sys.stderr)
            return 1
        results.append(round(time.time() - t0, 1))
        print("run %d/%d done (%.1fs incl. interpreter+compile)"
              % (i + 1, args.runs, results[-1]), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
