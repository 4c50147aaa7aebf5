"""Self-coverage audit (explicit-run-only): run the test suite under a
settrace hook restricted to cutesv_tpu/ and report unexecuted executable
lines per module — the inward-facing twin of tests/refcov.py.

Usage:
    python tests/selfcov.py [pytest-target ...]   # default: tests/
    python tests/selfcov.py --detail FILE.py      # missing lines of one file

Interpreting gaps (round-1 audit): ~97% of framework lines execute under
the default suite; the rest are (a) subprocess-side code the tracer
cannot see (the distributed CLI tests fork workers), (b) TPU-only
branches that run under CUTESV_TEST_PLATFORM=axon, and (c) arms
exercised only by the explicit campaign files.
"""
import json
import os
import sys
import threading

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(os.path.dirname(HERE), "cutesv_tpu")
OUT = os.path.join(HERE, ".selfcov.json")
sys.path.insert(0, os.path.dirname(HERE))


def _universe(path):
    co = compile(open(path).read(), path, "exec")
    lines = set()
    stack = [co]
    while stack:
        c = stack.pop()
        for (_, _, ln) in c.co_lines():
            if ln is not None:
                lines.add(ln)
        for k in c.co_consts:
            if hasattr(k, "co_lines"):
                stack.append(k)
    return lines


def run(targets):
    import pytest
    hits = set()

    def local(frame, event, arg):
        if event == "line":
            hits.add((frame.f_code.co_filename, frame.f_lineno))
        return local

    def g(frame, event, arg):
        if event == "call" and frame.f_code.co_filename.startswith(ROOT):
            hits.add((frame.f_code.co_filename, frame.f_lineno))
            return local
        return None

    sys.settrace(g)
    threading.settrace(g)
    try:
        rc = pytest.main(targets + ["-q", "-x", "-p", "no:cacheprovider"])
    finally:
        sys.settrace(None)
        threading.settrace(None)
    by_file = {}
    if os.path.exists(OUT):
        for k, v in json.load(open(OUT)).items():
            by_file[k] = set(v)
    for fn, ln in hits:
        by_file.setdefault(fn, set()).add(ln)
    json.dump({k: sorted(v) for k, v in by_file.items()}, open(OUT, "w"))
    return rc


def report():
    cov = {k: set(v) for k, v in json.load(open(OUT)).items()}
    rows = []
    for dirpath, _, files in os.walk(ROOT):
        if "__pycache__" in dirpath:
            continue
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            uni = _universe(path)
            missing = sorted(uni - cov.get(path, set()))
            rows.append((len(missing), len(uni), path, missing))
    rows.sort(reverse=True)
    total_m = total_u = 0
    for m, u, p, _ in rows:
        total_m += m
        total_u += u
        print("%-55s %4d/%4d missing"
              % (p.replace(ROOT + os.sep, ""), m, u))
    pct = 100.0 * (total_u - total_m) / max(total_u, 1)
    print("TOTAL: %d/%d executed (%.1f%%)"
          % (total_u - total_m, total_u, pct))


def detail(name):
    cov = {k: set(v) for k, v in json.load(open(OUT)).items()}
    path = os.path.join(ROOT, name)
    src = open(path).readlines()
    for ln in sorted(_universe(path) - cov.get(path, set())):
        print("%5d %s" % (ln, src[ln - 1].rstrip()))


if __name__ == "__main__":
    args = sys.argv[1:]
    if args[:1] == ["--detail"]:
        detail(args[1])
        sys.exit(0)
    rc = run(args or [HERE])
    report()
    sys.exit(rc)
