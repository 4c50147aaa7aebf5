"""Coverage-measured differential campaign (explicit-run-only).

Runs the reference-differential test suite in-process while recording
which LINES of the reference implementation actually executed, then
reports the unexecuted executable lines of the semantically load-bearing
reference functions (extraction state machine, resolvers, genotype
engine, emission, force calling). The differential harness asserts
equality against whatever the reference does — so its guarantee is only
as wide as the branches the random generators reach. This tool measures
that reach, line by line, straight from the code objects (co_lines), so
generator blind spots become an explicit work list instead of an unknown.

Usage:
    python tests/refcov.py [pytest-target ...]
        default targets: tests/test_reference_differential.py
    python tests/refcov.py --report-only cov.json

Writes executed-lines JSON to tests/.refcov.json and prints the
uncovered-line report for the target functions.
"""
import json
import os
import sys
import types

REF_ROOT = "/root/reference"
HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, ".refcov.json")
sys.path.insert(0, os.path.dirname(HERE))  # repo root (cutesv_tpu package)

# (module attr path, function names) to audit. Modules are imported by the
# fixtures; we fetch code objects after the run.
TARGETS = [
    ("ref_cutesv_main", [
        "detect_flag", "analysis_inv", "analysis_bnd",
        "analysis_split_read", "acquire_clip_pos", "organize_split_signal",
        "generate_combine_sigs", "parse_read",
    ]),
    ("cuteSV.cuteSV_resolveINDEL", [
        "resolution_DEL", "generate_del_cluster", "resolution_INS",
        "generate_ins_cluster", "call_gt",
    ]),
    ("cuteSV.cuteSV_resolveDUP", [
        "resolution_DUP", "generate_dup_cluster", "call_gt",
    ]),
    ("cuteSV.cuteSV_resolveINV", [
        "resolution_INV", "generate_semi_inv_cluster", "call_gt",
    ]),
    ("cuteSV.cuteSV_resolveTRA", [
        "resolution_TRA", "generate_semi_tra_cluster", "call_gt",
    ]),
    ("cuteSV.cuteSV_genotype", [
        "log10sumexp", "normalize_log10_probs", "rescale_read_counts",
        "cal_CIPOS", "threshold_ref_count", "count_coverage", "cal_GL",
        "overlap_cover", "assign_gt", "assign_gt_fc",
        "generate_output", "generate_pvcf", "load_valuable_chr", "load_bed",
    ]),
    ("cuteSV.cuteSV_forcecalling", [
        "parse_svtype", "parse_to_int", "check_same_variant",
        "parse_record", "parse_sigs_chrom", "generate_dispatch",
        "find_in_list", "find_in_indel_list", "force_calling_chrom",
        "solve_fc",
    ]),
]


def _tracer_factory(hits):
    def local(frame, event, arg):
        if event == "line":
            hits.add((frame.f_code.co_filename, frame.f_lineno))
        return local

    def globaltrace(frame, event, arg):
        if event == "call" and frame.f_code.co_filename.startswith(REF_ROOT):
            hits.add((frame.f_code.co_filename, frame.f_lineno))
            return local
        return None

    return globaltrace


class _SerialPool:
    """multiprocessing.Pool stand-in running tasks in-process, so the
    tracer sees the reference's solve_fc (force_calling_chrom dispatches
    through a Pool, cuteSV_forcecalling.py:555-570)."""

    def __init__(self, processes=None):
        pass

    def map_async(self, fn, iterable):
        res = [fn(x) for x in iterable]
        return types.SimpleNamespace(get=lambda: res)

    def close(self):
        pass

    def join(self):
        pass


def run_campaign(pytest_args):
    import threading

    import pytest
    hits = set()
    tracer = _tracer_factory(hits)
    sys.settrace(tracer)
    threading.settrace(tracer)  # in case reference code runs off-thread
    _ensure_modules()
    sys.modules["cuteSV.cuteSV_forcecalling"].Pool = _SerialPool
    try:
        rc = pytest.main(pytest_args + ["-q", "-x", "-p", "no:cacheprovider"])
    finally:
        sys.settrace(None)
        threading.settrace(None)
    if rc != 0:
        print("DIFFERENTIAL FAILURES (rc=%s) — coverage report still "
              "written, but fix the differential first!" % rc)
    by_file = {}
    if os.path.exists(OUT):  # accumulate across campaign invocations
        for k, v in json.load(open(OUT)).items():
            by_file[k] = set(v)
    for fn, ln in hits:
        by_file.setdefault(fn, set()).add(ln)
    with open(OUT, "w") as fh:
        json.dump({k: sorted(v) for k, v in by_file.items()}, fh)
    return rc


def _code_objects(func):
    """func.__code__ plus nested code objects (genexprs/lambdas)."""
    out = []
    stack = [func.__code__]
    while stack:
        co = stack.pop()
        out.append(co)
        for c in co.co_consts:
            if hasattr(c, "co_lines"):
                stack.append(c)
    return out


_KEEPALIVE = []


def _ensure_modules():
    """Load the reference modules (with the harness's stubs) so report-only
    mode can fetch code objects without re-running the campaign."""
    if "cuteSV.cuteSV_forcecalling" in sys.modules and \
            "ref_cutesv_main" in sys.modules:
        return
    sys.path.insert(0, HERE)
    import test_reference_differential as td
    ref_gen = td.ref.__wrapped__()
    ref_ns = next(ref_gen)
    main_gen = td.refmain.__wrapped__()
    # the fixture loads the script without registering it; report() looks
    # it up by name
    sys.modules["ref_cutesv_main"] = next(main_gen)
    fc_gen = td.reffc.__wrapped__(ref_ns)
    next(fc_gen)
    # keep the fixture generators unexhausted: their finally blocks pop
    # sys.path entries other imports may still need
    _KEEPALIVE.extend([ref_gen, main_gen, fc_gen])
    sys.path.insert(0, td.REF_SRC)
    import cuteSV.cuteSV_genotype  # noqa: F401


def report():
    _ensure_modules()
    with open(OUT) as fh:
        cov = {k: set(v) for k, v in json.load(fh).items()}
    total_missing = 0
    for modname, funcs in TARGETS:
        mod = sys.modules.get(modname)
        if mod is None:
            print("== %s: module not loaded by the campaign — skipped"
                  % modname)
            continue
        fn = mod.__file__
        executed = cov.get(fn, set())
        src = open(fn).readlines()
        for name in funcs:
            func = getattr(mod, name, None)
            if func is None:
                print("== %s.%s: MISSING in reference" % (modname, name))
                continue
            lines = set()
            for co in _code_objects(func):
                for (_, _, ln) in co.co_lines():
                    if ln is not None:
                        lines.add(ln)
            lines.discard(func.__code__.co_firstlineno)  # def line
            missing = sorted(lines - executed)
            covered = len(lines) - len(missing)
            tag = "FULL" if not missing else "%d/%d" % (covered, len(lines))
            print("== %s.%s: %s" % (modname, name, tag))
            total_missing += len(missing)
            for ln in missing:
                text = src[ln - 1].rstrip() if ln - 1 < len(src) else "?"
                print("   %5d  %s" % (ln, text))
    print("TOTAL UNEXECUTED LINES: %d" % total_missing)


if __name__ == "__main__":
    args = sys.argv[1:]
    if args[:1] == ["--report-only"]:
        report()
        sys.exit(0)
    targets = args or [os.path.join(HERE, "test_reference_differential.py")]
    rc = run_campaign(targets)
    # fixtures' modules stay imported after pytest.main returns in-process
    report()
    sys.exit(rc)
