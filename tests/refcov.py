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
        "process_process_sigs_type", "remove_duplicates_sorted",
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
    # benchmark/eval tool family (SURVEY.md section 2.2)
    ("benchmarks.eval_sim", [
        "pase_info", "phase_GT", "load_callset", "eval", "statistics",
        "load_ans", "load_gt", "main_ctrl",
    ]),
    ("benchmarks.eval_BND", [
        "pase_info", "phase_GT", "load_callset", "eval", "main_ctrl",
    ]),
    ("benchmarks.eval_trio", [
        "pase_info", "phase_GT", "load_callset", "eva_record",
        "statistics_true_possitive", "main_ctrl",
    ]),
    ("benchmarks.eval_forcecalling", [
        "population_statistic", "compare_callsets", "pre_cmrg",
    ]),
    ("benchmarks.multi_platform", [
        "pase_info", "phase_GT", "load_callset", "eva_record",
        "statistics", "main_ctrl",
    ]),
    ("benchmarks.sta_venn", [
        "pase_info", "load_callset", "eva_record", "statistics",
        "main_ctrl",
    ]),
    ("benchmarks.vcf2bedpe", ["phase_bnd", "main_ctrl"]),
    ("benchmarks.cmp_NA19240", [
        "pase_base_info", "load_base", "load_cuteSV", "load_sniffles",
        "load_pbsv", "load_svim", "cmp_callsets", "main_ctrl",
    ]),
    ("ref_diploid", ["call_gt", "main_ctrl"]),
]


# Lines that cannot execute in any real run — excluded from the actionable
# report (still listed in the summary count). Keys: (module, lineno).
KNOWN_DEAD = {}


def _add_dead(mod, lines, why):
    for ln in lines:
        KNOWN_DEAD[(mod, ln)] = why


_add_dead("ref_cutesv_main", [510, 511],
          "'-' strand SA append cannot raise; try/except is vestigial")
_add_dead("cuteSV.cuteSV_resolveINDEL", [45, 251],
          "resolution_* is only dispatched for chromosomes present in the "
          "sigindex (cuteSV:1113-1189)")
_add_dead("cuteSV.cuteSV_resolveINDEL", [268, 269],
          "INS store rows always carry the seq field (write path "
          "cuteSV:736); the short-row except is defensive")
_add_dead("cuteSV.cuteSV_resolveDUP", [20], "chromosome always indexed")
_add_dead("cuteSV.cuteSV_resolveINV", [34], "chromosome always indexed")
_add_dead("cuteSV.cuteSV_resolveTRA", [32], "chromosome always indexed")
_add_dead("cuteSV.cuteSV_genotype", list(range(670, 703)),
          "load_valuable_chr has no callers anywhere in the reference")
_add_dead("cuteSV.cuteSV_genotype", [119, 121],
          "overlap_cover: sv-close events carry sort code 0 and process "
          "before read-open (code 1) at equal positions, so no open sv "
          "can have end == the read start (:119); and the sv-open branch "
          "always initializes overlap_dict[idx] (:126-127), so the "
          "read-side init (:121) never runs")
_add_dead("cuteSV.cuteSV_resolveTRA", [155, 227],
          "generate_semi_tra_cluster's else-return guards a BND type "
          "outside A-D; extraction only emits A-D (cuteSV:97-188)")
_add_dead("cuteSV.cuteSV_genotype", [537, 538],
          "generate_pvcf DEL tests i[12]=='<DEL>' but i[12] is the STRAND "
          "slot (solve_fc row layout, cuteSV_forcecalling.py:673-676); "
          "the symbolic-DEL rebuild arm is unreachable")
_add_dead("cuteSV.cuteSV_forcecalling", [162],
          "check_same_variant's INS/DEL arm: find_in_list is only called "
          "for DUP/INV/TRA/BND records (solve_fc:620-626)")
_add_dead("cuteSV.cuteSV_forcecalling", [38],
          "parse_to_int fallthrough needs a non-None/str/list/tuple/int "
          "value; pysam INFO yields none such")
_add_dead("cuteSV.cuteSV_forcecalling", [132],
          "parse_sigs_chrom's short-row '<INS>' assignment is overwritten "
          "unconditionally on the next line (:133)")
_add_dead("cuteSV.cuteSV_forcecalling", list(range(649, 658)),
          "solve_fc: reads_info is keyed over chrom_list which contains "
          "every svs_dict chromosome (force_calling_chrom:556-565)")
# debug prints gated on pos == debug_pos (constant -1)
_add_dead("cuteSV.cuteSV_forcecalling",
          [275, 296, 297, 321, 322, 333, 363, 364, 376, 377,
           406, 407, 432, 433, 444, 474, 475, 443, 473],
          "debug print gated on pos == debug_pos (constant -1)")


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
    if "vcf" not in sys.modules:  # pyvcf3 stub (vcf2bedpe/diploid import)
        m = types.ModuleType("vcf")
        m.Reader = td._FakePyvcfReader
        sys.modules["vcf"] = m
    import benchmarks.cmp_NA19240  # noqa: F401
    import benchmarks.eval_BND  # noqa: F401
    import benchmarks.eval_forcecalling  # noqa: F401
    import benchmarks.eval_sim  # noqa: F401
    import benchmarks.eval_trio  # noqa: F401
    import benchmarks.multi_platform  # noqa: F401
    import benchmarks.sta_venn  # noqa: F401
    import benchmarks.vcf2bedpe  # noqa: F401
    import importlib.machinery
    import importlib.util
    dip = os.path.join(td.REF_SRC, "cuteSV", "diploid_calling.py")
    loader = importlib.machinery.SourceFileLoader("ref_diploid", dip)
    spec = importlib.util.spec_from_loader("ref_diploid", loader)
    mod = importlib.util.module_from_spec(spec)
    loader.exec_module(mod)
    sys.modules["ref_diploid"] = mod


def report():
    _ensure_modules()
    with open(OUT) as fh:
        cov = {k: set(v) for k, v in json.load(fh).items()}
    total_missing = 0
    total_dead = 0
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
            dead = [ln for ln in missing if (modname, ln) in KNOWN_DEAD]
            missing = [ln for ln in missing if (modname, ln) not in
                       KNOWN_DEAD]
            covered = len(lines) - len(missing) - len(dead)
            tag = "FULL" if not missing else "%d/%d" % (
                covered, len(lines) - len(dead))
            if dead:
                tag += "  (+%d known-dead)" % len(dead)
            print("== %s.%s: %s" % (modname, name, tag))
            total_missing += len(missing)
            total_dead += len(dead)
            for ln in missing:
                text = src[ln - 1].rstrip() if ln - 1 < len(src) else "?"
                print("   %5d  %s" % (ln, text))
    print("TOTAL UNEXECUTED LINES: %d  (+%d known-dead, see KNOWN_DEAD)"
          % (total_missing, total_dead))


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
