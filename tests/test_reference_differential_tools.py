"""CLI-level differentials for the reference benchmark-tool family
(SURVEY.md §2.2), closing the refcov gaps in their main_ctrl/statistics
orchestration and loader edge arms.

The reference tools report through logging; each test drives the
reference's main_ctrl under caplog and compares against our tool's CLI
run — byte-for-byte where our format mirrors the reference (eval_sim
TP-/TN- lines, eval_BND totals, eval_trio per-type rows), numerically
where ours generalizes (concordance's shared-with bit patterns vs
multi_platform/sta_venn Venn cells).

Loader edges covered by the crafted callsets: non-numeric INFO values
(pase_info except arms), CHR2 string INFO, GT 'unknown' phasing, all
four breakend ALT forms, SVLEN-from-END fallback, TRA->BND SVTYPE
override, numeric-chromosome BND ordering swaps, sta_venn's DV filter.
"""
import logging
import os
import random
import sys
import types

import pytest

from test_reference_differential import (  # noqa: F401 (fixtures)
    REF_SRC, _truth_and_calls, ref, reffc, refmain)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_SRC, "cuteSV")),
    reason="reference tree not mounted")


def _import_bench(name):
    sys.path.insert(0, REF_SRC)
    try:
        import importlib
        return importlib.import_module("benchmarks.%s" % name)
    finally:
        try:  # at interpreter shutdown sys may already be torn down
            sys.path.remove(REF_SRC)
        except Exception:
            pass


def _msgs(caplog, needles):
    return [r.getMessage() for r in caplog.records
            if any(n in r.getMessage() for n in needles)]


def _vcf_line(chrom, pos, svid, alt, info, sample="0/1:12"):
    return "%s\t%d\t%s\tN\t%s\t.\tPASS\t%s\tGT:DV\t%s\n" % (
        chrom, pos, svid, alt, info, sample)


def _rich_callset(path, numeric_chroms=False):
    """Callset exercising every loader arm shared by the eval tools."""
    c1, c2 = ("1", "2") if numeric_chroms else ("chr1", "chr2")
    k = [0]

    def nid():
        k[0] += 1
        return "v%03d" % k[0]

    lines = ["##fileformat=VCFv4.2\n",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"]
    # plain types, varied genotypes (incl. 'unknown' phasings)
    for pos, t, ln, gt in ((10_000, "DEL", 300, "0/1"),
                           (20_000, "DEL", 500, "1/1"),
                           (30_000, "INS", 200, "1/0"),
                           (40_000, "INV", 800, "0/0"),
                           (50_000, "DUP", 400, "2|3"),
                           (60_000, "INS", 120, "./.")):
        lines.append(_vcf_line(c1, pos, nid(), "<%s>" % t,
                               "PRECISE;SVTYPE=%s;SVLEN=%d;END=%d;RE=9"
                               % (t, ln, pos + ln), "%s:12" % gt))
    # SVLEN absent -> END-derived length; non-numeric END -> except arm
    lines.append(_vcf_line(c1, 70_000, nid(), "<DEL>",
                           "PRECISE;SVTYPE=DEL;END=70500;RE=5"))
    lines.append(_vcf_line(c1, 80_000, nid(), "<INV>",
                           "IMPRECISE;SVTYPE=INV;SVLEN=na;END=80900;RE=4"))
    # every breakend ALT form; one with CHR2/END INFO; one typed TRA
    lines.append(_vcf_line(c1, 90_000, nid(), "N[%s:5000[" % c2,
                           "PRECISE;SVTYPE=BND;RE=7"))
    lines.append(_vcf_line(c1, 91_000, nid(), "N]%s:6000]" % c2,
                           "PRECISE;SVTYPE=BND;RE=7"))
    lines.append(_vcf_line(c1, 92_000, nid(), "]%s:7000]N" % c2,
                           "PRECISE;SVTYPE=BND;RE=7"))
    lines.append(_vcf_line(c1, 93_000, nid(), "[%s:8000[N" % c2,
                           "PRECISE;SVTYPE=BND;RE=7"))
    lines.append(_vcf_line(c1, 94_000, nid(), "N[%s:9000[" % c2,
                           "PRECISE;SVTYPE=BND;CHR2=%s;END=9100;RE=6" % c2))
    lines.append(_vcf_line(c2, 95_000, nid(), "N[%s:9500[" % c1,
                           "PRECISE;SVTYPE=TRA;CHR2=%s;END=9600;RE=6" % c1))
    lines.append(_vcf_line(c2, 98_000, nid(), "N[%s:9700[" % c1,
                           "PRECISE;SVTYPE=BND;CHR2=%s;END=9800;RE=6" % c1))
    # mate chromosome outside the truth pairs (eval's BND chr2 mismatch)
    lines.append(_vcf_line(c1, 97_000, nid(), "N[chr9:1234[",
                           "PRECISE;SVTYPE=BND;RE=5"))
    # an abnormal type for the census
    lines.append(_vcf_line(c1, 96_000, nid(), "<CNV>",
                           "PRECISE;SVTYPE=CNV;SVLEN=900;END=96900;RE=3"))
    with open(path, "w") as fh:
        fh.writelines(lines)
    return path


def _edge_records(tag):
    """Loader-edge rows shared by the trio/multi_platform/sta_venn
    callsets: every breakend ALT form, CHR2 string INFO (pase_info's
    string arm), SVLEN-from-END fallback, non-numeric INFO values
    (pase_info's except), and an 'unknown' genotype."""
    return [
        _vcf_line("chr3", 10_000, tag + "e1", "N]chr4:6000]",
                  "PRECISE;SVTYPE=BND;RE=7", "1/1:9,8"),
        _vcf_line("chr3", 12_000, tag + "e2", "]chr4:7000]N",
                  "PRECISE;SVTYPE=BND;RE=7", "1/1:9,8"),
        _vcf_line("chr3", 14_000, tag + "e3", "[chr4:8000[N",
                  "PRECISE;SVTYPE=BND;CHR2=chr4;END=8100;RE=7", "1/1:9,8"),
        _vcf_line("chr3", 16_000, tag + "e4", "<DEL>",
                  "PRECISE;SVTYPE=DEL;END=16500;RE=5", "1/1:9"),
        _vcf_line("chr3", 18_000, tag + "e5", "<INV>",
                  "IMPRECISE;SVTYPE=INV;SVLEN=na;END=18900;RE=4",
                  "2|3:9"),
    ]


# ---------------------------------------------------------------------------
# eval_sim: full main_ctrl + statistics, byte-level TP-/TN- parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["IID", "DUP", "BND"])
def test_eval_sim_cli(tmp_path, caplog, mode):
    reval = _import_bench("eval_sim")
    from cutesv_tpu.tools import eval_sim as oureval

    ans_p, gt_p, vcf_p = _truth_and_calls(str(tmp_path), 11)
    rich = _rich_callset(str(tmp_path / "rich.vcf"))
    rich_num = _rich_callset(str(tmp_path / "richnum.vcf"),
                             numeric_chroms=True)
    ns = types.SimpleNamespace(ans=ans_p, gt=gt_p, cuteSV=vcf_p,
                               sniffles=rich, pbsv=rich_num, svim=rich,
                               bias=0.7, offect=1000, choice=mode)
    caplog.clear()
    with caplog.at_level(logging.INFO):
        reval.main_ctrl(ns)
    exp = _msgs(caplog, ["TP-", "TN-"])
    assert len(exp) >= 8
    caplog.clear()
    with caplog.at_level(logging.INFO):
        oureval.main([mode, ans_p, gt_p, vcf_p, rich, rich_num, rich])
    got = _msgs(caplog, ["TP-", "TN-"])
    assert got == exp


def test_eval_sim_call_type_absent_from_truth(tmp_path, caplog):
    """INS calls against a truth set with no INS rows: the cross-type
    fallback matching loop (eval_sim.py:99-111)."""
    reval = _import_bench("eval_sim")
    from cutesv_tpu.tools import eval_sim as oureval

    ans = str(tmp_path / "truth.bed")
    with open(ans, "w") as fh:  # deletions only
        fh.write("chr1\t5000\t5400\tdeletion\tNone\t0\n")
    gt = str(tmp_path / "zyg.bed")
    with open(gt, "w") as fh:
        fh.write("chr1\t0\t1000000\t50.0\n")  # het: GT-match arm
        fh.write("chr2\t0\t1000000\t10.0\n")  # 'None' zygosity arm
    calls = str(tmp_path / "c.vcf")
    with open(calls, "w") as fh:
        fh.write(_vcf_line("chr1", 5005, "a", "<DEL>",
                           "PRECISE;SVTYPE=DEL;SVLEN=400;END=5400;RE=9",
                           "1/1:9"))
        fh.write(_vcf_line("chr1", 5600, "b", "<INS>",
                           "PRECISE;SVTYPE=INS;SVLEN=350;END=5600;RE=9",
                           "0/1:9"))
    ns = types.SimpleNamespace(ans=ans, gt=gt, cuteSV=calls, sniffles=calls,
                               pbsv=calls, svim=calls, bias=0.7,
                               offect=1000, choice="IID")
    caplog.clear()
    with caplog.at_level(logging.INFO):
        reval.main_ctrl(ns)
    exp = _msgs(caplog, ["TP-", "TN-"])
    caplog.clear()
    with caplog.at_level(logging.INFO):
        oureval.main(["IID", ans, gt, calls, calls, calls, calls])
    assert _msgs(caplog, ["TP-", "TN-"]) == exp


# ---------------------------------------------------------------------------
# eval_BND main_ctrl; eval_trio main_ctrl; both log the same line formats
# ---------------------------------------------------------------------------


def test_eval_bnd_cli(tmp_path, caplog):
    rbnd = _import_bench("eval_BND")
    from cutesv_tpu.tools.compare import eval_bnd as ourbnd

    base = _rich_callset(str(tmp_path / "base.vcf"))
    comp = _rich_callset(str(tmp_path / "comp.vcf"), numeric_chroms=True)
    ns = types.SimpleNamespace(base=base, comp=comp, offect=1000)
    caplog.clear()
    with caplog.at_level(logging.INFO):
        rbnd.main_ctrl(ns)
    exp = _msgs(caplog, ["False positive", "Total amount"])
    assert len(exp) == 2
    caplog.clear()
    with caplog.at_level(logging.INFO):
        ourbnd([base, comp])
    assert _msgs(caplog, ["False positive", "Total amount"]) == exp


def test_eval_trio_cli(tmp_path, caplog):
    rtrio = _import_bench("eval_trio")
    from cutesv_tpu.tools.compare import eval_trio as ourtrio

    rng = random.Random(5)
    paths = []
    for name in ("f1", "mp", "fp"):
        lines = ["#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                 "\tS\n"]
        for t in ("DEL", "INS", "INV", "DUP"):
            for k in range(6):
                pos = 10_000 * (1 + k) + rng.randrange(0, 400)
                ln = 200 + rng.randrange(0, 80)
                gt = rng.choice(["0/1", "1/1", "1/1"])
                lines.append(_vcf_line("chr1", pos, "%s%s%d" % (name, t, k),
                                       "<%s>" % t,
                                       "PRECISE;SVTYPE=%s;SVLEN=%d;END=%d"
                                       ";RE=9" % (t, ln, pos + ln),
                                       "%s:12" % gt))
        for k in range(4):
            pos = 70_000 + 600 * k
            lines.append(_vcf_line("chr1", pos, "%sB%d" % (name, k),
                                   "N[chr2:%d[" % (40_000 + 600 * k),
                                   "PRECISE;SVTYPE=BND;RE=8", "1/1:9"))
        lines += _edge_records(name)
        p = str(tmp_path / ("%s.vcf" % name))
        with open(p, "w") as fh:
            fh.writelines(lines)
        paths.append(p)
    f1, mp, fp = paths
    ns = types.SimpleNamespace(F1=f1, MP=mp, FP=fp, bias=0.7, offect=1000)
    caplog.clear()
    with caplog.at_level(logging.INFO):
        rtrio.main_ctrl(ns)
    exp = [m for m in _msgs(caplog, ["F1-", "MP-", "FP-"])]
    assert len(exp) == 18
    caplog.clear()
    with caplog.at_level(logging.INFO):
        ourtrio([mp, fp, f1])
    # the reference interleaves F1/MP/FP per svtype; ours groups by label
    assert sorted(_msgs(caplog, ["F1-", "MP-", "FP-"])) == sorted(exp)


def test_eval_trio_type_absent(tmp_path):
    """statistics_true_possitive returns (0, 0) for a type the callset
    lacks (eval_trio.py:115-117), and eva_record skips types the B-side
    lacks (:83-84); the reference main_ctrl would divide by zero on
    either (record=0), ours reports 0.0 — pinned at function level."""
    rtrio = _import_bench("eval_trio")
    assert rtrio.statistics_true_possitive({"DEL": []}, "DUP",
                                           ["hom", "het"]) == (0, 0)
    a = {"DEL": [["chr1", 100, 400, 300, "hom", 0]]}
    b = {"INS": [["chr1", 100, 400, 300, "hom", 0]]}
    rtrio.eva_record(a, b, 0.7, 1000, ["hom"])
    assert b["INS"][0][-1] == 0  # untouched: type missing from A


# ---------------------------------------------------------------------------
# multi_platform / sta_venn: Venn cells vs our concordance bit patterns
# ---------------------------------------------------------------------------


def _venn_sets(tmp_path, n, with_filter_victim=False):
    rng = random.Random(77)
    sets = []
    for idx in range(n):
        lines = ["#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                 "\tS\n"]
        for t in ("DEL", "INS"):
            for k in range(8):
                # overlap pattern: each callset carries a subset
                if (k + idx) % 3 == 0 and k % 2 == 0:
                    continue
                pos = 10_000 * (1 + k)
                ln = 300
                lines.append(_vcf_line("chr1", pos, "s%dk%d" % (idx, k),
                                       "<%s>" % t,
                                       "PRECISE;SVTYPE=%s;SVLEN=%d;END=%d"
                                       ";RE=9" % (t, ln, pos + ln),
                                       "0/1:4,9"))
        if idx == 0:
            # a type the others lack (DUP: the shared edge records carry
            # DEL/INV/BND, so DUP stays exclusive): eva_record's
            # svtype-missing continue
            lines.append(_vcf_line("chr2", 5_000, "only%d" % idx, "<DUP>",
                                   "PRECISE;SVTYPE=DUP;SVLEN=400;END=5400"
                                   ";RE=6", "1/1:4,9"))
            # same type, disjoint chromosome: the chrom-missing continue
            lines.append(_vcf_line("chrZ", 6_000, "lone%d" % idx, "<INS>",
                                   "PRECISE;SVTYPE=INS;SVLEN=150;END=6000"
                                   ";RE=6", "0/1:4,9"))
        # explicit membership subsets so every Venn cell materializes
        # from callset 0's perspective (subset s of the other callsets)
        for s in range(1, 2 ** (n - 1)):
            members = {0} | {k + 1 for k in range(n - 1) if s & (1 << k)}
            if idx in members:
                pos = 200_000 + 10_000 * s
                lines.append(_vcf_line("chr1", pos, "cell%d_%d" % (s, idx),
                                       "<DEL>",
                                       "PRECISE;SVTYPE=DEL;SVLEN=250;"
                                       "END=%d;RE=9" % (pos + 250),
                                       "0/1:4,9"))
        if with_filter_victim and idx == 2:
            # PBSV slot: sta_venn's DV filter applies to BND records only
            # (sta_venn.py:68-70); sample AD[1] below the filter of 3
            lines.append(_vcf_line("chr1", 88_000, "weak",
                                   "N[chr2:4400[",
                                   "PRECISE;SVTYPE=BND;RE=2", "0/1:9,2"))
        if idx % 2 == 0:
            # shared breakends so the BND Venn rows are non-trivial
            lines.append(_vcf_line("chr1", 77_000, "bnd%d" % idx,
                                   "N[chr2:3300[",
                                   "PRECISE;SVTYPE=BND;RE=5", "0/1:9,8"))
        lines += _edge_records("s%d" % idx)
        p = str(tmp_path / ("set%d.vcf" % idx))
        with open(p, "w") as fh:
            fh.writelines(lines)
        sets.append(p)
    return sets


def _parse_venn(exp_msgs, labels):
    """reference statistics lines -> {(svtype, owner): {cell: n}}"""
    out = {}
    cur = None
    for m in exp_msgs:
        if " number of " in m:
            svtype, rest = m.split(" number of ")
            owner, n = rest.split(":\t")
            cur = out.setdefault((svtype, owner), {})
            cur["total"] = int(n)
        elif m.startswith("Only "):
            owner, n = m[5:].split(":\t")
            cur["0" * (len(labels) - 1)] = int(n)
        elif " and " in m and cur is not None:
            names, n = m.split(":\t")
            present = names.split(" and ")[1:]  # drop the owner
            cell = "".join("1" if lab in present else "0"
                           for lab in labels if lab != names.split(" and ")[0])
            cur[cell] = int(n)
    return out


def test_multi_platform_cli(tmp_path, caplog):
    rmp = _import_bench("multi_platform")
    from cutesv_tpu.tools.compare import concordance as ourcc

    s = _venn_sets(tmp_path, 3)
    ns = types.SimpleNamespace(c1=s[0], c2=s[1], c3=s[2], bias=0.7,
                               offect=1000)
    caplog.clear()
    with caplog.at_level(logging.INFO):
        rmp.main_ctrl(ns)
    ref_cells = _parse_venn(_msgs(caplog, [" number of ", "Only ",
                                           " and "]),
                            ["CLR", "ONT", "CCS"])
    assert ref_cells
    caplog.clear()
    with caplog.at_level(logging.INFO):
        ourcc(s)
    # ours: per-callset totals + shared-with bit patterns over the others
    ours = {}
    cur_idx = cur_type = None
    for m in _msgs(caplog, ["total of callset", "shared-with"]):
        if "total of callset" in m:
            head, n = m.split(":\t")
            cur_type, _, idx_s = head.partition(" total of callset ")
            cur_idx = int(idx_s)
            ours.setdefault((cur_type, cur_idx), {})["total"] = int(n)
            d = ours[(cur_type, cur_idx)]
            d.setdefault("00", 0)
        else:
            cell, n = m.split(":\t")
            cell = cell.strip()[len("shared-with["):-1]
            ours[(cur_type, cur_idx)][cell] = int(n)
    owners = {"CLR": 0, "ONT": 1, "CCS": 2}
    for (svtype, owner), cells in ref_cells.items():
        idx = owners[owner]
        mine = ours.get((svtype, idx), {"total": 0, "00": 0})
        assert mine["total"] == cells["total"], (svtype, owner)
        for cell, n in cells.items():
            if cell == "total":
                continue
            assert mine.get(cell, 0) == n, (svtype, owner, cell)


def test_sta_venn_cli(tmp_path, caplog):
    rsv = _import_bench("sta_venn")
    from cutesv_tpu.tools.compare import concordance as ourcc

    s = _venn_sets(tmp_path, 4, with_filter_victim=True)
    ns = types.SimpleNamespace(c1=s[0], c2=s[1], c3=s[2], c4=s[3],
                               bias=0.7, offect=1000)
    caplog.clear()
    with caplog.at_level(logging.INFO):
        rsv.main_ctrl(ns)
    ref_cells = _parse_venn(
        _msgs(caplog, [" number of ", "Only ", " and "]),
        ["cuteSV", "Sniffles", "PBSV", "SVIM"])
    assert ref_cells
    # our concordance has no per-slot DV filter: pre-filter the PBSV
    # callset the way sta_venn's load_callset(c3, 3) does
    filtered = str(tmp_path / "set2_f.vcf")
    with open(s[2]) as fh, open(filtered, "w") as out:
        for line in fh:
            if not line.startswith("#") and "SVTYPE=BND" in line:
                sample = line.rstrip("\n").split("\t")[-1]
                if int(sample.split(":")[1].split(",")[1]) < 3:
                    continue
            out.write(line)
    caplog.clear()
    with caplog.at_level(logging.INFO):
        ourcc([s[0], s[1], filtered, s[3]])
    ours = {}
    cur_idx = cur_type = None
    for m in _msgs(caplog, ["total of callset", "shared-with"]):
        if "total of callset" in m:
            head, n = m.split(":\t")
            cur_type, _, idx_s = head.partition(" total of callset ")
            cur_idx = int(idx_s)
            ours.setdefault((cur_type, cur_idx), {})["total"] = int(n)
            ours[(cur_type, cur_idx)].setdefault("000", 0)
        else:
            cell, n = m.split(":\t")
            cell = cell.strip()[len("shared-with["):-1]
            ours[(cur_type, cur_idx)][cell] = int(n)
    owners = {"cuteSV": 0, "Sniffles": 1, "PBSV": 2, "SVIM": 3}
    for (svtype, owner), cells in ref_cells.items():
        idx = owners[owner]
        mine = ours.get((svtype, idx), {"total": 0, "000": 0})
        assert mine["total"] == cells["total"], (svtype, owner)
        for cell, n in cells.items():
            if cell == "total":
                continue
            assert mine.get(cell, 0) == n, (svtype, owner, cell)


# ---------------------------------------------------------------------------
# cmp_NA19240 main_ctrl, diploid_calling except arms, eval_forcecalling
# compare_callsets match-writer
# ---------------------------------------------------------------------------


def test_cmp_na19240_cli(tmp_path, caplog):
    rna = _import_bench("cmp_NA19240")
    from test_reference_differential import _na_caller_vcf
    from cutesv_tpu.tools import compare

    rng = random.Random(21)
    sites = []
    pos = 40_000
    for k in range(80):
        sites.append((rng.choice(["1", "2"]), pos,
                      rng.choice(["DEL", "INS", "INV", "DUP"]),
                      rng.choice([120, 800])))
        pos += rng.randrange(2500, 8000)
    paths = {}
    for flavor in ("base", "cutesv", "sniffles", "pbsv", "svim"):
        p = _na_caller_vcf(str(tmp_path), flavor + ".vcf", rng, sites,
                           flavor)
        # loader edge rows: unknown symbolic ALT (skip arms) and a
        # non-numeric INFO value (pase_base_info's except)
        with open(p, "a") as fh:
            fh.write("1\t900000\tx1\tN\t<CNV>\t30\tPASS\t"
                     "PRECISE;SVTYPE=CNV;SVLEN=500;END=900500;RE=na\t"
                     "GT\t0/1\n")
        paths[flavor] = p
    # the base carries a chromosome no caller has (chrom-missing continue)
    with open(paths["base"], "a") as fh:
        fh.write("3\t50000\tonly3\tN\t<INV>\t30\tPASS\t"
                 "PRECISE;SVTYPE=INV;SVLEN=700;END=50700;RE=9\t"
                 "GT:DR:DV\t0/1:3:9\n")
    ns = types.SimpleNamespace(base=paths["base"], cuteSV=paths["cutesv"],
                               sniffles=paths["sniffles"],
                               pbsv=paths["pbsv"], svim=paths["svim"],
                               bias=0.7, offect=1000)
    caplog.clear()
    with caplog.at_level(logging.INFO):
        rna.main_ctrl(ns)
    needles = ["Camp count", "TP-call count", "Precision", "Recall",
               "F-measure"]
    exp = _msgs(caplog, needles)
    assert len(exp) == 20
    caplog.clear()
    with caplog.at_level(logging.INFO):
        compare.cmp_na19240([paths["base"], "cutesv:" + paths["cutesv"],
                             "sniffles:" + paths["sniffles"],
                             "pbsv:" + paths["pbsv"],
                             "svim:" + paths["svim"]])
    assert _msgs(caplog, needles) == exp


def test_diploid_calling_bnd_and_malformed(tmp_path):
    """Records missing SVLEN/END: TRA/BND fall back to the reduced-INFO
    write (diploid_calling.py:60-76), anything else is silently dropped
    (:79)."""
    import importlib.machinery
    import importlib.util

    from test_reference_differential import _FakePyvcfDCReader

    if "vcf" not in sys.modules:
        sys.modules["vcf"] = types.ModuleType("vcf")
    sys.modules["vcf"].Reader = _FakePyvcfDCReader
    path = os.path.join(REF_SRC, "cuteSV", "diploid_calling.py")
    loader = importlib.machinery.SourceFileLoader("ref_diploid", path)
    spec = importlib.util.spec_from_loader("ref_diploid", loader)
    rdc = importlib.util.module_from_spec(spec)
    loader.exec_module(rdc)
    from cutesv_tpu.tools import diploid_calling as ourdc

    lines = ["##fileformat=VCFv4.2\n",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n",
             # complete record (normal arm)
             "chr1\t1000\tcuteSV.DEL.0\tN\t<DEL>\t40.0\tPASS\t"
             "PRECISE;SVTYPE=DEL;SVLEN=-200;END=1200;RE=9;"
             "RNAMES=cutesvh1_a,ctg_b\tGT:DR:DV\t0/1:3:9\n",
             # BND without SVLEN/END -> reduced-INFO fallback arm
             "chr1\t2000\tcuteSV.BND.0\tN\tN[chr2:5000[\t22.0\tq5\t"
             "PRECISE;SVTYPE=BND;RE=7;RNAMES=cutesvh1_c,cutesvh2_d\t"
             "GT:DR:DV\t0/1:2:7\n",
             # TRA-typed, same fallback
             "chr1\t3000\tcuteSV.TRA.0\tN\tN]chr2:6000]\t21.0\tPASS\t"
             "PRECISE;SVTYPE=TRA;RE=6;RNAMES=cutesvh2_e\tGT:DR:DV\t"
             "0/1:2:6\n",
             # non-BND missing SVLEN/END -> silently dropped
             "chr1\t4000\tcuteSV.INS.0\tN\t<INS>\t20.0\tPASS\t"
             "PRECISE;SVTYPE=INS;RE=5;RNAMES=cutesvh1_f\tGT:DR:DV\t"
             "0/1:2:5\n"]
    invcf = os.path.join(str(tmp_path), "in.vcf")
    with open(invcf, "w") as fh:
        fh.writelines(lines)
    ref_out = os.path.join(str(tmp_path), "ref.vcf")
    our_out = os.path.join(str(tmp_path), "our.vcf")
    rdc.main_ctrl(types.SimpleNamespace(invcf=invcf, outvcf=ref_out))
    ourdc.convert(invcf, our_out)
    ref_text = open(ref_out).read()
    assert open(our_out).read() == ref_text
    assert "cuteSV.BND.0" in ref_text and "cuteSV.TRA.0" in ref_text
    assert "cuteSV.INS.0" not in ref_text  # dropped record


def test_eval_forcecalling_compare_writer(tmp_path):
    """compare_callsets with population records that SURVIVE the quality
    filters and MATCH base records: the DEL/INS collection in the
    population parse (eval_forcecalling.py:55-60) and the matched-AF
    writer loop (:86-90); byte-identical output files."""
    rfceval = _import_bench("eval_forcecalling")
    from cutesv_tpu.tools import eval_forcecalling as ourfc

    # NOTE: ExcHet must be the LAST INFO key — the reference parses it
    # with split(';ExcHet=')[1] and floats the whole remainder
    # (eval_forcecalling.py:45); mid-INFO ExcHet crashes the reference
    # (our tool tolerates it — covered elsewhere).
    pop = os.path.join(str(tmp_path), "pop.vcf")
    with open(pop, "w") as fh:
        fh.write("##x\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
                 "\tFORMAT\tS1\tS2\n")
        # survives filters, matches base DEL at 10050 (len ratio 0.9)
        fh.write("chr1\t10000\tp0\tN\t<DEL>\t30\tPASS\t"
                 "SVTYPE=DEL;SVLEN=-450;AF=0.25;HWE=0.5;ExcHet=0.5\t"
                 "GT\t0/1\t0/0\n")
        # filtered: tiny svlen (the <50 skip)
        fh.write("chr1\t11000\tp1\tN\t<DEL>\t30\tPASS\t"
                 "SVTYPE=DEL;SVLEN=-30;AF=0.1;HWE=0.5;ExcHet=0.5\t"
                 "GT\t0/1\t0/0\n")
        # filtered: bad HWE
        fh.write("chr1\t12000\tp2\tN\t<INS>\t30\tPASS\t"
                 "SVTYPE=INS;SVLEN=300;AF=0.1;HWE=0.0000001;ExcHet=0.5\t"
                 "GT\t0/1\t0/0\n")
        # survives, no base match (different type position)
        fh.write("chr1\t50000\tp3\tN\t<INS>\t30\tPASS\t"
                 "SVTYPE=INS;SVLEN=200;AF=0.3;HWE=0.5;ExcHet=0.5\t"
                 "GT\t0/1\t1/1\n")
    base = os.path.join(str(tmp_path), "base.vcf")
    with open(base, "w") as fh:
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                 "\tS1\tS2\n")
        fh.write("chr1\t10050\tb0\tN\t<DEL>\t30\tPASS\t"
                 "SVTYPE=DEL;SVLEN=-500;AF=0.5;HWE=0.5;ExcHet=0.5\t"
                 "GT\t0/1\t0/1\n")
    ref_out = os.path.join(str(tmp_path), "ref.tsv")
    our_out = os.path.join(str(tmp_path), "our.tsv")
    rfceval.compare_callsets(pop, base, ref_out)
    ourfc.compare_callsets(pop, base, our_out)
    ref_text = open(ref_out).read()
    assert open(our_out).read() == ref_text
    assert "DEL" in ref_text  # the matched row was written


def test_population_statistic_small_svlen_skip(tmp_path):
    """population_statistic drops non-BND records under 50 bp
    (eval_forcecalling.py:16-17); byte-identical output files."""
    rfceval = _import_bench("eval_forcecalling")
    from cutesv_tpu.tools import eval_forcecalling as ourfc

    samples = "\t".join(["0/1"] * 100)
    pop = os.path.join(str(tmp_path), "pop.vcf")
    with open(pop, "w") as fh:
        fh.write("##x\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
                 "\tFORMAT\t%s\n" % "\t".join("s%d" % i
                                              for i in range(100)))
        fh.write("chr1\t1000\ta\tN\t<DEL>\t30\tPASS\t"
                 "PRECISE;SVTYPE=DEL;SVLEN=-30;AF=0.1;HWE=0.5;ExcHet=0.5\tGT\t%s\n"
                 % samples)  # skipped: tiny
        fh.write("chr1\t2000\tb\tN\t<DEL>\t30\tPASS\t"
                 "PRECISE;SVTYPE=DEL;SVLEN=-300;AF=0.2;HWE=0.5;ExcHet=0.5\tGT\t%s\n"
                 % samples)
        fh.write("chr1\t3000\tc\tN\tN[chr2:7000[\t30\tPASS\t"
                 "PRECISE;SVTYPE=BND;SVLEN=0;AF=0.3;HWE=0.5;ExcHet=0.5\tGT\t%s\n"
                 % samples)  # BND exempt from the size floor
    ref_out = os.path.join(str(tmp_path), "ref.tsv")
    our_out = os.path.join(str(tmp_path), "our.tsv")
    rfceval.population_statistic(pop, ref_out)
    ourfc.population_statistic(pop, our_out)
    ref_text = open(ref_out).read()
    assert open(our_out).read() == ref_text
    assert len(ref_text.splitlines()) == 2  # tiny DEL dropped


def test_cmp_na19240_caller_missing_type(tmp_path, caplog):
    """A caller VCF lacking one of INS/DEL/INV: cmp_callsets' matching
    loop skips the type (cmp_NA19240.py:209-210) but the scoring tail
    then CRASHES on call[svtype] (:250-252). Ours scores it as 0 —
    a documented deviation."""
    rna = _import_bench("cmp_NA19240")
    from test_reference_differential import _na_caller_vcf
    from cutesv_tpu.tools import compare

    rng = random.Random(4)
    sites = [("1", 40_000 + 6000 * k, t, 300)
             for k, t in enumerate(["DEL", "INS", "INV"] * 4)]
    base_p = _na_caller_vcf(str(tmp_path), "base.vcf", rng, sites, "base")
    call_p = _na_caller_vcf(
        str(tmp_path), "cute.vcf", rng,
        [s for s in sites if s[2] != "INV"], "cutesv")
    base = rna.load_base(base_p)
    call = rna.load_cuteSV(call_p)
    assert "INV" in base and "INV" not in call
    with pytest.raises(KeyError):
        rna.cmp_callsets(base, call, 1, 0.7, 1000)
    caplog.clear()
    with caplog.at_level(logging.INFO):
        compare.cmp_na19240([base_p, "cutesv:" + call_p])
    assert _msgs(caplog, ["Camp count"])  # ours completes


def test_vcf_header_matches_reference(refmain, tmp_path):
    """Generation_VCF_header (cuteSV_Description.py:265-305) vs our
    vcf_header: byte-identical modulo the three environment-dependent
    lines (##source version, ##fileDate, ##CommandLine prefix)."""
    import io as _io

    sys.path.insert(0, REF_SRC)
    try:
        import cuteSV.cuteSV_Description as rdesc
    finally:
        try:  # at interpreter shutdown sys may already be torn down
            sys.path.remove(REF_SRC)
        except Exception:
            pass
    from cutesv_tpu.vcf import vcf_header

    contigs = [("chr1", 248_956_422), ("chrM", 16_569)]
    argv = ["in.bam", "ref.fa", "out.vcf", "wd", "--genotype"]
    buf = _io.StringIO()
    rdesc.Generation_VCF_header(buf, contigs, "HG002", argv)
    ref_lines = buf.getvalue().splitlines(keepends=True)
    our_lines = vcf_header(contigs, "HG002", argv).splitlines(keepends=True)

    def env_dependent(l):
        return l.startswith(("##source=", "##fileDate="))

    ref_core = [l for l in ref_lines if not env_dependent(l)]
    our_core = [l for l in our_lines if not env_dependent(l)]
    # CommandLine: same argv echo, different tool name prefix
    for lines in (ref_core, our_core):
        for i, l in enumerate(lines):
            if l.startswith("##CommandLine="):
                lines[i] = l.split(None, 1)[-1]
    # the reference writes the #CHROM line separately at the merge stage
    # (cuteSV:1222-1224); ours folds it into the header
    ref_core.append("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\t"
                    "FORMAT\tHG002\n")
    assert our_core == ref_core
    assert any(l.startswith("##source=") for l in our_lines)
    assert any(l.startswith("##fileDate=") for l in our_lines)


@pytest.mark.parametrize("seed", [0, 5])
def test_stage2_merge_matches_reference(refmain, tmp_path, seed):
    """Stage-2 merge/sort/dedup/index (process_process_sigs_type,
    cuteSV:750-857) driven on real per-PID spill pickles vs our
    build_store + write_old_sigs: the six legacy .sigs files are
    byte-identical and every per-chromosome pickle block equals our
    store's stream after the resolver-row projection."""
    import pickle

    import cutesv_tpu.extract as extract
    from cutesv_tpu import sigstore
    from cutesv_tpu.io.bam import BamReader
    from test_native_decoder import _make_random_bam

    rng = random.Random(900 + seed)
    bam = tmp_path / "x.bam"
    _make_random_bam(str(bam), rng, n_reads=300)
    from cutesv_tpu.config import Config
    cfg = Config(input=str(bam), min_support=3)

    candidates = extract.new_candidate_dict()
    census_rows = []
    reader = BamReader(str(bam))
    chrom_names = [x for x, _ in reader.references]
    lengths = dict(reader.references)
    for rec in reader:
        if rec.ref_id < 0 or rec.flag & 4 or rec.flag in (256, 272):
            continue
        chrom = chrom_names[rec.ref_id]
        extract.extract_read(rec, candidates, chrom, cfg.min_size,
                             cfg.min_mapq, cfg.max_split_parts,
                             cfg.min_read_len, cfg.min_siglength,
                             cfg.merge_del_threshold,
                             cfg.merge_ins_threshold, cfg.max_size)
        if rec.mapq >= cfg.min_mapq:
            census_rows.append((rec.pos, rec.reference_end,
                                1 if rec.flag in (0, 16) else 0,
                                rec.qname, chrom))
    reader.close()

    # --- reference side: per-PID spills (3 fake pids x 2 dumps each),
    # exactly as single_pipe appends them (cuteSV:734-741)
    ref_dir = str(tmp_path / "refwd") + os.sep
    os.makedirs(ref_dir + "signatures")
    pids = [111, 222, 333]
    for svtype in ("DEL", "INS", "DUP", "INV", "TRA"):
        rows = candidates[svtype]
        for k, pid in enumerate(pids):
            part = rows[k::3]
            with open("%ssignatures/%s%s.pickle"
                      % (ref_dir, pid, svtype), "ab") as fh:
                half = len(part) // 2
                pickle.dump(part[:half], fh)
                pickle.dump(part[half:], fh)
    # reads spills split into CONTIGUOUS chunks: the reference's stage-2
    # sorts reads by chromosome only (stable, cuteSV:810), so the
    # within-chromosome order is whatever order the PID spills
    # concatenate in — a pool-scheduling artifact in the real reference
    # (order-independent downstream: overlap_cover works on sets).
    # Contiguous chunks emulate in-order tasks and pin the deterministic
    # case; our census keeps file order, which then matches.
    n3 = (len(census_rows) + 2) // 3
    for k, pid in enumerate(pids):
        part = census_rows[k * n3:(k + 1) * n3]
        with open("%ssignatures/%sreads.pickle" % (ref_dir, pid),
                  "ab") as fh:
            pickle.dump(part, fh)
    index = {}
    reads_count = None
    for svtype in ("DEL", "INS", "DUP", "INV", "TRA", "reads"):
        t, idx, rc = refmain.process_process_sigs_type(
            (svtype, ref_dir, pids, True))
        index[t] = idx
        if svtype == "reads":
            reads_count = rc

    # empty-stream dedup early return (cuteSV:959-960)
    assert refmain.remove_duplicates_sorted([]) == []
    assert sigstore._dedup_sorted([]) == []

    # --- our side
    our_dir = str(tmp_path / "ourwd")
    os.makedirs(our_dir)
    store = sigstore.build_store(candidates, census_rows, census_rows,
                                 lengths)
    sigstore.write_old_sigs(store, our_dir, candidates)

    # legacy .sigs byte parity (all six files)
    for name in ("DEL", "INS", "DUP", "INV", "TRA", "reads"):
        ref_bytes = open(os.path.join(ref_dir, name + ".sigs"),
                         "rb").read()
        our_bytes = open(os.path.join(our_dir, name + ".sigs"),
                         "rb").read()
        assert our_bytes == ref_bytes, name

    # per-chromosome pickle blocks equal our store streams
    for svtype in ("DEL", "INS", "DUP", "INV", "TRA"):
        assert set(index[svtype]) == set(store.sigs[svtype]), svtype
        with open(os.path.join(ref_dir, svtype + ".pickle"), "rb") as fh:
            for chrom, off in index[svtype].items():
                fh.seek(off)
                rows = pickle.load(fh)
                projected = [sigstore._to_resolver_row(svtype, r)
                             for r in rows]
                assert projected == list(store.sigs[svtype][chrom]), (
                    svtype, chrom)
    # reads stream: same per-chrom grouping and counts as our census
    assert set(reads_count) == set(store.census)
    with open(os.path.join(ref_dir, "reads.pickle"), "rb") as fh:
        for chrom, off in index["reads"].items():
            fh.seek(off)
            rows = pickle.load(fh)
            assert len(rows) == reads_count[chrom]
            cen = store.census[chrom]
            ours = list(zip(cen["start"].tolist(), cen["end"].tolist(),
                            cen["is_primary"].tolist(), cen["name"]))
            assert [tuple(r[:4]) for r in rows] == ours, chrom
