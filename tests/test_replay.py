"""Closed-loop replay of the reference's bundled VISOR truth beds
(simulation/sim_*.bed.gz): synthesize reads carrying the truth records
inside a genome window, call, and score with tools/eval_sim — recall must
be 100% at both presence and genotype level on the replayed subset.

Skipped when the reference checkout is not present.
"""
import os

import pytest

from cutesv_tpu.config import Config
from cutesv_tpu.pipeline import run_pipeline
from cutesv_tpu.tools import eval_sim
from cutesv_tpu.tools.simulate import replay

SIM = "/root/reference/simulation"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SIM), reason="reference simulation beds not present")


def _call(info, tmp_path, tag):
    out = str(tmp_path / ("calls_%s.vcf" % tag))
    cfg = Config(input=info["bam"], reference=info["fa"], output=out,
                 work_dir=str(tmp_path / ("wd_%s" % tag)), genotype=True,
                 min_support=3, engine="device", decoder="native")
    run_pipeline(cfg, ["t"])
    return out


def _score(info, vcf_path, mode):
    ans = eval_sim.load_ans(info["bed"])
    genotype = eval_sim.load_gt(info["gt"])
    callset, _ = eval_sim.load_callset(vcf_path, eval_sim.MODES[mode])
    eval_sim.evaluate(callset, ans, 0.7, 1000, 1, genotype)
    return {res: eval_sim.statistics(callset, ans, 1, res)
            for res in (1, 2)}


def test_replay_reference_truth_beds(tmp_path):
    beds = [os.path.join(SIM, "sim_%s.bed.gz" % t)
            for t in ("del", "ins", "dup", "inv", "tra")]
    info = replay(str(tmp_path / "rp"), beds, "1:0-3000000", coverage=12,
                  seed=0)
    assert info["n_sv"] > 40
    vcf_path = _call(info, tmp_path, "win0")

    iid = _score(info, vcf_path, "IID")
    dup = _score(info, vcf_path, "DUP")
    bnd = _score(info, vcf_path, "BND")
    for res in (1, 2):
        for mode, svtype in ((iid, "DEL"), (iid, "INS"), (dup, "DUP"),
                             (bnd, "BND")):
            matched, total = mode[res][("ans", svtype)]
            assert total > 0
            assert matched == total, (res, svtype, matched, total)


def test_replay_force_calling_round_trip(tmp_path):
    """Force-calling the discovery VCF on the replayed dataset reproduces
    the discovery genotypes for DEL/INS sites.

    DUPs are excluded on purpose: the reference genotypes a force-called
    DUP over its whole span (cuteSV_forcecalling.py:640-641, window =
    (sv_start, sv_end)) while discovery uses breakpoint windows, so any
    DUP longer than the read length legitimately flips het->hom under
    force calling. Our force caller reproduces that faithfully."""
    from cutesv_tpu.forcecalling import run_force_calling

    beds = [os.path.join(SIM, "sim_%s.bed.gz" % t)
            for t in ("del", "ins", "dup")]
    info = replay(str(tmp_path / "rp"), beds, "1:0-2000000", coverage=12,
                  seed=0)
    disc = _call(info, tmp_path, "fcd")
    fc_out = str(tmp_path / "fc.vcf")
    cfg = Config(input=info["bam"], reference=info["fa"], output=fc_out,
                 work_dir=str(tmp_path / "wd_fc"), Ivcf=disc,
                 genotype=True, min_support=3)
    run_force_calling(cfg, ["f"])

    def gts(path):
        out = {}
        for line in open(path):
            if line.startswith("#"):
                continue
            f = line.rstrip("\n").split("\t")
            info_d = dict(kv.split("=", 1) for kv in f[7].split(";")
                          if "=" in kv)
            out[(f[0], f[1], info_d["SVTYPE"])] = f[9].split(":")[0]
        return out

    d, fc = gts(disc), gts(fc_out)
    keys = [k for k in d if k[2] in ("DEL", "INS")]
    assert len(keys) > 20
    agree = sum(1 for k in keys if fc.get(k) == d[k])
    assert agree / len(keys) >= 0.95, (agree, len(keys))


def test_replay_guards(tmp_path):
    """Unknown VISOR types are dropped (not crashed on); the allocation
    cap checks the window width (offset windows allocate only the span)."""
    bed = tmp_path / "t.bed"
    bed.write_text(
        "1\t100000\t101000\tinverted tandem duplication\t2\t0\n"
        "1\t200000\t200001\tinsertion\tACGTACGTACGTACGTACGT\t0\n")
    info = replay(str(tmp_path / "rp"), [str(bed)], "1:0-400000",
                  coverage=8)
    assert info["n_sv"] == 1 and info["n_dropped"] == 1
    with pytest.raises(ValueError, match="64Mb"):
        replay(str(tmp_path / "rp2"), [str(bed)], "1:0-100000000")


def test_replay_inversion_window(tmp_path):
    info = replay(str(tmp_path / "rpi"),
                  [os.path.join(SIM, "sim_inv.bed.gz")],
                  "1:26900000-27100000", coverage=12, seed=0)
    assert info["n_sv"] == 1
    vcf_path = _call(info, tmp_path, "inv")
    iid = _score(info, vcf_path, "IID")
    for res in (1, 2):
        matched, total = iid[res][("ans", "INV")]
        assert (matched, total) == (1, 1)


def test_replay_eval_driver_smoke(tmp_path):
    """The whole-genome replay driver end to end on a tiny truth set:
    one chromosome window, replay + call + score (+ force-call round
    trip); every truth row must be recovered at presence AND genotype
    level."""
    import gzip
    import json
    import random

    from cutesv_tpu.tools import replay_eval

    bed = tmp_path / "sim_mix.bed.gz"
    rows = []
    pos = 100_000
    rng = random.Random(3)
    for k in range(12):
        ty = ("deletion", "insertion")[k % 2]
        ln = rng.randrange(80, 400)
        if ty == "insertion":
            seq = "".join(rng.choice("ACGT") for _ in range(ln))
            rows.append("1\t%d\t%d\tinsertion\t%s\t0\n"
                        % (pos, pos + 1, seq))
        else:
            rows.append("1\t%d\t%d\tdeletion\tNone\t0\n"
                        % (pos, pos + ln))
        pos += rng.randrange(20_000, 40_000)
    with gzip.open(str(bed), "wt") as fh:
        fh.writelines(rows)

    out = tmp_path / "replay_out"
    rc = replay_eval.main([
        "--beds", str(bed), "--out", str(out), "--chroms", "1",
        "--window_mb", "2", "--coverage", "10", "--force_call"])
    assert rc == 0
    summary = json.load(open(out / "summary.json"))
    for ty in ("DEL", "INS"):
        assert summary[ty]["rows"] == 6
        assert summary[ty]["presence"] == 6
        assert summary[ty]["genotype"] == 6
