"""Post-processing / evaluation tools."""
from cutesv_tpu.tools import diploid_calling, eval_sim, vcf2bedpe

HEADER = ("##fileformat=VCFv4.2\n"
          "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")


def test_diploid_calling(tmp_path):
    invcf = tmp_path / "in.vcf"
    invcf.write_text(
        HEADER
        + "chr1\t100\tsv0\tA\t<DEL>\t30\tPASS\t"
          "SVTYPE=DEL;SVLEN=-50;END=150;RE=4;"
          "RNAMES=cutesvh1_r1,cutesvh2_r9\tGT:DR\t0/1:3\n"
        + "chr1\t500\tsv1\tA\t<DEL>\t30\tPASS\t"
          "SVTYPE=DEL;SVLEN=-60;END=560;RE=2;RNAMES=cutesvh1_r7\t"
          "GT:DR\t0/1:3\n"
        + "chr1\t900\tsv2\tN\tN[chr2:77[\t30\tPASS\t"
          "SVTYPE=BND;RE=2;RNAMES=cutesvh2_r3\tGT:DR\t0/1:3\n")
    outvcf = tmp_path / "out.vcf"
    diploid_calling.convert(str(invcf), str(outvcf))
    body = [l.split("\t") for l in outvcf.read_text().splitlines()
            if not l.startswith("#")]
    assert body[0][9] == "1/1"      # both haplotypes
    assert body[1][9] == "1/0"      # h1 only
    assert body[2][9] == "0/1"      # h2 only, BND fallback info path
    assert body[2][7].startswith("SVTYPE=BND;RE=2")


def test_vcf2bedpe(tmp_path):
    invcf = tmp_path / "in.vcf"
    invcf.write_text(
        HEADER
        + "chr1\t100\tsv0\tA\t<DEL>\t30\tPASS\t"
          "SVTYPE=DEL;SVLEN=-50;END=150;RE=4\tGT\t0/1\n"
        + "chr1\t900\tsv1\tN\tN[chr2:77[\t30\tPASS\tSVTYPE=BND;RE=2\t"
          "GT\t0/1\n"
        + "chr1\t950\tsv2\tN\t]chr2:88]N\t30\tPASS\tSVTYPE=BND;RE=2\t"
          "GT\t0/1\n")
    out = tmp_path / "out.bedpe"
    vcf2bedpe.convert(str(invcf), str(out))
    lines = [l.split("\t") for l in out.read_text().splitlines()[1:]]
    assert lines[0][:6] == ["chr1", "101", "101", "chr1", "151", "151"]
    assert lines[1][3:6] == ["chr2", "78", "78"]
    assert lines[2][3:6] == ["chr2", "89", "89"]


def test_eval_sim_matching(tmp_path):
    ans = tmp_path / "ans.bed"
    ans.write_text(
        "chr1\t1000\t1050\tdeletion\t50\n"
        "chr1\t5000\t5000\tinsertion\tACGTACGTAA\n")
    gt = tmp_path / "gt.bed"
    gt.write_text("chr1\t0\t10000\th1\t100.0\n")  # hom chromosome
    calls = tmp_path / "calls.vcf"
    calls.write_text(
        HEADER
        + "chr1\t1005\tc0\tA\t<DEL>\t30\tPASS\t"
          "SVTYPE=DEL;SVLEN=-48;END=1053\tGT:DR\t1/1:0\n"
        + "chr1\t5100\tc1\tA\t<INS>\t30\tPASS\t"
          "SVTYPE=INS;SVLEN=9;END=5100\tGT:DR\t0/1:4\n"
        + "chr1\t9000\tc2\tA\t<DEL>\t30\tPASS\t"
          "SVTYPE=DEL;SVLEN=-300;END=9300\tGT:DR\t1/1:0\n")
    answers = eval_sim.load_ans(str(ans))
    genotype = eval_sim.load_gt(str(gt))
    callset, ab = eval_sim.load_callset(str(calls), ["INS", "INV", "DEL"])
    eval_sim.evaluate(callset, answers, 0.7, 1000, 1, genotype)
    stats1 = eval_sim.statistics(callset, answers, 1, 1)
    stats2 = eval_sim.statistics(callset, answers, 1, 2)
    # DEL at 1005 matches (size ratio 48/50 ok) at genotype level (hom)
    assert stats1[("call", "DEL")] == (1, 2)
    assert stats2[("call", "DEL")] == (1, 2)
    # INS len 9 vs 10: ratio 0.9 >= 0.7 and offset 100 <= 1000, but GT het
    # vs truth hom -> presence only
    assert stats1[("call", "INS")] == (1, 1)
    assert stats2[("call", "INS")] == (0, 1)
    assert genotype["chr1"] == "hom"


def test_eval_sim_five_callsets(tmp_path):
    """More than 4 callsets: match slots grow with the callset count (the
    reference hardcodes 4 slots; default layout stays 4 for parity)."""
    ans = tmp_path / "ans.bed"
    ans.write_text("chr1\t1000\t1050\tdeletion\t50\n")
    gt = tmp_path / "gt.bed"
    gt.write_text("chr1\t0\t10000\th1\t100.0\n")
    calls = tmp_path / "calls.vcf"
    calls.write_text(
        HEADER
        + "chr1\t1005\tc0\tA\t<DEL>\t30\tPASS\t"
          "SVTYPE=DEL;SVLEN=-48;END=1053\tGT:DR\t1/1:0\n")
    paths = [str(calls)] * 5
    answers = eval_sim.load_ans(str(ans), n_slots=len(paths))
    genotype = eval_sim.load_gt(str(gt))
    for opt, path in enumerate(paths, start=1):
        callset, _ = eval_sim.load_callset(path, ["INS", "INV", "DEL"])
        eval_sim.evaluate(callset, answers, 0.7, 1000, opt, genotype)
        stats = eval_sim.statistics(callset, answers, opt, 2)
        assert stats[("call", "DEL")] == (1, 1)
        assert stats[("ans", "DEL")] == (1, 1)
    # default layout unchanged (reference parity): 4 fields + 4 slots
    assert len(eval_sim.load_ans(str(ans))["DEL"][0]) == 8


def test_population_statistic_robust_inputs(tmp_path):
    """ExcHet mid-INFO, a bare '.' sample, and fewer samples than the
    default 100 must produce a correct table, not a crash (the reference
    assumes ExcHet last, full GT fields, and exactly 100 samples)."""
    from cutesv_tpu.tools import eval_forcecalling as fc

    vcf = tmp_path / "pop.vcf"
    vcf.write_text(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
        "\tS1\tS2\tS3\n"
        "chr1\t100\tv0\tA\t<DEL>\t30\tPASS\t"
        "SVTYPE=DEL;SVLEN=-60;AF=0.25;HWE=1;ExcHet=0.5;AN=6\tGT"
        "\t0/1\t.\t./.\n")
    out = tmp_path / "pop.tsv"
    fc.population_statistic(str(vcf), str(out))
    row = out.read_text().strip().split("\t")
    # S2 ('.') = 2 missing alleles, S3 ('./.') = 2; 4 of 6 alleles missing
    assert row[0] == "1"
    assert abs(float(row[1]) - 4 / 6) < 1e-5  # '%f' prints 6 decimals
    assert float(row[4]) == 0.5  # ExcHet parsed despite trailing ;AN=


def test_simulate_then_call_then_eval(tmp_path):
    """simulate -> call -> eval_sim closes the loop: planted SVs are
    recalled at the genotype level."""
    import logging

    from cutesv_tpu.config import Config
    from cutesv_tpu.pipeline import run_pipeline
    from cutesv_tpu.tools import simulate

    info = simulate.simulate(str(tmp_path / "sim"), genome_mb=2.0,
                             n_chroms=2, coverage=12, read_len=6000,
                             sv_spacing=100_000, zygosity="hom")
    out = tmp_path / "calls.vcf"
    cfg = Config(input=info["bam"], reference=info["fa"], output=str(out),
                 work_dir=str(tmp_path), genotype=True, min_support=3)
    run_pipeline(cfg, ["sim"])
    ans = eval_sim.load_ans(info["bed"])
    gt = eval_sim.load_gt(info["gt"])
    callset, _ = eval_sim.load_callset(str(out), ["INS", "INV", "DEL"])
    eval_sim.evaluate(callset, ans, 0.7, 1000, 1, gt)
    s2 = eval_sim.statistics(callset, ans, 1, 2)
    n_truth = sum(len(v) for v in ans.values())
    # every planted DEL and INS recalled with matching (hom) genotype
    for svtype in ("DEL", "INS"):
        tp, total = s2[("call", svtype)]
        assert total >= 8 and tp == total, (svtype, tp, total)
        fn, t2 = s2[("ans", svtype)]
        assert fn == t2, (svtype, fn, t2)


def test_messy_simulator_call_and_eval(tmp_path):
    """The heterogeneous stress corpus (coverage waves, ONT noise,
    chimeras, clip storms — round 3) runs the full pipeline and scores
    sanely; host and device engines agree byte-for-byte on it."""
    from cutesv_tpu.config import Config
    from cutesv_tpu.pipeline import run_pipeline
    from cutesv_tpu.tools.replay_eval import eval_window
    from cutesv_tpu.tools.simulate import simulate_messy

    pre = str(tmp_path / "m")
    info = simulate_messy(pre, genome_mb=2.0, n_chroms=2, seed=3)
    assert info["n_reads"] > 1000
    outs = {}
    for engine in ("device", "host"):
        wd = tmp_path / ("wd_" + engine)
        wd.mkdir()
        out = pre + ".%s.vcf" % engine
        cfg = Config(input=pre + ".bam", reference=pre + ".fa",
                     output=out, work_dir=str(wd), genotype=True,
                     min_support=3, engine=engine, decoder="auto")
        stats = run_pipeline(cfg, ["x"])
        assert stats["n_calls"] > 0
        outs[engine] = open(out).read().split("#CHROM")[-1]
    assert outs["device"] == outs["host"]
    res = eval_window(pre + ".device.vcf", pre + ".truth.bed",
                      pre + ".zygosity.bed", 0.7, 1000)
    m1, m2, tot = res["DEL"]
    assert tot > 10 and m1 >= 0.5 * tot  # waves cost recall, not all


def test_console_script_targets_resolve():
    """Every [project.scripts] target (incl. the reference-named `cuteSV`
    alias) imports and is callable."""
    import importlib
    import os
    import tomllib

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as fh:
        cfg = tomllib.load(fh)
    scripts = cfg["project"]["scripts"]
    assert "cuteSV" in scripts and "cutesv-tpu" in scripts
    for name, target in scripts.items():
        mod_name, _, func = target.partition(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func)), name
