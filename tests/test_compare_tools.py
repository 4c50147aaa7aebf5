"""Comparison/eval CLIs."""
from cutesv_tpu.tools import compare, eval_forcecalling

HEADER = ("##fileformat=VCFv4.2\n"
          "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")


def _write(path, rows):
    path.write_text(HEADER + "".join(rows))


def test_load_and_match(tmp_path):
    a = tmp_path / "a.vcf"
    b = tmp_path / "b.vcf"
    _write(a, [
        "chr1\t1000\ta0\tA\t<DEL>\t30\tPASS\t"
        "SVTYPE=DEL;SVLEN=-100;END=1100\tGT\t0/1\n",
        "chr1\t5000\ta1\tN\tN[chr2:800[\t30\tPASS\tSVTYPE=BND\tGT\t1/1\n"])
    _write(b, [
        "chr1\t1010\tb0\tA\t<DEL>\t30\tPASS\t"
        "SVTYPE=DEL;SVLEN=-95;END=1105\tGT\t1/1\n",
        "chr1\t5100\tb1\tN\tN[chr2:850[\t30\tPASS\tSVTYPE=BND\tGT\t0/1\n"])
    ca = compare.load_callset(str(a))
    cb = compare.load_callset(str(b))
    compare.match(ca, cb, 0.7, 1000, "B", "A")
    assert "B" in ca["DEL"][0][-1]
    assert "A" in cb["DEL"][0][-1]
    assert "B" in ca["BND"][0][-1]


def test_eval_bnd_cli(tmp_path, caplog):
    base = tmp_path / "base.vcf"
    comp = tmp_path / "comp.vcf"
    _write(base, ["chr1\t5000\tx\tN\tN[chr2:800[\t30\tPASS\tSVTYPE=BND\t"
                  "GT\t0/1\n"])
    _write(comp, ["chr1\t5100\ty\tN\tN[chr2:850[\t30\tPASS\tSVTYPE=BND\t"
                  "GT\t0/1\n",
                  "chr1\t90000\tz\tN\tN[chr2:99999[\t30\tPASS\tSVTYPE=BND\t"
                  "GT\t0/1\n"])
    import logging
    with caplog.at_level(logging.INFO):
        compare.eval_bnd([str(base), str(comp)])
    text = "\n".join(r.message for r in caplog.records)
    assert "False positive in BND: 1" in text
    assert "Total amount of BND: 2" in text


def test_eval_trio_cli(tmp_path, caplog):
    child = tmp_path / "f1.vcf"
    dad = tmp_path / "mp.vcf"
    mom = tmp_path / "fp.vcf"
    sv = ("chr1\t1000\tv\tA\t<DEL>\t30\tPASS\t"
          "SVTYPE=DEL;SVLEN=-100;END=1100\tGT\t%s\n")
    _write(child, [sv % "0/1"])
    _write(dad, [sv % "1/1"])
    _write(mom, [])
    import logging
    with caplog.at_level(logging.INFO):
        compare.eval_trio([str(dad), str(mom), str(child)])
    text = "\n".join(r.message for r in caplog.records)
    assert "F1-DEL: 1\t1\t100.00." in text
    assert "MP-DEL: 1\t1\t100.00." in text


def test_concordance_cli(tmp_path, caplog):
    a, b = tmp_path / "a.vcf", tmp_path / "b.vcf"
    sv = ("chr1\t%d\tv\tA\t<INS>\t30\tPASS\t"
          "SVTYPE=INS;SVLEN=80;END=%d\tGT\t0/1\n")
    _write(a, [sv % (1000, 1000), sv % (99000, 99000)])
    _write(b, [sv % (1050, 1050)])
    import logging
    with caplog.at_level(logging.INFO):
        compare.concordance([str(a), str(b)])
    text = "\n".join(r.message for r in caplog.records)
    assert "INS total of callset 0:\t2" in text
    assert "shared-with[1]:\t1" in text


def test_cmrg_prep(tmp_path):
    invcf = tmp_path / "cmrg.vcf"
    invcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        "chr1\t100\t.\tACCTG\tA\t.\tPASS\t.\tGT\t0/1\n"
        "chr1\t500\t.\tA\tACCGTT\t.\tPASS\t.\tGT\t1/1\n")
    out = tmp_path / "out.vcf"
    eval_forcecalling.pre_cmrg(str(invcf), str(out))
    body = [l.split("\t") for l in out.read_text().splitlines()
            if not l.startswith("#")]
    assert body[0][7] == "SVTYPE=DEL;SVLEN=-4"
    assert body[1][7] == "SVTYPE=INS;SVLEN=5"


def test_cmp_base_cli(tmp_path, caplog):
    base, comp = tmp_path / "base.vcf", tmp_path / "c.vcf"
    sv = ("chr1\t%d\tv\tA\t<%s>\t30\tPASS\t"
          "SVTYPE=%s;SVLEN=%d;END=%d\tGT\t0/1\n")
    _write(base, [sv % (1000, "DEL", "DEL", -100, 1100)])
    _write(comp, [sv % (1020, "DEL", "DEL", -95, 1115),
                  sv % (50000, "INS", "INS", 20, 50000)])  # below 50bp
    import logging
    with caplog.at_level(logging.INFO):
        compare.cmp_base([str(base), str(comp)])
    text = "\n".join(r.message for r in caplog.records)
    assert "DEL: matched 1 / 1" in text
    assert "recalled 1 / 1" in text
