"""Force calling: regenotype a discovery VCF against the same BAM."""
import random

from cutesv_tpu.config import Config
from cutesv_tpu.forcecalling import (find_in_indel_list, find_in_list,
                                     parse_vcf_records, run_force_calling)
from cutesv_tpu.pipeline import run_pipeline
from tests import simdata


def _fixture(tmp_path, seed=21):
    rng = random.Random(seed)
    ref = simdata.make_reference(rng, {"chr1": 80_000})
    chrom = ref["chr1"]
    ins_seq = simdata.random_seq(rng, 70)
    plans = []
    for i, start in enumerate(range(0, 77_000, 250)):
        q = "fc%05d" % i
        if 27_350 <= start <= 29_800:  # hom DEL @30k len 150
            plans.append(simdata.read_with_del(chrom, 0, start, 30_000, 150,
                                               3000 - (30_150 - start), q))
        elif 57_000 <= start <= 59_000 and i % 2 == 0:  # het INS @60k
            plans.append(simdata.read_with_ins(chrom, 0, start, 60_000,
                                               ins_seq,
                                               3000 - (60_000 - start), q))
        else:
            plans.append(simdata.plain_read(chrom, 0, start, 3000, q))
    bam, fa = tmp_path / "fc.bam", tmp_path / "fc.fa"
    simdata.write_bam(str(bam), [("chr1", 80_000)], plans)
    simdata.write_ref_fasta(str(fa), ref)
    return bam, fa


def test_force_calling_regenotypes(tmp_path):
    bam, fa = _fixture(tmp_path)
    disc = tmp_path / "disc.vcf"
    cfg = Config(input=str(bam), reference=str(fa), output=str(disc),
                 work_dir=str(tmp_path), genotype=True, min_support=3)
    run_pipeline(cfg, ["d"])
    body = [l for l in disc.read_text().splitlines()
            if not l.startswith("#")]
    assert len(body) == 2

    fc_out = tmp_path / "fc.vcf"
    cfg2 = Config(input=str(bam), reference=str(fa), output=str(fc_out),
                  work_dir=str(tmp_path), Ivcf=str(disc), genotype=True)
    run_force_calling(cfg2, ["f"])
    fc_body = [l for l in fc_out.read_text().splitlines()
               if not l.startswith("#")]
    assert len(fc_body) == 2
    by_type = {}
    for l in fc_body:
        f = l.split("\t")
        info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
        by_type[info["SVTYPE"]] = (f, info)
    f, info = by_type["DEL"]
    assert f[0] == "chr1" and f[1] == "30000"
    assert f[9].split(":")[0] == "1/1"
    assert info["SVLEN"] == "-150"
    f, info = by_type["INS"]
    assert f[1] == "60000"
    assert f[9].split(":")[0] == "0/1"
    # IDs carried over from the input VCF
    assert f[2].startswith("cuteSV.INS.")


def test_parse_vcf_records(tmp_path):
    vcf = tmp_path / "in.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        "chr1\t100\tid1\tA\t<DEL>\t.\tPASS\t"
        "SVTYPE=DEL;SVLEN=-50;END=150\tGT\t./.\n"
        "chr1\t200\tid2\tN\tN[chr2:5000[\t.\tPASS\tSVTYPE=BND\tGT\t./.\n"
        "chr2\t300\tid3\tA\tACCGT\t.\tPASS\tSVTYPE=INS\tGT\t./.\n")
    rows = list(parse_vcf_records(str(vcf)))
    assert rows[0][:6] == ("DEL", "chr1", "chr1", 100, 150, 50)
    assert rows[1][0] == "BND" and rows[1][2] == "chr2" and rows[1][4] == 5000
    assert rows[2][0] == "INS" and rows[2][5] == 4


def test_find_in_list_window():
    rows = [["c", 100, 500, "r1"], ["c", 110, 505, "r2"],
            ["c", 5000, 480, "r3"]]
    ids, ss, se = find_in_list("DUP", rows, 200, 105, 500)
    assert sorted(ids) == ["r1", "r2"]
    assert (ss, se) == (100, 110)
    # pos beyond every signature: the reference's forward scan still
    # matches the trailing cluster (negative gap passes `<= bias`,
    # cuteSV_forcecalling.py:188)
    ids, ss, se = find_in_list("DUP", rows, 200, 9000, 500)
    assert ids == ["r3"]
    # but a pos far *before* every signature matches nothing
    ids2, _, _ = find_in_list("DUP", rows, 200, -500, 500)
    assert ids2 == []


def test_find_in_indel_list_merging():
    # two sigs on one read merge toward the target length
    rows = [["c", 1000, 60, "r1"], ["c", 1040, 60, "r1"],
            ["c", 1010, 120, "r2"], ["c", 1015, 118, "r3"]]
    ids, ss, se, cipos, cilen = find_in_indel_list(
        "DEL", rows, 1000, 1010, 120, 0.3, False)
    assert sorted(ids) == ["r1", "r2", "r3"]


def test_force_calling_all_types(tmp_path):
    """Force-call a discovery VCF containing DUP/INV/BND records."""
    from tests.test_e2e_alltypes import _build

    bam, fa = _build(tmp_path)
    disc = tmp_path / "disc_all.vcf"
    cfg = Config(input=str(bam), reference=str(fa), output=str(disc),
                 work_dir=str(tmp_path), genotype=True, min_support=3)
    run_pipeline(cfg, ["d"])
    types_in = sorted({l.split("SVTYPE=")[1].split(";")[0]
                       for l in disc.read_text().splitlines()
                       if not l.startswith("#")})
    assert types_in == ["BND", "DEL", "DUP", "INV"]

    fc_out = tmp_path / "fc_all.vcf"
    cfg2 = Config(input=str(bam), reference=str(fa), output=str(fc_out),
                  work_dir=str(tmp_path), Ivcf=str(disc), genotype=True)
    run_force_calling(cfg2, ["f"])
    body = [l.split("\t") for l in fc_out.read_text().splitlines()
            if not l.startswith("#")]
    assert len(body) == 4
    by_type = {}
    for f in body:
        info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
        by_type[info["SVTYPE"]] = (f, info)
    assert set(by_type) == {"BND", "DEL", "DUP", "INV"}
    # supports rediscovered: RE > 0 and a called genotype for each
    for t, (f, info) in by_type.items():
        assert int(info["RE"]) >= 3, (t, info)
        assert f[9].split(":")[0] in ("0/1", "1/1"), (t, f[9])
