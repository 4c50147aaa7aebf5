"""End-to-end: synthetic BAM with planted SVs -> VCF records."""
import random

import pytest

from cutesv_tpu.config import Config
from cutesv_tpu.pipeline import run_pipeline
from tests import simdata


def _parse_vcf(path):
    header = []
    records = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("#"):
                header.append(line.rstrip("\n"))
            else:
                f = line.rstrip("\n").split("\t")
                info = dict(kv.split("=", 1) if "=" in kv else (kv, True)
                            for kv in f[7].split(";"))
                records.append(dict(chrom=f[0], pos=int(f[1]), id=f[2],
                                    ref=f[3], alt=f[4], qual=f[5],
                                    filter=f[6], info=info, fmt=f[8],
                                    sample=f[9]))
    return header, records


@pytest.fixture(scope="module")
def called_vcf(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    rng = random.Random(42)
    ref = simdata.make_reference(rng, {"chr1": 60_000})
    refs = [("chr1", 60_000)]
    plans = []
    chrom = ref["chr1"]
    read_len = 3_000
    step = 250  # ~12x coverage
    del_pos, del_len = 20_000, 120
    ins_pos, ins_len = 40_000, 90
    ins_seq = simdata.random_seq(rng, ins_len)
    ridx = 0
    for start in range(0, 60_000 - read_len, step):
        ridx += 1
        qname = "read%04d" % ridx
        # DEL genotype window is anchor±200 (max_cluster_bias_DEL); give the
        # deletion to every read whose span covers that window -> DR=0, 1/1
        carries_del = (del_pos + del_len + 200 - read_len <= start
                       <= del_pos - 200)
        # INS window is anchor±1000 (hardcoded); alternate carriers -> 0/1
        carries_ins = (ins_pos - 3_000 <= start <= ins_pos - 1_000
                       and ridx % 2 == 0)
        if carries_del:
            flank = start + read_len - (del_pos + del_len)
            plans.append(simdata.read_with_del(chrom, 0, start, del_pos,
                                               del_len, flank, qname))
        elif carries_ins:
            flank = start + read_len - ins_pos
            plans.append(simdata.read_with_ins(chrom, 0, start, ins_pos,
                                               ins_seq, flank, qname))
        else:
            plans.append(simdata.plain_read(chrom, 0, start, read_len, qname))
    bam = tmp / "sim.bam"
    fa = tmp / "ref.fa"
    out = tmp / "out.vcf"
    simdata.write_bam(str(bam), refs, plans)
    simdata.write_ref_fasta(str(fa), ref)
    cfg = Config(input=str(bam), reference=str(fa), output=str(out),
                 work_dir=str(tmp), genotype=True, min_support=3)
    stats = run_pipeline(cfg, ["test"])
    return _parse_vcf(str(out)), ins_seq, stats


def test_calls_found(called_vcf):
    (header, records), ins_seq, stats = called_vcf
    assert len(records) == 2
    dele = [r for r in records if r["info"]["SVTYPE"] == "DEL"]
    ins = [r for r in records if r["info"]["SVTYPE"] == "INS"]
    assert len(dele) == 1 and len(ins) == 1


def test_del_record(called_vcf):
    (header, records), ins_seq, stats = called_vcf
    r = [x for x in records if x["info"]["SVTYPE"] == "DEL"][0]
    assert r["chrom"] == "chr1"
    assert r["pos"] == 20_000  # VCF POS = int(breakpoint), reference conv.
    assert r["info"]["SVLEN"] == "-120"
    assert r["info"]["END"] == str(20_000 + 120)
    assert r["id"] == "cuteSV.DEL.0"
    # homozygous: no covering read lacks the deletion
    gt = r["sample"].split(":")[0]
    assert gt == "1/1"
    assert r["info"]["STRAND"] == "+-"
    # REF column = ref base before + deleted bases
    assert len(r["ref"]) == 121


def test_ins_record(called_vcf):
    (header, records), ins_seq, stats = called_vcf
    r = [x for x in records if x["info"]["SVTYPE"] == "INS"][0]
    assert r["pos"] == 40_000
    assert r["info"]["SVLEN"] == "90"
    gt = r["sample"].split(":")[0]
    assert gt == "0/1"
    assert r["alt"][1:] == ins_seq  # ALT = ref base + inserted sequence


def test_header_contract(called_vcf):
    (header, records), ins_seq, stats = called_vcf
    assert header[0] == "##fileformat=VCFv4.2"
    assert any(h.startswith("##contig=<ID=chr1,length=60000>")
               for h in header)
    assert header[-1].startswith("#CHROM\tPOS")
    assert header[-1].endswith("NULL")


def test_min_support_gate(tmp_path):
    """With min_support above the planted coverage no calls emerge."""
    rng = random.Random(1)
    ref = simdata.make_reference(rng, {"c": 20_000})
    chrom = ref["c"]
    plans = []
    for i, start in enumerate(range(0, 14_000, 1_000)):
        plans.append(simdata.read_with_del(chrom, 0, start, 15_000 - 2_000,
                                           80, 500, "q%d" % i))
    bam, fa, out = tmp_path / "b.bam", tmp_path / "r.fa", tmp_path / "o.vcf"
    simdata.write_bam(str(bam), [("c", 20_000)], plans)
    simdata.write_ref_fasta(str(fa), ref)
    cfg = Config(input=str(bam), reference=str(fa), output=str(out),
                 work_dir=str(tmp_path), genotype=False, min_support=50)
    run_pipeline(cfg, [])
    _, records = _parse_vcf(str(out))
    assert records == []


def test_workdir_guard_and_resume(tmp_path):
    """Clobber refusal (cuteSV:1005-1011 parity) + checkpoint resume."""
    rng = random.Random(3)
    ref = simdata.make_reference(rng, {"c": 30_000})
    chrom = ref["c"]
    plans = [simdata.read_with_del(chrom, 0, start, 15_000, 80,
                                   3000 - (15_000 - start), "g%d" % i)
             for i, start in enumerate(range(12_100, 14_700, 250))]
    bam, fa = tmp_path / "g.bam", tmp_path / "g.fa"
    simdata.write_bam(str(bam), [("c", 30_000)], plans)
    simdata.write_ref_fasta(str(fa), ref)
    wd = tmp_path / "wd"
    wd.mkdir()
    out1 = tmp_path / "o1.vcf"
    cfg = Config(input=str(bam), reference=str(fa), output=str(out1),
                 work_dir=str(wd), genotype=True, min_support=3,
                 retain_work_dir=True, decoder="python", engine="host")
    run_pipeline(cfg, [])
    assert (wd / "sigstore.pickle").exists()
    # leftover checkpoint -> refuse to clobber
    with pytest.raises(FileExistsError):
        run_pipeline(cfg, [])
    # --resume skips decode and reproduces the records
    out2 = tmp_path / "o2.vcf"
    cfg2 = Config(input=str(bam), reference=str(fa), output=str(out2),
                  work_dir=str(wd), genotype=True, min_support=3,
                  resume=True, decoder="python", engine="host")
    run_pipeline(cfg2, [])
    body1 = [l for l in out1.read_text().splitlines()
             if not l.startswith("#")]
    body2 = [l for l in out2.read_text().splitlines()
             if not l.startswith("#")]
    assert body1 == body2 and len(body1) == 1


def test_native_checkpoint_resume(tmp_path):
    """--resume works from a native-decode (columnar) checkpoint."""
    rng = random.Random(8)
    ref = simdata.make_reference(rng, {"c": 30_000})
    chrom = ref["c"]
    plans = [simdata.read_with_del(chrom, 0, start, 15_000, 80,
                                   3000 - (15_000 - start), "n%d" % i)
             for i, start in enumerate(range(12_100, 14_700, 250))]
    bam, fa = tmp_path / "n.bam", tmp_path / "n.fa"
    simdata.write_bam(str(bam), [("c", 30_000)], plans)
    simdata.write_ref_fasta(str(fa), ref)
    wd = tmp_path / "wd"
    wd.mkdir()
    out1, out2 = tmp_path / "n1.vcf", tmp_path / "n2.vcf"
    cfg = Config(input=str(bam), reference=str(fa), output=str(out1),
                 work_dir=str(wd), genotype=True, min_support=3,
                 retain_work_dir=True, decoder="native", engine="device")
    run_pipeline(cfg, [])
    cfg2 = Config(input=str(bam), reference=str(fa), output=str(out2),
                  work_dir=str(wd), genotype=True, min_support=3,
                  resume=True, decoder="native", engine="device")
    run_pipeline(cfg2, [])
    strip = lambda p: [l for l in p.read_text().splitlines()
                       if not l.startswith("#")]
    assert strip(out1) == strip(out2) and len(strip(out1)) == 1


def test_emission_flags(tmp_path):
    """--ignore_sequence, --report_readid and -L max_size emission rules."""
    rng = random.Random(12)
    ref = simdata.make_reference(rng, {"c": 40_000})
    chrom = ref["c"]
    plans = []
    for i, start in enumerate(range(7_400, 9_700, 250)):   # DEL len 120
        plans.append(simdata.read_with_del(chrom, 0, start, 10_000, 120,
                                           3000 - (10_120 - start),
                                           "a%02d" % i))
    for i, start in enumerate(range(27_800, 29_700, 250)):  # DEL len 500
        plans.append(simdata.read_with_del(chrom, 0, start, 30_000, 500,
                                           3000 - (30_500 - start),
                                           "b%02d" % i))
    bam, fa = tmp_path / "f.bam", tmp_path / "f.fa"
    simdata.write_bam(str(bam), [("c", 40_000)], plans)
    simdata.write_ref_fasta(str(fa), ref)

    def run(**kw):
        out = tmp_path / ("out_%d.vcf" % len(list(tmp_path.iterdir())))
        cfg = Config(input=str(bam), reference=str(fa), output=str(out),
                     work_dir=str(tmp_path), genotype=True, min_support=3,
                     **kw)
        run_pipeline(cfg, [])
        return [l.split("\t") for l in out.read_text().splitlines()
                if not l.startswith("#")]

    base = run()
    assert len(base) == 2
    assert len(base[0][3]) == 121  # REF carries deleted bases

    sym = run(ignore_sequence=True)
    assert sym[0][3] == "N" and sym[0][4] == "<DEL>"

    rn = run(report_readid=True)
    assert "RNAMES=" in rn[0][7]
    assert "a00" in rn[0][7]

    capped = run(max_size=300)  # drops the 500bp DEL at emission
    assert len(capped) == 1
    assert "SVLEN=-120" in capped[0][7]


@pytest.mark.parametrize("decoder", ["python", "native"])
def test_resume_write_old_sigs_byte_identical(tmp_path, decoder):
    """--resume --write_old_sigs regenerates the six legacy .sigs files
    byte-identically from the checkpoint alone, for BOTH store flavors
    (oracle tuple rows and native columnar streams) — the resumed path
    has no raw candidates dict, only the store."""
    rng = random.Random(9)
    ref = simdata.make_reference(rng, {"c": 30_000})
    chrom = ref["c"]
    plans = [simdata.read_with_del(chrom, 0, start, 15_000, 80,
                                   3000 - (15_000 - start), "g%d" % i)
             for i, start in enumerate(range(12_100, 14_700, 250))]
    bam, fa = tmp_path / "g.bam", tmp_path / "g.fa"
    simdata.write_bam(str(bam), [("c", 30_000)], plans)
    simdata.write_ref_fasta(str(fa), ref)
    wd = tmp_path / "wd"
    wd.mkdir()
    cfg = Config(input=str(bam), reference=str(fa),
                 output=str(tmp_path / "o1.vcf"), work_dir=str(wd),
                 genotype=True, min_support=3, retain_work_dir=True,
                 write_old_sigs=True, decoder=decoder, engine="host")
    run_pipeline(cfg, [])
    direct = {n: (wd / (n + ".sigs")).read_bytes()
              for n in ("DEL", "INS", "DUP", "INV", "TRA", "reads")}
    for n in direct:
        (wd / (n + ".sigs")).unlink()
    cfg2 = Config(input=str(bam), reference=str(fa),
                  output=str(tmp_path / "o2.vcf"), work_dir=str(wd),
                  genotype=True, min_support=3, resume=True,
                  write_old_sigs=True, decoder=decoder, engine="host")
    run_pipeline(cfg2, [])
    for n, blob in direct.items():
        assert (wd / (n + ".sigs")).read_bytes() == blob, n
