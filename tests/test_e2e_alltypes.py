"""End-to-end over every SV type: CIGAR DEL/INS plus split-read DUP, INV
and cross-chromosome BND, through both engine/decoder stacks."""
import random

from cutesv_tpu.config import Config
from cutesv_tpu.io.bam import cigar_to_string
from cutesv_tpu.pipeline import run_pipeline
from tests import simdata
from tests.simdata import ReadPlan


def _sa(chrom, pos0, strand, cigar):
    return "%s,%d,%s,%s,60,0;" % (chrom, pos0 + 1, strand, cigar)


def _split_pair(qname, chrom_id, chrom_name, p, sa_chrom, sa_pos, sa_strand,
                sa_cigar, seq):
    """Primary (1000M1000S) + its supplementary record."""
    primary = ReadPlan(qname, chrom_id, p, [(0, 1000), (4, 1000)], seq,
                       flag=0, mapq=60,
                       tags={"SA": _sa(sa_chrom, sa_pos, sa_strand,
                                       sa_cigar)})
    return [primary]


def _build(tmp_path):
    rng = random.Random(11)
    seqs = simdata.make_reference(rng, {"chr1": 60_000, "chr2": 30_000})
    c1 = seqs["chr1"]
    plans = []
    # background coverage on both chroms
    for i, start in enumerate(range(0, 57_000, 500)):
        plans.append(simdata.plain_read(c1, 0, start, 3000, "bg%04d" % i))
    for i, start in enumerate(range(0, 27_000, 500)):
        plans.append(simdata.plain_read(seqs["chr2"], 1, start, 3000,
                                        "cg%04d" % i))
    # CIGAR DEL @10k
    for i, start in enumerate(range(7_400, 9_700, 250)):
        plans.append(simdata.read_with_del(c1, 0, start, 10_000, 120,
                                           3000 - (10_120 - start),
                                           "del%02d" % i))
    # DUP: supplementary re-aligns 400 bp back -> (p1, p2)=(p+600, p+1000)
    for i in range(5):
        p = 20_000 + i * 7
        plans.extend(_split_pair("dup%02d" % i, 0, "chr1", p, "chr1",
                                 p + 600, "+", "1000S1000M", "A" * 2000))
    # INV: '-' strand supplementary at Q -> ("++", p+1000, Q+1000)
    for i in range(5):
        p = 30_000 + i * 7
        q = p + 3_000
        plans.extend(_split_pair("inv%02d" % i, 0, "chr1", p, "chr1",
                                 q, "-", "1000M1000S", "C" * 2000))
    # BND: supplementary on chr2 -> type A (N[chr2:pos[)
    for i in range(5):
        p = 40_000 + i * 3  # TRA cluster bias is 50
        plans.extend(_split_pair("bnd%02d" % i, 0, "chr1", p, "chr2",
                                 5_000, "+", "1000S1000M", "G" * 2000))
    bam, fa = tmp_path / "all.bam", tmp_path / "all.fa"
    simdata.write_bam(str(bam), [("chr1", 60_000), ("chr2", 30_000)], plans)
    simdata.write_ref_fasta(str(fa), seqs)
    return bam, fa


def test_write_old_sigs_parity_across_decoders(tmp_path):
    """--write_old_sigs emits the reference's six legacy text files
    (DEL/INS/DUP/INV/TRA/reads, cuteSV:766-816) byte-identically from
    both decoder stacks."""
    bam, fa = _build(tmp_path)
    dirs = {}
    for label, engine, decoder in (("py", "host", "python"),
                                   ("nat", "device", "native")):
        wd = tmp_path / ("wd_%s" % label)
        wd.mkdir()
        cfg = Config(input=str(bam), reference=str(fa),
                     output=str(tmp_path / ("s_%s.vcf" % label)),
                     work_dir=str(wd), genotype=True, min_support=3,
                     engine=engine, decoder=decoder, write_old_sigs=True)
        run_pipeline(cfg, ["t"])
        dirs[label] = wd
    for name in ("DEL", "INS", "DUP", "INV", "TRA", "reads"):
        a = (dirs["py"] / ("%s.sigs" % name)).read_text()
        b = (dirs["nat"] / ("%s.sigs" % name)).read_text()
        assert a == b, "%s.sigs differs between decoders" % name
    reads = (dirs["py"] / "reads.sigs").read_text().splitlines()
    assert len(reads) > 50
    chroms = []
    for line in reads:
        chrom, start, end, prim, qname = line.split("\t")
        assert int(start) >= 0 and int(end) > int(start)
        assert prim in ("0", "1") and qname
        chroms.append(chrom)
    # stable chrom-name sort (the reference's only sort key for reads)
    assert chroms == sorted(chroms)
    dels = (dirs["py"] / "DEL.sigs").read_text().splitlines()
    assert dels and all(l.split("\t")[0] == "DEL" for l in dels)


def test_all_types_called_and_engines_agree(tmp_path):
    bam, fa = _build(tmp_path)
    outputs = {}
    for label, engine, decoder in (("py", "host", "python"),
                                   ("nat", "device", "native")):
        out = tmp_path / ("o_%s.vcf" % label)
        cfg = Config(input=str(bam), reference=str(fa), output=str(out),
                     work_dir=str(tmp_path), genotype=True, min_support=3,
                     engine=engine, decoder=decoder)
        run_pipeline(cfg, ["t"])
        outputs[label] = [l for l in out.read_text().splitlines()
                          if not l.startswith("#")]
    assert outputs["py"] == outputs["nat"]
    body = outputs["py"]
    by_type = {}
    for l in body:
        f = l.split("\t")
        info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
        by_type.setdefault(info["SVTYPE"], []).append((f, info))
    assert set(by_type) == {"DEL", "DUP", "INV", "BND"}

    f, info = by_type["DEL"][0]
    assert f[1] == "10000" and info["SVLEN"] == "-120"

    f, info = by_type["DUP"][0]
    # p1 mean of 20600..20628 band; POS = p1+1; SVLEN = p2-p1 = 400
    assert info["SVLEN"] == "400"
    assert 20_600 <= int(f[1]) <= 20_630
    assert f[4] == "<DUP>"
    assert info["STRAND"] == "-+"

    f, info = by_type["INV"][0]
    # "++": POS = bp1 (p+1000), SVLEN = 3000
    assert info["SVLEN"] == "3000"
    assert 31_000 <= int(f[1]) <= 31_030
    assert info["STRAND"] == "++"

    f, info = by_type["BND"][0]
    # ALT leads with the actual REF base in place of N
    # (cuteSV_genotype.py:428-435); mate position is 1-based for type A
    assert f[4] == "%s[chr2:%d[" % (f[3], 5_000 + 1)
    assert 41_000 <= int(f[1]) <= 41_015
