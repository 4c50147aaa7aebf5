"""Unit tests for signature extraction against hand-derived expectations
(semantics from parse_read cuteSV:606-681 and the split-read analyses)."""
from cutesv_tpu.extract import (detect_flag, extract_read,
                                new_candidate_dict, revcomp)
from cutesv_tpu.io.bam import BamRecord


def _rec(qname="r1", flag=0, pos=1000, mapq=60, cigar=None, seq=None,
         tags=None):
    cigar = cigar or [(0, 2000)]
    qlen = sum(ln for op, ln in cigar if op in (0, 1, 4, 7, 8))
    seq = seq if seq is not None else "A" * qlen
    return BamRecord(qname=qname, flag=flag, ref_id=0, pos=pos, mapq=mapq,
                     cigar=cigar, seq=seq, tags=tags or {})


def _extract(rec, **kw):
    out = new_candidate_dict()
    params = dict(chrom="chr1", sv_size=30, min_mapq=20, max_split_parts=7,
                  min_read_len=500, min_siglength=10, merge_del_threshold=0,
                  merge_ins_threshold=100, max_size=100000)
    params.update(kw)
    extract_read(rec, out, **params)
    return out


def test_revcomp():
    assert revcomp("ACGT") == "ACGT"
    assert revcomp("AACG") == "CGTT"
    assert revcomp("RN") == "NY"


def test_detect_flag():
    assert detect_flag(0) == 1
    assert detect_flag(16) == 2
    assert detect_flag(2048) == 3
    assert detect_flag(2064) == 4
    assert detect_flag(4) == 0
    assert detect_flag(256) == 0


def test_short_read_skipped():
    out = _extract(_rec(cigar=[(0, 400)]))
    assert all(not v for v in out.values())


def test_cigar_del_signature():
    # 500M 50D 1500M at pos 1000 -> DEL at 1500 len 50
    out = _extract(_rec(cigar=[(0, 500), (2, 50), (0, 1500)]))
    assert out["DEL"] == [(1500, 50, "r1", "DEL", "chr1")]
    assert out["INS"] == []


def test_cigar_ins_signature_with_seq():
    seq = "G" * 500 + "T" * 40 + "G" * 1500
    out = _extract(_rec(cigar=[(0, 500), (1, 40), (0, 1500)], seq=seq))
    assert out["INS"] == [(1500, 40, "r1", "T" * 40, "INS", "chr1")]


def test_small_ops_ignored():
    out = _extract(_rec(cigar=[(0, 500), (2, 9), (0, 500), (1, 9), (0, 500)]))
    assert out["DEL"] == [] and out["INS"] == []


def test_softclip_shifts_ins_seq():
    seq = "C" * 100 + "G" * 500 + "T" * 40 + "G" * 1500
    out = _extract(_rec(cigar=[(4, 100), (0, 500), (1, 40), (0, 1500)],
                        seq=seq))
    assert out["INS"] == [(1500, 40, "r1", "T" * 40, "INS", "chr1")]


def test_hardclip_ins_seq_unshifted():
    # hard clips are not in SEQ; the reference's cursor handles this by
    # starting at -hardclip_left
    seq = "G" * 500 + "T" * 40 + "G" * 1500
    out = _extract(_rec(cigar=[(5, 100), (0, 500), (1, 40), (0, 1500)],
                        seq=seq))
    assert out["INS"] == [(1500, 40, "r1", "T" * 40, "INS", "chr1")]


def test_del_merge_chain():
    # two DELs, gap between end of first and start of second = 100
    out = _extract(_rec(cigar=[(0, 500), (2, 50), (0, 100), (2, 60),
                               (0, 1000)]),
                   merge_del_threshold=150)
    # merged: pos 1500, len 110
    assert out["DEL"] == [(1500, 110, "r1", "DEL", "chr1")]
    out = _extract(_rec(cigar=[(0, 500), (2, 50), (0, 100), (2, 60),
                               (0, 1000)]),
                   merge_del_threshold=0)
    assert out["DEL"] == [(1500, 50, "r1", "DEL", "chr1"),
                          (1650, 60, "r1", "DEL", "chr1")]


def test_ins_merge_chain():
    seq = "G" * 500 + "A" * 20 + "G" * 50 + "C" * 30 + "G" * 1000
    out = _extract(_rec(cigar=[(0, 500), (1, 20), (0, 50), (1, 30),
                               (0, 1000)], seq=seq))
    # gap between positions 1500 and 1550 = 50 <= 100 -> merged, seqs concat
    assert out["INS"] == [(1500, 50, "r1", "A" * 20 + "C" * 30, "INS",
                           "chr1")]


def test_low_mapq_no_cigar_sigs():
    out = _extract(_rec(mapq=10, cigar=[(0, 500), (2, 50), (0, 1500)]))
    assert out["DEL"] == []


def test_split_read_del():
    # primary: first 1000 bases at ref 1000; supplementary: last 1000 bases
    # at ref 2500 -> ref gap 500, read gap 0 -> DEL len 500 at 2000
    rec = _rec(cigar=[(0, 1000), (4, 1000)], seq="A" * 2000,
               tags={"SA": "chr1,2501,+,1000S1000M,60,0;"})
    out = _extract(rec)
    assert out["DEL"] == [(2000, 500, "r1", "DEL", "chr1")]


def test_split_read_ins():
    # read has 300 unaligned bases between two segments mapping adjacently
    seq = "A" * 1000 + "T" * 300 + "G" * 1000
    rec = _rec(cigar=[(0, 1000), (4, 1300)], seq=seq,
               tags={"SA": "chr1,2001,+,1300S1000M,60,0;"})
    out = _extract(rec)
    assert len(out["INS"]) == 1
    pos, ln, name, sv_seq, svtype, chrom = out["INS"][0]
    assert (pos, ln, name, svtype, chrom) == (2000, 300, "r1", "INS", "chr1")
    assert sv_seq == "T" * 300


def test_split_read_dup():
    # supplementary maps *backwards* (ref overlap >= sv_size) and the read
    # gap is smaller than the overlap -> DUP
    rec = _rec(cigar=[(0, 1000), (4, 1000)], seq="A" * 2000,
               tags={"SA": "chr1,1501,+,1000S1000M,60,0;"})
    out = _extract(rec)
    # e1=[0,1000,1000,2000], e2=[1000,2000,1500,2500]: overlap 500
    assert out["DUP"] == [(1500, 2000, "r1", "DUP", "chr1")]


def test_split_read_inv():
    # +/- segments on same chrom -> INV (head-to-head)
    # e1 ends at ref 2000 (+), e2: '-' strand segment ref 2600..3600
    rec = _rec(cigar=[(0, 1000), (4, 1000)], seq="A" * 2000,
               tags={"SA": "chr1,2601,-,1000M1000S,60,0;"})
    out = _extract(rec)
    # e1=[0,1000,1000,2000,'+'], e2 from '-' SA: clips swap ->
    # [1000, 2000, 2600, 3600]; e1[3]-e2[3]=-1600, e2[3]-e1[3]=1600>=30,
    # midpoint guard: e2[0]+800 >= e1[1] -> 1800>=1000 ok
    assert out["INV"] == [("++", 2000, 3600, "r1", "INV", "chr1")]


def test_split_read_bnd():
    rec = _rec(cigar=[(0, 1000), (4, 1000)], seq="A" * 2000,
               tags={"SA": "chr2,5001,+,1000S1000M,60,0;"})
    out = _extract(rec)
    # +/+ cross-chrom, chr1 < chr2: type A, pos1 = e1 ref_end
    assert out["TRA"] == [("A", 2000, "chr2", 5000, "r1", "TRA", "chr1")]


def test_max_split_parts_gate():
    sa = "".join("chr1,%d,+,%dS1000M%dS,60,0;" % (3000 + 2000 * i,
                                                  1000 + 10 * i,
                                                  990 - 10 * i)
                 for i in range(8))
    rec = _rec(cigar=[(0, 1000), (4, 1000)], seq="A" * 2000,
               tags={"SA": sa})
    out = _extract(rec)
    assert all(not v for v in out.values())


def test_reverse_primary_split_del():
    # same DEL as test_split_read_del but the read aligns on '-' strand:
    # primary is the *second* half in read coords
    rec = _rec(flag=16, cigar=[(4, 1000), (0, 1000)], seq="T" * 2000,
               pos=2500, tags={"SA": "chr1,1001,-,1000M1000S,60,0;"})
    out = _extract(rec)
    assert out["DEL"] == [(2000, 500, "r1", "DEL", "chr1")]
