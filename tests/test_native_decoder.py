"""Golden test: native C++ decoder vs the Python extraction oracle.

Random BAMs (noisy CIGARs, soft/hard clips, SA split reads incl. reverse
strands, low mapq, secondary/supplementary flags, cross-chrom breakends)
must produce identical signature streams, census and read tables.
"""
import random

import pytest

from cutesv_tpu.config import Config
from cutesv_tpu.io import native
from cutesv_tpu.io.bam import BamWriter, cigar_to_string
from cutesv_tpu.pipeline import decode_bam

REFS = [("chr1", 1_000_000), ("chr2", 800_000)]


def _random_cigar(rng, read_len):
    """Random CIGAR consuming exactly read_len query bases."""
    ops = []
    remaining = read_len
    if rng.random() < 0.3:
        c = rng.randrange(1, 200)
        if c < remaining:
            ops.append((4 if rng.random() < 0.7 else 5, c))
            if ops[-1][0] == 4:
                remaining -= c
    body = []
    while remaining > 60:
        m = rng.randrange(30, min(remaining - 20, 2000))
        # aligned block: mostly M, sometimes the =/X spelling (same
        # query+ref consumption, REFCHANGEOP parity must hold)
        r0 = rng.random()
        body.append((0 if r0 < 0.8 else (7 if r0 < 0.9 else 8), m))
        remaining -= m
        r = rng.random()
        if r < 0.25:
            ln = rng.randrange(1, 120)
            if ln < remaining - 20:
                body.append((1, ln))  # insertion
                remaining -= ln
        elif r < 0.5:
            body.append((2, rng.randrange(1, 150)))  # deletion
        elif r < 0.6:
            # ref skip (RNA-style N): advances ref, consumes no query,
            # and resets the reference's sig_start like a deletion would
            body.append((3, rng.randrange(1, 500)))
        elif r < 0.65:
            body.append((6, rng.randrange(1, 30)))  # pad: consumes neither
    body.append((0, remaining))
    ops.extend(body)
    if rng.random() < 0.3:
        c = rng.randrange(1, 200)
        ops.append((4, c))
        # soft clip consumes query: extend seq below instead of resizing
    return ops


def _qlen(cigar):
    return sum(ln for op, ln in cigar if op in (0, 1, 4, 7, 8))


def _random_sa(rng):
    n = rng.randrange(1, 4)
    parts = []
    for _ in range(n):
        chrom = rng.choice(["chr1", "chr2", "chrUn_scaffold9"])
        pos = rng.randrange(1, 500_000)
        strand = rng.choice("+-")
        a = rng.randrange(0, 900)
        m = rng.randrange(100, 3000)
        b = rng.randrange(0, 900)
        cig = ""
        if rng.random() < 0.15:
            cig += "%dH" % rng.randrange(1, 50)  # H is NOT a clip here
        if a:
            cig += "%dS" % a
        if rng.random() < 0.3:
            cig += "%d=%dX%dM" % (m // 3, rng.randrange(1, 20),
                                  m - m // 3)
        else:
            cig += "%dM" % m
        if rng.random() < 0.5:
            cig += "%dD%dM" % (rng.randrange(1, 100), rng.randrange(50, 500))
        if rng.random() < 0.15:
            # N is NOT counted in the SA ref span (acquire_clip_pos only
            # sums M/D/=/X, cuteSV:478-480) — pin the exclusion
            cig += "%dN%dM" % (rng.randrange(1, 400), rng.randrange(30, 200))
        if b:
            cig += "%dS" % b
        mq = rng.choice([0, 10, 20, 45, 60])
        parts.append("%s,%d,%s,%s,%d,%d" % (chrom, pos, strand, cig, mq,
                                            rng.randrange(0, 50)))
    return ";".join(parts) + (";" if rng.random() < 0.9 else "")


def _make_random_bam(path, rng, n_reads=300):
    recs = []
    for i in range(n_reads):
        ref_id = rng.randrange(2)
        pos = rng.randrange(0, 400_000)
        read_len = rng.randrange(300, 4000)
        cigar = _random_cigar(rng, read_len)
        qlen = _qlen(cigar)
        seq = "".join(rng.choice("ACGT") for _ in range(qlen))
        flag = rng.choice([0, 0, 0, 16, 16, 2048, 2064, 256, 272, 0,
                           99, 147, 83, 163, 2304,
                           # duplicate / QC-fail combinations: detect_flag
                           # maps unrecognized flags to 0 (cuteSV:32-48)
                           1024, 1040, 528, 2560])
        mapq = rng.choice([0, 10, 20, 30, 60, 60, 255])
        tags = {}
        if rng.random() < 0.5:
            tags["SA"] = _random_sa(rng)
        if rng.random() < 0.3:
            tags["NM"] = rng.randrange(100)
        qname = "q%04d" % rng.randrange(n_reads // 2)  # name collisions
        recs.append((ref_id, pos, qname, flag, mapq, cigar, seq, tags))
    recs.sort(key=lambda r: (r[0], r[1]))
    with BamWriter(path, REFS) as w:
        for ref_id, pos, qname, flag, mapq, cigar, seq, tags in recs:
            w.write(qname, flag, ref_id, pos, mapq, cigar, seq, tags)


def _native_tuples(nd: native.NativeDecode):
    A = nd.arrays
    c = nd.chroms
    n = nd.names
    out = {"DEL": [], "INS": [], "DUP": [], "INV": [], "TRA": []}
    for i in range(len(A["del_pos"])):
        out["DEL"].append((int(A["del_pos"][i]), int(A["del_len"][i]),
                           n[A["del_name"][i]], "DEL", c[A["del_chr"][i]]))
    for i in range(len(A["ins_posx2"])):
        out["INS"].append((A["ins_posx2"][i] / 2, int(A["ins_len"][i]),
                           n[A["ins_name"][i]], nd.ins_seq(i), "INS",
                           c[A["ins_chr"][i]]))
    for i in range(len(A["dup_p1"])):
        out["DUP"].append((int(A["dup_p1"][i]), int(A["dup_p2"][i]),
                           n[A["dup_name"][i]], "DUP", c[A["dup_chr"][i]]))
    for i in range(len(A["inv_b1"])):
        out["INV"].append((["++", "--"][A["inv_strand"][i]],
                           int(A["inv_b1"][i]), int(A["inv_b2"][i]),
                           n[A["inv_name"][i]], "INV", c[A["inv_chr"][i]]))
    for i in range(len(A["tra_p1"])):
        out["TRA"].append(("ABCD"[A["tra_type"][i]], int(A["tra_p1"][i]),
                           c[A["tra_chr2"][i]], int(A["tra_p2"][i]),
                           n[A["tra_name"][i]], "TRA",
                           c[A["tra_chr1"][i]]))
    return out


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("strict", [False, True])
def test_native_matches_python(tmp_path, seed, strict):
    rng = random.Random(seed)
    bam = tmp_path / ("fuzz%d.bam" % seed)
    _make_random_bam(str(bam), rng)
    if strict:
        # non-default extraction knobs; merge_del_threshold>0 notably
        # reaches the after-break re-anchor quirk (cuteSV:570)
        cfg = Config(input=str(bam), min_support=3, min_size=50,
                     min_mapq=10, max_split_parts=3, min_read_len=800,
                     min_siglength=25, merge_del_threshold=150,
                     merge_ins_threshold=20, max_size=5000)
    else:
        cfg = Config(input=str(bam), min_support=3)

    # Python oracle (raw candidate streams, record order)
    import cutesv_tpu.extract as extract
    from cutesv_tpu.io.bam import BamReader
    candidates = extract.new_candidate_dict()
    census, allreads = [], []
    reader = BamReader(str(bam))
    chrom_names = [x for x, _ in reader.references]
    for rec in reader:
        if rec.ref_id < 0 or rec.flag & 4:
            continue
        chrom = chrom_names[rec.ref_id]
        allreads.append((rec.pos, rec.reference_end,
                         1 if rec.flag in (0, 16) else 0, rec.qname, chrom))
        if rec.flag in (256, 272):
            continue
        extract.extract_read(rec, candidates, chrom, cfg.min_size,
                             cfg.min_mapq, cfg.max_split_parts,
                             cfg.min_read_len, cfg.min_siglength,
                             cfg.merge_del_threshold,
                             cfg.merge_ins_threshold, cfg.max_size)
        if rec.mapq >= cfg.min_mapq:
            census.append((rec.pos, rec.reference_end,
                           1 if rec.flag in (0, 16) else 0, rec.qname,
                           chrom))
    reader.close()

    nd = native.decode(str(bam), cfg)
    got = _native_tuples(nd)
    for svtype in ("DEL", "INS", "DUP", "INV", "TRA"):
        assert got[svtype] == candidates[svtype], svtype

    got_census = [(int(nd.arrays["cen_start"][i]),
                   int(nd.arrays["cen_end"][i]),
                   int(nd.arrays["cen_prim"][i]),
                   nd.names[nd.arrays["cen_name"][i]],
                   nd.chroms[nd.arrays["cen_chr"][i]])
                  for i in range(len(nd.arrays["cen_start"]))]
    assert got_census == census
    got_all = [(int(nd.arrays["all_start"][i]), int(nd.arrays["all_end"][i]),
                int(nd.arrays["all_prim"][i]),
                nd.names[nd.arrays["all_name"][i]],
                nd.chroms[nd.arrays["all_chr"][i]])
               for i in range(len(nd.arrays["all_start"]))]
    assert got_all == allreads


def test_ultralong_records_cross_chunks(tmp_path):
    """Records larger than the decoder's 1MB leftover gap (ultralong ONT
    reads) take the stitch-copy fallback when they straddle an inflate
    chunk; signatures must still match the Python oracle."""
    rng = random.Random(123)
    bam = tmp_path / "long.bam"
    recs = []
    pos = 1000
    for i in range(30):  # ~150MB of records: several chunk crossings
        read_len = 3_000_000 + rng.randrange(0, 1_500_000)
        d = rng.randrange(80, 400)
        m1 = read_len // 2
        cigar = [(0, m1), (2, d), (0, read_len - m1)]
        seq = "".join(rng.choice("ACGT") for _ in range(1000)) * (
            read_len // 1000) + "A" * (read_len % 1000)
        recs.append(("u%03d" % i, 0, pos, cigar, seq))
        pos += 500
    with BamWriter(str(bam), REFS) as w:
        for qname, ref_id, p, cigar, seq in recs:
            w.write(qname, 0, ref_id, p, 60, cigar, seq)

    cfg = Config(input=str(bam), min_support=3)
    import cutesv_tpu.extract as extract
    from cutesv_tpu.io.bam import BamReader
    candidates = extract.new_candidate_dict()
    reader = BamReader(str(bam))
    chrom_names = [x for x, _ in reader.references]
    for rec in reader:
        extract.extract_read(rec, candidates, chrom_names[rec.ref_id],
                             cfg.min_size, cfg.min_mapq,
                             cfg.max_split_parts, cfg.min_read_len,
                             cfg.min_siglength, cfg.merge_del_threshold,
                             cfg.merge_ins_threshold, cfg.max_size)
    reader.close()
    nd = native.decode(str(bam), cfg)
    got = _native_tuples(nd)
    assert got["DEL"] == candidates["DEL"]
    assert len(got["DEL"]) == 30


def test_single_thread_pools_match(tmp_path):
    """CUTESV_INFLATE_THREADS=1 / CUTESV_PARSE_WORKERS=1 take the
    pool-less inline paths (empty inflate pool -> synchronous inflate in
    start_next_raw; single parse worker); outputs must equal the default
    pooled decode. The knobs are process-cached statics, so the
    single-thread decode runs in a subprocess."""
    import json
    import os
    import subprocess
    import sys

    rng = random.Random(77)
    bam = tmp_path / "st.bam"
    _make_random_bam(str(bam), rng, n_reads=400)
    cfg = Config(input=str(bam), min_support=3)
    nd = native.decode(str(bam), cfg, None)
    want = {k: sorted(map(str, v)) for k, v in _native_tuples(nd).items()}
    script = (
        "import json, sys\n"
        "sys.path.insert(0, %r)\n"
        "sys.path.insert(0, %r)\n"
        "from cutesv_tpu.config import Config\n"
        "from cutesv_tpu.io import native\n"
        "from test_native_decoder import _native_tuples\n"
        "nd = native.decode(%r, Config(input=%r, min_support=3), None)\n"
        "out = {k: sorted(map(str, v))\n"
        "       for k, v in _native_tuples(nd).items()}\n"
        "print(json.dumps([out, nd.n_records]))\n"
        % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
           os.path.dirname(os.path.abspath(__file__)),
           str(bam), str(bam)))
    env = dict(os.environ, CUTESV_INFLATE_THREADS="1",
               CUTESV_PARSE_WORKERS="1", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    got, got_n = json.loads(out.stdout.strip().splitlines()[-1])
    assert got_n == nd.n_records
    assert got == want


def test_name_ranks_lexicographic(tmp_path):
    rng = random.Random(77)
    bam = tmp_path / "r.bam"
    _make_random_bam(str(bam), rng, n_reads=100)
    nd = native.decode(str(bam), Config(input=str(bam)))
    ranked = sorted(range(len(nd.names)), key=lambda i: nd.name_rank[i])
    assert [nd.names[i] for i in ranked] == sorted(nd.names)


def test_long_cigar_cg_tag(tmp_path):
    """>65535-op CIGARs ride the CG:B,I convention (SAM spec 4.2.2):
    BamWriter stores the sentinel + tag, and BOTH decoders recover the
    real ops — signatures, census ref_end, and the round-tripped cigar
    must look exactly as if the CIGAR were inline."""
    from cutesv_tpu.io.bam import BamReader

    n_pairs = 33_000  # 2*33000 + 3 ops > 65535
    cigar = [(0, 120)]
    for _ in range(n_pairs):
        cigar += [(1, 12), (0, 5)]
    cigar += [(2, 60), (0, 120)]  # one DEL >= min_siglength, then tail
    qlen = _qlen(cigar)
    rng = random.Random(9)
    seq = "".join(rng.choice("ACGT") for _ in range(qlen))
    bam = tmp_path / "cg.bam"
    with BamWriter(str(bam), REFS) as w:
        w.write("cgread", 0, 0, 1000, 60, cigar, seq)
        w.write("plain", 0, 0, 2000, 60, [(0, 600), (2, 60), (0, 600)],
                "A" * 1200)

    # reader round-trips the true ops and a CG tag
    with BamReader(str(bam)) as r:
        recs = list(r)
    assert recs[0].cigar == cigar
    assert len(recs[0].tags["CG"]) == len(cigar)
    ref_len = sum(ln for op, ln in cigar if op in (0, 2, 3, 7, 8))
    assert recs[0].reference_end == 1000 + ref_len

    cfg = Config(input=str(bam), min_support=1)
    nd = native.decode(str(bam), cfg)
    got = _native_tuples(nd)
    # the DEL signature sits after 120 + 33000*5 reference bases
    del_pos = 1000 + 120 + n_pairs * 5
    assert (del_pos, 60, "cgread", "DEL", "chr1") in got["DEL"]
    assert (2600, 60, "plain", "DEL", "chr1") in got["DEL"]
    # census ref_end matches the python reader's
    assert int(nd.arrays["cen_end"][0]) == recs[0].reference_end
    # merged INS chain: 12-bp insertions 5 apart merge under the default
    # 100-bp threshold into one signature of summed length
    assert any(r[0] == 1120 and r[1] == n_pairs * 12 and r[2] == "cgread"
               for r in got["INS"])
