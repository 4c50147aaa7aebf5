"""CRAM 3.0 reader/writer round-trips and pipeline integration."""
import random

import pytest

from cutesv_tpu.config import Config
from cutesv_tpu.io.bam import BamReader
from cutesv_tpu.io.cram import CramReader, CramWriter, open_alignment_file
from tests import simdata
from tests.simdata import ReadPlan


def _fixture(tmp_path):
    rng = random.Random(9)
    seqs = simdata.make_reference(rng, {"chr1": 60_000, "chr2": 30_000})
    c1 = seqs["chr1"]
    plans = []
    for i, start in enumerate(range(0, 56_000, 400)):
        plans.append(simdata.plain_read(c1, 0, start, 3000, "p%04d" % i))
    for i, start in enumerate(range(17_400, 19_700, 250)):
        plans.append(simdata.read_with_del(c1, 0, start, 20_000, 120,
                                           3000 - (20_120 - start),
                                           "d%02d" % i))
    for i, start in enumerate(range(37_100, 39_000, 250)):
        plans.append(simdata.read_with_ins(
            c1, 0, start, 40_000, simdata.random_seq(rng, 80),
            3000 - (40_000 - start), "i%02d" % i))
    # split read with SA tag + soft clip, on chr2 too
    plans.append(ReadPlan("sa01", 1, 5_000, [(0, 1000), (4, 1000)],
                          seqs["chr2"][5_000:6_000] + "A" * 1000,
                          tags={"SA": "chr2,8001,+,1000S1000M,60,0;",
                                "NM": 3}))
    bam = tmp_path / "rt.bam"
    fa = tmp_path / "rt.fa"
    simdata.write_bam(str(bam), [("chr1", 60_000), ("chr2", 30_000)], plans)
    simdata.write_ref_fasta(str(fa), seqs)
    return bam, fa


import pytest


@pytest.mark.parametrize("rans_order", [0, 1])
def test_cram_roundtrip_records(tmp_path, rans_order):
    bam, fa = _fixture(tmp_path)
    cram = tmp_path / "rt.cram"
    with BamReader(str(bam)) as r:
        refs = r.references
        records = list(r)
    with CramWriter(str(cram), refs, rans_order=rans_order) as w:
        for rec in records:
            w.write(rec)
    with CramReader(str(cram), reference=str(fa)) as cr:
        assert cr.references == refs
        back = list(cr)
    assert len(back) == len(records)
    for a, b in zip(records, back):
        assert a.qname == b.qname
        assert a.flag == b.flag
        assert a.ref_id == b.ref_id
        assert a.pos == b.pos
        assert a.mapq == b.mapq
        assert a.cigar == b.cigar
        assert a.seq == b.seq
        assert a.tags.get("SA") == b.tags.get("SA")


def test_pipeline_on_cram_equals_bam(tmp_path):
    from cutesv_tpu.pipeline import run_pipeline

    bam, fa = _fixture(tmp_path)
    cram = tmp_path / "pipe.cram"
    with BamReader(str(bam)) as r:
        refs = r.references
        with CramWriter(str(cram), refs) as w:
            for rec in r:
                w.write(rec)
    outs = {}
    for label, path in (("bam", bam), ("cram", cram)):
        out = tmp_path / ("out_%s.vcf" % label)
        cfg = Config(input=str(path), reference=str(fa), output=str(out),
                     work_dir=str(tmp_path), genotype=True, min_support=3,
                     decoder="python", engine="host")
        run_pipeline(cfg, ["c"])
        outs[label] = [l for l in out.read_text().splitlines()
                       if not l.startswith("#")]
    assert outs["bam"] == outs["cram"]
    assert len(outs["bam"]) >= 2  # the DEL and INS at least


def test_open_alignment_file_dispatch(tmp_path):
    bam, fa = _fixture(tmp_path)
    cram = tmp_path / "d.cram"
    with BamReader(str(bam)) as r:
        refs = r.references
        with CramWriter(str(cram), refs) as w:
            for rec in r:
                w.write(rec)
    assert isinstance(open_alignment_file(str(bam)), BamReader)
    assert isinstance(open_alignment_file(str(cram), reference=str(fa)),
                      CramReader)


def test_cram_pipeline_on_fuzzed_bam(tmp_path):
    """Messy fuzzed records (hard clips, SA tags, secondary flags) survive
    the BAM->CRAM->pipeline round trip with identical calls."""
    import numpy as np

    from cutesv_tpu.pipeline import run_pipeline
    from tests.test_native_decoder import _make_random_bam

    rng0 = np.random.default_rng(2)
    fa = tmp_path / "ref.fa"
    with open(fa, "w") as fh:
        for name, ln in (("chr1", 1_000_000), ("chr2", 800_000)):
            fh.write(">%s\n" % name)
            s = (np.frombuffer(b"ACGT", np.uint8)[
                rng0.integers(0, 4, ln)]).tobytes().decode()
            for i in range(0, ln, 10_000):
                fh.write(s[i:i + 10_000] + "\n")
    bam = tmp_path / "fz.bam"
    _make_random_bam(str(bam), random.Random(51), n_reads=200)
    cram = tmp_path / "fz.cram"
    with BamReader(str(bam)) as r:
        with CramWriter(str(cram), r.references) as w:
            for rec in r:
                w.write(rec)
    outs = {}
    for label, path in (("bam", bam), ("cram", cram)):
        out = tmp_path / ("fz_%s.vcf" % label)
        wd = tmp_path / ("fzw_%s" % label)
        wd.mkdir()
        cfg = Config(input=str(path), reference=str(fa), output=str(out),
                     work_dir=str(wd), genotype=True, min_support=2,
                     decoder="python", engine="host")
        run_pipeline(cfg, ["c"])
        outs[label] = [l for l in out.read_text().splitlines()
                       if not l.startswith("##")]
    assert outs["bam"] == outs["cram"]


def test_cram_reference_based_roundtrip(tmp_path):
    """Reference-based writing (implicit matches + X substitutions) takes
    the reader through the reconstruction paths real CRAMs use."""
    bam, fa = _fixture(tmp_path)
    from cutesv_tpu.io.fasta import FastaFile

    fasta = FastaFile(str(fa))
    with BamReader(str(bam)) as r:
        refs = r.references
        records = list(r)
    # plant point mismatches in a few reads to force X features
    for rec in records[5:10]:
        if rec.cigar and rec.cigar[0][0] == 0 and len(rec.seq) > 100:
            s = list(rec.seq)
            s[50] = "A" if s[50] != "A" else "C"
            rec.seq = "".join(s)
    cram = tmp_path / "rb.cram"
    ref_seqs = {n: fasta.fetch(n) for n, _ in refs}
    with CramWriter(str(cram), refs, ref_seqs=ref_seqs) as w:
        for rec in records:
            w.write(rec)
    # implicit matching should beat verbatim-base storage on size
    verb = tmp_path / "vb.cram"
    with CramWriter(str(verb), refs) as w:
        for rec in records:
            w.write(rec)
    assert cram.stat().st_size < verb.stat().st_size / 2
    with CramReader(str(cram), reference=str(fa)) as cr:
        back = list(cr)
    assert len(back) == len(records)
    for a, b in zip(records, back):
        assert (a.qname, a.flag, a.pos, a.cigar) == (b.qname, b.flag,
                                                     b.pos, b.cigar)
        assert a.seq == b.seq


def test_cram_detached_mates_multiref_roundtrip(tmp_path):
    """Detached-mate records (CF bit 1 + MF/NS/NP/TS series) and
    multi-reference slices (slice ref_id -2, per-record RI) — both
    real-world layouts — round-trip through the reader."""
    bam, fa = _fixture(tmp_path)
    with BamReader(str(bam)) as r:
        refs = r.references
        records = list(r)
    cram = tmp_path / "dm.cram"
    with CramWriter(str(cram), refs, detached_mates=True,
                    multi_ref=True) as w:
        for rec in records:
            w.write(rec)
    with CramReader(str(cram), reference=str(fa)) as cr:
        back = list(cr)
    assert len(back) == len(records)
    for a, b in zip(records, back):
        assert (a.qname, a.flag, a.ref_id, a.pos, a.mapq, a.cigar) == (
            b.qname, b.flag, b.ref_id, b.pos, b.mapq, b.cigar)
        assert a.seq == b.seq


def test_cram_core_series_roundtrip(tmp_path):
    """core_series profile stores FN/FC/MQ in the core bit block (Elias
    gamma / canonical huffman / beta) — the layout htslib emits — and
    must round-trip through the bit-codec reader paths."""
    bam, fa = _fixture(tmp_path)
    from cutesv_tpu.io.fasta import FastaFile

    fasta = FastaFile(str(fa))
    with BamReader(str(bam)) as r:
        refs = r.references
        records = list(r)
    ref_seqs = {n: fasta.fetch(n) for n, _ in refs}
    cram = tmp_path / "core.cram"
    with CramWriter(str(cram), refs, ref_seqs=ref_seqs,
                    core_series=True) as w:
        for rec in records:
            w.write(rec)
    with CramReader(str(cram), reference=str(fa)) as cr:
        back = list(cr)
    assert len(back) == len(records)
    for a, b in zip(records, back):
        assert (a.qname, a.flag, a.pos, a.mapq, a.cigar) == (
            b.qname, b.flag, b.pos, b.mapq, b.cigar)
        assert a.seq == b.seq


def test_rans_order1_roundtrip():
    """Order-1 rANS (htslib CRAM block codec, compression method 4 with
    order byte 1): encode/decode round-trips on structured and random
    payloads, and rans_decode dispatches on the order byte."""
    import random

    from cutesv_tpu.io.cram_codecs import (rans_decode, rans_decode_o1,
                                           rans_encode_o1)

    rng = random.Random(11)
    payloads = [
        b"A" * 1000,                                     # degenerate
        bytes(rng.randrange(256) for _ in range(4096)),  # uniform
        ("ACGT" * 1000).encode(),                        # periodic
        bytes(rng.choice(b"ACGTN") for _ in range(9999)),
        b"ABCD",                                         # minimal (4 states)
    ]
    for data in payloads:
        enc = rans_encode_o1(data)
        assert enc[0] == 1
        assert rans_decode_o1(enc) == data
        assert rans_decode(enc) == data


def _write_recompressed_cram(tmp_path, monkeypatch, method_byte, compress,
                             magic):
    """Build a BAM + CRAM pair where every sizable EXTERNAL block in the
    CRAM is recompressed with `compress` and tagged `method_byte` —
    htslib-producible CRAM 3.0 layouts outside our writer's default
    method set (gzip/rANS)."""
    import struct
    import zlib

    from cutesv_tpu.io import cram as cram_mod
    from cutesv_tpu.io.cram_codecs import write_itf8
    from cutesv_tpu.io.fasta import write_fasta

    orig_write_block = cram_mod.write_block

    def alt_block(out, method, content_type, content_id, data,
                  rans_order=0):
        if content_type == cram_mod.CT_EXTERNAL and len(data) > 16:
            comp = compress(data)
            blob = bytearray([method_byte, content_type])
            blob += write_itf8(content_id)
            blob += write_itf8(len(comp))
            blob += write_itf8(len(data))
            blob += comp
            blob += struct.pack("<I", zlib.crc32(bytes(blob)))
            out.write(bytes(blob))
            return len(blob)
        return orig_write_block(out, method, content_type, content_id,
                                data, rans_order)

    rng = random.Random(13)
    seqs = simdata.make_reference(rng, {"chr1": 40_000})
    plans = [simdata.read_with_del(seqs["chr1"], 0, start, 15_000, 90,
                                   3000 - (15_090 - start), "d%02d" % i)
             for i, start in enumerate(range(12_200, 14_600, 250))]
    plans += [simdata.plain_read(seqs["chr1"], 0, 300 * i, 2500,
                                 "p%03d" % i) for i in range(60)]
    bam, fa, cram = (tmp_path / n for n in ("b.bam", "b.fa", "b.cram"))
    simdata.write_bam(str(bam), [("chr1", 40_000)], plans)
    write_fasta(str(fa), seqs)
    with monkeypatch.context() as m:
        m.setattr(cram_mod, "write_block", alt_block)
        with BamReader(str(bam)) as r:
            with CramWriter(str(cram), r.references) as w:
                for rec in r:
                    w.write(rec)
    assert magic in cram.read_bytes()  # alt-compressed blocks present
    return bam, fa, cram


def _pipeline_bodies(tmp_path, bam, fa, cram):
    from cutesv_tpu.pipeline import run_pipeline

    bodies = {}
    for name, inp in (("bam", bam), ("cram", cram)):
        out = tmp_path / ("out_%s.vcf" % name)
        cfg = Config(input=str(inp), reference=str(fa), output=str(out),
                     work_dir=str(tmp_path / ("wd_" + name)),
                     genotype=True, min_support=3, decoder="auto")
        run_pipeline(cfg, [])
        bodies[name] = [l for l in out.read_text().splitlines()
                        if not l.startswith("##")]
    return bodies


@pytest.mark.parametrize("codec", ["bzip2", "xz"])
def test_cram_bzip2_xz_blocks_native_decode(tmp_path, monkeypatch, codec):
    """EXTERNAL blocks compressed with bzip2 (method 2) or xz-framed
    LZMA (method 3) — legal CRAM 3.0, producible by htslib — decode
    through the NATIVE decoder directly, and the pipeline VCF equals
    the BAM run byte-for-byte."""
    import bz2
    import lzma

    from cutesv_tpu.io import native

    method_byte, compress, magic = {
        "bzip2": (2, bz2.compress, b"BZh"),
        "xz": (3, lambda d: lzma.compress(d, format=lzma.FORMAT_XZ),
               b"\xfd7zXZ\x00"),
    }[codec]
    bam, fa, cram = _write_recompressed_cram(tmp_path, monkeypatch,
                                             method_byte, compress, magic)
    # the native decoder handles these methods itself — no fallback
    store = native.decode(str(cram), Config(input=str(cram)),
                          reference=str(fa))
    assert store is not None
    bodies = _pipeline_bodies(tmp_path, bam, fa, cram)
    assert bodies["cram"] == bodies["bam"]
    assert any("DEL" in l for l in bodies["bam"])


def test_cram_lzma_alone_blocks_pipeline_fallback(tmp_path, monkeypatch):
    """LZMA blocks in the legacy "alone" container (no .xz framing —
    python's lzma module accepts it, liblzma's buffer API does not) are
    the python reader's territory: the native decoder reports
    unsupported, the pipeline transparently retries with the python
    reader, and the calls equal the BAM run byte-for-byte."""
    import lzma

    from cutesv_tpu.io import native

    bam, fa, cram = _write_recompressed_cram(
        tmp_path, monkeypatch, 3,
        lambda d: lzma.compress(d, format=lzma.FORMAT_ALONE),
        b"\x5d\x00\x00")
    with pytest.raises(native.NativeUnsupported):
        native.decode(str(cram), Config(input=str(cram)),
                      reference=str(fa))
    bodies = _pipeline_bodies(tmp_path, bam, fa, cram)
    assert bodies["cram"] == bodies["bam"]
    assert any("DEL" in l for l in bodies["bam"])


@pytest.mark.parametrize("seed", range(6))
def test_corrupt_cram_python_reader_raises_not_crash(tmp_path, seed):
    """Byte-flipped CRAMs through the PYTHON reader (the fallback path
    for bzip2/lzma/CRAM-2.x) must fail cleanly — bounded allocations and
    typed errors, no IndexError-free crashes or hangs (mirrors the
    native-decoder fuzz in test_native_cram.py)."""
    import time

    rng = random.Random(seed)
    bam, fa, cram = (tmp_path / n for n in ("c.bam", "c.fa", "c.cram"))
    seqs = simdata.make_reference(rng, {"chr1": 20_000})
    plans = [simdata.plain_read(seqs["chr1"], 0, 200 * i, 2000,
                                "q%03d" % i) for i in range(40)]
    simdata.write_bam(str(bam), [("chr1", 20_000)], plans)
    simdata.write_ref_fasta(str(fa), seqs)
    with BamReader(str(bam)) as r:
        with CramWriter(str(cram), r.references) as w:
            for rec in r:
                w.write(rec)
    raw = bytearray(cram.read_bytes())
    for _ in range(rng.randrange(1, 40)):
        raw[rng.randrange(len(raw))] = rng.randrange(256)
    cram.write_bytes(bytes(raw))
    t0 = time.time()
    try:
        n = 0
        for _ in CramReader(str(cram), reference=str(fa)):
            n += 1
        assert n >= 0  # flips may land in ignored bytes
    except (ValueError, IOError, EOFError, KeyError, AssertionError):
        pass  # clean, typed rejection
    assert time.time() - t0 < 30


def test_rans_raw_len_bomb_rejected():
    """A crafted in-payload raw_len far beyond what the payload could
    encode must raise instead of allocating GiBs and spinning ~4e9
    iterations (both orders)."""
    import struct

    from cutesv_tpu.io.cram_codecs import (rans_decode, rans_encode_o0,
                                           rans_encode_o1)

    for encode in (rans_encode_o0, rans_encode_o1):
        enc = bytearray(encode(b"ACGT" * 64))
        enc[5:9] = struct.pack("<I", 0xFFFFFFFF)
        with pytest.raises(ValueError, match="implausible"):
            rans_decode(bytes(enc))


def test_container_header_long_landmark_list():
    """Multi-slice containers put arbitrarily many landmarks in the
    container header; the reader must grow its buffer past the initial
    68 bytes (same fix as the native decoder)."""
    import io as _io

    from cutesv_tpu.io.cram import (_container_header_bytes,
                                    _read_container_header)

    landmarks = [17 + 131 * k for k in range(200)]
    raw = _container_header_bytes(12345, 0, 100, 50, 7, 3, 999, 201,
                                  landmarks)
    fh = _io.BytesIO(raw + b"PAYLOAD-FOLLOWS")
    hdr = _read_container_header(fh)
    assert hdr["length"] == 12345
    assert hdr["landmarks"] == landmarks
    assert hdr["n_blocks"] == 201
    # surplus bytes pushed back: next read starts at the payload
    assert fh.read(7) == b"PAYLOAD"


def test_block_raw_size_mismatch_rejected():
    """A block whose decompressed size disagrees with the declared
    raw_size is corrupt; the reader must say so."""
    import struct
    import zlib

    from cutesv_tpu.io.cram import read_block
    from cutesv_tpu.io.cram_codecs import write_itf8

    data = b"x" * 100
    blob = bytearray()
    blob.append(0)   # RAW
    blob.append(4)   # EXTERNAL
    blob += write_itf8(7)
    blob += write_itf8(len(data))
    blob += write_itf8(len(data) + 5)  # wrong raw_size
    blob += data
    blob += struct.pack("<I", zlib.crc32(bytes(blob)))
    with pytest.raises(ValueError, match="raw size mismatch"):
        read_block(bytes(blob), 0)
