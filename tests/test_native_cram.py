"""Native C++ CRAM front-end vs the BAM paths.

The CRAM decoder (native/cramdecode.inc) synthesizes BAM-layout records
fed through the same extraction Worker, so decoding a CRAM made from a
BAM must yield byte-identical signature tensors to decoding the BAM
itself — across both writer profiles (verbatim-base 'b' features and
reference-based implicit matches + X/B substitutions, the layout real
htslib files use).
"""
import random

import pytest

from cutesv_tpu.config import Config
from cutesv_tpu.io import native
from cutesv_tpu.io.bam import BamReader
from cutesv_tpu.io.cram import CramWriter
from cutesv_tpu.io.fasta import write_fasta
from tests.test_native_decoder import _make_random_bam, _native_tuples


def _random_ref(rng, lengths):
    import numpy as np
    seqs = {}
    r = np.random.default_rng(rng.randrange(1 << 30))
    for name, ln in lengths:
        seqs[name] = (np.frombuffer(b"ACGT", np.uint8)[
            r.integers(0, 4, size=ln)]).tobytes().decode()
    return seqs


def _bam_to_cram(bam, cram, ref_seqs=None, **writer_kwargs):
    with BamReader(str(bam)) as r:
        refs = r.references
        with CramWriter(str(cram), refs, ref_seqs=ref_seqs,
                        **writer_kwargs) as w:
            for rec in r:
                w.write(rec)
    return refs


def _assert_same_decode(nd_bam, nd_cram):
    assert nd_cram.names == nd_bam.names
    assert nd_cram.chroms == nd_bam.chroms
    assert list(nd_cram.ref_lengths) == list(nd_bam.ref_lengths)
    assert nd_cram.n_records == nd_bam.n_records
    assert _native_tuples(nd_cram) == _native_tuples(nd_bam)
    for key in nd_bam.arrays:
        assert list(nd_cram.arrays[key]) == list(nd_bam.arrays[key]), key
    assert nd_cram.ins_seq_blob == nd_bam.ins_seq_blob


@pytest.mark.parametrize("seed,ref_based,kwargs",
                         [(0, False, {}), (0, True, {}),
                          (1, False, {}), (2, True, {}),
                          (3, True, dict(core_series=True)),
                          (4, False, dict(core_series=True)),
                          (5, True, dict(detached_mates=True)),
                          (6, True, dict(multi_ref=True)),
                          (7, False, dict(core_series=True,
                                          detached_mates=True,
                                          multi_ref=True)),
                          (8, True, dict(rans_order=1)),
                          (9, False, dict(rans_order=1,
                                          core_series=True))])
def test_native_cram_matches_native_bam(tmp_path, seed, ref_based, kwargs):
    rng = random.Random(seed)
    bam = tmp_path / "f.bam"
    cram = tmp_path / "f.cram"
    fa = tmp_path / "f.fa"
    _make_random_bam(str(bam), rng, n_reads=120)
    with BamReader(str(bam)) as r:
        lengths = r.references
    ref_seqs = _random_ref(rng, lengths)
    write_fasta(str(fa), ref_seqs)
    _bam_to_cram(bam, cram, ref_seqs=ref_seqs if ref_based else None,
                 **kwargs)
    cfg = Config(input=str(bam), min_support=3)
    nd_bam = native.decode(str(bam), cfg)
    nd_cram = native.decode(str(cram), cfg, reference=str(fa))
    _assert_same_decode(nd_bam, nd_cram)


def test_native_cram_v2_clear_error_both_decoders(tmp_path):
    """CRAM major version 2: the native decoder raises NativeUnsupported,
    the pipeline retries with the Python reader, and the Python reader
    raises a designed error with a re-encode hint — 2.x containers carry
    no CRCs and a different counter width, so parsing them with the 3.0
    layout would desync (the retry path itself stays covered by
    test_cram.py::test_cram_lzma_alone_blocks_pipeline_fallback)."""
    rng = random.Random(3)
    bam = tmp_path / "g.bam"
    cram = tmp_path / "g.cram"
    fa = tmp_path / "g.fa"
    _make_random_bam(str(bam), rng, n_reads=40)
    with BamReader(str(bam)) as r:
        lengths = r.references
    write_fasta(str(fa), _random_ref(rng, lengths))
    _bam_to_cram(bam, cram)
    raw = bytearray(cram.read_bytes())
    assert raw[:4] == b"CRAM" and raw[4] == 3
    raw[4] = 2  # pretend CRAM 2.x
    cram.write_bytes(bytes(raw))
    with pytest.raises(native.NativeUnsupported):
        native.decode(str(cram), Config(input=str(cram)),
                      reference=str(fa))

    from cutesv_tpu.pipeline import decode_bam
    cfg = Config(input=str(cram), reference=str(fa), decoder="auto",
                 min_support=3)
    with pytest.raises(ValueError, match="major version 2.*version=3.0"):
        decode_bam(cfg)


@pytest.mark.parametrize("seed", range(8))
def test_corrupt_cram_raises_not_crash(tmp_path, seed):
    """Byte-flipped CRAMs must produce a clean error (bounds-checked
    varint/stream readers), never out-of-bounds access."""
    rng = random.Random(seed)
    bam = tmp_path / "c.bam"
    cram = tmp_path / "c.cram"
    fa = tmp_path / "c.fa"
    _make_random_bam(str(bam), rng, n_reads=40)
    with BamReader(str(bam)) as r:
        lengths = r.references
    write_fasta(str(fa), _random_ref(rng, lengths))
    _bam_to_cram(bam, cram)
    raw = bytearray(cram.read_bytes())
    for _ in range(rng.randrange(1, 40)):
        raw[rng.randrange(len(raw))] = rng.randrange(256)
    cram.write_bytes(bytes(raw))
    try:
        nd = native.decode(str(cram), Config(input=str(cram)),
                           reference=str(fa))
        assert nd.n_records >= 0  # flips may land in ignored bytes
    except IOError:
        pass  # clean rejection (unsupported/corrupt -> status 10)


def _patch_first_rans_raw_len(path, new_raw_len):
    """Find the first rANS-compressed block in a CRAM file, overwrite its
    in-payload raw_len with ``new_raw_len``, and fix the block CRC so only
    the length-consistency checks can object. Returns True if patched."""
    import struct
    import zlib

    from cutesv_tpu.io.cram import _read_container_header
    from cutesv_tpu.io.cram_codecs import read_itf8

    raw = bytearray(path.read_bytes())
    with open(path, "rb") as fh:
        fh.read(26)  # magic + version + file id
        while True:
            pos0 = fh.tell()
            hdr = _read_container_header(fh)
            if hdr is None:
                return False
            payload_pos = fh.tell()
            buf = fh.read(hdr["length"])
            off = 0
            for _ in range(hdr["n_blocks"]):
                bstart = off
                method, ctype = buf[off], buf[off + 1]
                off += 2
                _, off = read_itf8(buf, off)
                comp_size, off = read_itf8(buf, off)
                raw_size, off = read_itf8(buf, off)
                data_off = off
                off += comp_size + 4  # payload + crc
                if method == 4 and comp_size >= 9:  # rANS
                    abs_block = payload_pos + bstart
                    abs_rawlen = payload_pos + data_off + 5
                    raw[abs_rawlen:abs_rawlen + 4] = struct.pack(
                        "<I", new_raw_len)
                    crc = zlib.crc32(bytes(
                        raw[abs_block:payload_pos + off - 4]))
                    raw[payload_pos + off - 4:payload_pos + off] = \
                        struct.pack("<I", crc)
                    path.write_bytes(bytes(raw))
                    return True
            assert pos0 < fh.tell()


def test_native_rans_raw_len_bomb_rejected(tmp_path):
    """A crafted rANS raw_len of 4 GiB must be rejected promptly by BOTH
    decoders (length cross-check vs the block header + plausibility
    bound), not allocate gigabytes and spin ~4e9 decode iterations."""
    import time

    rng = random.Random(12)
    bam = tmp_path / "r.bam"
    cram = tmp_path / "r.cram"
    fa = tmp_path / "r.fa"
    _make_random_bam(str(bam), rng, n_reads=40)
    with BamReader(str(bam)) as r:
        lengths = r.references
    ref_seqs = _random_ref(rng, lengths)
    write_fasta(str(fa), ref_seqs)
    _bam_to_cram(bam, cram, ref_seqs=ref_seqs)
    assert _patch_first_rans_raw_len(cram, 0xFFFFFFFF)
    t0 = time.time()
    with pytest.raises(IOError):
        native.decode(str(cram), Config(input=str(cram)),
                      reference=str(fa))
    assert time.time() - t0 < 30
    from cutesv_tpu.io.cram import CramReader
    with pytest.raises(ValueError):
        for _ in CramReader(str(cram), reference=str(fa)):
            pass


def test_pipeline_native_cram_requires_reference(tmp_path):
    """Without a FASTA the native CRAM decode reports unsupported (the
    python reader then raises the user-facing error)."""
    rng = random.Random(4)
    bam = tmp_path / "h.bam"
    cram = tmp_path / "h.cram"
    _make_random_bam(str(bam), rng, n_reads=20)
    _bam_to_cram(bam, cram)
    with pytest.raises(native.NativeUnsupported):
        native.decode(str(cram), Config(input=str(cram)))


def _recompress_external(monkeypatch, method_byte, compress):
    """Monkeypatch cram.write_block so sizable EXTERNAL blocks are
    recompressed with `compress` and tagged `method_byte` (htslib can
    emit bzip2/lzma EXTERNAL blocks; our writer's default set is
    gzip/rANS)."""
    import struct
    import zlib

    from cutesv_tpu.io import cram as cram_mod
    from cutesv_tpu.io.cram_codecs import write_itf8

    orig = cram_mod.write_block

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
        return orig(out, method, content_type, content_id, data,
                    rans_order)

    monkeypatch.setattr(cram_mod, "write_block", alt_block)


@pytest.mark.parametrize("seed,codec", [(20, "bzip2"), (21, "xz"),
                                        (22, "bzip2"), (23, "xz")])
def test_native_cram_bzip2_xz_matches_native_bam(tmp_path, monkeypatch,
                                                 seed, codec):
    """bzip2 (method 2) and xz-framed LZMA (method 3) EXTERNAL blocks
    decode natively to the same signature tensors as the BAM."""
    import bz2
    import lzma

    method_byte, compress = {
        "bzip2": (2, bz2.compress),
        "xz": (3, lambda d: lzma.compress(d, format=lzma.FORMAT_XZ)),
    }[codec]
    rng = random.Random(seed)
    bam = tmp_path / "z.bam"
    cram = tmp_path / "z.cram"
    fa = tmp_path / "z.fa"
    _make_random_bam(str(bam), rng, n_reads=120)
    with BamReader(str(bam)) as r:
        lengths = r.references
    ref_seqs = _random_ref(rng, lengths)
    write_fasta(str(fa), ref_seqs)
    _recompress_external(monkeypatch, method_byte, compress)
    _bam_to_cram(bam, cram, ref_seqs=ref_seqs)
    cfg = Config(input=str(bam), min_support=3)
    nd_bam = native.decode(str(bam), cfg)
    nd_cram = native.decode(str(cram), cfg, reference=str(fa))
    _assert_same_decode(nd_bam, nd_cram)


@pytest.mark.parametrize("seed,codec", [(30, "bzip2"), (31, "xz"),
                                        (32, "bzip2"), (33, "xz"),
                                        (34, "bzip2"), (35, "xz")])
def test_corrupt_bzip2_xz_cram_raises_not_crash(tmp_path, monkeypatch,
                                                seed, codec):
    """Byte-flipped CRAMs whose EXTERNAL blocks use the bzip2/xz native
    paths must fail cleanly (typed error or clean decode when flips land
    in ignored bytes) — mirrors the gzip/rANS corrupt fuzz above."""
    import bz2
    import lzma

    method_byte, compress = {
        "bzip2": (2, bz2.compress),
        "xz": (3, lambda d: lzma.compress(d, format=lzma.FORMAT_XZ)),
    }[codec]
    rng = random.Random(seed)
    bam = tmp_path / "y.bam"
    cram = tmp_path / "y.cram"
    fa = tmp_path / "y.fa"
    _make_random_bam(str(bam), rng, n_reads=40)
    with BamReader(str(bam)) as r:
        lengths = r.references
    write_fasta(str(fa), _random_ref(rng, lengths))
    _recompress_external(monkeypatch, method_byte, compress)
    _bam_to_cram(bam, cram)
    raw = bytearray(cram.read_bytes())
    for _ in range(rng.randrange(1, 40)):
        raw[rng.randrange(len(raw))] = rng.randrange(256)
    cram.write_bytes(bytes(raw))
    try:
        nd = native.decode(str(cram), Config(input=str(cram)),
                           reference=str(fa))
        assert nd.n_records >= 0
    except IOError:
        pass
