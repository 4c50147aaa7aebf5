"""Adversarial-input hardening of the native decoder.

Structurally valid BGZF streams whose record payloads are garbage (or
carry internal lengths that exceed the record block) must never read out
of bounds: the decoder raises a clean IOError (status 4) instead of
crashing the host process. Found by fuzzing — 50/60 such files
segfaulted before the span validation in Worker::process_record.
"""
import random
import struct

import pytest

from cutesv_tpu.config import Config
from cutesv_tpu.io import native
from cutesv_tpu.io.bgzf import BgzfWriter


def _fuzz_bam(path, rng):
    w = BgzfWriter(path)
    hdr = b"BAM\x01" + struct.pack("<i", 0)
    hdr += struct.pack("<i", 1)
    name = b"chr1\x00"
    hdr += struct.pack("<i", len(name)) + name + struct.pack("<i", 100000)
    w.write(hdr)
    for _ in range(rng.randrange(1, 30)):
        if rng.random() < 0.5:
            # pure garbage payload with a plausible block_size
            bs = rng.randrange(8, 400)
            payload = bytes(rng.randrange(256) for _ in range(bs))
        else:
            # semi-valid fixed header with lying internal lengths
            core = struct.pack(
                "<iiBBHHHiiii", 0, rng.randrange(0, 90000),
                rng.randrange(0, 255), rng.randrange(0, 61), 0,
                rng.randrange(0, 500), rng.choice([0, 16, 2048, 4, 256]),
                rng.randrange(0, 10000), -1, -1, 0)
            payload = core + bytes(rng.randrange(256)
                                   for _ in range(rng.randrange(0, 200)))
        w.write(struct.pack("<i", len(payload)) + payload)
    w.close()


def test_truncated_bam_is_an_error(tmp_path):
    """A BAM cut mid-stream must fail loudly (status 5), not silently
    call on a prefix of the data — matching the python reader's
    'truncated BGZF block' ValueError."""
    from tests.simdata import make_reference, plain_read, write_bam

    rng = random.Random(7)
    seqs = make_reference(rng, {"chr1": 30_000})
    plans = [plain_read(seqs["chr1"], 0, s, 2000, "p%03d" % i)
             for i, s in enumerate(range(0, 26_000, 500))]
    bam = tmp_path / "t.bam"
    write_bam(str(bam), [("chr1", 30_000)], plans)
    raw = bam.read_bytes()
    cut = tmp_path / "cut.bam"
    cut.write_bytes(raw[:len(raw) * 2 // 3])
    with pytest.raises(IOError, match="truncated|malformed"):
        native.decode(str(cut), Config(input=str(cut)))


@pytest.mark.parametrize("seed", range(12))
def test_malformed_records_raise_not_crash(tmp_path, seed):
    rng = random.Random(seed)
    path = tmp_path / ("fuzz%d.bam" % seed)
    _fuzz_bam(str(path), rng)
    try:
        nd = native.decode(str(path), Config(input=str(path)))
        # a file whose garbage happens to parse as consistent records is
        # fine — the guarantee is only "no out-of-bounds access"
        assert nd.n_records >= 0
    except IOError as e:
        assert "malformed" in str(e) or "status" in str(e)


def _bgzf_block(payload_deflated: bytes, isize: int,
                bsize_override: int = None, xlen_extra: bytes = b""):
    """Hand-rolled BGZF block with full control over BSIZE/ISIZE."""
    import zlib

    extra = b"BC\x02\x00\x00\x00" + xlen_extra  # BSIZE patched below
    xlen = len(extra)
    bsize = 12 + xlen + len(payload_deflated) + 8 - 1
    if bsize_override is not None:
        bsize = bsize_override
    extra = b"BC\x02\x00" + struct.pack("<H", bsize & 0xFFFF) + xlen_extra
    hdr = (b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
           + struct.pack("<H", xlen) + extra)
    crc = zlib.crc32(b"")  # not validated; any value
    return hdr + payload_deflated + struct.pack("<II", crc & 0xFFFFFFFF,
                                                isize & 0xFFFFFFFF)


def _deflate(data: bytes) -> bytes:
    import zlib

    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


def _decode_expect_error(path):
    cfg = Config(input=str(path))
    with pytest.raises(IOError):
        native.decode(str(path), cfg)


def test_bsize_underflow_block_is_an_error(tmp_path):
    """A BSIZE smaller than the fixed header+footer would underflow
    cdata_len to ~2^64 (heap overflow before the fix); must error."""
    path = tmp_path / "u.bam"
    good = _bgzf_block(_deflate(b"BAM\x01" + b"\x00" * 8), 12)
    bad = _bgzf_block(_deflate(b"x"), 1, bsize_override=10)
    path.write_bytes(good + bad)
    _decode_expect_error(path)


def test_oversized_isize_footer_is_an_error(tmp_path):
    """An ISIZE footer above the 64 KiB BGZF cap (would balloon the chunk
    allocation) must error, not allocate terabytes."""
    path = tmp_path / "i.bam"
    good = _bgzf_block(_deflate(b"BAM\x01" + b"\x00" * 8), 12)
    bad = _bgzf_block(_deflate(b"y" * 10), 0xFFFFFFFF)
    path.write_bytes(good + bad)
    _decode_expect_error(path)


def test_corrupt_deflate_payload_is_an_error(tmp_path):
    """A structurally valid block whose deflate stream is garbage must
    fail loudly instead of parsing uninitialized bytes as records."""
    path = tmp_path / "c.bam"
    good = _bgzf_block(_deflate(b"BAM\x01" + b"\x00" * 8), 12)
    bad = _bgzf_block(b"\xde\xad\xbe\xef" * 8, 1000)
    path.write_bytes(good + bad)
    _decode_expect_error(path)


def test_header_zero_lname_is_an_error(tmp_path):
    """l_name=0 in the reference list threw std::length_error across the
    C boundary before the fix (aborting the process); must error."""
    path = tmp_path / "h.bam"
    hdr = b"BAM\x01" + struct.pack("<i", 0) + struct.pack("<i", 1)
    hdr += struct.pack("<i", 0)  # l_name = 0
    hdr += struct.pack("<i", 1000)
    w = BgzfWriter(str(path))
    w.write(hdr)
    w.close()
    _decode_expect_error(path)
