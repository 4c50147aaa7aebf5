"""CRAM 3.1 behavior on both reader stacks: version-3.1 containers
decode with the 3.0 codec set AND with the 3.1 codecs we implement
(rANS-Nx16 blocks, name-tokenised read names — cram_codecs31.py /
cramdecode.inc); the remaining 3.1-only codecs (fqzcomp, adaptive
arithmetic) are tolerated on quality blocks (lazy block decompression
skips them) and raise the designed re-encode error on a NEEDED block;
corrupt rANS-Nx16 payloads fail loudly, not wrongly.

Reference capability being mirrored: pysam/htslib reads whatever CRAM
version htslib supports (cuteSV:1013)."""
import struct
import zlib

import pytest

from cutesv_tpu.io.bam import BamReader
from cutesv_tpu.io.cram import (CramReader, CramWriter, _W_IDS, read_itf8)
from tests.test_cram import _fixture


def _write_cram(tmp_path, name="c31.cram"):
    bam, fa = _fixture(tmp_path)
    cram = tmp_path / name
    with BamReader(str(bam)) as r:
        refs = r.references
        records = list(r)
    with CramWriter(str(cram), refs, store_quals=True) as w:
        for rec in records:
            w.write(rec)
    return cram, fa, records


def _set_version(path, minor):
    raw = bytearray(path.read_bytes())
    assert raw[:4] == b"CRAM" and raw[4] == 3
    raw[5] = minor
    path.write_bytes(bytes(raw))


def _rewrite_block_method(path, content_id, method):
    """Find every block with ``content_id`` across all containers and
    in-place rewrite it: new method byte, same-size garbage payload,
    fixed CRC. Sizes are unchanged, so container headers/landmarks stay
    valid."""
    raw = bytearray(path.read_bytes())
    off = 6  # magic + version
    off += 20  # file id
    n_hit = 0
    while off < len(raw):
        # container header: int32 length + 7 varints + landmarks + crc
        length = struct.unpack_from("<i", raw, off)[0]
        o = off + 4
        for _ in range(4):
            _, o = read_itf8(raw, o)
        for _ in range(2):  # ltf8 counter/bases: reuse itf8-compatible?
            o = _skip_ltf8(raw, o)
        _, o = read_itf8(raw, o)  # n_blocks
        n_lm, o = read_itf8(raw, o)
        for _ in range(n_lm):
            _, o = read_itf8(raw, o)
        o += 4  # header crc
        payload_start = o
        p = payload_start
        end = payload_start + length
        while p < end:
            blk_start = p
            p += 2  # method, ctype
            cid, p = read_itf8(raw, p)
            comp_size, p = read_itf8(raw, p)
            _, p = read_itf8(raw, p)
            data_start = p
            p += comp_size
            crc_at = p
            p += 4
            if cid == content_id and raw[blk_start + 1] == 4:  # external
                raw[blk_start] = method
                for k in range(data_start, data_start + comp_size):
                    raw[k] = 0x5A
                struct.pack_into(
                    "<I", raw, crc_at,
                    zlib.crc32(bytes(raw[blk_start:crc_at])))
                n_hit += 1
        off = end
    assert n_hit > 0, "target block not found"
    path.write_bytes(bytes(raw))


def _skip_ltf8(buf, off):
    b = buf[off]
    n_extra = 0
    while n_extra < 8 and (b << n_extra) & 0x80:
        n_extra += 1
    return off + 1 + n_extra


def _read_all(cram, fa, use_native):
    if use_native:
        import numpy as np

        from cutesv_tpu.config import Config
        from cutesv_tpu.io import native as nio
        cfg = Config(min_mapq=0, min_read_len=0, min_siglength=10)
        nd = nio.decode(str(cram), cfg, None, reference=str(fa))
        return nd.n_records, np.asarray(nd.arrays["all_start"]).tolist()
    with CramReader(str(cram), reference=str(fa)) as cr:
        recs = list(cr)
    return len(recs), [r.pos for r in recs]


@pytest.mark.parametrize("use_native", [False, True])
def test_version_31_with_30_codecs_decodes(tmp_path, use_native):
    cram, fa, records = _write_cram(tmp_path)
    base = _read_all(cram, fa, use_native)
    _set_version(cram, 1)
    assert _read_all(cram, fa, use_native) == base


@pytest.mark.parametrize("use_native", [False, True])
def test_31_codec_on_quality_block_is_skipped(tmp_path, use_native):
    """fqzcomp'd quality values never decompress (their values are
    discarded), so the file still decodes."""
    cram, fa, records = _write_cram(tmp_path)
    base = _read_all(cram, fa, use_native)
    _set_version(cram, 1)
    _rewrite_block_method(cram, _W_IDS["QS"], 7)
    assert _read_all(cram, fa, use_native) == base


@pytest.mark.parametrize("use_native", [False, True])
def test_corrupt_fqz_needed_block_fails_loudly(tmp_path, use_native):
    """A method-7 block with garbage payload is a loud fqzcomp error on
    both stacks (unsupported version / corrupt stream), never a silent
    misdecode."""
    cram, fa, records = _write_cram(tmp_path)
    _set_version(cram, 1)
    _rewrite_block_method(cram, _W_IDS["RN"], 7)
    if use_native:
        from cutesv_tpu.config import Config
        from cutesv_tpu.io import native as nio
        cfg = Config(min_mapq=0, min_read_len=0, min_siglength=10)
        with pytest.raises(Exception, match="fqzcomp"):
            nio.decode(str(cram), cfg, None, reference=str(fa))
    else:
        with pytest.raises(ValueError, match="fqzcomp"):
            with CramReader(str(cram), reference=str(fa)) as cr:
                list(cr)


@pytest.mark.parametrize("use_native", [False, True])
def test_fqz_quality_blocks_decode_or_skip(tmp_path, use_native):
    """A 3.1 file with fqzcomp'd quality blocks (the codec's real use)
    decodes fine — readers skip quality content lazily, and the python
    block decoder can also decompress it directly."""
    bam, fa = _fixture(tmp_path)
    with BamReader(str(bam)) as r:
        refs = r.references
        records = list(r)
    c30 = tmp_path / "q30.cram"
    c31 = tmp_path / "q31.cram"
    with CramWriter(str(c30), refs, store_quals=True) as w:
        for rec in records:
            w.write(rec)
    with CramWriter(str(c31), refs, store_quals=True, version=(3, 1),
                    fqz=True) as w:
        for rec in records:
            w.write(rec)
    assert _read_all(c31, fa, use_native) == _read_all(c30, fa,
                                                       use_native)


@pytest.mark.parametrize("use_native", [False, True])
def test_fqz_on_needed_blocks_decodes_both_stacks(tmp_path, use_native):
    """fqzcomp on blocks the readers actually consume (RN/BF/AP) —
    drives the real fqz decode path on both stacks through file reads."""
    bam, fa = _fixture(tmp_path)
    with BamReader(str(bam)) as r:
        refs = r.references
        records = list(r)
    c30 = tmp_path / "n30.cram"
    c31 = tmp_path / "n31.cram"
    with CramWriter(str(c30), refs, store_quals=True) as w:
        for rec in records:
            w.write(rec)
    with CramWriter(str(c31), refs, store_quals=True, version=(3, 1),
                    fqz={"RN", "BF", "AP"}) as w:
        for rec in records:
            w.write(rec)
    assert _read_all(c31, fa, use_native) == _read_all(c30, fa,
                                                       use_native)
    with CramReader(str(c31), reference=str(fa)) as cr:
        assert [r.qname for r in cr] == [r.qname for r in records]


@pytest.mark.parametrize("use_native", [False, True])
def test_fqz_full_profiles_on_needed_blocks(tmp_path, use_native):
    """Full fqzcomp profile bits (multi-param/selector, reverse, dedup,
    dtab) on consumed blocks decode identically on both stacks through
    real container reads (round-3; writer fqz_profile knob)."""
    bam, fa = _fixture(tmp_path)
    with BamReader(str(bam)) as r:
        refs = r.references
        records = list(r)
    c30 = tmp_path / "p30.cram"
    c31 = tmp_path / "p31.cram"
    with CramWriter(str(c30), refs, store_quals=True) as w:
        for rec in records:
            w.write(rec)
    with CramWriter(str(c31), refs, store_quals=True, version=(3, 1),
                    fqz={"RN", "BF", "AP"},
                    fqz_profile=dict(auto_selectors=True,
                                     auto_reverse=True, dedup=True,
                                     use_dtab=True)) as w:
        for rec in records:
            w.write(rec)
    assert _read_all(c31, fa, use_native) == _read_all(c30, fa,
                                                       use_native)


@pytest.mark.parametrize("use_native", [False, True])
def test_corrupt_nx16_needed_block_fails_loudly(tmp_path, use_native):
    """A method-5 block with garbage payload is a loud corrupt-input
    error on both stacks, never a silent misdecode."""
    cram, fa, records = _write_cram(tmp_path)
    _set_version(cram, 1)
    _rewrite_block_method(cram, _W_IDS["RN"], 5)
    if use_native:
        from cutesv_tpu.config import Config
        from cutesv_tpu.io import native as nio
        cfg = Config(min_mapq=0, min_read_len=0, min_siglength=10)
        with pytest.raises(Exception, match="nx16|rANS-Nx16"):
            nio.decode(str(cram), cfg, None, reference=str(fa))
    else:
        with pytest.raises(ValueError, match="nx16|rANS-Nx16"):
            with CramReader(str(cram), reference=str(fa)) as cr:
                list(cr)


@pytest.mark.parametrize("use_native", [False, True])
@pytest.mark.parametrize("rans_order", [0, 1])
def test_full_31_file_decodes_on_both_stacks(tmp_path, use_native,
                                             rans_order):
    """A real 3.1 fixture — rANS-Nx16 external blocks, name-tokenised
    RN block — decodes identically to its 3.0 twin."""
    bam, fa = _fixture(tmp_path)
    with BamReader(str(bam)) as r:
        refs = r.references
        records = list(r)
    c30 = tmp_path / "v30.cram"
    c31 = tmp_path / "v31.cram"
    with CramWriter(str(c30), refs, store_quals=True) as w:
        for rec in records:
            w.write(rec)
    with CramWriter(str(c31), refs, store_quals=True, version=(3, 1),
                    rans_order=rans_order) as w:
        for rec in records:
            w.write(rec)
    raw = c31.read_bytes()
    assert raw[4:6] == bytes([3, 1])
    assert _read_all(c31, fa, use_native) == _read_all(c30, fa,
                                                       use_native)


@pytest.mark.parametrize("use_native", [False, True])
def test_full_31_arith_file_decodes_on_both_stacks(tmp_path, use_native):
    """A 3.1 fixture whose external blocks use the adaptive arithmetic
    coder (method 6) decodes identically to the 3.0 twin."""
    bam, fa = _fixture(tmp_path)
    with BamReader(str(bam)) as r:
        refs = r.references
        records = list(r)
    c30 = tmp_path / "av30.cram"
    c31 = tmp_path / "av31.cram"
    with CramWriter(str(c30), refs, store_quals=True) as w:
        for rec in records:
            w.write(rec)
    with CramWriter(str(c31), refs, store_quals=True, version=(3, 1),
                    arith=True, rans_order=1) as w:
        for rec in records:
            w.write(rec)
    assert c31.read_bytes()[4:6] == bytes([3, 1])
    assert _read_all(c31, fa, use_native) == _read_all(c30, fa,
                                                       use_native)


def test_31_names_roundtrip_exactly(tmp_path):
    """Read names (the tokenised series) survive bit-exactly."""
    bam, fa = _fixture(tmp_path)
    with BamReader(str(bam)) as r:
        refs = r.references
        records = list(r)
    c31 = tmp_path / "names31.cram"
    with CramWriter(str(c31), refs, store_quals=True,
                    version=(3, 1)) as w:
        for rec in records:
            w.write(rec)
    with CramReader(str(c31), reference=str(fa)) as cr:
        out = list(cr)
    assert [r.qname for r in out] == [r.qname for r in records]
    assert [r.seq for r in out] == [r.seq for r in records]


@pytest.mark.parametrize("decoder", ["python", "native"])
def test_pipeline_on_cram31_equals_bam(tmp_path, decoder):
    """End to end: the pipeline on a 3.1 CRAM emits the same VCF body
    as on the BAM, through either decode stack."""
    from cutesv_tpu.config import Config
    from cutesv_tpu.pipeline import run_pipeline
    from tests.test_cram import _fixture as _pipe_fixture

    bam, fa = _pipe_fixture(tmp_path)
    cram = tmp_path / "pipe31.cram"
    with BamReader(str(bam)) as r:
        refs = r.references
        with CramWriter(str(cram), refs, version=(3, 1),
                        rans_order=1) as w:
            for rec in r:
                w.write(rec)
    assert cram.read_bytes()[4:6] == bytes([3, 1])
    outs = {}
    for label, path in (("bam", bam), ("cram31", cram)):
        out = tmp_path / ("out_%s_%s.vcf" % (label, decoder))
        cfg = Config(input=str(path), reference=str(fa), output=str(out),
                     work_dir=str(tmp_path), genotype=True, min_support=3,
                     decoder=decoder, engine="host")
        run_pipeline(cfg, ["c"])
        outs[label] = [l for l in out.read_text().splitlines()
                       if not l.startswith("#")]
    assert outs["bam"] == outs["cram31"]
    assert len(outs["bam"]) >= 2
