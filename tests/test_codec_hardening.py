"""Crafted-input hardening regressions for the CRAM 3.1 block codecs
(round-3 advisor findings): every case must raise the designed
ValueError on BOTH stacks — never a process-killing SIGFPE/stack
overflow, a multi-TB allocation, or a silent wrong-bytes decode.

Reference capability being matched: the reference reads these blocks
via htslib (/root/reference/src/cuteSV/cuteSV:1013), whose decoders
reject the same malformed inputs.
"""
import struct
import time

import pytest

from cutesv_tpu.io.cram_codecs31 import (NX_CAT, NX_RLE, NX_STRIPE,
                                         AR_RLE, T_DELTA, T_DIFF, T_END,
                                         T_STRING, T_TYPE,
                                         arith_decode, fqz_decode,
                                         fqz_encode, name_tok_decode,
                                         rans_nx16_decode,
                                         rans_nx16_encode, write_uint7)
from cutesv_tpu.io.native import block_decode


def _both_raise(method, payload, raw_len):
    with pytest.raises(ValueError):
        if method == 5:
            rans_nx16_decode(payload, raw_len)
        elif method == 6:
            arith_decode(payload, raw_len)
        elif method == 7:
            fqz_decode(payload, raw_len)
        else:
            name_tok_decode(payload)
    with pytest.raises(ValueError):
        block_decode(method, payload, raw_len)


def test_fqz_max_sym_zero_is_designed_error():
    """max_sym=0 gives a zero-total adaptive model: the native decoder
    used to SIGFPE (range/0) and python to ZeroDivisionError."""
    enc = bytearray(fqz_encode(b"FFFF:::;;;" * 40, [100, 100, 100, 100]))
    # header layout: vers, gflags, u16 ctx, pflags, max_sym, ...
    assert enc[5] != 0
    enc[5] = 0
    _both_raise(7, bytes(enc), 400)


def test_rle_literal_length_bomb_rejected_fast():
    """A ~30-byte block demanding a multi-MB literal decode must be
    rejected by the plausibility guard before any allocation/loop."""
    for method, flag in ((5, NX_RLE), (6, AR_RLE)):
        blob = bytearray([flag])
        blob += write_uint7(100)            # out_len (plausible)
        meta = b"\x01A"                     # nsym=1, symbol 'A'
        blob += write_uint7((len(meta) << 1) | 1)
        blob += meta
        blob += write_uint7(50_000_000)     # lit_len bomb
        blob += b"\x00" * 16                # fake entropy payload
        t0 = time.monotonic()
        _both_raise(method, bytes(blob), 100)
        assert time.monotonic() - t0 < 1.0


def test_pack_stage_length_bomb_rejected_fast():
    for method, flag in ((5, 0x80), (6, 0x80)):
        blob = bytearray([flag])
        blob += write_uint7(100)            # out_len
        blob += b"\x02AB"                   # pack: nsym=2, syms
        blob += write_uint7(80_000_000)     # stage_len bomb
        blob += b"\x00" * 16
        t0 = time.monotonic()
        _both_raise(method, bytes(blob), 100)
        assert time.monotonic() - t0 < 1.0


def _stripe_wrap(payload: bytes, out_len: int, flag: int) -> bytes:
    # single-stripe (n=1) wrapper: decodes to the sub-stream verbatim
    return (bytes([flag]) + write_uint7(out_len) + bytes([1])
            + write_uint7(len(payload)) + payload)


def test_shallow_stripe_nesting_still_decodes():
    inner = bytes([NX_CAT]) + write_uint7(4) + b"abcd"
    for _ in range(3):
        inner = _stripe_wrap(inner, 4, NX_STRIPE)
    assert rans_nx16_decode(inner, 4) == b"abcd"
    assert block_decode(5, inner, 4) == b"abcd"


def test_deep_stripe_nesting_is_designed_error():
    """~4 bytes per nesting level used to recurse unbounded: C++ stack
    overflow (crash) / python RecursionError."""
    for method, stripe_flag, cat_flag in ((5, NX_STRIPE, NX_CAT),
                                          (6, 0x08, 0x20)):
        inner = bytes([cat_flag]) + write_uint7(4) + b"abcd"
        for _ in range(200):
            inner = _stripe_wrap(inner, 4, stripe_flag)
        _both_raise(method, inner, 4)


def test_truncated_nx16_payload_raises_not_garbage():
    """Dropping the final renorm word used to decode silently to wrong
    bytes of the right length on both stacks."""
    data = bytes((i * 131 + 17) % 251 for i in range(3000))
    enc = rans_nx16_encode(data, 0)
    _both_raise(5, enc[:-2], 3000)


def test_strict_interop_gate_disables_unvalidated_codecs(tmp_path,
                                                         monkeypatch):
    """CUTESV_CRAM31_INTEROP=strict turns methods 6/7/8 into loud
    unsupported errors at the container-decode layer on both stacks."""
    from cutesv_tpu.io import cram as cram_mod

    monkeypatch.setenv("CUTESV_CRAM31_INTEROP", "strict")
    with pytest.raises(ValueError, match="INTEROP=strict"):
        cram_mod._decompress(cram_mod.ARITH, b"x", 1)
    with pytest.raises(ValueError, match="INTEROP=strict"):
        cram_mod._decompress(cram_mod.FQZ, b"x", 1)
    with pytest.raises(ValueError, match="INTEROP=strict"):
        cram_mod._decompress(cram_mod.TOK, b"x", 1)
    # method 5 (rANS-Nx16) stays enabled: it is required for 3.1 core
    data = b"hello world" * 30
    enc = rans_nx16_encode(data, 0)
    assert cram_mod._decompress(cram_mod.NX16, enc, len(data)) == data


def test_name_tok_truncated_stream_payload_rejected():
    """A per-(column,type) stream whose declared length runs past the
    block end must raise on BOTH stacks — python used to slice short and
    decode garbage-but-valid bytes while native's cram_need errored
    (fresh-seed mutation campaign divergence, round 3)."""
    blob = bytes.fromhex(
        "0900000001000000000402000320010606032001000200032001010105"
        "2003726400020003200107071f0004000c5962008800880088008800000"
        "80200000c0200000402000000020001005120010b")
    _both_raise(8, blob, 9)


def test_name_tok_delta_against_non_numeric_prev():
    """A DELTA token whose previous-column token is a STRING: native
    used to strtoull it silently to 0 while python raised."""
    streams = {
        (0, T_TYPE): bytes([T_DIFF, T_DIFF]),
        (0, T_DIFF): write_uint7(0) + write_uint7(1),
        (1, T_TYPE): bytes([T_STRING, T_DELTA]),
        (1, T_STRING): b"abc\x00",
        (1, T_DELTA): b"\x01",
        (2, T_TYPE): bytes([T_END, T_END]),
    }
    blob = bytearray()
    blob += struct.pack("<I", 8)   # ulen (unreached: decode raises first)
    blob += struct.pack("<I", 2)   # nnames
    blob.append(0)                 # use_arith = 0
    blob += write_uint7(3)         # ncols
    for col in range(3):
        col_streams = sorted((t, v) for (c, t), v in streams.items()
                             if c == col)
        blob += write_uint7(len(col_streams))
        for ttype, payload in col_streams:
            comp = rans_nx16_encode(payload, 0)
            blob.append(ttype)
            blob += write_uint7(len(comp))
            blob += comp
    _both_raise(8, bytes(blob), 8)
