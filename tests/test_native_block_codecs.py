"""Direct python-encode -> NATIVE-decode differentials for every CRAM
block codec (methods 0-8), through the bamdecode_block_decode test seam
— no container crafting needed, so the native ports of the 3.1 codecs
(rANS-Nx16, arith, fqzcomp, name tokeniser) get dense cross-stack
coverage. Seed window env-tunable: CUTESV_BLKCODEC_BASE / _N."""
import bz2
import os
import random
import zlib

import pytest

from cutesv_tpu.io.cram_codecs import rans_encode_o0, rans_encode_o1
from cutesv_tpu.io.cram_codecs31 import (AR_CAT, AR_EXT, AR_ORDER1,
                                         AR_PACK, AR_RLE, AR_STRIPE,
                                         NX_CAT, NX_N32, NX_ORDER1,
                                         NX_PACK, NX_RLE, NX_STRIPE,
                                         arith_decode, arith_encode,
                                         fqz_decode, fqz_encode,
                                         name_tok_decode, name_tok_encode,
                                         rans_nx16_decode,
                                         rans_nx16_encode)
from cutesv_tpu.io.native import block_decode

BASE = int(os.environ.get("CUTESV_BLKCODEC_BASE", "0"))
N = int(os.environ.get("CUTESV_BLKCODEC_N", "25"))

NX_FLAGS = [0, NX_ORDER1, NX_N32, NX_ORDER1 | NX_N32, NX_RLE, NX_PACK,
            NX_RLE | NX_PACK | NX_ORDER1, NX_STRIPE,
            NX_STRIPE | NX_ORDER1, NX_CAT]
AR_FLAGS = [0, AR_ORDER1, AR_RLE, AR_PACK, AR_RLE | AR_PACK | AR_ORDER1,
            AR_STRIPE, AR_STRIPE | AR_ORDER1, AR_CAT, AR_EXT]


def _rnd(rng, n, alphabet=256):
    return bytes(rng.randrange(alphabet) for _ in range(n))


def test_legacy_methods_native_matches_python():
    rng = random.Random(1000 + BASE)
    for data in (b"", b"x", _rnd(rng, 4000, 7), _rnd(rng, 2500)):
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        gz = co.compress(data) + co.flush()
        assert block_decode(0, data, len(data)) == data
        assert block_decode(1, gz, len(data)) == data
        assert block_decode(2, bz2.compress(data), len(data)) == data
        if data:
            assert block_decode(4, rans_encode_o0(data), len(data)) == data
            assert block_decode(4, rans_encode_o1(data), len(data)) == data


@pytest.mark.parametrize("seed", range(BASE, BASE + N))
def test_nx16_native_matches_python(seed):
    rng = random.Random(31000 + seed)
    for _ in range(6):
        n = rng.randrange(0, 3000)
        data = _rnd(rng, n, rng.randrange(1, 257))
        fl = rng.choice(NX_FLAGS)
        enc = rans_nx16_encode(data, fl)
        assert rans_nx16_decode(enc, n) == data
        assert block_decode(5, enc, n) == data, hex(fl)


@pytest.mark.parametrize("seed", range(BASE, BASE + N))
def test_arith_native_matches_python(seed):
    rng = random.Random(32000 + seed)
    for _ in range(5):
        n = rng.randrange(0, 2500)
        data = _rnd(rng, n, rng.randrange(1, 257))
        fl = rng.choice(AR_FLAGS)
        enc = arith_encode(data, fl)
        assert arith_decode(enc, n) == data
        assert block_decode(6, enc, n) == data, hex(fl)


@pytest.mark.parametrize("seed", range(BASE, BASE + N))
def test_fqz_native_matches_python(seed):
    rng = random.Random(33000 + seed)
    for _ in range(4):
        lens = [rng.randrange(1, 200) for _ in range(rng.randrange(1, 25))]
        data = _rnd(rng, sum(lens), rng.randrange(1, 250))
        enc = fqz_encode(data, lens)
        assert fqz_decode(enc, len(data)) == data
        assert block_decode(7, enc, len(data)) == data


@pytest.mark.parametrize("seed", range(BASE, BASE + N))
def test_fqz_full_profiles_native_matches_python(seed):
    """Every fqzcomp profile bit (multi-param/selector, reverse,
    fixed-length, dedup, dtab) decodes identically on both stacks."""
    rng = random.Random(35000 + seed)
    n_recs = rng.randrange(4, 30)
    rlen = rng.randrange(20, 200)
    lens = [rlen] * n_recs
    recs = [bytes(rng.choice(b"##''--05;@F~") for _ in range(rlen))
            for _ in range(n_recs)]
    # plant some consecutive duplicates for the dedup arm
    for i in range(1, n_recs, 3):
        recs[i] = recs[i - 1]
    data = b"".join(recs)
    n_params = rng.randrange(1, 4)
    kw = dict(
        selectors=[rng.randrange(0, 4) for _ in range(n_recs)],
        n_params=n_params,
        reverse=[rng.random() < 0.5 for _ in range(n_recs)],
        fixed_len=bool(rng.random() < 0.5),
        dedup=bool(rng.random() < 0.7),
        use_dtab=bool(rng.random() < 0.5),
    )
    if rng.random() < 0.3:
        kw.pop("selectors")
        kw["n_params"] = 1
    if rng.random() < 0.3:
        kw.pop("reverse")
    enc = fqz_encode(data, lens, **kw)
    assert fqz_decode(enc, len(data)) == data
    assert block_decode(7, enc, len(data)) == data


@pytest.mark.parametrize("seed", range(BASE, BASE + N))
def test_name_tok_native_matches_python(seed):
    rng = random.Random(34000 + seed)
    for _ in range(4):
        names = [bytes("r%d_%s" % (
            rng.randrange(10 ** 9),
            "".join(rng.choice("abcXYZ_/:0") for _ in
                    range(rng.randrange(12)))), "ascii")
            for _ in range(rng.randrange(0, 60))]
        blob = b"".join(x + b"\x00" for x in names)
        enc = name_tok_encode(blob)
        assert name_tok_decode(enc) == blob
        assert block_decode(8, enc, len(blob)) == blob


@pytest.mark.parametrize("method", [5, 6, 7, 8])
def test_corrupt_blocks_both_stacks_raise(method):
    """Mutated 3.1-codec payloads either raise on BOTH stacks or decode
    to the same bytes on both — the stacks never silently diverge."""
    rng = random.Random(7000 + BASE + method)
    data = _rnd(rng, 600, 60)
    if method == 5:
        enc = rans_nx16_encode(data, NX_ORDER1)
        pydec = rans_nx16_decode
    elif method == 6:
        enc = arith_encode(data, AR_ORDER1 | AR_RLE)
        pydec = arith_decode
    elif method == 7:
        enc = fqz_encode(data, [200, 200, 200])
        pydec = fqz_decode
    else:
        blob = b"".join(b"read%d\x00" % i for i in range(60))
        data = blob
        enc = name_tok_encode(blob)
        pydec = lambda b, n=None: name_tok_decode(b)  # noqa: E731
    for _ in range(25):
        blob2 = bytearray(enc)
        for _ in range(3):
            blob2[rng.randrange(len(blob2))] = rng.randrange(256)
        blob2 = bytes(blob2)
        try:
            py = pydec(blob2, len(data))
            py_err = None
        except ValueError as exc:
            py, py_err = None, exc
        try:
            nat = block_decode(method, blob2, len(data))
            nat_err = None
        except ValueError as exc:
            nat, nat_err = None, exc
        assert (py is None) == (nat is None), (py_err, nat_err)
        if py is not None:
            assert py == nat
