"""Ad-hoc corrupt-block agreement campaign (not part of CI; run
explicitly: ``pytest tests/campaign_block_codecs.py``). Mutates valid
CRAM 3.1 codec streams (byte flips, inserts, deletes) and requires the
python and native decoders to AGREE on every blob — both raise, or both
return identical bytes. This is what caught the asymmetric-strictness
divergences (silent short slices, uncaught bz2 OSError, unchecked DUP
distance) during development. Seed window: CUTESV_BLKFUZZ_BASE / _N."""
import os
import random

import pytest

from cutesv_tpu.io.cram_codecs31 import (AR_EXT, AR_ORDER1, AR_PACK,
                                         AR_RLE, AR_STRIPE, NX_N32,
                                         NX_ORDER1, NX_PACK, NX_RLE,
                                         NX_STRIPE, arith_decode,
                                         arith_encode, fqz_decode,
                                         fqz_encode, name_tok_decode,
                                         name_tok_encode,
                                         rans_nx16_decode,
                                         rans_nx16_encode)
from cutesv_tpu.io.native import block_decode

BASE = int(os.environ.get("CUTESV_BLKFUZZ_BASE", "0"))
N = int(os.environ.get("CUTESV_BLKFUZZ_N", "30"))


def _mutate(rng, enc):
    blob = bytearray(enc)
    for _ in range(rng.randrange(1, 5)):
        op = rng.randrange(3)
        if op == 0 and len(blob) > 2:
            del blob[rng.randrange(len(blob))]
        elif op == 1:
            blob.insert(rng.randrange(len(blob) + 1), rng.randrange(256))
        else:
            blob[rng.randrange(len(blob))] = rng.randrange(256)
    return bytes(blob)


@pytest.mark.parametrize("seed", range(BASE, BASE + N))
def test_mutated_blocks_agree_across_stacks(seed):
    rng = random.Random(60000 + seed)
    for _ in range(4):
        n = rng.randrange(1, 800)
        data = bytes(rng.randrange(rng.randrange(1, 200))
                     for _ in range(n))
        m = rng.choice([5, 5, 6, 6, 7, 8])
        if m == 5:
            fl = rng.choice([0, NX_ORDER1, NX_N32, NX_RLE, NX_PACK,
                             NX_STRIPE, NX_ORDER1 | NX_RLE | NX_PACK])
            enc = rans_nx16_encode(data, fl)
            pydec = lambda b: rans_nx16_decode(b, n)  # noqa: E731
        elif m == 6:
            fl = rng.choice([0, AR_ORDER1, AR_RLE, AR_PACK, AR_STRIPE,
                             AR_EXT])
            enc = arith_encode(data, fl)
            pydec = lambda b: arith_decode(b, n)  # noqa: E731
        elif m == 7:
            if rng.random() < 0.5:
                # full-profile arm: multi-param/selector, reverse,
                # fixed-length, dedup and dtab bits all fuzzed
                rl = rng.randrange(1, 80)
                n_recs = max(1, n // rl)
                n = n_recs * rl
                data = data[:n].ljust(n, b"#")
                lens = [rl] * n_recs
                kw = {}
                if rng.random() < 0.7:
                    kw["selectors"] = [rng.randrange(0, 4)
                                       for _ in range(n_recs)]
                    kw["n_params"] = rng.randrange(1, 4)
                if rng.random() < 0.5:
                    kw["reverse"] = [rng.random() < 0.5
                                     for _ in range(n_recs)]
                kw["fixed_len"] = rng.random() < 0.5
                kw["dedup"] = rng.random() < 0.5
                kw["use_dtab"] = rng.random() < 0.5
                enc = fqz_encode(data, lens, **kw)
            else:
                lens, left = [], n
                while left:
                    l = min(rng.randrange(1, 100), left)
                    lens.append(l)
                    left -= l
                enc = fqz_encode(data, lens)
            pydec = lambda b: fqz_decode(b, n)  # noqa: E731,B023
        else:
            data = b"".join(b"rd%d\x00" % rng.randrange(10 ** 6)
                            for _ in range(rng.randrange(1, 40)))
            n = len(data)
            enc = name_tok_encode(data)
            pydec = lambda b: name_tok_decode(b)  # noqa: E731
        for _ in range(25):
            blob = _mutate(rng, enc)
            try:
                py = pydec(blob)
            except ValueError:
                py = None
            try:
                nat = block_decode(m, blob, n)
            except ValueError:
                nat = None
            assert py == nat, (m, blob.hex()[:80])
