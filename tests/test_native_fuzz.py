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
