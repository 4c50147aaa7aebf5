"""Ad-hoc native-decoder golden-fuzz campaign (not part of CI; run
explicitly: ``pytest tests/campaign_native_fuzz.py``). Fresh-seed
native-vs-oracle extraction equality over the full fuzz generator
(noisy CIGARs incl. N/P/=/X ops, dense multi-segment SA tags, reverse
strands, hardclips, duplicate/QC-fail flags, mapq 255, name
collisions). Seed window via CUTESV_FUZZ_BASE / CUTESV_FUZZ_N."""
import os
import random

import pytest

import cutesv_tpu.extract as extract
from cutesv_tpu.config import Config
from cutesv_tpu.io import native as native_io
from cutesv_tpu.io.bam import BamReader

from test_native_decoder import _make_random_bam, _native_tuples

BASE = int(os.environ.get("CUTESV_FUZZ_BASE", "9000"))
N = int(os.environ.get("CUTESV_FUZZ_N", "40"))


@pytest.mark.parametrize("seed", range(BASE, BASE + N))
def test_native_fuzz_campaign(tmp_path, seed):
    rng = random.Random(seed)
    bam = str(tmp_path / "f.bam")
    _make_random_bam(bam, rng, n_reads=300)
    cfg = Config(input=bam, min_support=3)
    ours = extract.new_candidate_dict()
    reader = BamReader(bam)
    chrom_names = [x for x, _ in reader.references]
    for rec in reader:
        if rec.ref_id < 0 or rec.flag & 4 or rec.flag in (256, 272):
            continue
        extract.extract_read(rec, ours, chrom_names[rec.ref_id],
                             cfg.min_size, cfg.min_mapq,
                             cfg.max_split_parts, cfg.min_read_len,
                             cfg.min_siglength, cfg.merge_del_threshold,
                             cfg.merge_ins_threshold, cfg.max_size)
    reader.close()
    nat = _native_tuples(native_io.decode(bam, cfg, None))
    for t in ("DEL", "INS", "DUP", "INV", "TRA"):
        assert nat[t] == ours[t], t
