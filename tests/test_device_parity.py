"""Device engine vs host oracle parity (the generalized `duipai` pattern,
cuteSV_genotype.py:192-240): randomized signature streams through both
engines must produce byte-identical candidate rows."""
import random

import numpy as np
import pytest

from cutesv_tpu.genotype import cover_counts
from cutesv_tpu.models import device as dev
from cutesv_tpu.models import host as host
from cutesv_tpu.ops.sweep import cover_counts_device


def _random_del_stream(rng, n_sites=30, max_reads=20):
    """Simulated merged DEL stream: sorted by (pos, len, name)."""
    rows = []
    pos = 0
    for _ in range(n_sites):
        pos += rng.randrange(50, 3000)
        n = rng.randrange(1, max_reads)
        base_len = rng.randrange(30, 500)
        for k in range(n):
            name = "r%05d" % rng.randrange(2000)
            p = pos + rng.randrange(-40, 40)
            ln = max(10, base_len + rng.randrange(-60, 60))
            rows.append((p, ln, name))
            if rng.random() < 0.2:  # same-read second signature
                rows.append((p + rng.randrange(0, 80),
                             max(10, ln + rng.randrange(-30, 30)), name))
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    # exact-duplicate removal (sigstore contract)
    out = []
    for r in rows:
        if not out or out[-1] != r:
            out.append(r)
    return out


def _random_ins_stream(rng, **kw):
    rows = _random_del_stream(rng, **kw)
    out = []
    for p, ln, name in rows:
        seq = "ACGT"[rng.randrange(4)] * (ln if rng.random() < 0.8
                                          else max(1, ln - rng.randrange(1, ln)))
        out.append((p, ln, name, seq))
    out.sort(key=lambda r: (r[0], r[1], r[2], r[3]))
    dedup = []
    for r in out:
        if not dedup or dedup[-1] != r:
            dedup.append(r)
    return dedup


@pytest.mark.parametrize("seed", range(6))
def test_del_parity(seed):
    rng = random.Random(seed)
    sigs = _random_del_stream(rng)
    for action in (False, True):
        a, ja = host.resolve_del(sigs, "chr1", 4, 0.5, 200, 4, 1.0, action)
        b, jb = dev.resolve_del_device(sigs, "chr1", 4, 0.5, 200, 4, 1.0,
                                       action)
        assert a == b
        assert [j["window"] for j in ja] == [j["window"] for j in jb]
        assert [j["support"] for j in ja] == [j["support"] for j in jb]


@pytest.mark.parametrize("seed", range(6))
def test_ins_parity(seed):
    rng = random.Random(100 + seed)
    sigs = _random_ins_stream(rng)
    for action in (False, True):
        a, ja = host.resolve_ins(sigs, "chr1", 4, 0.3, 100, 4, 1.0, action)
        b, jb = dev.resolve_ins_device(sigs, "chr1", 4, 0.3, 100, 4, 1.0,
                                       action)
        assert a == b
        assert [j["window"] for j in ja] == [j["window"] for j in jb]


@pytest.mark.parametrize("seed", range(4))
def test_del_parity_remain_ratio(seed):
    rng = random.Random(200 + seed)
    sigs = _random_del_stream(rng)
    a, _ = host.resolve_del(sigs, "chr1", 3, 0.5, 200, 3, 0.6, True)
    b, _ = dev.resolve_del_device(sigs, "chr1", 3, 0.5, 200, 3, 0.6, True)
    assert a == b


def test_cover_counts_device_parity():
    rng = random.Random(9)
    starts = np.array([rng.randrange(0, 100_000) for _ in range(5000)])
    ends = starts + np.array([rng.randrange(1, 20_000) for _ in range(5000)])
    svs = []
    for _ in range(400):
        s = rng.randrange(0, 110_000)
        svs.append((max(s - 500, 0), s + 500))
    for _ in range(100):  # half-integral windows (DUP/INV bias/2)
        s = rng.randrange(0, 110_000)
        svs.append((max(s - 250.5, 0), s + 250.5))
    a = cover_counts(svs, starts, ends)
    b = cover_counts_device(svs, starts, ends)
    assert list(a) == list(b)


def test_cover_counts_pallas_parity():
    from cutesv_tpu.ops.pallas_sweep import cover_counts_pallas
    rng = random.Random(17)
    starts = np.array([rng.randrange(0, 100_000) for _ in range(3000)])
    ends = starts + np.array([rng.randrange(1, 20_000) for _ in range(3000)])
    svs = []
    for _ in range(1500):
        s = rng.randrange(0, 110_000)
        svs.append((max(s - 500, 0), s + 500))
    for _ in range(100):
        s = rng.randrange(0, 110_000)
        svs.append((max(s - 250.5, 0), s + 250.5))
    a = cover_counts(svs, starts, ends)
    b = cover_counts_pallas(svs, starts, ends, interpret=True)
    assert list(a) == list(b)


def _random_dup_stream(rng, n_sites=20):
    rows = []
    pos = 0
    for _ in range(n_sites):
        pos += rng.randrange(600, 5000)
        p2 = pos + rng.randrange(50, 2000)
        for _ in range(rng.randrange(1, 12)):
            rows.append((pos + rng.randrange(-100, 100),
                         p2 + rng.randrange(-300, 300),
                         "r%04d" % rng.randrange(500)))
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    out = []
    for r in rows:
        if not out or out[-1] != r:
            out.append(r)
    return out


def _random_inv_stream(rng, n_sites=20):
    rows = []
    pos = 0
    for _ in range(n_sites):
        pos += rng.randrange(600, 5000)
        b2 = pos + rng.randrange(100, 3000)
        st = rng.choice(["++", "--"])
        for _ in range(rng.randrange(1, 12)):
            rows.append((st, pos + rng.randrange(-100, 100),
                         b2 + rng.randrange(-200, 200),
                         "r%04d" % rng.randrange(500)))
    rows.sort(key=lambda r: (r[0], r[1], r[2], r[3]))
    # note: reference sorts INV by (chr, strand, bp1, ...) — strand first
    out = []
    for r in rows:
        if not out or out[-1] != r:
            out.append(r)
    return out


@pytest.mark.parametrize("seed", range(5))
def test_dup_parity(seed):
    rng = random.Random(300 + seed)
    sigs = _random_dup_stream(rng)
    for action in (False, True):
        a, ja = host.resolve_dup(sigs, "chr1", 3, 150, 30, 100000,
                                 action)
        b, jb = dev.resolve_dup_device(sigs, "chr1", 3, 150, 30, 100000,
                                       action)
        assert a == b
        assert ja == jb


@pytest.mark.parametrize("seed", range(5))
def test_inv_parity(seed):
    rng = random.Random(400 + seed)
    sigs = _random_inv_stream(rng)
    for action in (False, True):
        a, ja = host.resolve_inv(sigs, "chr1", 3, 150, 30, 100000,
                                 action)
        b, jb = dev.resolve_inv_device(sigs, "chr1", 3, 150, 30, 100000,
                                       action)
        assert a == b
        assert ja == jb


@pytest.mark.parametrize("seed", range(4))
def test_multi_chrom_batched_resolution(seed):
    """One batched kernel dispatch over many chromosomes must equal the
    per-chromosome resolvers exactly."""
    rng = random.Random(500 + seed)
    streams = []
    for c in ["chr1", "chr2", "chr3", "chrX"]:
        streams.append((c, _random_del_stream(rng, n_sites=10)))
    per = {c: host.resolve_del(s, c, 3, 0.5, 200, 3, 1.0, True)
           for c, s in streams}
    multi = dev.resolve_indel_device_multi(streams, False, 3, 0.5, 200, 3,
                                           1.0, True)
    assert set(multi) == set(per)
    for c in per:
        assert multi[c][0] == per[c][0]
        assert multi[c][1] == per[c][1]


def test_multi_chrom_batched_ins(seed=0):
    rng = random.Random(600)
    streams = [(c, _random_ins_stream(rng, n_sites=8))
               for c in ["a", "b", "c"]]
    per = {c: host.resolve_ins(s, c, 3, 0.3, 100, 3, 1.0, True)
           for c, s in streams}
    multi = dev.resolve_indel_device_multi(streams, True, 3, 0.3, 100, 3,
                                           1.0, True)
    for c in per:
        assert multi[c][0] == per[c][0]
        assert multi[c][1] == per[c][1]


def test_indel_stream_select_and_sentinel_filter():
    """drop_sentinel_rows over BOTH IndelStream storage modes: the
    columnar (native) mode goes through IndelStream.select, the
    tuple-backed mode through row filtering; no-op streams are returned
    unchanged (same object)."""
    import numpy as np

    from cutesv_tpu.models.device import IndelStream
    from cutesv_tpu.sigstore import drop_sentinel_rows

    # columnar mode with a sentinel-shaped row
    names = ["ra", "rb", "rc"]
    s = IndelStream.from_arrays([0, 50, 90], [0, 40, 41], [0, 1, 2], names)
    out = drop_sentinel_rows("DEL", s)
    assert list(out.pos) == [50, 90] and list(out.rid) == [1, 2]
    assert out.names_of(np.array([0, 1])) == ["rb", "rc"]
    # clean stream: same object back
    clean = IndelStream.from_arrays([50, 90], [40, 41], [0, 1], names)
    assert drop_sentinel_rows("DEL", clean) is clean
    # tuple mode (INS with sequences)
    rows = [(0, 0, "ra", ""), (70, 33, "rb", "A" * 33)]
    t = IndelStream.from_tuples(rows, is_ins=True)
    out2 = drop_sentinel_rows("INS", t)
    assert list(out2.pos) == [70] and out2.seq_of(0) == "A" * 33
    assert out2.tuples() == [rows[1]]
