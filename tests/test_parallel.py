"""Sharded pipeline vs single-device reference on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cutesv_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh(8)


def test_sharded_cluster_sizes_match_serial(mesh8):
    bias = 200
    pos, valid, *_ = pmesh.demo_inputs(8)
    fn = pmesh.sharded_cluster_sizes(mesh8, bias)
    cid, sizes, n_clusters = jax.device_get(fn(pos, valid))
    pos_np = np.asarray(pos)
    valid_np = np.asarray(valid)
    # serial reference
    exp_cid = np.full(len(pos_np), -1)
    cur = -1
    prev = None
    for i in range(len(pos_np)):
        if not valid_np[i]:
            continue
        if prev is None or pos_np[i] - prev > bias:
            cur += 1 if prev is not None else 1
        if prev is None:
            cur = 0
        exp_cid[i] = cur
        prev = pos_np[i]
    assert list(cid) == list(exp_cid)
    exp_sizes = np.bincount(exp_cid[exp_cid >= 0])
    got = np.asarray(sizes)[:len(exp_sizes)]
    assert list(got) == list(exp_sizes)
    assert int(n_clusters) == len(exp_sizes)


def test_sharded_cluster_sizes_per_shard_padding(mesh8):
    """Gaps are measured to the last VALID position: per-shard tail pads
    (the natural equal-length shard layout) and empty shards must not
    perturb cluster boundaries — a cluster continuing across a padded
    shard edge stays ONE cluster, and a pad row's position never opens
    one."""
    n, rows, bias = 8, 16, 200
    pos = np.zeros(n * rows, np.int32)
    valid = np.zeros(n * rows, bool)
    # one dense run (gap 10) laid out with only the first 12 rows of each
    # shard valid; shard 3 entirely empty; pad positions left at 0 (which
    # would look like huge backwards gaps if compared against raw rows)
    p = 1000
    serial = []
    for k in range(n):
        if k == 3:
            continue
        for r in range(12):
            i = k * rows + r
            pos[i] = p
            valid[i] = True
            serial.append(p)
            p += 10
    fn = pmesh.sharded_cluster_sizes(mesh8, bias)
    cid, sizes, n_clusters = jax.device_get(fn(jnp.asarray(pos),
                                               jnp.asarray(valid)))
    assert int(n_clusters) == 1
    assert set(np.asarray(cid)[valid].tolist()) == {0}
    assert int(sizes[0]) == len(serial)
    # and a real gap across an empty shard still breaks clusters
    pos2 = pos.copy()
    pos2[4 * rows:] += 10_000
    cid2, sizes2, n2 = jax.device_get(fn(jnp.asarray(pos2),
                                         jnp.asarray(valid)))
    assert int(n2) == 2
    assert int(sizes2[0]) + int(sizes2[1]) == len(serial)


def test_sharded_cluster_sizes_boundary_spanning(mesh8):
    """A single dense run of positions spanning every shard must form ONE
    cluster with the full global size."""
    n, rows = 8, 32
    pos = np.arange(n * rows, dtype=np.int32) * 10  # gaps of 10 << bias
    valid = np.ones(n * rows, bool)
    fn = pmesh.sharded_cluster_sizes(mesh8, 200)
    cid, sizes, n_clusters = jax.device_get(fn(pos, valid))
    assert set(cid.tolist()) == {0}
    assert int(sizes[0]) == n * rows
    assert int(n_clusters) == 1


def test_sharded_cover_counts(mesh8):
    pos, valid, sv_s, sv_e, starts, ends = pmesh.demo_inputs(8)
    fn = pmesh.sharded_cover_counts(mesh8)
    got = np.asarray(jax.device_get(fn(sv_s, sv_e, starts, ends)))
    s_np, e_np = np.asarray(sv_s), np.asarray(sv_e)
    st, en = np.asarray(starts), np.asarray(ends)
    exp = [(int(np.sum((st <= s) & (en >= e)))) for s, e in zip(s_np, e_np)]
    assert got.tolist() == exp


def test_sharded_cover_in_pipeline(tmp_path, mesh8):
    """--n_shards 8 routes genotype cover counts through the mesh and the
    VCF stays byte-identical; --profile writes a trace."""
    import random

    from cutesv_tpu.config import Config
    from cutesv_tpu.pipeline import run_pipeline
    from tests import simdata

    rng = random.Random(6)
    ref = simdata.make_reference(rng, {"c": 30_000})
    chrom = ref["c"]
    plans = [simdata.read_with_del(chrom, 0, start, 15_000, 80,
                                   3000 - (15_080 - start), "s%d" % i)
             for i, start in enumerate(range(12_200, 14_700, 250))]
    bam, fa = tmp_path / "s.bam", tmp_path / "s.fa"
    simdata.write_bam(str(bam), [("c", 30_000)], plans)
    simdata.write_ref_fasta(str(fa), ref)
    bodies = {}
    for shards in (1, 8):
        out = tmp_path / ("o%d.vcf" % shards)
        wd = tmp_path / ("wd%d" % shards)
        wd.mkdir()
        cfg = Config(input=str(bam), reference=str(fa), output=str(out),
                     work_dir=str(wd), genotype=True, min_support=3,
                     n_shards=shards, profile=(shards == 8))
        run_pipeline(cfg, [])
        bodies[shards] = [l for l in out.read_text().splitlines()
                          if not l.startswith("#")]
    assert bodies[1] == bodies[8] and len(bodies[1]) == 1
    assert (tmp_path / "wd8" / "jax_trace").exists()


@pytest.mark.parametrize("seed", range(3))
def test_sharded_cluster_resolution_parity(mesh8, seed):
    """8-way sharded DEL resolution (gap-aligned cuts, per-shard kernels)
    equals the host oracle byte for byte."""
    import random

    from tests.test_device_parity import _random_del_stream
    from cutesv_tpu.models import device as dev
    from cutesv_tpu.models import host as host

    rng = random.Random(700 + seed)
    streams = [(c, _random_del_stream(rng, n_sites=14))
               for c in ["chr1", "chr2", "chr3"]]
    per = {c: host.resolve_del(s, c, 3, 0.5, 200, 3, 1.0, True)
           for c, s in streams}
    multi = dev.resolve_indel_device_multi(streams, False, 3, 0.5, 200, 3,
                                           1.0, True, n_shards=8)
    for c in per:
        assert multi[c][0] == per[c][0], c
        assert multi[c][1] == per[c][1], c


@pytest.mark.parametrize("seed", range(3))
def test_sharded_pair_cluster_parity(mesh8, seed):
    """8-way sharded DUP/INV resolution (k1-gap-aligned cuts, per-shard
    pair-cluster kernels) equals the host oracle byte for byte."""
    import random

    from tests.test_device_parity import (_random_dup_stream,
                                          _random_inv_stream)
    from cutesv_tpu.models import device as dev
    from cutesv_tpu.models import host as host

    rng = random.Random(900 + seed)
    dup = _random_dup_stream(rng, n_sites=40)
    inv = _random_inv_stream(rng, n_sites=40)
    for action in (False, True):
        a, ja = host.resolve_dup(dup, "chr1", 3, 150, 30, 100000, action)
        b, jb = dev.resolve_dup_device(dup, "chr1", 3, 150, 30, 100000,
                                       action, n_shards=8)
        assert a == b and ja == jb
        a, ja = host.resolve_inv(inv, "chr1", 3, 150, 30, 100000, action)
        b, jb = dev.resolve_inv_device(inv, "chr1", 3, 150, 30, 100000,
                                       action, n_shards=8)
        assert a == b and ja == jb


def test_chrom_bucket_partition():
    """Every chromosome lands in exactly one host bucket, deterministic
    across processes."""
    from cutesv_tpu.parallel.distributed import chrom_bucket

    chroms = ["chr%d" % i for i in range(1, 23)] + ["chrX", "chrY", "chrM"]
    for n in (1, 2, 4, 8):
        owners = {c: chrom_bucket(c, n) for c in chroms}
        assert all(0 <= b < n for b in owners.values())
        assert owners == {c: chrom_bucket(c, n) for c in chroms}
    assert all(b == 0 for b in
               (chrom_bucket(c, 1) for c in chroms))


def test_lpt_assignment_balances_skewed_contigs():
    """Greedy LPT over census+sig rows: human-like contig-size skew must
    land per-host loads within ~1.5x of each other (round-2 verdict weak
    #3 done-criterion), deterministically."""
    import numpy as np

    from cutesv_tpu import sigstore
    from cutesv_tpu.parallel.distributed import assign_chroms_lpt

    # human-like skew: chr1 ~5x chr21
    sizes = {"chr%d" % i: 250_000 - 10_000 * i for i in range(1, 23)}
    store = sigstore.SigStore(chrom_lengths={c: 1 for c in sizes})
    for c, n in sizes.items():
        store.census[c] = {"start": np.zeros(n, np.int64)}
    for n_hosts in (2, 4, 8):
        assign = assign_chroms_lpt(store, n_hosts)
        assert set(assign) == set(sizes)
        assert all(0 <= b < n_hosts for b in assign.values())
        loads = [0] * n_hosts
        for c, b in assign.items():
            loads[b] += sizes[c]
        assert max(loads) <= 1.5 * min(loads), (n_hosts, loads)
        # deterministic: identical plan on a "different host"
        assert assign == assign_chroms_lpt(store, n_hosts)


def test_filter_store_and_gather_roundtrip():
    """_filter_store_chroms keeps only the bucket's chromosomes (census
    and read tables stay whole); _gather_results on a single process
    returns the input merged dict unchanged."""
    from cutesv_tpu import pipeline, sigstore

    store = sigstore.SigStore(
        sigs={"DEL": {"chr1": [1], "chr2": [2]},
              "INS": {"chr1": [3]}},
        census={"chr1": {}, "chr2": {}},
        read_tables={"chr1": None, "chr2": None},
        chrom_lengths={"chr1": 10, "chr2": 20})
    sub = pipeline._filter_store_chroms(store, lambda c: c == "chr2")
    assert sub.sigs == {"DEL": {"chr2": [2]}, "INS": {}}
    assert set(sub.census) == {"chr1", "chr2"}
    assert set(sub.read_tables) == {"chr1", "chr2"}

    results = {"chr1": [["a"], ["b"]], "chr2": [["c"]]}
    merged = pipeline._gather_results(dict(results))
    assert merged == results


def _distributed_fixture(tmp_path):
    from tests import simdata
    import random
    rng = random.Random(5)
    seqs = simdata.make_reference(rng, {"chr1": 40_000, "chr2": 30_000})
    plans = [simdata.plain_read(seqs["chr1"], 0, s, 3000, "p%03d" % i)
             for i, s in enumerate(range(0, 36_000, 400))]
    plans += [simdata.plain_read(seqs["chr2"], 1, s, 3000, "q%03d" % i)
              for i, s in enumerate(range(0, 26_000, 400))]
    for i, s in enumerate(range(17_000, 19_300, 230)):
        plans.append(simdata.read_with_del(seqs["chr1"], 0, s, 20_000, 120,
                                           2000, "d%02d" % i))
    for i, s in enumerate(range(12_000, 14_300, 230)):
        plans.append(simdata.read_with_del(seqs["chr2"], 1, s, 15_000, 150,
                                           2000, "e%02d" % i))
    simdata.write_bam(str(tmp_path / "in.bam"),
                      [("chr1", 40_000), ("chr2", 30_000)], plans)
    simdata.write_ref_fasta(str(tmp_path / "ref.fa"), seqs)
    return [str(tmp_path / "in.bam"), str(tmp_path / "ref.fa")]


def _vcf_body(p):
    return [l for l in open(p) if not l.startswith("##")]


def test_distributed_single_process_cli(tmp_path):
    """--distributed --num_processes 1 degenerates cleanly: initialize()
    skipped, output identical to the plain run."""
    from cutesv_tpu.cli import main

    base = _distributed_fixture(tmp_path)
    assert main(base + [str(tmp_path / "a.vcf"), str(tmp_path / "wa"),
                        "--engine", "host"]) == 0
    assert main(base + [str(tmp_path / "b.vcf"), str(tmp_path / "wb"),
                        "--engine", "host", "--distributed",
                        "--num_processes", "1"]) == 0
    assert _vcf_body(tmp_path / "a.vcf") == _vcf_body(tmp_path / "b.vcf")


def test_distributed_process_count_mismatch(monkeypatch):
    """initialize() connecting while the backend reports fewer processes
    than requested must fail loudly — otherwise every process silently
    runs the whole file standalone (round 4: seen for real when the
    single-chip TPU tunnel platform was selected under --distributed)."""
    import jax
    import pytest

    from cutesv_tpu.parallel import distributed

    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: None)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    with pytest.raises(RuntimeError, match="reports 1 process"):
        distributed.init_distributed("localhost:1", 2, 0)


def test_distributed_two_process_cli(tmp_path):
    """A real 2-process jax.distributed run (CPU backend): each process
    resolves its chromosome bucket, host 0 gathers and writes the VCF —
    byte-identical to the single-process run."""
    import os
    import subprocess
    import sys

    from cutesv_tpu.cli import main

    base = _distributed_fixture(tmp_path)
    assert main(base + [str(tmp_path / "ref.vcf"), str(tmp_path / "wr"),
                        "--engine", "host"]) == 0
    port = 20000 + (os.getpid() % 10000)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    procs = []
    for i in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "cutesv_tpu.cli"] + base
            + [str(tmp_path / ("mp%d.vcf" % i)), str(tmp_path / ("wm%d" % i)),
               "--engine", "host", "--distributed",
               "--coordinator", "localhost:%d" % port,
               "--num_processes", "2", "--process_id", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=240)[0] for p in procs]
    assert procs[0].returncode == 0, outs[0].decode()[-2000:]
    assert procs[1].returncode == 0, outs[1].decode()[-2000:]
    assert not (tmp_path / "mp1.vcf").exists()  # only host 0 emits
    assert _vcf_body(tmp_path / "mp0.vcf") == _vcf_body(
        tmp_path / "ref.vcf")
    # decode went down the sharded byte-range path on both processes
    assert all(b"sharded decode: shard" in o for o in outs), \
        outs[0].decode()[-1500:]


def test_distributed_cram_two_process_cli(tmp_path):
    """CRAM --distributed: a real 2-process jax.distributed run where
    each process decodes a disjoint container-aligned byte range
    (round-3; BAM counterpart above). Byte-identical to the
    single-process CRAM run; both processes must log the sharded
    decode."""
    import os
    import subprocess
    import sys

    from cutesv_tpu.cli import main
    from tests.test_sharded_decode import _bam_to_cram

    base = _distributed_fixture(tmp_path)
    cram = tmp_path / "in.cram"
    _bam_to_cram(tmp_path / "in.bam", cram, max_slice=25)
    cbase = [str(cram), base[1]]
    assert main(cbase + [str(tmp_path / "refc.vcf"),
                         str(tmp_path / "wrc"), "--engine", "host"]) == 0
    port = 21000 + (os.getpid() % 10000)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    procs = []
    for i in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "cutesv_tpu.cli"] + cbase
            + [str(tmp_path / ("mc%d.vcf" % i)),
               str(tmp_path / ("wc%d" % i)),
               "--engine", "host", "--distributed",
               "--coordinator", "localhost:%d" % port,
               "--num_processes", "2", "--process_id", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=240)[0] for p in procs]
    assert procs[0].returncode == 0, outs[0].decode()[-2000:]
    assert procs[1].returncode == 0, outs[1].decode()[-2000:]
    assert not (tmp_path / "mc1.vcf").exists()  # only host 0 emits
    assert _vcf_body(tmp_path / "mc0.vcf") == _vcf_body(
        tmp_path / "refc.vcf")
    assert all(b"sharded decode: shard" in o for o in outs), \
        outs[0].decode()[-1500:]


def test_distributed_device_sharded_two_process_cli(tmp_path):
    """Distributed x device-engine x sharded kernels combined: a real
    2-process jax.distributed run where each process resolves its
    chromosome bucket through the JAX cluster/genotype kernels over a
    LOCAL 4-device genome mesh (pick_devices restricts to
    jax.local_devices() under multi-process — a global mesh would hang:
    the hosts resolve different chromosomes, so shard_map collectives
    would never line up). Byte-identical to the single-process sharded
    device run."""
    import os
    import subprocess
    import sys

    base = _distributed_fixture(tmp_path)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    extra = ["--genotype", "-s", "3", "--engine", "device",
             "--n_shards", "4"]
    serial = subprocess.run(
        [sys.executable, "-m", "cutesv_tpu.cli"] + base
        + [str(tmp_path / "ref.vcf"), str(tmp_path / "ws")] + extra,
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=240)
    assert serial.returncode == 0, serial.stdout.decode()[-2000:]
    port = 21000 + (os.getpid() % 10000)
    procs = []
    for i in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "cutesv_tpu.cli"] + base
            + [str(tmp_path / ("mp%d.vcf" % i)),
               str(tmp_path / ("wm%d" % i))] + extra
            + ["--distributed", "--coordinator", "localhost:%d" % port,
               "--num_processes", "2", "--process_id", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=240)[0] for p in procs]
    assert procs[0].returncode == 0, outs[0].decode()[-2000:]
    assert procs[1].returncode == 0, outs[1].decode()[-2000:]
    assert not (tmp_path / "mp1.vcf").exists()  # only host 0 emits
    assert _vcf_body(tmp_path / "mp0.vcf") == _vcf_body(
        tmp_path / "ref.vcf")


def test_shard_tail_gate_unit():
    """The sharded streaming decode's mid-decode-tail gate: the
    range-start chromosome is excluded (its local census may be missing
    a prefix another shard owns) unless the range starts at the file
    head (shard 0)."""
    from cutesv_tpu.pipeline import _shard_tail_gate

    class FakeSd:
        def __init__(self, first, last):
            self._r = (first, last)

        def range_refids(self):
            return self._r

    gate = _shard_tail_gate(FakeSd(1, 3), range_start=4096)
    assert not gate(1)          # first-partial chromosome: never tail
    assert gate(2) and gate(3)  # interior chromosomes: eligible
    gate0 = _shard_tail_gate(FakeSd(0, 3), range_start=0)
    assert gate0(0)             # shard 0 owns the file start


def test_range_refids_reports_boundary_chromosomes(tmp_path):
    """StreamingDecode.range_refids names the first/last chromosome a
    ranged decode actually merged — the possibly-partial boundary
    chromosomes of a shard."""
    import numpy as np

    from cutesv_tpu.config import Config
    from cutesv_tpu.io import native as native_io
    from cutesv_tpu.parallel.distributed import plan_shard_ranges

    base = _distributed_fixture(tmp_path)
    cfg = Config(input=base[0], min_support=3)
    ranges = plan_shard_ranges(base[0], 2)
    # second shard starts mid-file: its first merged refid must match
    # the refid of its first owned record
    sd = native_io.StreamingDecode(base[0], cfg,
                                   byte_range=ranges[1][:2])
    try:
        nd = sd.join()
        first, last = sd.range_refids()
    finally:
        sd.free()
    chrs = np.asarray(nd.arrays["all_chr"])
    assert len(chrs) > 0
    assert first == int(chrs[0])
    assert last == int(chrs[-1])
    # and the whole-file decode spans all chromosomes
    sd = native_io.StreamingDecode(base[0], cfg)
    try:
        sd.join()
        first0, last0 = sd.range_refids()
    finally:
        sd.free()
    assert (first0, last0) == (0, 1)


def _tails_fixture(tmp_path):
    """A corpus big enough that chromosomes complete MID-decode on each
    shard (ranges span several 128-block inflate chunks), so the forced
    streaming tails really run inside the 2-process ranged decode."""
    import random

    from tests import simdata

    rng = random.Random(9)
    n_chrom = 4
    clen = 600_000
    names = ["chr%d" % (i + 1) for i in range(n_chrom)]
    seqs = simdata.make_reference(rng, {c: clen for c in names})
    plans = []
    for cid, c in enumerate(names):
        ref = seqs[c]
        for i, s in enumerate(range(0, clen - 8_000, 500)):
            if 98_000 <= s <= 99_500:
                # DEL @100k len 150 carriers (support >= 3)
                plans.append(simdata.read_with_del(
                    ref, cid, s, 100_000, 150, 8_000 - (100_150 - s),
                    "%s_d%03d" % (c, i)))
            else:
                plans.append(simdata.plain_read(ref, cid, s, 8_000,
                                                "%s_r%04d" % (c, i)))
    simdata.write_bam(str(tmp_path / "big.bam"),
                      [(c, clen) for c in names], plans)
    simdata.write_ref_fasta(str(tmp_path / "big.fa"), seqs)
    return [str(tmp_path / "big.bam"), str(tmp_path / "big.fa")]


def test_distributed_streaming_tails_two_process_cli(tmp_path):
    """--distributed BAM decode WITH the mid-decode overlap (round-4):
    a real 2-process run with CUTESV_STREAM_TAIL=force must run full
    tails inside the ranged decode on at least one shard and stay
    byte-identical to the single-process run."""
    import os
    import re
    import subprocess
    import sys

    from cutesv_tpu.cli import main

    base = _tails_fixture(tmp_path)
    assert main(base + [str(tmp_path / "ref.vcf"), str(tmp_path / "wr"),
                        "--engine", "device"]) == 0

    def run_pair(attempt, delay_ms):
        port = 22000 + ((os.getpid() + attempt) % 10000)
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   CUTESV_STREAM_TAIL="force",
                   # pace the decode so per-chromosome completion is
                   # observable mid-run (the corpus would otherwise
                   # decode faster than the 20 ms poll interval)
                   CUTESV_DECODE_CHUNK_DELAY_MS=str(delay_ms),
                   PYTHONPATH=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))
        procs = []
        for i in range(2):
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "cutesv_tpu.cli"] + base
                + [str(tmp_path / ("st%d_%d.vcf" % (attempt, i))),
                   str(tmp_path / ("ws%d_%d" % (attempt, i))),
                   "--engine", "device", "--distributed",
                   "--coordinator", "localhost:%d" % port,
                   "--num_processes", "2", "--process_id", str(i)],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT))
        outs = [p.communicate(timeout=420)[0] for p in procs]
        assert procs[0].returncode == 0, outs[0].decode()[-2000:]
        assert procs[1].returncode == 0, outs[1].decode()[-2000:]
        assert _vcf_body(tmp_path / ("st%d_0.vcf" % attempt)) \
            == _vcf_body(tmp_path / "ref.vcf")
        # both processes took the streaming sharded path
        assert all(b"(streaming)" in o for o in outs), \
            outs[0].decode()[-1500:]
        tails = 0
        for o in outs:
            for m in re.finditer(rb"(\d+) full tails\s*validated", o):
                tails += int(m.group(1))
        return tails, outs

    # at least one shard must run validated full tails mid-decode; a
    # heavily loaded host can starve the 20 ms poll past every chunk, so
    # retry once with a slower pace before calling it a failure
    tails, outs = run_pair(0, 80)
    if tails == 0:
        tails, outs = run_pair(1, 250)
    assert tails >= 1, outs[0].decode()[-1500:]


def test_assign_chroms_by_decode_range():
    """Range-affine assignment (round 5): a chromosome resolves on the
    part that produced most of its census rows (argmax, ties to the
    lowest part), row-less chromosomes fall back to the LPT plan, and
    the plan is deterministic across 'hosts'."""
    import numpy as np

    from cutesv_tpu import sigstore
    from cutesv_tpu.parallel.distributed import (
        assign_chroms_by_decode_range, assign_chroms_lpt)

    store = sigstore.SigStore(chrom_lengths={})
    for c, n in (("chr1", 100), ("chr2", 80), ("chr3", 60), ("chr4", 5)):
        store.census[c] = {"start": np.zeros(n, np.int64)}
    store.sigs = {"DEL": {"chrX": [1, 2, 3]}}  # sig-only chromosome
    part_counts = [
        {"chr1": 100, "chr2": 10},           # part 0
        {"chr2": 70, "chr3": 60, "chr4": 5},  # part 1
    ]
    assign = assign_chroms_by_decode_range(part_counts, store, 2)
    assert assign["chr1"] == 0
    assert assign["chr2"] == 1      # majority of its rows in part 1
    assert assign["chr3"] == 1
    assert assign["chr4"] == 1
    # chrX has no census rows anywhere -> LPT fallback decides it
    assert assign["chrX"] == assign_chroms_lpt(store, 2)["chrX"]
    # deterministic across hosts
    assert assign == assign_chroms_by_decode_range(part_counts, store, 2)
    # tie breaks to the lowest part index
    tie = assign_chroms_by_decode_range(
        [{"c": 5}, {"c": 5}], sigstore.SigStore(chrom_lengths={}), 2)
    assert tie["c"] == 0
