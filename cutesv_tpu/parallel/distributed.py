"""Multi-host (pod-slice) bring-up for the genome mesh.

The reference is strictly single-node (SURVEY §2.5: a process pool over
genome intervals, filesystem IPC — cuteSV:1026-1076). The TPU-native
scale-out path instead runs one cutesv-tpu process per host of a pod
slice; ``jax.distributed`` wires the processes into a single JAX runtime
so ``jax.devices()`` spans every chip and the genome-axis ``Mesh``
(parallel/mesh.py) lays collectives over ICI/DCN automatically.

Usage (one command per host):

    cutesv-tpu in.bam ref.fa out.vcf wd/ --distributed \
        --coordinator host0:8476 --num_processes 4 --process_id $IDX \
        --n_shards 32

On Cloud TPU the three topology arguments may be omitted —
``jax.distributed.initialize()`` auto-detects them from the metadata
server. With ``--num_processes 1`` the call degenerates to the
single-host setup (used by tests/smoke runs).

Division of labor across hosts:

* decode is SHARDED over compressed byte ranges (``decode_sharded``):
  each host inflates only ~1/N of the BAM's BGZF blocks, finds its
  first record boundary by validated chaining, and the (small)
  signature/census partials are allgathered and merged so every host
  ends with the exact whole-file decode — the dominant stage's wall
  drops ~1/N. Cross-shard boundaries are asserted equal. Each host then
  keeps the signature streams of the chromosomes that hash into its
  bucket (`chrom_bucket`); the census/read tables stay complete on
  every host because TRA genotyping replays coverage on mate
  chromosomes (they are ~40 bytes/read — noise next to the raw input),
* device steps (cluster kernels, cover counts) run under ``shard_map``
  over the global mesh, so per-host shards combine exactly like the
  single-host --n_shards path,
* host 0 performs the serial VCF merge/emit (the reference's stage-4
  equivalent, cuteSV:1218-1247).
"""
from __future__ import annotations

import logging

log = logging.getLogger("cutesv_tpu.distributed")


def init_distributed(coordinator: str = None, num_processes: int = None,
                     process_id: int = None) -> bool:
    """Initialize jax.distributed; returns True when this call made the
    process part of a multi-process runtime (False for the degenerate
    single-process case, where initialization is skipped entirely —
    jax.distributed.initialize(num_processes=1) would still spin up a
    coordinator service)."""
    import jax

    if num_processes is not None and num_processes <= 1:
        log.info("distributed: single process; skipping initialize()")
        return False
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    log.info("distributed: process %d/%d, %d global / %d local devices",
             jax.process_index(), jax.process_count(),
             len(jax.devices()), len(jax.local_devices()))
    return True


def is_emitter() -> bool:
    """True on the process that writes the merged VCF (host 0)."""
    import jax
    return jax.process_index() == 0


def chrom_bucket(chrom: str, num_processes: int) -> int:
    """Deterministic chromosome -> host assignment for the decode split
    (stable across hosts: a cheap byte-sum hash, not PYTHONHASHSEED
    dependent)."""
    return sum(chrom.encode()) % max(1, num_processes)


# ---------------------------------------------------------------------------
# sharded decode: each host inflates only its block-aligned byte range
# (the reference's counterpart is the density-adaptive per-interval task
# list, cuteSV:1026-1076 — here the split is on compressed bytes, which
# is what actually costs)
# ---------------------------------------------------------------------------

def plan_shard_ranges(path: str, n: int):
    """Block-aligned decode ranges splitting the BAM's compressed bytes
    ~equally over ``n`` shards. Every process derives the identical plan
    from the file alone (no communication). Returns a list of
    (range_start, range_ulen, u_base) per shard:

    * range_start — compressed offset of the shard's first BGZF block
      (0 for shard 0, which also decodes the header),
    * range_ulen — uncompressed byte budget: records whose uncompressed
      start offset (relative to range_start) is below it belong to this
      shard; 0 (unbounded) for the last shard so truncated-file
      detection stays active; -1 (own nothing) for shards left empty
      when the file has fewer blocks than shards,
    * u_base — global uncompressed offset of range_start, turning the
      decoder's relative boundary reports into global coordinates for
      the cross-shard agreement check.
    """
    import numpy as np

    from cutesv_tpu.io.bgzf import scan_block_table

    offs, isizes = scan_block_table(path)
    n_blocks = len(offs)
    cum_u = np.concatenate([np.zeros(1, np.int64), np.cumsum(isizes)])
    total_c = int(offs[-1]) + 1 if n_blocks else 0  # only split points matter
    splits = [0]
    for k in range(1, n):
        idx = int(np.searchsorted(offs, k * (offs[-1] + 1) // n))
        splits.append(min(max(idx, splits[-1]), n_blocks))
    splits.append(n_blocks)
    del total_c
    import os as _os

    fsize = _os.path.getsize(path)
    ranges = []
    for k in range(n):
        b0, b1 = splits[k], splits[k + 1]
        start = int(offs[b0]) if b0 < n_blocks else fsize
        ulen = int(cum_u[b1] - cum_u[b0])
        if k == n - 1:
            ulen = 0  # unbounded: keep cut-file detection live
        elif ulen == 0:
            ulen = -1  # empty shard: own nothing (0 would mean unbounded)
        ranges.append((start, ulen, int(cum_u[b0])))
    return ranges


def check_shard_boundaries(ranges, reports):
    """``reports``: per shard (first_u, next_u) in range-local
    coordinates. Converts to global uncompressed offsets and asserts
    each shard stopped exactly where its successor started — the
    record-boundary discovery heuristic is statistically unambiguous,
    and this check makes silent disagreement structurally impossible."""
    firsts = [u_base + f for (_, _, u_base), (f, _) in zip(ranges, reports)]
    nexts = [u_base + nx for (_, _, u_base), (_, nx) in zip(ranges,
                                                            reports)]
    for k in range(len(ranges) - 1):
        if nexts[k] != firsts[k + 1]:
            raise RuntimeError(
                "sharded decode boundary mismatch between shards %d and "
                "%d (%d != %d); file layout not understood — rerun "
                "without --distributed" % (k, k + 1, nexts[k],
                                           firsts[k + 1]))


def merge_partial_decodes(parts):
    """Merge per-shard NativeDecode partials (shard order == file order)
    into one NativeDecode equal to the whole-file decode.

    Name ids are re-interned globally (first occurrence wins, preserving
    file order); INS sequence blobs concatenate with offset shifts; the
    name lexicographic ranks and INS sequence content ranks are
    recomputed globally (per-part ranks are only locally valid)."""
    import numpy as np

    from cutesv_tpu.io.native import NativeDecode

    assert parts, "no partial decodes"
    head = parts[0]
    for p in parts[1:]:
        assert p.chroms == head.chroms, "header mismatch across shards"

    # global name table (file order) + per-part id remaps
    gid_of: dict = {}
    names: list = []
    remaps = []
    for p in parts:
        remap = np.empty(len(p.names), np.int64)
        for i, nm in enumerate(p.names):
            g = gid_of.get(nm)
            if g is None:
                g = len(names)
                gid_of[nm] = g
                names.append(nm)
            remap[i] = g
        remaps.append(remap)
    order = np.argsort(np.asarray(names))
    name_rank = np.empty(len(names), np.int64)
    name_rank[order] = np.arange(len(names))

    name_cols = {"del_name", "ins_name", "dup_name", "inv_name",
                 "tra_name", "cen_name", "all_name"}
    arrays = {}
    for key in head.arrays:
        if key == "ins_seq_rank":
            continue  # recomputed below
        cols = []
        for p, remap in zip(parts, remaps):
            a = p.arrays[key]
            if key in name_cols:
                a = remap[a]
            elif key == "ins_seq_off":
                a = a  # shifted below with the blob
            cols.append(np.asarray(a))
        arrays[key] = (np.concatenate(cols) if cols[0].ndim
                       else np.asarray(cols))

    # INS seq blob concat + offset shift + global content ranks
    blob = bytearray()
    shifted = []
    for p in parts:
        off = len(blob)
        blob += p.ins_seq_blob
        shifted.append(np.asarray(p.arrays["ins_seq_off"]) + off)
    arrays["ins_seq_off"] = (np.concatenate(shifted) if shifted
                             else np.empty(0, np.int64))
    blob = bytes(blob)
    soff = arrays["ins_seq_off"]
    slen = arrays["ins_seq_len"]
    seqs = np.empty(len(soff), object)
    for i in range(len(soff)):
        seqs[i] = blob[int(soff[i]):int(soff[i]) + int(slen[i])]
    if len(seqs):
        _, inv = np.unique(seqs, return_inverse=True)
        arrays["ins_seq_rank"] = inv.astype(np.int64)
    else:
        arrays["ins_seq_rank"] = np.empty(0, np.int64)

    return NativeDecode(
        names=names, name_rank=name_rank, chroms=list(head.chroms),
        ref_lengths=head.ref_lengths,
        n_records=sum(p.n_records for p in parts),
        arrays=arrays, ins_seq_blob=blob)


def allgather_obj(obj):
    """Allgather one picklable object per process; returns the list of
    every process's object (same order everywhere). Pads to the max
    pickle length; lengths ride as two int32 halves (jnp.asarray would
    silently truncate int64 without jax_enable_x64)."""
    import pickle

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    blob = pickle.dumps(obj)
    n = np.array([len(blob) >> 31, len(blob) & 0x7FFFFFFF], np.int32)
    halves = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(n))
    ).reshape(-1, 2).astype(np.int64)
    lens = (halves[:, 0] << 31) | halves[:, 1]
    cap = int(lens.max())
    padded = np.zeros(cap, np.uint8)
    padded[:len(blob)] = np.frombuffer(blob, np.uint8)
    gathered = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(padded)))
    gathered = gathered.reshape(jax.process_count(), cap)
    return [pickle.loads(gathered[k, :int(lens[k])].tobytes())
            for k in range(jax.process_count())]


def decode_sharded(cfg, bed_ids):
    """Distributed decode: this process inflates only its block-aligned
    byte range of the BAM, then the per-shard partial decodes are
    allgathered (signatures + census are ~2% of the compressed input)
    and merged — each host ends with the exact whole-file decode, and
    the dominant stage's wall drops ~1/num_processes. Cross-shard record
    boundaries are asserted equal before any result is used."""
    import jax

    from cutesv_tpu.io import native as native_io

    n = jax.process_count()
    k = jax.process_index()
    ranges = plan_shard_ranges(cfg.input, n)
    nd = native_io.decode(cfg.input, cfg, bed_ids,
                          byte_range=ranges[k][:2])
    log.info("sharded decode: shard %d/%d decoded %d records", k, n,
             nd.n_records)
    parts = allgather_obj(nd)
    check_shard_boundaries(ranges,
                           [(p.first_u, p.next_u) for p in parts])
    return merge_partial_decodes(parts)
