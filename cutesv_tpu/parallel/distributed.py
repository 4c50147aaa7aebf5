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

* every host decodes the (shared) input and keeps the signature streams
  of the chromosomes that hash into its bucket (`chrom_bucket`); the
  census/read tables stay complete on every host because TRA genotyping
  replays coverage on mate chromosomes,
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
