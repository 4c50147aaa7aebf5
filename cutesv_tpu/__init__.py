"""cutesv-tpu: a TPU-native structural-variant calling engine for long reads.

A from-scratch re-design of the capabilities of cuteSV (tjiangHIT/cuteSV
v2.1.4) for TPU hardware:

- host-side BAM/CRAM decode (C++ / Python) streams reads once and emits dense
  coordinate tensors of SV signatures (CIGAR indels + SA-tag split reads),
- per-type clustering, allele splitting, breakpoint refinement and genotype
  read-support counting run as JAX sort / segment-reduction kernels on device,
- genome bins shard across a ``jax.sharding.Mesh`` (data parallel over the
  genome axis, halo exchange at bin boundaries),
- a host-side VCF emitter reproduces cuteSV's output format record for record.

Package layout:
    io/        BGZF + BAM + FASTA + BED readers (and a BAM writer for tests)
    ops/       device kernel library (sort, segments, interval sweep, GL)
    models/    per-SV-type resolvers (INS/DEL, DUP, INV, TRA/BND)
    parallel/  mesh sharding / multi-chip pipeline
    native/    C++ host decoder sources
    utils/     logging, timers
"""

__version__ = "0.1.0"

REFERENCE_VERSION = "2.1.4"  # cuteSV version whose behavior we reproduce
