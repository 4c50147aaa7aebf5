"""Host-side IO: BGZF, BAM, FASTA, BED.

Implemented from the published format specifications (SAM/BAM spec v1.6,
BGZF appendix). The execution environment has neither pysam nor htslib, so
this package is self-contained: a pure-Python implementation (tests, fallback)
and a C++ implementation in ``cutesv_tpu/native`` for the hot decode path.
"""
from cutesv_tpu.io.bgzf import BgzfReader, BgzfWriter  # noqa: F401
from cutesv_tpu.io.bam import BamReader, BamWriter, BamRecord  # noqa: F401
from cutesv_tpu.io.fasta import FastaFile  # noqa: F401
