"""Synthetic long-read data generator for tests and benchmarks.

Builds a random reference, plants SVs, and emits perfectly-aligned reads
(with CIGAR indels for INS/DEL and SA-tag split reads for DUP/INV/TRA) into
a coordinate-sorted BAM via cutesv_tpu.io.bam.BamWriter.
"""
from __future__ import annotations

import random
from typing import Dict, List, Optional, Tuple

from cutesv_tpu.io.bam import BamWriter
from cutesv_tpu.io.fasta import write_fasta

BASES = "ACGT"


def random_seq(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(BASES) for _ in range(n))


def make_reference(rng: random.Random, chroms: Dict[str, int]) -> Dict[str, str]:
    return {name: random_seq(rng, n) for name, n in chroms.items()}


class ReadPlan:
    """One alignment record to be written."""

    def __init__(self, qname, chrom_id, pos, cigar, seq, flag=0, mapq=60,
                 tags=None):
        self.qname = qname
        self.chrom_id = chrom_id
        self.pos = pos
        self.cigar = cigar
        self.seq = seq
        self.flag = flag
        self.mapq = mapq
        self.tags = tags or {}


def plain_read(ref: str, chrom_id: int, pos: int, length: int,
               qname: str, mapq: int = 60) -> ReadPlan:
    return ReadPlan(qname, chrom_id, pos, [(0, length)],
                    ref[pos:pos + length], mapq=mapq)


def read_with_del(ref: str, chrom_id: int, pos: int, del_pos: int,
                  del_len: int, flank: int, qname: str) -> ReadPlan:
    """Read aligned [pos, del_pos) + DEL + [del_pos+del_len, ...)."""
    left = del_pos - pos
    cigar = [(0, left), (2, del_len), (0, flank)]
    seq = ref[pos:del_pos] + ref[del_pos + del_len:del_pos + del_len + flank]
    return ReadPlan(qname, chrom_id, pos, cigar, seq)


def read_with_ins(ref: str, chrom_id: int, pos: int, ins_pos: int,
                  ins_seq: str, flank: int, qname: str) -> ReadPlan:
    left = ins_pos - pos
    cigar = [(0, left), (1, len(ins_seq)), (0, flank)]
    seq = ref[pos:ins_pos] + ins_seq + ref[ins_pos:ins_pos + flank]
    return ReadPlan(qname, chrom_id, pos, cigar, seq)


def write_bam(path: str, references: List[Tuple[str, int]],
              plans: List[ReadPlan], sort: bool = True):
    if sort:
        plans = sorted(plans, key=lambda p: (p.chrom_id, p.pos))
    with BamWriter(path, references) as w:
        for p in plans:
            w.write(p.qname, p.flag, p.chrom_id, p.pos, p.mapq, p.cigar,
                    p.seq, p.tags)


def write_ref_fasta(path: str, seqs: Dict[str, str]):
    write_fasta(path, seqs)
