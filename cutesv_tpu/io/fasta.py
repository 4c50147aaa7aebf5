"""FASTA access (replaces pysam.FastaFile for VCF REF/ALT assembly).

The VCF emitter only needs whole-contig strings (reference touchpoint:
cuteSV_genotype.py:254-259 fetches the full chromosome). Supports plain and
BGZF-compressed FASTA; builds an in-memory index on first open.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

from cutesv_tpu.io.bgzf import _read_block


def _read_all(path: str) -> bytes:
    with open(path, "rb") as fh:
        head = fh.read(2)
        fh.seek(0)
        if head == b"\x1f\x8b":
            chunks = []
            while True:
                block = _read_block(fh)
                if block is None:
                    break
                chunks.append(block)
            return b"".join(chunks)
        return fh.read()


class FastaFile:
    def __init__(self, path: str):
        self.path = path
        self._seqs: Dict[str, str] = {}
        self._order: List[str] = []
        data = _read_all(path)
        name = None
        parts: List[bytes] = []
        for line in data.split(b"\n"):
            if line.startswith(b">"):
                if name is not None:
                    self._seqs[name] = b"".join(parts).decode("ascii")
                name = line[1:].split()[0].decode("ascii")
                self._order.append(name)
                parts = []
            else:
                parts.append(line.strip())
        if name is not None:
            self._seqs[name] = b"".join(parts).decode("ascii")

    @property
    def references(self) -> List[str]:
        return list(self._order)

    def lengths(self) -> List[Tuple[str, int]]:
        return [(n, len(self._seqs[n])) for n in self._order]

    def fetch(self, name: str) -> str:
        if name not in self._seqs:
            raise KeyError(name)
        return self._seqs[name]

    def __contains__(self, name: str) -> bool:
        return name in self._seqs


def write_fasta(path: str, seqs: Dict[str, str], width: int = 60):
    """Test helper: write a plain FASTA file."""
    with open(path, "w") as fh:
        for name, seq in seqs.items():
            fh.write(">%s\n" % name)
            for i in range(0, len(seq), width):
                fh.write(seq[i:i + width] + "\n")
