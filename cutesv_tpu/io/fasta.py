"""FASTA access (replaces pysam.FastaFile for VCF REF/ALT assembly).

The VCF emitter only needs whole-contig strings (reference touchpoint:
cuteSV_genotype.py:254-259 fetches the full chromosome). Supports plain and
BGZF-compressed FASTA. Plain files are memory-mapped and indexed with one
vectorized newline scan (the faidx idea); a contig's bytes are only decoded
when fetched, so a run over a 3 GB genome pays for the contigs it emits
calls on, not the whole file.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from cutesv_tpu.io.bgzf import _read_block


def _read_all_bgzf(path: str) -> bytes:
    with open(path, "rb") as fh:
        chunks = []
        while True:
            block = _read_block(fh)
            if block is None:
                break
            chunks.append(block)
        return b"".join(chunks)


class FastaFile:
    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as fh:
            head = fh.read(2)
        if head == b"\x1f\x8b":
            buf = np.frombuffer(_read_all_bgzf(path), np.uint8)
        elif len(head) == 0:  # np.memmap rejects empty files
            buf = np.empty(0, np.uint8)
        else:
            buf = np.memmap(path, np.uint8, mode="r")
        self._buf = buf
        n = len(buf)
        nl = np.flatnonzero(buf == 10)
        starts = np.concatenate([np.zeros(1, np.int64), nl + 1])
        starts = starts[starts < n] if n else starts[:0]
        hdr_starts = starts[buf[starts] == ord(">")] if len(starts) \
            else starts
        self._order: List[str] = []
        self._regions: Dict[str, Tuple[int, int]] = {}
        self._lengths: Dict[str, int] = {}
        n_h = len(hdr_starts)
        for k in range(n_h):
            h = int(hdr_starts[k])
            j = int(np.searchsorted(nl, h))
            line_end = int(nl[j]) if j < len(nl) else n
            name = bytes(buf[h + 1:line_end]).split()[0].decode("ascii") \
                if line_end > h + 1 else ""
            data_start = min(line_end + 1, n)
            data_end = int(hdr_starts[k + 1]) if k + 1 < n_h else n
            self._order.append(name)
            self._regions[name] = (data_start, max(data_end, data_start))

    @property
    def references(self) -> List[str]:
        return list(self._order)

    def length(self, name: str) -> int:
        if name not in self._lengths:
            s, e = self._regions[name]
            self._lengths[name] = int(np.count_nonzero(self._buf[s:e] > 32))
        return self._lengths[name]

    def lengths(self) -> List[Tuple[str, int]]:
        return [(n, self.length(n)) for n in self._order]

    def fetch(self, name: str) -> str:
        if name not in self._regions:
            raise KeyError(name)
        s, e = self._regions[name]
        arr = np.asarray(self._buf[s:e])
        return arr[arr > 32].tobytes().decode("ascii")

    def __contains__(self, name: str) -> bool:
        return name in self._regions


def write_fasta(path: str, seqs: Dict[str, str], width: int = 60):
    """Test helper: write a plain FASTA file."""
    with open(path, "w") as fh:
        for name, seq in seqs.items():
            fh.write(">%s\n" % name)
            for i in range(0, len(seq), width):
                fh.write(seq[i:i + width] + "\n")
