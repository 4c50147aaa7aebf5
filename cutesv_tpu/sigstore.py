"""Signature store: merge, sort, dedup and per-chromosome grouping.

Stands in for the reference's stage-2 spill-merge (process_process_sigs_type,
cuteSV:750-857): per SV type, signatures are sorted with the reference's
exact keys, exact duplicates removed, and grouped per chromosome. The engine
keeps everything in memory as tuples (oracle path) or numpy SoA (device
path); ``save``/``load`` provide the npz checkpoint that replaces the
reference's pickle work_dir (its checkpoint/resume story, cuteSV:1101-1102).
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

from cutesv_tpu.genotype import ReadTable

SVTYPES = ("DEL", "INS", "DUP", "INV", "TRA")

# sort keys per type, matching cuteSV:763-810 (tuple layouts documented in
# cutesv_tpu/extract.py)
_SORT_KEYS = {
    "DEL": lambda x: (x[4], int(x[0]), x[1], x[2]),
    "INS": lambda x: (x[5], int(x[0]), x[1], x[2], x[3]),
    "DUP": lambda x: (x[4], int(x[0]), int(x[1]), x[2]),
    "INV": lambda x: (x[5], x[0], int(x[1]), x[2], x[3]),
    "TRA": lambda x: (x[6], x[2], x[0], int(x[1]), x[3], x[4]),
}
_CHROM_IDX = {"DEL": 4, "INS": 5, "DUP": 4, "INV": 5, "TRA": 6}


def _dedup_sorted(rows: List[tuple]) -> List[tuple]:
    """Remove exact-duplicate tuples from a sorted list
    (remove_duplicates_sorted, cuteSV:958-969)."""
    out = []
    prev = None
    for r in rows:
        if r != prev:
            out.append(r)
            prev = r
    return out


@dataclass
class SigStore:
    """Merged signature streams + read census, grouped per chromosome."""

    # per type: chrom -> list of resolver-format rows
    sigs: Dict[str, Dict[str, List[tuple]]] = field(default_factory=dict)
    # chrom -> census arrays (mapq-passing, bed-passing, non-256/272 records)
    census: Dict[str, dict] = field(default_factory=dict)
    # chrom -> full record table (TRA count_coverage replay source)
    read_tables: Dict[str, ReadTable] = field(default_factory=dict)
    chrom_lengths: Dict[str, int] = field(default_factory=dict)

    def chroms(self, svtype: str) -> List[str]:
        return list(self.sigs.get(svtype, {}))


def build_store(candidates: Dict[str, List[tuple]],
                census_rows: List[tuple],
                allread_rows: List[tuple],
                chrom_lengths: Dict[str, int]) -> SigStore:
    """Merge raw extraction output into a SigStore.

    ``candidates``: dict of per-type signature tuples (extract.py layouts).
    ``census_rows``: (start, end, is_primary, qname, chrom) per kept record.
    ``allread_rows``: (start, end, primary01, qname, chrom) per mapped
    record regardless of filters, in file order.
    """
    store = SigStore(chrom_lengths=dict(chrom_lengths))
    for svtype in SVTYPES:
        rows = sorted(candidates.get(svtype, []), key=_SORT_KEYS[svtype])
        rows = _dedup_sorted(rows)
        per_chrom: Dict[str, List[tuple]] = {}
        cidx = _CHROM_IDX[svtype]
        for r in rows:
            per_chrom.setdefault(r[cidx], []).append(
                _to_resolver_row(svtype, r))
        store.sigs[svtype] = per_chrom
    # census grouped by chrom, preserving file order (coordinate sorted)
    grouped: Dict[str, List[tuple]] = {}
    for r in census_rows:
        grouped.setdefault(r[4], []).append(r)
    for chrom, rows in grouped.items():
        store.census[chrom] = dict(
            start=np.array([r[0] for r in rows], np.int64),
            end=np.array([r[1] for r in rows], np.int64),
            is_primary=np.array([r[2] for r in rows], np.int8),
            name=[r[3] for r in rows],
        )
    ag: Dict[str, List[tuple]] = {}
    for r in allread_rows:
        ag.setdefault(r[4], []).append(r)
    for chrom, rows in ag.items():
        store.read_tables[chrom] = ReadTable(
            [r[0] for r in rows], [r[1] for r in rows],
            [r[2] for r in rows], [r[3] for r in rows])
    return store


def _to_resolver_row(svtype: str, r: tuple) -> tuple:
    """Project a merged signature tuple onto the per-type resolver layout,
    applying the reference's int() coercions at resolution load time
    (e.g. cuteSV_resolveINDEL.py:57-58,263-264)."""
    if svtype == "DEL":
        return (int(r[0]), int(r[1]), r[2])
    if svtype == "INS":
        return (int(r[0]), int(r[1]), r[2], r[3])
    if svtype == "DUP":
        return (int(r[0]), int(r[1]), r[2])
    if svtype == "INV":
        return (r[0], int(r[1]), int(r[2]), r[3])
    # TRA
    return (r[0], int(r[1]), r[2], int(r[3]), r[4])


def save_store(store: SigStore, work_dir: str):
    """Checkpoint the store (signature tensors = natural resume point
    between extract and cluster, SURVEY §5)."""
    path = os.path.join(work_dir, "sigstore.pickle")
    with open(path, "wb") as fh:
        pickle.dump(store, fh, protocol=pickle.HIGHEST_PROTOCOL)
    return path


def load_store(work_dir: str) -> SigStore:
    with open(os.path.join(work_dir, "sigstore.pickle"), "rb") as fh:
        return pickle.load(fh)


def write_old_sigs(store: SigStore, work_dir: str,
                   candidates: Dict[str, List[tuple]]):
    """Legacy text .sigs files (--write_old_sigs, cuteSV:766-816)."""
    fmts = {
        "DEL": ("%s\t%s\t%d\t%d\t%s\n",
                lambda e: ("DEL", e[4], e[0], e[1], e[2])),
        "INS": ("%s\t%s\t%d\t%d\t%s\t%s\n",
                lambda e: ("INS", e[5], e[0], e[1], e[2], e[3])),
        "DUP": ("%s\t%s\t%d\t%d\t%s\n",
                lambda e: ("DUP", e[4], e[0], e[1], e[2])),
        "INV": ("%s\t%s\t%s\t%d\t%d\t%s\n",
                lambda e: ("INV", e[5], e[0], e[1], e[2], e[3])),
        "TRA": ("%s\t%s\t%s\t%d\t%s\t%d\t%s\n",
                lambda e: ("TRA", e[6], e[0], e[1], e[2], e[3], e[4])),
    }
    for svtype in SVTYPES:
        rows = sorted(candidates.get(svtype, []), key=_SORT_KEYS[svtype])
        rows = _dedup_sorted(rows)
        fmt, proj = fmts[svtype]
        with open(os.path.join(work_dir, "%s.sigs" % svtype), "w") as fh:
            for e in rows:
                fh.write(fmt % proj(e))
