"""Host (oracle) resolvers for INS/DEL/DUP/INV/TRA clusters.

Reproduces the per-chromosome clustering semantics of the reference:
cuteSV_resolveINDEL.py, cuteSV_resolveDUP.py, cuteSV_resolveINV.py,
cuteSV_resolveTRA.py — gap clustering, per-read dedup (keep max length),
allele splitting on length diffs, breakpoint refinement via
closest-to-mean means, and the per-type genotype window construction.

All functions take already-merged, sorted, deduplicated per-chromosome
signature lists (the sigstore contract) and return the reference's
"candidate row" string lists, ready for the VCF emitter.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from cutesv_tpu.genotype import ReadTable, cal_CIPOS, call_gt_tra


def _gap_clusters(rows: Sequence, pos_of, read_count: int, bias: int,
                  also_break=None):
    """Split a sorted signature stream into clusters: a new cluster starts
    when pos - prev_pos > bias (or ``also_break(prev, cur)``); only clusters
    with >= read_count members (counting duplicates) are yielded.

    This is the distilled form of the reference's sentinel-seeded loop
    (cuteSV_resolveINDEL.py:49-100 and per-type variants): the [0,0,''] seed
    never survives into a generated cluster, so plain gap clustering with a
    size gate is equivalent.
    """
    out = []
    cur: List = []
    prev = None
    for row in rows:
        if prev is not None and (pos_of(row) - pos_of(prev) > bias
                                 or (also_break and also_break(prev, row))):
            if len(cur) >= read_count:
                out.append(cur)
            cur = []
        cur.append(row)
        prev = row
    if len(cur) >= read_count:
        out.append(cur)
    return out


def _dedup_keep_max(cluster: Sequence, len_idx: int, read_idx: int):
    """Per-read dedup keeping the max-length signature; first occurrence
    wins ties and keeps its stream position (dict-insertion semantics of
    cuteSV_resolveINDEL.py:125-131)."""
    tag: Dict = {}
    for row in cluster:
        name = row[read_idx]
        if name not in tag:
            tag[name] = row
        elif row[len_idx] > tag[name][len_idx]:
            tag[name] = row
    return list(tag.values())


def _closest_to_mean_mean(values: List, remain: int) -> float:
    """Mean over the ``remain`` members closest to the mean, selection
    ordered by (|v - mean|, index) (cuteSV_resolveINDEL.py:169-187)."""
    mean = np.mean(values)
    order = sorted(((abs(v - mean), i) for i, v in enumerate(values)))
    picked = [values[order[i][1]] for i in range(remain)]
    return np.mean(picked), picked


def finalize_indel_allele(poss, lens, support: int,
                          remain_reads_ratio: float) -> dict:
    """Float finalization of one DEL/INS allele: breakpoint/length means over
    the closest-to-mean members + CIPOS/CILEN
    (cuteSV_resolveINDEL.py:165-194). Shared by the host and device engines
    so f64 behavior is identical."""
    remain = max(int(remain_reads_ratio * support), 1)
    bp_mean, bp_picked = _closest_to_mean_mean(poss, remain)
    len_mean, _ = _closest_to_mean_mean(lens, remain)
    return dict(
        support=support,
        breakpoint=bp_mean,
        search_threshold=bp_picked[0],
        signal_len=len_mean,
        cipos=cal_CIPOS(np.std(poss), len(poss)),
        cilen=cal_CIPOS(np.std(lens), len(lens)),
    )


def _resolve_alleles_indel(cluster, read_count, threshold_gloab,
                           minimum_support_reads, remain_reads_ratio,
                           is_ins: bool):
    """Shared DEL/INS allele machinery (generate_del_cluster /
    generate_ins_cluster). Yields per-allele dicts."""
    dedup = _dedup_keep_max(cluster, len_idx=1, read_idx=2)
    if len(dedup) < read_count:
        return
    rows = sorted(dedup, key=lambda x: x[1])  # stable: ties keep stream order
    global_len = [r[1] for r in rows]
    threshold = threshold_gloab * np.mean(global_len)

    alleles = [[rows[0]]]
    last_len = rows[0][1]
    for r in rows[1:]:
        if r[1] - last_len > threshold:
            alleles.append([])
        alleles[-1].append(r)
        last_len = r[1]
    # process in increasing-support order (allele_sort on [count],
    # cuteSV_resolveINDEL.py:163); Python sort is stable so equal-support
    # alleles keep length order.
    for allele in sorted(alleles, key=lambda a: len(a)):
        support = len(allele)
        if support < minimum_support_reads:
            continue
        poss = [r[0] for r in allele]
        lens = [r[1] for r in allele]
        res = finalize_indel_allele(poss, lens, support, remain_reads_ratio)
        res["rows"] = allele
        yield res


def resolve_del(sigs: Sequence, chrom: str, read_count: int,
                threshold_gloab: float, max_cluster_bias: int,
                minimum_support_reads: int, remain_reads_ratio: float,
                action: bool, names: Optional[Sequence[str]] = None):
    """DEL resolution (resolution_DEL, cuteSV_resolveINDEL.py:17-108).

    ``sigs`` rows: (pos:int, len:int, read_key) sorted by (pos, len, key).
    Returns (candidates, gt_jobs) where gt_jobs carries the genotype windows
    and support sets when ``action``. ``names`` renders integer read keys
    (native decode path) to strings; string keys render as themselves.
    """
    render = (lambda k: names[k]) if names is not None else (lambda k: k)
    if remain_reads_ratio > 1:
        remain_reads_ratio = 1
    candidates = []
    gt_jobs = []
    clusters = _gap_clusters(sigs, lambda r: r[0], read_count,
                             max_cluster_bias)
    for cluster in clusters:
        for al in _resolve_alleles_indel(cluster, read_count, threshold_gloab,
                                         minimum_support_reads,
                                         remain_reads_ratio, is_ins=False):
            keys = [r[2] for r in al["rows"]]
            rnames = ",".join(render(k) for k in keys)
            if action:
                anchor = int(al["search_threshold"])
                gt_jobs.append(dict(
                    window=(max(anchor - max_cluster_bias, 0),
                            anchor + max_cluster_bias),
                    support=keys))
                candidates.append([chrom, "DEL", str(int(al["breakpoint"])),
                                   str(int(-al["signal_len"])),
                                   str(al["support"]), al["cipos"],
                                   al["cilen"], None, None, None, None, None,
                                   rnames])
            else:
                candidates.append([chrom, "DEL", str(int(al["breakpoint"])),
                                   str(int(-al["signal_len"])),
                                   str(al["support"]), al["cipos"],
                                   al["cilen"], ".", "./.", ".,.,.", ".",
                                   ".", rnames])
    return candidates, gt_jobs


def resolve_ins(sigs: Sequence, chrom: str, read_count: int,
                threshold_gloab: float, max_cluster_bias: int,
                minimum_support_reads: int, remain_reads_ratio: float,
                action: bool, names: Optional[Sequence[str]] = None):
    """INS resolution (resolution_INS, cuteSV_resolveINDEL.py:222-317).

    ``sigs`` rows: (pos:float, len:int, read_key, seq) sorted by
    (int(pos), len, key, seq). Genotype windows use the hardcoded 1000 bp
    bias (cuteSV_resolveINDEL.py:312). ``names`` renders integer read keys
    (native decode path) to strings; string keys render as themselves.
    """
    render = (lambda k: names[k]) if names is not None else (lambda k: k)
    if remain_reads_ratio > 1:
        remain_reads_ratio = 1
    candidates = []
    gt_jobs = []
    clusters = _gap_clusters(sigs, lambda r: r[0], read_count,
                             max_cluster_bias)
    for cluster in clusters:
        for al in _resolve_alleles_indel(cluster, read_count, threshold_gloab,
                                         minimum_support_reads,
                                         remain_reads_ratio, is_ins=True):
            breakpoint = al["breakpoint"]
            signal_len = al["signal_len"]
            # representative sequence: first member (length order) whose
            # sequence is long enough; drop the allele otherwise
            # (cuteSV_resolveINDEL.py:398-405)
            ideal_seq = None
            for r in al["rows"]:
                if len(r[3]) >= int(signal_len):
                    breakpoint = r[0]
                    ideal_seq = r[3][:int(signal_len)]
                    break
            if ideal_seq is None:
                continue
            keys = [r[2] for r in al["rows"]]
            rnames = ",".join(render(k) for k in keys)
            if action:
                anchor = int(breakpoint)
                gt_jobs.append(dict(window=(max(anchor - 1000, 0),
                                            anchor + 1000),
                                    support=keys))
                candidates.append([chrom, "INS", str(int(breakpoint)),
                                   str(int(signal_len)), str(al["support"]),
                                   al["cipos"], al["cilen"], None, None,
                                   None, None, None, rnames,
                                   ideal_seq])
            else:
                candidates.append([chrom, "INS", str(int(breakpoint)),
                                   str(int(signal_len)), str(al["support"]),
                                   al["cipos"], al["cilen"], ".", "./.",
                                   ".,.,.", ".", ".", rnames,
                                   ideal_seq])
    return candidates, gt_jobs


def resolve_dup(sigs: Sequence, chrom: str, read_count: int,
                max_cluster_bias: int, sv_size: int, max_size: int,
                action: bool, names: Optional[Sequence[str]] = None):
    """DUP resolution (resolution_DUP, cuteSV_resolveDUP.py:17-131).

    ``sigs`` rows: (pos1:int, pos2:int, read_key) sorted by
    (pos1, pos2, key). Breakpoints = means of the 40-60th percentile band
    of the pos2-sorted sub-cluster. ``names`` renders integer read keys
    (native decode path) to strings; string keys render as themselves.
    """
    render = (lambda k: names[k]) if names is not None else (lambda k: k)
    candidates = []
    gt_jobs = []
    clusters = _gap_clusters(sigs, lambda r: r[0], read_count,
                             max_cluster_bias)
    for cluster in clusters:
        dup_cluster_emit(cluster, chrom, read_count, max_cluster_bias,
                         sv_size, max_size, action, render, candidates,
                         gt_jobs)
    return candidates, gt_jobs


def dup_cluster_emit(cluster, chrom, read_count, max_cluster_bias, sv_size,
                     max_size, action, render, candidates, gt_jobs):
    """Per-cluster DUP sub-clustering + emission
    (generate_dup_cluster, cuteSV_resolveDUP.py:79-131). ``cluster`` rows
    may arrive pre-sorted by pos2 (stable ties by stream order) — the sort
    here is stable so the result is identical."""
    support_all = _stable_unique([r[2] for r in cluster])
    if len(support_all) < read_count:
        return
    by_p2 = sorted(cluster, key=lambda r: r[1])
    sub: List[List] = [[by_p2[0]]]
    last = by_p2[0][1]
    for r in by_p2[1:]:
        if r[1] - last > max_cluster_bias:
            sub.append([])
        sub[-1].append(r)
        last = r[1]
    for rows in sub:
        support = _stable_unique([r[2] for r in rows])
        if len(support) < read_count:
            continue
        low_b = int(len(rows) * 0.4)
        up_b = int(len(rows) * 0.6)
        if low_b == up_b:
            bp1, bp2 = rows[low_b][0], rows[low_b][1]
        else:
            band = rows[low_b:up_b]
            bp1 = int(sum(r[0] for r in band) / len(band))
            bp2 = int(sum(r[1] for r in band) / len(band))
        if not (sv_size <= bp2 - bp1 <= max_size
                or (sv_size <= bp2 - bp1 and max_size == -1)):
            continue
        if action:
            ncb = min(max_cluster_bias, bp2 - bp1)
            gt_jobs.append(dict(
                window1=(max(bp1 - ncb / 2, 0), bp1 + ncb / 2),
                window2=(max(bp2 - ncb / 2, 0), bp2 + ncb / 2),
                support=support))
            candidates.append([chrom, "DUP", str(bp1), str(bp2 - bp1),
                               str(len(support)), None, None, None, None,
                               None, ",".join(render(k)
                                              for k in support)])
        else:
            candidates.append([chrom, "DUP", str(bp1), str(bp2 - bp1),
                               str(len(support)), ".", "./.", ".,.,.",
                               ".", ".",
                               ",".join(render(k) for k in support)])


def resolve_inv(sigs: Sequence, chrom: str, read_count: int,
                max_cluster_bias: int, sv_size: int, max_size: int,
                action: bool, names: Optional[Sequence[str]] = None):
    """INV resolution (resolution_INV, cuteSV_resolveINV.py:6-203).

    ``sigs`` rows: (strand, bp1:int, bp2:int, read_name) sorted by
    (strand, bp1, bp2, name). Clusters break on bp1 gap, bp2 gap, or strand
    change; sub-clusters on sorted-bp2 gaps with running-mean breakpoints.
    """
    render = (lambda k: names[k]) if names is not None else (lambda k: k)
    candidates = []
    gt_jobs = []

    def also_break(prev, cur):
        return (cur[2] - prev[2] > max_cluster_bias
                or cur[0] != prev[0])

    clusters = _gap_clusters(sigs, lambda r: r[1], read_count,
                             max_cluster_bias, also_break=also_break)
    for cluster in clusters:
        inv_cluster_emit(cluster, chrom, read_count, max_cluster_bias,
                         sv_size, max_size, action, render, candidates,
                         gt_jobs)
    return candidates, gt_jobs


def inv_cluster_emit(cluster, chrom, read_count, max_cluster_bias, sv_size,
                     max_size, action, render, candidates, gt_jobs):
    """Per-cluster INV sub-clustering + emission
    (generate_semi_inv_cluster, cuteSV_resolveINV.py:101-203)."""
    strand = cluster[0][0]
    if len(_stable_unique([r[3] for r in cluster])) < read_count:
        return
    by_b2 = sorted(cluster, key=lambda r: r[2])
    # running sub-cluster accumulation (cuteSV_resolveINV.py:114-203)
    groups: List[List] = [[by_b2[0]]]
    last_bp = by_b2[0][2]
    for r in by_b2[1:]:
        if r[2] - last_bp > max_cluster_bias:
            groups.append([])
        groups[-1].append(r)
        last_bp = r[2]
    for rows in groups:
        temp_count = len(rows)
        if temp_count < read_count:
            continue
        ids = _stable_unique([r[3] for r in rows])
        max_count_id = len(ids)
        bp1 = round(sum(r[1] for r in rows) / temp_count)
        bp2 = round(sum(r[2] for r in rows) / temp_count)
        inv_len = bp2 - bp1
        if inv_len < sv_size or max_count_id < read_count:
            continue
        if not (inv_len <= max_size or max_size == -1):
            continue
        if action:
            gt_jobs.append(dict(
                window1=(max(bp1 - max_cluster_bias / 2, 0),
                         bp1 + max_cluster_bias / 2),
                window2=(max(bp2 - max_cluster_bias / 2, 0),
                         bp2 + max_cluster_bias / 2),
                support=ids))
            candidates.append([chrom, "INV", str(int(bp1)),
                               str(int(inv_len)), str(max_count_id),
                               None, None, strand, None, None, None,
                               ",".join(render(k) for k in ids)])
        else:
            candidates.append([chrom, "INV", str(int(bp1)),
                               str(int(inv_len)), str(max_count_id),
                               ".", "./.", strand, ".,.,.", ".", ".",
                               ",".join(render(k) for k in ids)])


def _stable_unique(items: Sequence) -> List:
    seen = set()
    out = []
    for x in items:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def resolve_tra(sigs: Sequence, chr_1: str, read_count: int,
                overlap_size: float, max_cluster_bias: int,
                tables: Optional[Dict[str, ReadTable]],
                chrom_lengths: Dict[str, int], action: bool, gt_round: int,
                names: Optional[Sequence[str]] = None):
    """TRA/BND resolution (resolution_TRA, cuteSV_resolveTRA.py:30-254).

    ``sigs`` rows: (bnd_type, pos1:int, chr2, pos2:int, read_name) sorted by
    (chr2, bnd_type, pos1, pos2, name). Keeps the reference's running-sum
    sub-cluster averaging, including the double-counted first element.
    """
    candidates = []
    # group by chr2 (stream is sorted by chr2 first)
    i = 0
    n = len(sigs)
    while i < n:
        j = i
        chr_2 = sigs[i][2]
        while j < n and sigs[j][2] == chr_2:
            j += 1
        block = sigs[i:j]
        i = j
        # clusters break on pos1 gap or bnd-type change
        clusters = _gap_clusters(block, lambda r: r[1], read_count,
                                 max_cluster_bias,
                                 also_break=lambda p, c: c[0] != p[0])
        for cluster in clusters:
            _generate_tra_cluster(cluster, chr_1, chr_2, read_count,
                                  overlap_size, max_cluster_bias,
                                  candidates, tables, chrom_lengths, action,
                                  gt_round, names)
    return candidates


_BND_FMT = {"A": "N[%s[", "B": "N]%s]", "C": "[%s[N", "D": "]%s]N"}


def _generate_tra_cluster(cluster, chr_1, chr_2, read_count, overlap_size,
                          max_cluster_bias, candidates, tables,
                          chrom_lengths, action, gt_round, names=None):
    """generate_semi_tra_cluster (cuteSV_resolveTRA.py:106-254)."""
    render = (lambda k: names[k]) if names is not None else (lambda k: k)
    bnd_type = cluster[0][0]
    by_p2 = sorted(cluster, key=lambda r: r[3])
    read_tag = set()
    # running-sum sub-clusters; the first element is seeded AND iterated,
    # double-counting it exactly as the reference does
    # (cuteSV_resolveTRA.py:113-124)
    temp = [[by_p2[0][1], by_p2[0][3], [by_p2[0][4]]]]
    last = by_p2[0][3]
    for r in by_p2:
        if r[3] - last > max_cluster_bias:
            temp.append([r[1], r[3], [r[4]]])
        else:
            temp[-1][0] += r[1]
            temp[-1][1] += r[3]
            temp[-1][2].append(r[4])
        last = r[3]
        read_tag.add(r[4])
    if len(read_tag) < read_count:
        return
    temp.sort(key=lambda t: -len(set(t[2])))

    def emit(entry):
        p1 = int(entry[0] / len(entry[2]))
        p2 = int(entry[1] / len(entry[2]))
        # A/C mate positions are start-type (0-based) and need +1
        # (cuteSV_resolveTRA.py:137-141)
        mate = "%s:%s" % (chr_2, p2 + (1 if bnd_type in ("A", "C") else 0))
        alt = _BND_FMT[bnd_type] % mate
        support = set(entry[2])
        if action:
            dv, dr, gt, gl, gq, qual = call_gt_tra(
                tables, chrom_lengths, p1, p2, chr_1, chr_2, support,
                max_cluster_bias, gt_round)
        else:
            dr, gt, gl, gq, qual = ".", "./.", ".,.,.", ".", "."
        candidates.append([chr_1, alt, str(p1), chr_2, str(p2),
                           str(len(support)), str(dr), str(gt), str(gl),
                           str(gq), str(qual),
                           ",".join(render(k)
                                    for k in _stable_unique(entry[2]))])

    if len(temp) > 1 and len(set(temp[1][2])) >= 0.5 * read_count:
        if (len(set(temp[0][2])) + len(set(temp[1][2]))
                >= len(cluster) * overlap_size):
            emit(temp[0])
            emit(temp[1])
    else:
        if len(set(temp[0][2])) >= len(cluster) * overlap_size:
            emit(temp[0])
