"""Force calling / regenotyping of a given VCF (-Ivcf).

The reference disabled this path at the CLI (cuteSV:999-1000, directing
users to cuteFC) while keeping the 678-line implementation in-tree. We keep
the same user-facing contract for now; a native implementation lands in a
later milestone (sig matching by windowed binary search + 1-D 2-means on
device).
"""
from __future__ import annotations


def run_force_calling(cfg, argv):
    raise ValueError(
        "The force calling module has been disabled, please install cuteFC "
        "(https://github.com/Meltpinkg/cuteFC) to achieve SV force "
        "calling/regenotyping.")
