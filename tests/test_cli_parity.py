"""CLI flag-surface parity with the reference parser.

The reference's live flag table (cuteSV_Description.py:53-263) is pinned
here verbatim — every live flag, its short/long aliases, and its default —
so a drift in cutesv_tpu/cli.py fails loudly. Commented-out reference
flags (--hom/--het, --preset, --diff_ratio_filtering_INS/DEL,
-d/--max_distance, --min_del_size) are intentionally absent except
--preset, which we promote from docs-only to a real flag.
"""
import contextlib
import io

import pytest

from cutesv_tpu.cli import build_parser

POSITIONALS = ["in.bam", "ref.fa", "out.vcf", "wd"]

# dest -> (aliases..., default)   [cuteSV_Description.py:78-250]
REFERENCE_FLAGS = {
    "threads": (("-t", "--threads"), 16),
    "batches": (("-b", "--batches"), 10_000_000),
    "sample": (("-S", "--sample"), "NULL"),
    "retain_work_dir": (("--retain_work_dir",), False),
    "write_old_sigs": (("--write_old_sigs",), False),
    "report_readid": (("--report_readid",), False),
    "ignore_sequence": (("--ignore_sequence",), False),
    "max_split_parts": (("-p", "--max_split_parts"), 7),
    "min_mapq": (("-q", "--min_mapq"), 20),
    "min_read_len": (("-r", "--min_read_len"), 500),
    "merge_del_threshold": (("-md", "--merge_del_threshold"), 0),
    "merge_ins_threshold": (("-mi", "--merge_ins_threshold"), 100),
    "include_bed": (("-include_bed",), None),
    "min_support": (("-s", "--min_support"), 10),
    "min_size": (("-l", "--min_size"), 30),
    "max_size": (("-L", "--max_size"), 100_000),
    "min_siglength": (("-sl", "--min_siglength"), 10),
    "genotype": (("--genotype",), False),
    "gt_round": (("--gt_round",), 500),
    "read_range": (("--read_range",), 1000),
    "Ivcf": (("-Ivcf",), None),
    "max_cluster_bias_INS": (("--max_cluster_bias_INS",), 100),
    "diff_ratio_merging_INS": (("--diff_ratio_merging_INS",), 0.3),
    "max_cluster_bias_DEL": (("--max_cluster_bias_DEL",), 200),
    "diff_ratio_merging_DEL": (("--diff_ratio_merging_DEL",), 0.5),
    "max_cluster_bias_INV": (("--max_cluster_bias_INV",), 500),
    "max_cluster_bias_DUP": (("--max_cluster_bias_DUP",), 500),
    "max_cluster_bias_TRA": (("--max_cluster_bias_TRA",), 50),
    "diff_ratio_filtering_TRA": (("--diff_ratio_filtering_TRA",), 0.6),
    "remain_reads_ratio": (("--remain_reads_ratio",), 1.0),
}


def test_defaults_match_reference():
    args = build_parser().parse_args(POSITIONALS)
    bad = {}
    for dest, (_aliases, default) in REFERENCE_FLAGS.items():
        got = getattr(args, dest, "<missing>")
        if got != default:
            bad[dest] = (default, got)
    assert not bad, "defaults drifted from the reference: %r" % bad


@pytest.mark.parametrize("dest", sorted(REFERENCE_FLAGS))
def test_every_reference_alias_parses(dest):
    aliases, default = REFERENCE_FLAGS[dest]
    p = build_parser()
    for alias in aliases:
        argv = list(POSITIONALS)
        if isinstance(default, bool):
            argv += [alias]
            want = True
        elif isinstance(default, float):
            argv += [alias, "0.25"]
            want = 0.25
        elif isinstance(default, int):
            argv += [alias, "5"]
            want = 5
        else:  # str / None-valued (paths, sample name)
            argv += [alias, "xyz"]
            want = "xyz"
        with contextlib.redirect_stderr(io.StringIO()):
            args = p.parse_args(argv)
        assert getattr(args, dest) == want, (dest, alias)


def test_version_flag():
    p = build_parser()
    for flag in ("--version", "-v"):
        with contextlib.redirect_stdout(io.StringIO()):
            with pytest.raises(SystemExit) as e:
                p.parse_args([flag])
        assert e.value.code == 0


def test_preset_expansion_matches_documented_values():
    """--preset expands to the reference's documented per-platform
    settings (cuteSV_Description.py:30-46); hifi aliases ccs; unknown
    presets fail loudly."""
    import pytest

    from cutesv_tpu.config import Config, apply_preset

    base = Config(input="i", reference="r", output="o", work_dir="w")
    clr = apply_preset(base, "CLR")
    assert (clr.max_cluster_bias_INS, clr.diff_ratio_merging_INS,
            clr.max_cluster_bias_DEL, clr.diff_ratio_merging_DEL) \
        == (100, 0.3, 200, 0.5)
    ccs = apply_preset(base, "ccs")
    assert (ccs.max_cluster_bias_INS, ccs.diff_ratio_merging_INS,
            ccs.max_cluster_bias_DEL, ccs.diff_ratio_merging_DEL) \
        == (1000, 0.9, 1000, 0.5)
    assert apply_preset(base, "hifi") == ccs
    ont = apply_preset(base, "ont")
    assert (ont.max_cluster_bias_INS, ont.diff_ratio_merging_INS,
            ont.max_cluster_bias_DEL, ont.diff_ratio_merging_DEL) \
        == (100, 0.3, 100, 0.3)
    with pytest.raises(ValueError):
        apply_preset(base, "nanopore2")


def test_preset_does_not_override_explicit_flags():
    """An explicitly passed per-type flag wins over --preset regardless of
    flag order; preset still fills the untouched fields."""
    from cutesv_tpu.cli import (_explicit_dests, args_to_config,
                                build_parser)

    parser = build_parser()
    for argv in (["i.bam", "r.fa", "o.vcf", "wd", "--preset", "ccs",
                  "--max_cluster_bias_INS", "555"],
                 ["i.bam", "r.fa", "o.vcf", "wd",
                  "--max_cluster_bias_INS=555", "--preset", "ccs"]):
        args = parser.parse_args(argv)
        cfg = args_to_config(args, explicit=_explicit_dests(parser, argv))
        assert cfg.max_cluster_bias_INS == 555          # explicit wins
        assert cfg.diff_ratio_merging_INS == 0.9        # preset fills rest
        assert cfg.max_cluster_bias_DEL == 1000


def test_preset_does_not_override_abbreviated_explicit_flags():
    """argparse accepts unambiguous long-option abbreviations; an
    abbreviated explicit flag must also win over --preset (and an
    ambiguous prefix marks nothing — argparse rejects it anyway)."""
    from cutesv_tpu.cli import (_explicit_dests, args_to_config,
                                build_parser)

    parser = build_parser()
    argv = ["i.bam", "r.fa", "o.vcf", "wd", "--preset", "ccs",
            "--diff_ratio_merging_D=0.42", "--remain_read", "0.5"]
    args = parser.parse_args(argv)
    cfg = args_to_config(args, explicit=_explicit_dests(parser, argv))
    assert cfg.diff_ratio_merging_DEL == 0.42
    assert cfg.remain_reads_ratio == 0.5
    assert cfg.diff_ratio_merging_INS == 0.9   # preset fills the rest
    assert cfg.max_cluster_bias_INS == 1000
    dests = _explicit_dests(parser, ["--max_cluster_bias_"])
    assert not any(d.startswith("max_cluster_bias") for d in dests)
