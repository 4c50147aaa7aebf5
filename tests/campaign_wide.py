"""Ad-hoc extended differential campaign (not part of CI; run explicitly:
pytest tests/campaign_wide.py). Reuses the reference-differential harness
over a much wider randomized grid. Seed windows are env-tunable so fresh
sweeps don't re-walk old ground: CUTESV_WIDE_BASE shifts every window,
CUTESV_WIDE_N scales the per-family counts (defaults reproduce the
committed campaign exactly)."""
import os

import pytest

from tests.test_reference_differential import (  # noqa: F401 (fixture)
    ref, test_resolvers_match_reference)

BASE = int(os.environ.get("CUTESV_WIDE_BASE", "0"))
N = int(os.environ.get("CUTESV_WIDE_N", "40"))


@pytest.mark.parametrize("seed", range(200 + BASE, 200 + BASE + N))
@pytest.mark.parametrize("action", [False, True])
@pytest.mark.parametrize("engine", ["host", "device"])
def test_resolver_differential_wide(ref, tmp_path, seed, action, engine):
    test_resolvers_match_reference(ref, tmp_path, seed, action, engine)


from tests.test_reference_differential import (  # noqa: F401,E402 (fixture)
    refmain, test_extraction_matches_reference)


@pytest.mark.parametrize("seed", range(40 + BASE, 40 + BASE + N))
def test_extraction_differential_wide(refmain, tmp_path, seed):
    test_extraction_matches_reference(refmain, tmp_path, seed)


from tests.test_reference_differential import (  # noqa: F401,E402 (fixtures)
    reffc, test_force_calling_matches_reference,
    test_vcf_emission_matches_reference)


@pytest.mark.parametrize("seed", range(50 + BASE, 50 + BASE + N // 2))
def test_force_calling_differential_wide(ref, reffc, tmp_path, seed):
    test_force_calling_matches_reference(ref, reffc, tmp_path, seed)


@pytest.mark.parametrize("seed", range(30 + BASE, 30 + BASE + N // 2))
@pytest.mark.parametrize("report_readid,ignore_sequence",
                         [(False, False), (True, False), (False, True)])
def test_vcf_emission_differential_wide(ref, tmp_path, seed, report_readid,
                                        ignore_sequence):
    test_vcf_emission_matches_reference(ref, tmp_path, seed, report_readid,
                                        ignore_sequence)
