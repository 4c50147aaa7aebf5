"""Ad-hoc extended differential campaign (not part of CI; run explicitly:
pytest tests/campaign_wide.py). Reuses the reference-differential harness
over a much wider randomized grid."""
import pytest

from tests.test_reference_differential import (  # noqa: F401 (fixture)
    ref, test_resolvers_match_reference)


@pytest.mark.parametrize("seed", range(200, 240))
@pytest.mark.parametrize("action", [False, True])
@pytest.mark.parametrize("engine", ["host", "device"])
def test_resolver_differential_wide(ref, tmp_path, seed, action, engine):
    test_resolvers_match_reference(ref, tmp_path, seed, action, engine)
