"""Ad-hoc full-pipeline equivalence campaign (not part of CI; run
explicitly: ``pytest tests/campaign_pipeline_fuzz.py``). Fresh-seed
random messy BAMs through BOTH stacks (python decode + host resolvers
vs native decode + device kernels) must emit byte-equal VCF bodies —
the strongest end-to-end invariant the suite has. Seed window via
CUTESV_PIPE_BASE / CUTESV_PIPE_N."""
import os

import pytest

from tests.test_engine_equivalence import (
    test_fuzzed_full_pipeline_equivalence as _pipeline_case)

BASE = int(os.environ.get("CUTESV_PIPE_BASE", "5000"))
N = int(os.environ.get("CUTESV_PIPE_N", "30"))


@pytest.mark.parametrize("seed", range(BASE, BASE + N))
def test_pipeline_fuzz_campaign(tmp_path, seed):
    _pipeline_case(tmp_path, seed)
