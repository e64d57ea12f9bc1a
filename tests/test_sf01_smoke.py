"""Scale smoke: every registered query must EXECUTE at sf0.1 (the
bench SF). Catches scale-dependent failures the sf0.01 parity tests
can't see — e.g. int64 overflow under ANSI mode, skew blowups."""

from __future__ import annotations

import pytest

from selfhealingdatapipeline_gcp_spark import registry

SF_BENCH = "/root/testdata/sf0.1"


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_runs_at_sf01(name, spark):
    df = registry.queries()[name](spark, SF_BENCH)
    # execution without materializing a huge collect
    n = df.count()
    assert n >= 0
