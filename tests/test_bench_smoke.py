"""CI-shape smoke of the DRIVER BENCH code path itself (VERDICT r4
#10): run bench.run_bench at sf0.001 with a single measured run and
assert zero per-query errors. The per-query sf0.1 smoke
(test_sf01_smoke) already executes every registered query; what it
cannot catch is a regression in the bench harness plumbing — the
bucketed-table setup, the timing loop, the error isolation — which is
exactly what silently shipped broken in BENCH_r03. Red pytest before
a red BENCH.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def test_bench_harness_smoke(spark):
    out = bench.run_bench(spark, SF_SMOKE, n_runs=1)
    assert out.get("errors") in (None, {}), (
        f"bench harness reported per-query errors: {out.get('errors')}")
    # every headline query produced a timing, plus the bucketed pair
    missing = [n for n in bench.HEADLINE if n not in out["queries"]]
    assert not missing, f"headline queries missing timings: {missing}"
    assert "fact_join_bucketed" in out["queries"]
    assert out["value"] > 0
