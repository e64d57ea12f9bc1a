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
    # Shuffle-volume metrics (VERDICT r6 #5): rows written to shuffle
    # are a deterministic function of data + plan — a plan regression
    # (new Exchange, lost ReusedExchange, broken partial agg) flips a
    # pinned integer here instead of hiding inside the 1.8x wall-time
    # host-noise band. Values pinned at sf0.001 from the shipped plans.
    assert out["shuffle_rows_total"] > 0
    assert out["shuffle_bytes_total"] > 0
    pinned = {
        # partial agg emits one row per (input partition x group):
        # 2 input splits x 6 flag/status groups
        "q1_pricing_summary": 12,
        # exact dedup shuffles one digest row per document, never the
        # documents themselves: 500 docs at sf0.001
        "dedup_exact": 500,
    }
    for name, want_rows in pinned.items():
        got = out["shuffle"].get(name)
        assert got is not None, f"no shuffle metrics recorded for {name}"
        assert got[1] == want_rows, (
            f"{name}: shuffle rows {got[1]} != pinned {want_rows} — "
            "the physical plan changed shape (check explain before "
            "re-pinning)")
        assert got[0] > 0


def test_bench_final_line_is_bounded():
    """The driver parses the LAST stdout line from a bounded (~3 KB)
    tail window; r07 shipped `parsed: null` because the final line
    grew with the registry. Pin: the compact final object serializes
    under 2000 bytes no matter how many queries ran."""
    import json

    fake_out = {
        "metric": "headline_queries_total_time",
        "value": 123.456,
        "unit": "sec",
        # worst case: every registered query present with a timing
        "queries": {n: 99.999 for n in bench.HEADLINE},
        "sf": 0.1,
        "shuffle_bytes_total": 10**12,
        "shuffle_rows_total": 10**10,
        "errors": {f"q{i}": "x" * 500 for i in range(50)},
    }
    final = bench.compact_final(fake_out, "/root/repo/BENCH.json")
    line = json.dumps(final, separators=(",", ":"))
    assert len(line) < 2000, f"final line {len(line)} bytes — too big"
    # contract shape the driver expects
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in final
    assert set(final["queries"]) == set(bench.CORE)


def test_bench_shuffle_metrics_zero_shuffle(spark):
    """A plain scan-filter has no exchange: the metrics reader must
    report (0, 0), not None (None means traversal broke)."""
    df = (spark.read.parquet(f"{SF_SMOKE}/region.parquet")
          .filter("r_regionkey >= 0"))
    df.collect()
    assert bench.shuffle_metrics(df) == (0, 0)
