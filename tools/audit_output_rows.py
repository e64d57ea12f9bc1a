"""Audit: output row count per HEADLINE query at a given SF dir, plus
whether the query's benched action is collect (row materialization on
the driver) — the evidence table for bench.py LARGE_OUTPUT membership
(VERDICT r10 #4: a ≥100k-row collect measures driver materialization,
not the plan).

Usage: python tools/audit_output_rows.py [sf_dir] > /tmp/output_rows.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from selfhealingdatapipeline_gcp_spark import registry  # noqa: E402
from selfhealingdatapipeline_gcp_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("audit-output-rows")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    out = {}
    for name in bench.HEADLINE:
        try:
            n = qs[name](spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001
            n = f"ERR {type(e).__name__}: {e}"[:120]
        out[name] = {"rows": n,
                     "action": "count" if name in bench.LARGE_OUTPUT
                     else "collect"}
        print(json.dumps({name: out[name]}), file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
