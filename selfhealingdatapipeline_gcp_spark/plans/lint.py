"""Pre-flight physical-plan lint: the anti-pattern scan the repo's
own test suite runs on its headline queries (tests/test_plan_shapes
.py), packaged as an API any caller can run on any DataFrame BEFORE
committing a 100 TB execution — the preventive sibling of
plans/healer.py (which classifies failures after the fact).

Reference parity: the reference has no pre-flight at all — jobs run
and its healer (scripts/healing_script) reacts. Lint shifts the
cheapest class of incidents (cartesian blow-ups, accidental Python
row UDFs, runaway shuffle counts) to before the cluster burns.

Static rules only — everything here reads the FORMATTED executed
plan, never data: sizes/skew belong to the runtime advisors
(key_skew_profile, join_skew_advisor, catalog_stats_report).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

#: severity levels in report order
ERROR, WARN, INFO = "error", "warn", "info"


@dataclass(frozen=True)
class Finding:
    severity: str
    rule: str
    detail: str


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def lint_plan(df: DataFrame, max_exchanges: int = 12) -> list[Finding]:
    """Scan a DataFrame's physical plan for scale anti-patterns.

    Rules (all static, all cheap):
    - ``cartesian``  (error): CartesianProduct — output is |A|·|B|;
      at fact-table sizes this never finishes. A deliberate tiny
      cross join should use ``broadcast()`` (which plans as BNLJ).
    - ``python-row-udf`` (error): BatchEvalPython — row-at-a-time
      Python in the hot path, ~10-100× slower than Arrow-batched
      (ArrowEvalPython / mapInPandas are NOT flagged).
    - ``nested-loop-join`` (warn): BroadcastNestedLoopJoin — correct
      for 1-row anchor broadcasts (this repo's only sanctioned use);
      anything bigger is a quadratic probe. Static lint cannot see
      the build side's size, hence warn, not error.
    - ``exchange-count`` (warn): more than ``max_exchanges`` Exchange
      nodes — not wrong, but a plan this shuffle-heavy deserves a
      look at reuse/bucketing before a 100 TB run.
    - ``single-partition-sort`` (info): a global Sort directly under
      the root is usually a presentation ORDER BY — harmless on
      bounded outputs, a serial bottleneck on corpus-sized ones.
    """
    plan = _plan_string(df)
    findings: list[Finding] = []
    n_cart = plan.count("CartesianProduct")
    if n_cart:
        findings.append(Finding(
            ERROR, "cartesian",
            f"{n_cart} CartesianProduct node(s): output is |A|*|B| — "
            "broadcast() the small side or add an equi-join key"))
    n_py = plan.count("BatchEvalPython")
    if n_py:
        findings.append(Finding(
            ERROR, "python-row-udf",
            f"{n_py} BatchEvalPython node(s): row-at-a-time Python "
            "UDF in the plan — use built-in expressions or an "
            "Arrow-batched pandas UDF"))
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    if n_bnlj:
        findings.append(Finding(
            WARN, "nested-loop-join",
            f"{n_bnlj} BroadcastNestedLoopJoin node(s): fine for a "
            "1-row anchor broadcast, quadratic for anything bigger — "
            "verify the build side is plan-constant"))
    # count SHUFFLE exchanges only: a bare "Exchange" substring also
    # matches BroadcastExchange / ReusedExchange, which move no
    # shuffle data — a broadcast-heavy but shuffle-light plan would
    # fire spuriously (ADVICE r7)
    n_ex = (plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning")
            + plan.count("Exchange RoundRobinPartitioning")
            + plan.count("Exchange SinglePartition"))
    if n_ex > max_exchanges:
        findings.append(Finding(
            WARN, "exchange-count",
            f"{n_ex} shuffle Exchange nodes (> {max_exchanges}): "
            "check for missed ReusedExchange, bucketing, or "
            "pre-aggregation"))
    # exact node name: startswith("Sort") also matched SortMergeJoin /
    # SortAggregate near the root — false findings (ADVICE r7). Node
    # extraction strips tree art, the whole-stage-codegen "*(n)"
    # marker, and skips AQE wrapper/stage lines so the rule sees the
    # first REAL operator.
    import re as _re

    # Project is presentation-only: a global Sort under a root
    # Project (df.orderBy(...).select(...)) is still a corpus-sized
    # serial sort — skipping it keeps the pre-r7 rule's reach
    # without re-admitting the SortMergeJoin/SortAggregate false
    # positives (those are real operators, never skipped).
    _wrappers = {"AdaptiveSparkPlan", "ResultQueryStage",
                 "ShuffleQueryStage", "BroadcastQueryStage",
                 "AQEShuffleRead", "TableCacheQueryStage",
                 "InMemoryTableScan", "CollectLimit", "Project"}
    first_node, first_line = None, ""
    for ln in plan.splitlines()[:12]:
        s = ln.strip().lstrip("*+- ")
        if not s or s.startswith("=="):
            continue
        s = _re.sub(r"^\(\d+\)\s*", "", s)
        node = _re.split(r"[ \[(]", s, maxsplit=1)[0]
        if node and node not in _wrappers:
            first_node, first_line = node, s
            break
    # physical Sort prints as `Sort [keys...], <global>, 0` — only a
    # GLOBAL sort (`, true`) is the serial bottleneck; a root
    # sortWithinPartitions (`, false`) is per-partition and fine
    if first_node == "Sort" and "], true" in first_line:
        findings.append(Finding(
            INFO, "single-partition-sort",
            "global Sort at the plan root: harmless for a bounded "
            "report, a serial bottleneck for corpus-sized output"))
    return findings


def assert_plan_clean(df: DataFrame, allow: tuple[str, ...] = ()) -> None:
    """Raise if lint finds any ERROR finding not in ``allow`` — the
    one-liner a pipeline task calls before a big execution (the DAG
    runner's preflight hook can call this per task)."""
    bad = [f for f in lint_plan(df)
           if f.severity == ERROR and f.rule not in allow]
    if bad:
        raise ValueError(
            "plan lint failed: "
            + "; ".join(f"[{f.rule}] {f.detail}" for f in bad))
