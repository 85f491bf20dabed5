"""Plan audit: per-query physical-plan metrics for the scale review.

``python -m spark_stream_kudu_spark.plans.audit [sf_dir]`` prints one
row per registry query: exchange (shuffle) count, broadcast joins,
sort-merge joins, Python eval nodes, whole-stage-codegen spans, and
whether the scan carries pushed filters. This is the working tool
behind SCALE.md's shuffle inventory — re-run it after changing any
operator to catch plan regressions (an extra exchange at sf0.1 is a
cluster-wide reshuffle at 100 TB).
"""

from __future__ import annotations

import re
import sys

from spark_stream_kudu_spark.plans import checks
from spark_stream_kudu_spark.registry import load_all
from spark_stream_kudu_spark.session import get_spark


def _nodes(plan: str, name: str) -> int:
    """Count unique plan nodes by their detail-section header line
    ``(<id>) <Name>`` — the tree section repeats each node, so plain
    substring counts double-count."""
    return len(re.findall(rf"^\(\d+\) {name}\b", plan, flags=re.M))


def audit_row(df) -> dict[str, object]:
    plan = checks.formatted_plan(df)
    return {
        "exchanges": _nodes(plan, "Exchange"),
        "bhj": _nodes(plan, "BroadcastHashJoin"),
        "smj": _nodes(plan, "SortMergeJoin"),
        "python": len(checks.python_eval_nodes(df)),
        "pushed": "PushedFilters: [" in plan
        and any(
            "PushedFilters: []" not in line
            for line in plan.splitlines()
            if "PushedFilters" in line
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    print(f"{'query':28s} {'shuffles':>8s} {'bcast':>5s} {'smj':>4s} {'py':>3s} {'pushed':>6s}")
    for name in sorted(specs):
        try:
            row = audit_row(specs[name].builder(spark, sf_dir))
        except Exception as e:  # pragma: no cover - diagnostic tool
            print(f"{name:28s} ERROR {e}")
            continue
        print(
            f"{name:28s} {row['exchanges']:8d} {row['bhj']:5d} {row['smj']:4d} "
            f"{row['python']:3d} {str(row['pushed']):>6s}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
