"""Lineage-cut helpers shared by the iterative operators (connected
components in operators/dedup.py, PageRank in operators/graph.py) and
the multiply-consumed rollup pins (two_phase_order_stats /
two_phase_rowid and the pinned rollups across operators/).

An iterative DataFrame loop must cut lineage every round or the plan
grows without bound. ``localCheckpoint`` is the fast default, but it is
executor-local: on a 1000-executor run, one lost executor forces a full
lineage recompute. When ``SPARK_GRAFT_CC_CHECKPOINT_DIR`` points at a
reliable store (HDFS / object store), every ``interval``-th round is
written through a *reliable* checkpoint instead, bounding the
recomputation window on executor loss to ``interval`` rounds.

``pin`` is the second seam (round-9 verdict item 2): a rollup consumed
by two or more downstream branches is materialized ONCE instead of
re-running its lineage per branch (Spark's ReuseExchange does not
dedupe the subtrees). The mechanism is env-selected via
``SPARK_GRAFT_PIN_MODE`` so a production deployment on preemptible
executors can switch every pin in the engine without editing kernels:

  local (default)  eager ``localCheckpoint`` — fastest; blocks live on
                   executors, so a lost executor FAILS the job (the
                   lineage was truncated). Right for the sandbox and
                   for on-demand clusters.
  persist          ``MEMORY_AND_DISK`` persist, eagerly materialized.
                   Lineage is KEPT: a lost executor's blocks recompute
                   from source instead of failing — the
                   preemptible-executor mode. Entries stay in the
                   cache manager for the session (bounded: pins hold
                   entity rollups, not corpus scans).
  reliable         ``checkpoint(eager=True)`` through the
                   ``SPARK_GRAFT_CC_CHECKPOINT_DIR`` store — survives
                   any executor loss; one HDFS/object-store round-trip
                   per pin. Raises loudly if no dir is configured
                   rather than silently degrading.

At 100 TB the strongest form is still a PERSISTED rollup table written
by the upstream pipeline stage (SCALE.md "Pin -> persisted-table
contract"); the seam covers the deployments in between.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

RELIABLE_CKPT_ENV = "SPARK_GRAFT_CC_CHECKPOINT_DIR"
CKPT_INTERVAL = 3
PIN_MODE_ENV = "SPARK_GRAFT_PIN_MODE"
_PIN_MODES = ("local", "persist", "reliable")


def configure_reliable_checkpoints(spark: SparkSession) -> bool:
    """Point the context's checkpoint dir at the env-configured reliable
    store; returns whether reliable checkpointing is active."""
    ckpt_dir = os.environ.get(RELIABLE_CKPT_ENV)
    if ckpt_dir:
        spark.sparkContext.setCheckpointDir(ckpt_dir)
    return bool(ckpt_dir)


def cut_lineage(
    df: DataFrame,
    round_no: int,
    reliable: bool,
    interval: int = CKPT_INTERVAL,
    local_interval: int = 1,
    eager: bool = True,
) -> DataFrame:
    """Cut lineage after an iteration: reliable checkpoint on every
    ``interval``-th round when active, executor-local otherwise.

    ``local_interval`` lets loops that don't inspect intermediate
    results (PageRank/LPA/closure — no per-round convergence check)
    cut only every N-th round: the plan grows linearly over N rounds,
    but each eager checkpoint is a blocking materialization whose
    latency dominates small-data rounds. Loops that DO act on each
    round's result (connected components' convergence probe) keep the
    default of 1.

    ``eager=False`` (round-11): a LAZY localCheckpoint cuts the
    Catalyst plan just the same (the DataFrame wraps a LogicalRDD
    immediately), but defers materialization to the next action that
    consumes the round — the per-round convergence probe where one
    exists, else the query's final action. Every eager cut is a
    blocking driver round-trip (one job submission + wait per round);
    deferring it removes that barrier while keeping both the bounded
    plan and the executor-local persistence of the cut. Loops that
    run an action on each round's result anyway (k-core's edge count,
    star contraction's digest) get the materialization for free
    inside that action; loops with no per-round action pipeline every
    round into the single final job. The reliable branch stays eager:
    a durable checkpoint's point is that the data is on stable store
    BEFORE the loop proceeds."""
    if reliable and round_no % interval == interval - 1:
        return df.checkpoint(eager=True)
    if round_no % local_interval == local_interval - 1:
        return df.localCheckpoint(eager=eager)
    return df


def pin_mode() -> str:
    """The active pin mode (validated). Read per-call, not at import:
    tests and long-lived drivers may flip the env between queries."""
    mode = os.environ.get(PIN_MODE_ENV, "local") or "local"
    if mode not in _PIN_MODES:
        raise ValueError(
            f"{PIN_MODE_ENV}={mode!r}: expected one of {_PIN_MODES}"
        )
    return mode


# Persist-mode pins registered since the last release_pins() call.
# localCheckpoint/checkpoint blocks are dropped by the context cleaner
# once the DataFrame is garbage-collected, but persist() entries stay
# registered in the cache manager for the session — a long-lived
# driver (bench sweep, correctness harness) running many queries under
# SPARK_GRAFT_PIN_MODE=persist would otherwise accumulate
# MEMORY_AND_DISK entries without bound (round-10 advice). Harnesses
# call release_pins() at query boundaries; in the default local mode
# the list stays empty and the call is a no-op.
_PERSISTED_PINS: list[DataFrame] = []


def release_pins() -> int:
    """Unpersist every persist-mode pin registered since the last call;
    returns how many were released. Safe to call in any pin mode."""
    n = 0
    while _PERSISTED_PINS:
        df = _PERSISTED_PINS.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # Session already stopped — nothing left to release.
            pass
    return n


_REL_UPGRADE_WARNED = False


def _warn_reliable_upgrade_once() -> None:
    """One process-level note when a lazy pin is upgraded to an eager
    reliable checkpoint, so every round-11 barrier reappearing under
    SPARK_GRAFT_PIN_MODE=reliable is attributable (round-11 advice)."""
    global _REL_UPGRADE_WARNED
    if not _REL_UPGRADE_WARNED:
        _REL_UPGRADE_WARNED = True
        import logging

        logging.getLogger(__name__).info(
            "pin(eager=False) upgraded to an EAGER reliable checkpoint "
            "(%s=reliable): one blocking driver job per pin returns — "
            "perf deltas vs the default lazy mode are expected",
            PIN_MODE_ENV,
        )


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize a multiply-consumed rollup once, via the mechanism
    selected by ``SPARK_GRAFT_PIN_MODE`` (module docstring).

    ``eager=True`` (default): every mode blocks until the input is
    materialized — callers rely on it being computed exactly once
    before any branch consumes the result.

    ``eager=False`` (round-11): materialization is deferred into the
    first consuming action instead of a blocking driver job per pin.
    Compute-once is then BEST-EFFORT, not guaranteed: the backing
    persist fills per-task during that first action, so sibling stages
    scheduled concurrently inside the same action can each recompute
    not-yet-cached partitions. Values are identical regardless — which
    is exactly why lazy pins must only wrap DETERMINISTIC lineage
    (every pinned subtree here is). Use it when every consumer lives
    in the query's final job anyway — an eager pin's barrier
    serializes phases that otherwise overlap on idle cores (measured
    losing on the verify-family A/Bs). The reliable mode stays eager
    by design — a durable checkpoint's point is that the data reaches
    stable store before the query proceeds — so a lazy-tuned caller
    sees its barriers reappear there; that upgrade is logged once per
    process so a reliable-mode perf delta stays attributable."""
    mode = pin_mode()
    if mode == "persist":
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            df.count()  # materialize before any branch consumes it
        _PERSISTED_PINS.append(df)
        return df
    if mode == "reliable":
        spark = df.sparkSession
        if not eager:
            _warn_reliable_upgrade_once()
        if not configure_reliable_checkpoints(spark):
            raise RuntimeError(
                f"{PIN_MODE_ENV}=reliable requires {RELIABLE_CKPT_ENV} "
                "to name a durable checkpoint store (HDFS/object "
                "store) — refusing to silently degrade to an "
                "executor-local pin"
            )
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=eager)
