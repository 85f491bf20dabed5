"""Lineage-cut helper shared by the iterative operators (connected
components in operators/dedup.py, PageRank in operators/graph.py).

An iterative DataFrame loop must cut lineage every round or the plan
grows without bound. ``localCheckpoint`` is the fast default, but it is
executor-local: on a 1000-executor run, one lost executor forces a full
lineage recompute. When ``SPARK_GRAFT_CC_CHECKPOINT_DIR`` points at a
reliable store (HDFS / object store), every ``interval``-th round is
written through a *reliable* checkpoint instead, bounding the
recomputation window on executor loss to ``interval`` rounds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

RELIABLE_CKPT_ENV = "SPARK_GRAFT_CC_CHECKPOINT_DIR"
CKPT_INTERVAL = 3


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
) -> DataFrame:
    """Cut lineage after an iteration: reliable checkpoint on every
    ``interval``-th round when active, executor-local otherwise.

    ``local_interval`` lets loops that don't inspect intermediate
    results (PageRank/LPA/closure — no per-round convergence check)
    cut only every N-th round: the plan grows linearly over N rounds,
    but each eager checkpoint is a blocking materialization whose
    latency dominates small-data rounds. Loops that DO act on each
    round's result (connected components' convergence probe) keep the
    default of 1."""
    if reliable and round_no % interval == interval - 1:
        return df.checkpoint(eager=True)
    if round_no % local_interval == local_interval - 1:
        return df.localCheckpoint(eager=True)
    return df
