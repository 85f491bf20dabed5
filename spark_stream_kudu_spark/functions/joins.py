"""Size-gated join-side hints for iterative algorithms.

The iterative graph family (PageRank, label propagation) re-joins a
|nodes|-sized table against the static edge list every round. For
dimension-scale graphs a broadcast is the right plan — the edge list
never re-shuffles. At web scale the same broadcast OOMs the driver, so
the loop must switch to a shuffled hash join. That decision belongs in
code, not a docstring: ``gated_broadcast`` estimates the table's
broadcast footprint from a row count the caller already knows (counted
ONCE before the loop — never per round) and returns either
``F.broadcast(df)`` or ``df.hint("shuffle_hash")``.

``shuffle_hash`` (not sort-merge) on the small side keeps the per-round
cost at hash-build + probe without re-sorting the edge list each
iteration.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SIZE_RE = re.compile(r"^(-?\d+)\s*([kmgt]?)b?$", re.IGNORECASE)

_UNIT = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def broadcast_threshold_bytes(spark: SparkSession) -> int:
    """The session's autoBroadcastJoinThreshold in bytes (-1 = disabled).

    Spark renders the conf in several shapes ("10485760b", "10MB",
    "-1"); parse them all rather than guessing.
    """
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    m = _SIZE_RE.match(raw.strip())
    if not m:
        return 10 * (1 << 20)
    return int(m.group(1)) * _UNIT[m.group(2).lower()]


# Conservative in-memory footprint of one broadcast-relation row of a
# few numeric columns (unsafe-row payload + hash-relation overhead).
DEFAULT_BYTES_PER_ROW = 64


def gated_broadcast(
    df: DataFrame,
    est_rows: int,
    spark: SparkSession,
    bytes_per_row: int = DEFAULT_BYTES_PER_ROW,
) -> DataFrame:
    """Broadcast ``df`` iff ``est_rows`` fits under the session's
    autoBroadcastJoinThreshold; otherwise hint a shuffled hash join.

    ``est_rows`` is the caller's upper bound on the table's row count
    (e.g. |nodes|, counted once before an iterative loop) — estimating
    here would trigger a job per call.
    """
    threshold = broadcast_threshold_bytes(spark)
    if threshold > 0 and est_rows * bytes_per_row <= threshold:
        return F.broadcast(df)
    return df.hint("shuffle_hash")
