"""Keyed upsert sink — the engine's replacement for the Kudu upsert.

The reference demonstrates the same upsert three ways per batch
(KuduContext.upsertRows KafkaToKuduJava.java:117-119; datasource writer
with Kudu UPSERT-on-append semantics kafka_to_kudu.py:44-45,
KafkaToKuduScala.scala:53-56; SQL INSERT kafka_to_kudu.py:48-51) and
documents the contract in comments (java:113-115): idempotent,
last-writer-wins on the primary key ``as_of_time``, safe to re-run.

This engine reproduces that contract sink-side (Spark's parquet writer
has no upsert; Kudu's did — SURVEY.md §2.3.4):

- ``merge_by_key``: pure DataFrame-level keyed merge (new rows win) —
  the unit the oracle checks.
- ``UpsertParquetSink``: a ``foreachBatch`` target maintaining a keyed
  parquet table with hash layout on the key (mirrors the DDL's
  ``PARTITION BY HASH PARTITIONS 4``, ddl/create_impala_kudu_table.sql:14).

Scale note: the merge implementation is merge-on-read-free — it
rewrites the table per batch, which is right for the reference's
cardinality (ONE row per 5 s batch; ddl key = second-granular stamp).
For high-cardinality keyed state at 100 TB you'd swap the store for a
format with real MERGE (Delta/Iceberg/Hudi or Kudu itself) behind the
same ``merge_by_key`` semantics; the sink isolates exactly that seam.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# One sub-batch marker column used to disambiguate replays.
_BATCH_COL = "__batch_id"

# Sentinel distinguishing "caller did not pre-read the store" from "the
# caller read it and it was missing (None)" in UpsertParquetSink.__call__.
_READ_STORE = object()


def merge_by_key(
    current: DataFrame | None,
    updates: DataFrame,
    key: str | list[str],
    num_buckets: int | None = None,
) -> DataFrame:
    """Last-writer-wins merge of ``updates`` into ``current``.

    Row-for-row equivalent to Kudu UPSERT (java:117-119): every key in
    ``updates`` replaces its row in ``current``; unknown keys insert.
    If ``updates`` itself carries duplicate keys, the *last* occurrence
    wins, matching sequential upserts (requires a deterministic order
    column ``__batch_id`` if present, else arbitrary-but-single).

    Shape (round-11): the merge is ONE keyed aggregate — union both
    sides with a priority tag (current 0, updates 1) and keep, per key,
    the max of ``struct(priority, non_keys...)``. Row-for-row identical
    to the previous dedup -> anti-join -> union form: a key only in one
    side keeps that side's (deduped) row, a key in both keeps the
    updates row regardless of content, and duplicate update keys
    resolve to the same lexicographically-largest non-key tuple the
    dedup pass picked (struct comparison is field-order left-to-right,
    priority first). One exchange instead of three (updates dedup +
    anti-join + layout); with ``num_buckets`` set the exchange is
    issued as ``repartition(num_buckets, keys)`` so the merged output
    already carries the store's hash layout (same idiom as
    ``merge_additive``). Requires orderable non-key columns (no maps),
    which holds for every sink schema here.
    """
    keys = [key] if isinstance(key, str) else list(key)
    had_batch_col = _BATCH_COL in updates.columns
    if had_batch_col:
        # Explicit arrival order: keep the row of the LATEST batch per
        # key (window dedup, unchanged pre-round-11 semantics).
        w = Window.partitionBy(*keys).orderBy(F.col(_BATCH_COL).desc())
        updates = (
            updates.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", _BATCH_COL)
        )
    non_keys = [c for c in updates.columns if c not in keys]
    # Output column order replicates the pre-round-11 form exactly: the
    # surviving-current union put current's order first; the first-batch
    # struct-max dedup emitted keys-first; the first-batch window dedup
    # kept updates' own order. The order is load-bearing — it becomes
    # the store's parquet schema, which later batches read back.
    if current is not None:
        out_cols = current.columns
    elif had_batch_col or not non_keys:
        out_cols = updates.columns
    else:
        out_cols = [*keys, *non_keys]

    def _bucketed(df: DataFrame) -> DataFrame:
        return df if num_buckets is None else df.repartition(num_buckets, *keys)

    if not non_keys:
        # Key-only rows: the merge degenerates to a distinct union.
        both = updates if current is None else current.unionByName(updates)
        return _bucketed(both).dropDuplicates(keys)
    tagged = updates.withColumn("__prio", F.lit(1))
    if current is not None:
        tagged = current.withColumn("__prio", F.lit(0)).unionByName(tagged)
    packed = (
        _bucketed(tagged)
        .groupBy(*keys)
        .agg(
            F.max(
                F.struct(F.col("__prio"), *[F.col(c) for c in non_keys])
            ).alias("__r")
        )
    )
    merged = packed.select(
        *keys, *[F.col(f"__r.{c}").alias(c) for c in non_keys]
    )
    return merged.select(*out_cols)


class UpsertParquetSink:
    """``foreachBatch`` sink: keyed parquet table with upsert semantics.

    Usage::

        sink = UpsertParquetSink(path, key="as_of_time", num_buckets=4)
        q = (df.writeStream.outputMode("update")
               .foreachBatch(sink).start())

    Idempotency: the sink records the last committed batch id in the
    table directory; replaying an already-committed batch is a no-op,
    reproducing the reference's replay-safety (java:113-115).
    """

    #: Aggregate-merge subclasses set this True: their batch inputs are
    #: by construction partial aggregates — a shuffle runs before the
    #: first output row — so the empty-batch probe would execute the
    #: aggregation once and the merge would execute it AGAIN (round-11).
    #: A lazy lineage cut makes the probe the materializer and the merge
    #: a read-back. The base last-writer-wins sink stays uncut: its
    #: inputs are often raw or narrow scan-local plans whose limit-1
    #: probe is cheaper than a full materialization (callers with
    #: expensive plans cut at the call site instead).
    _cut_input = False

    def __init__(self, path: str, key: str | list[str], num_buckets: int = 4):
        self.path = path
        self.key = [key] if isinstance(key, str) else list(key)
        self.num_buckets = num_buckets
        self._data = os.path.join(path, "data")
        self._marker = os.path.join(path, "_last_batch")
        # Read-back schema, cached after the first inference (round-11):
        # every merge preserves the column set (unionByName would fail
        # otherwise), so the store's read schema is fixed for the life
        # of the sink and re-inferring it per read pays one footer-scan
        # job per micro-batch for nothing. Cached from an actual
        # read-back (not from the written DataFrame) so nullability
        # matches parquet inference exactly.
        self._schema = None

    def _last_batch(self) -> int:
        try:
            with open(self._marker) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return -1

    def num_rows(self) -> int | None:
        """Exact row count of the live store from its parquet footers
        (driver-side metadata, no Spark job) — None when the store is
        missing. The cheap source for row bounds fed to size-gated
        joins over the store (a ``count()`` would cost a scan job)."""
        if not os.path.isdir(self._data):
            return None
        import glob

        import pyarrow.parquet as pq

        return sum(
            pq.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(self._data, "*.parquet"))
        )

    def read(self, spark) -> DataFrame | None:
        # Only a MISSING table reads as empty. Transient read failures
        # must propagate: swallowing them would make the next merge
        # treat the table as empty and silently drop all upserted state.
        if not os.path.isdir(self._data):
            return None
        if self._schema is not None:
            return spark.read.schema(self._schema).parquet(self._data)
        df = spark.read.parquet(self._data)
        self._schema = df.schema
        return df

    def _merge(self, current: DataFrame | None, batch_df: DataFrame) -> DataFrame:
        """Merge policy — last-writer-wins here; subclasses override
        (AdditiveRollupSink sum-merges partial aggregates)."""
        return merge_by_key(current, batch_df, self.key, num_buckets=self.num_buckets)

    def _layout(self, merged: DataFrame) -> DataFrame:
        """Hash layout on the key before the store write. Every merge
        policy — last-writer-wins included since round-11 — issues its
        key shuffle as ``repartition(num_buckets, key)`` feeding its
        aggregate, so the merged output already carries the store's
        hash layout (reference ddl:14, HASH PARTITIONS 4) and a second
        exchange here would be redundant."""
        return merged

    def compute(
        self, batch_df: DataFrame, batch_id: int, current=_READ_STORE
    ) -> bool:
        """Stage this batch's merged store into the side directory —
        the Spark job, WITHOUT touching the live table. Returns True
        iff a staged table is ready for :meth:`commit`.

        Compute/commit separation (round-12, guide §2.6): a stream
        that maintains several stores per batch has data-independent
        write jobs, but promoting a store mid-flight would yank files
        out from under any concurrent job still READING it (the
        credits plan of the semantic-dedup stream reads the member
        store while the dominator store writes). Staging only reads
        live directories and writes a private side directory, so any
        number of sinks may compute concurrently (driver thread pool);
        the renames happen afterwards, in :meth:`commit`, when no job
        is in flight."""
        if self._cut_input:
            batch_df = batch_df.localCheckpoint(eager=False)
        # Empty-batch guard (reference O7, kafka_to_kudu.py:23).
        if batch_df.isEmpty():
            return False
        if batch_id <= self._last_batch():
            return False  # replayed batch: idempotent no-op
        spark = batch_df.sparkSession
        # ``current`` (round-11): a caller that already read this
        # store's CURRENT version for its own batch logic (e.g. the
        # incremental-dedup streams join new arrivals against the
        # accumulated store before upserting into it) passes that
        # DataFrame here, so the store is listed/planned once per batch
        # instead of twice. Must be the unmodified result of
        # ``self.read(spark)`` taken in the same micro-batch, with no
        # intervening write to this sink.
        if current is _READ_STORE:
            current = self.read(spark)
        merged = self._merge(current, batch_df)
        # Hash layout on the key (reference ddl:14, HASH PARTITIONS 4):
        # co-locates future merges and bounds file counts. Write to a
        # side directory then swap — the merge plan reads the current
        # directory, so an in-place overwrite would corrupt its input.
        tmp = self._data + ".tmp"
        self._layout(merged).write.mode("overwrite").parquet(tmp)
        self._staged_batch = batch_id
        return True

    #: Batch id staged by :meth:`compute` and not yet promoted.
    _staged_batch: int | None = None

    def commit(self) -> None:
        """Promote the staged table (renames + replay marker). No-op
        when nothing is staged. Driver-side only — safe to call while
        OTHER sinks' jobs run, but every job reading THIS store must
        have finished."""
        if self._staged_batch is None:
            return
        import shutil

        tmp = self._data + ".tmp"
        # Promote via rename-aside: the previous table is moved to .old
        # (not deleted) before tmp takes its place, so a crash anywhere
        # in the window leaves a recoverable copy instead of no table.
        old = self._data + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(self._data):
            os.rename(self._data, old)
        os.rename(tmp, self._data)
        if os.path.exists(old):
            shutil.rmtree(old)
        os.makedirs(self.path, exist_ok=True)
        with open(self._marker, "w") as f:
            f.write(str(self._staged_batch))
        self._staged_batch = None

    def __call__(
        self, batch_df: DataFrame, batch_id: int, current=_READ_STORE
    ) -> None:
        if self.compute(batch_df, batch_id, current):
            self.commit()


def merge_additive(
    current: DataFrame | None,
    updates: DataFrame,
    key: str | list[str],
    sum_cols: list[str],
    num_buckets: int | None = None,
) -> DataFrame:
    """Additive (aggregate-merge) upsert: ``updates`` carries PARTIAL
    aggregates per key; merging SUMS them into the current table instead
    of replacing rows — the maintenance step of an incrementally-updated
    rollup (continuous aggregate). Commutative and associative, so the
    result is independent of micro-batch boundaries; one shuffle on the
    key, same as the last-writer-wins merge.

    ``num_buckets`` (round-11): when set, the key shuffle is issued as
    ``repartition(num_buckets, keys)`` BEFORE the groupBy — the
    aggregate's clustered-distribution requirement is satisfied by that
    partitioning (map-side partial aggregation is unchanged), so the
    merged output already carries the store's hash layout and the sink
    skips its separate layout exchange (2 exchanges -> 1 per batch)."""
    keys = [key] if isinstance(key, str) else list(key)
    both = updates if current is None else current.unionByName(updates)
    if num_buckets is not None:
        both = both.repartition(num_buckets, *keys)
    return both.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )


class AdditiveRollupSink(UpsertParquetSink):
    """``foreachBatch`` sink maintaining an incrementally-updated rollup
    table: each micro-batch's partial aggregates are SUM-merged into the
    keyed store (vs. the base class's last-writer-wins replacement).
    Inherits the idempotent-replay marker and the crash-safe rename-aside
    promotion — replaying a committed batch must NOT double-count."""

    _cut_input = True

    def __init__(
        self,
        path: str,
        key: str | list[str],
        sum_cols: list[str],
        num_buckets: int = 4,
    ):
        super().__init__(path, key, num_buckets)
        self.sum_cols = list(sum_cols)

    def _merge(self, current: DataFrame | None, batch_df: DataFrame) -> DataFrame:
        return merge_additive(
            current, batch_df, self.key, self.sum_cols,
            num_buckets=self.num_buckets,
        )

    def _layout(self, merged: DataFrame) -> DataFrame:
        # The merge's pre-aggregation repartition already produced the
        # store's hash layout — a second exchange would be redundant.
        return merged


class SketchUnionSink(UpsertParquetSink):
    """``foreachBatch`` sink maintaining keyed HLL sketches: each
    micro-batch's partial sketches are hll_union-merged into the store.
    Register-wise max is commutative, associative AND idempotent, so the
    final sketch — and therefore its estimate — is bit-identical for any
    batch slicing or merge order (stronger than the additive sink, which
    needs the replay marker to avoid double-counting; the marker is
    still inherited for IO economy). The streaming cardinality path
    that never stores identities."""

    _cut_input = True

    def __init__(
        self,
        path: str,
        key: str | list[str],
        sketch_col: str,
        num_buckets: int = 4,
    ):
        super().__init__(path, key, num_buckets)
        self.sketch_col = sketch_col

    def _merge(self, current, batch_df):
        if current is None:
            base = batch_df
        else:
            base = current.select(*batch_df.columns).unionByName(batch_df)
        # Pre-aggregation repartition = aggregation + layout in one
        # exchange (see merge_additive).
        return base.repartition(self.num_buckets, *self.key).groupBy(
            *self.key
        ).agg(F.hll_union_agg(self.sketch_col).alias(self.sketch_col))

    def _layout(self, merged: DataFrame) -> DataFrame:
        return merged


class BitmapOrSink(UpsertParquetSink):
    """``foreachBatch`` sink maintaining keyed bitmap words: each
    micro-batch's (key, word, mask) partials are bitwise-OR-merged into
    the store. OR is commutative, associative AND idempotent — the same
    algebra class as SketchUnionSink's register-max, but the merged
    bitmap is EXACT: popcount over the final words equals the true
    distinct count for any batch slicing, merge order, or replay. State
    is |keys| x |id-space/63| words, never raw identities."""

    _cut_input = True

    def __init__(
        self,
        path: str,
        key: str | list[str],
        mask_col: str = "mask",
        num_buckets: int = 4,
    ):
        super().__init__(path, key, num_buckets)
        self.mask_col = mask_col

    def _merge(self, current, batch_df):
        if current is None:
            base = batch_df
        else:
            base = current.select(*batch_df.columns).unionByName(batch_df)
        # Pre-aggregation repartition = aggregation + layout in one
        # exchange (see merge_additive).
        return base.repartition(self.num_buckets, *self.key).groupBy(
            *self.key
        ).agg(F.bit_or(self.mask_col).alias(self.mask_col))

    def _layout(self, merged: DataFrame) -> DataFrame:
        return merged
