"""Two-phase global order statistics — rank / running sum / exact ntile
without a single-partition sort over the data.

``two_phase_rowid`` (operators/layout.py, q181) kills the global
row_number funnel for inputs whose order key has a naturally bounded
coarse bucket (a day, a value stride). This module generalizes that
kernel to the remaining shape the round-7 audit flagged: rollups ranked
by a METRIC whose tie mass is unbounded (millions of users at
purchase_cents = 0, the freq = 1 Zipf mass of a vocabulary). A single
stride bucket re-creates the funnel there — every tied row lands in one
bucket and the within-bucket window serializes again — so the kernel
takes a second, optional bucket level that refines ties by a
uniform key stride:

  phase 0  leaf counts:   groupBy(b1, *b2) — one partially-aggregated
           shuffle of the rollup, the only pass over the input until
           the final rank join.
  phase 1  coarse prefix: per-b1 totals prefix-summed in ONE bounded
           single-partition window over |b1| rows (a value stride /
           day domain — thousands, recursively bucketable).
  phase 2  fine prefix:   per-leaf counts prefix-summed WITHIN each b1
           (window partitioned by b1 — parallel across coarse buckets;
           a tie-heavy stride splits across its |b2| sub-buckets
           instead of serializing).
  phase 3  leaf ranks:    row_number within (b1, *b2) — bounded by the
           key stride even when every row ties on the metric — plus
           the offset (size-gated join).

Contract: lexicographic (b1 asc, *b2 asc, *order_cols asc) must EQUAL
the intended global order, and the whole tuple must be a total order
(give order_cols a unique key tail). Callers encode DESC metrics by
negating them into the bucket columns.

The offsets side is |leaf| rows — input_rows / key_stride at worst,
which scales with the input — so its join is NOT hinted: AQE
broadcasts it from actual runtime size at every tested scale and
degrades to a shuffled join past the threshold (on the same leaf keys
the downstream window repartitions by anyway).

``exact_ntile`` reproduces SQL NTILE(k) exactly from (global rank, n):
the first n % k tiles get ceil(n/k) rows, the rest floor(n/k) — NOT
the floor((rank-1)*k/n) spread, which distributes remainder rows
differently (n=7, k=5: NTILE gives 2,2,1,1,1; the floor spread gives
2,1,2,1,1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.lineage import pin as _pin


def two_phase_order_stats(
    df: DataFrame,
    b1: str | Sequence[str],
    order_cols: Sequence[str | Column],
    b2: Sequence[str] = (),
    *,
    value_col: str | None = None,
    rank_alias: str = "rnk",
    n_alias: str | None = None,
    cumsum_alias: str | None = None,
    total_alias: str | None = None,
    pin: bool = True,
) -> DataFrame:
    """Attach exact global order statistics to ``df`` two-phase.

    Adds ``rank_alias`` (1-based dense global row number under
    lex(*b1, *b2, *order_cols)) and optionally ``n_alias`` (total row
    count), ``cumsum_alias`` (inclusive running sum of ``value_col``
    in rank order) and ``total_alias`` (grand total of ``value_col``)
    — everything a gains table / Pareto curve / Gini / NTILE needs,
    with no window ever seeing more than max(|b1| coarse rows,
    per-leaf tie group) rows in one partition.

    ``b1`` may be a single column name or a SEQUENCE of names — a
    composite coarse bucket, ordered lexicographically. The composite
    form lets one kernel pass rank several independent orders at once
    by melting them into (metric_tag, stride) coarse buckets (q144's
    three RFM quintiles in a single leaf-count shuffle); with equal
    row counts per tag, per-tag ranks are recovered as
    rank - tag_index * (n / n_tags).

    NULL CONTRACT: every bucket column (b1, b2) and — when null-
    ordering matters — every order column must be NON-NULL. Ranks are
    attached via an equi-join on the bucket keys, and SQL null
    never equals null, so a null-keyed row has no rank under this
    kernel (unlike the window formulation it replaces, which sorts
    nulls first). Rather than silently dropping such rows, each
    bucket column is wrapped in a raise_error null guard that Catalyst
    folds away entirely when the column is provably non-nullable (the
    registry's callers — zero plan cost) and that fails loudly at
    execution otherwise (round-8 advice). Callers with legitimately
    nullable metrics must coalesce into a sentinel bucket first.

    ``pin`` (default on): the kernel consumes ``df`` TWICE — the
    counts branch and the decorating join — and Spark's ReuseExchange
    does not dedupe the subtrees, so an unpinned rollup re-runs its
    whole lineage (typically a corpus scan + aggregate) per branch.
    The shared ``functions.lineage.pin`` seam materializes the
    |rollup| rows once — mechanism selected by ``SPARK_GRAFT_PIN_MODE``
    (local localCheckpoint by default; ``persist`` / ``reliable`` for
    preemptible-executor production, no kernel edit needed); at 100 TB
    the rank input is the PERSISTED entity rollup, which the pin
    stands in for (see SCALE.md "Pin -> persisted-table contract").
    Pass ``pin=False`` when the caller already pinned the input
    (q144's shared per-user rollup).
    """
    b1s = [b1] if isinstance(b1, str) else list(b1)
    b2 = list(b2)
    leaf = [*b1s, *b2]
    # Non-null contract guard (round-8 advice), placed on the INPUT
    # bucket columns rather than around the offsets join: for a
    # provably non-nullable column Catalyst folds IsNotNull to true
    # and the whole conditional away (zero plan cost — verified: the
    # guarded and unguarded plans are identical for the registry's
    # callers); for a nullable one the per-row check stays and raises
    # at execution instead of letting the equi-join drop the row.
    # (A left-join + conditional-rank formulation was measured ~1.3x
    # slower at sf0.1 across the rank family — the outer join blocks
    # the tighter inner-join plan.)
    # Applied BEFORE the pin (round-9 advice): the checkpoint then
    # materializes already-validated keys, so a nullable-input caller
    # pays the per-row check once and both downstream consumptions
    # (counts branch + decorating join) see plain attributes as
    # join/group keys rather than CASE WHEN expressions.
    for c in leaf:
        df = df.withColumn(
            c,
            F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
                F.raise_error(
                    F.lit(
                        "two_phase_order_stats: null bucket key in "
                        f"column {c!r} — the kernel requires non-null "
                        "b1/b2 columns (coalesce nullable metrics "
                        "into a sentinel bucket first)"
                    )
                )
            ),
        )
    if pin:
        df = _pin(df)
    aggs = [F.count(F.lit(1)).alias("__c")]
    want_sum = value_col is not None and (cumsum_alias or total_alias)
    if want_sum:
        aggs.append(F.sum(F.col(value_col).cast("long")).alias("__v"))
    counts = df.groupBy(*leaf).agg(*aggs)

    # Phase 1: coarse totals. The ONLY single-partition window, over
    # |b1| rows (bounded by the caller's stride/domain choice).
    if b2:
        l1_aggs = [F.sum("__c").alias("__c1")]
        if want_sum:
            l1_aggs.append(F.sum("__v").alias("__v1"))
        l1 = counts.groupBy(*b1s).agg(*l1_aggs)
    else:
        l1 = counts.select(
            *b1s,
            F.col("__c").alias("__c1"),
            *([F.col("__v").alias("__v1")] if want_sum else []),
        )
    w1 = Window.orderBy(*b1s).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sel = [
        *[F.col(c) for c in b1s],
        F.coalesce(F.sum("__c1").over(w1), F.lit(0))
        .cast("long")
        .alias("__off1"),
    ]
    if n_alias:
        sel.append(F.sum("__c1").over(w_all).cast("long").alias(n_alias))
    if want_sum:
        sel.append(
            F.coalesce(F.sum("__v1").over(w1), F.lit(0))
            .cast("long")
            .alias("__voff1")
        )
        if total_alias:
            sel.append(
                F.sum("__v1").over(w_all).cast("long").alias(total_alias)
            )
    off1 = l1.select(*sel)

    if b2:
        # Phase 2: fine prefix within each coarse bucket — parallel
        # across b1 values, so a tie-heavy stride costs |its sub-
        # buckets| in one task, never the whole tie mass.
        w2 = (
            Window.partitionBy(*b1s)
            .orderBy(*b2)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        fine = counts.select(
            *leaf,
            F.coalesce(F.sum("__c").over(w2), F.lit(0))
            .cast("long")
            .alias("__off2"),
            *(
                [
                    F.coalesce(F.sum("__v").over(w2), F.lit(0))
                    .cast("long")
                    .alias("__voff2")
                ]
                if want_sum
                else []
            ),
        )
        offsets = fine.join(off1, b1s).select(
            *leaf,
            (F.col("__off1") + F.col("__off2")).alias("__off"),
            *([n_alias] if n_alias else []),
            *(
                [(F.col("__voff1") + F.col("__voff2")).alias("__voff")]
                if want_sum
                else []
            ),
            *([total_alias] if total_alias and want_sum else []),
        )
    else:
        offsets = off1.select(
            *[F.col(c) for c in b1s],
            F.col("__off1").alias("__off"),
            *([n_alias] if n_alias else []),
            *([F.col("__voff1").alias("__voff")] if want_sum else []),
            *([total_alias] if total_alias and want_sum else []),
        )

    # Phase 3: leaf-local rank + offset join. The offsets side is the
    # rank dictionary — |leaf| rows = input_rows / key_stride at worst,
    # which SCALES WITH THE INPUT, so it is deliberately NOT hinted:
    # AQE broadcasts it from its actual runtime size at every tested
    # scale and degrades to a shuffled join (on the same leaf keys the
    # window repartitions by anyway) past the threshold, instead of a
    # forced broadcast OOMing the driver on a trillion-row rollup.
    w_in = Window.partitionBy(*leaf).orderBy(*order_cols)
    out = df.join(offsets, leaf).withColumn(
        rank_alias,
        (F.col("__off") + F.row_number().over(w_in)).cast("long"),
    )
    if want_sum and cumsum_alias:
        w_cum = (
            Window.partitionBy(*leaf)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumn(
            cumsum_alias,
            (
                F.col("__voff")
                + F.sum(F.col(value_col).cast("long")).over(w_cum)
            ).cast("long"),
        )
    return out.drop("__off", "__voff")


def exact_ntile(rank: Column, n: Column, k: int) -> Column:
    """SQL NTILE(k) reconstructed from a 1-based global rank and the
    total row count: the first ``n % k`` tiles take ``ceil(n/k)`` rows,
    the rest ``floor(n/k)``. Integral ``div`` throughout (round-9
    advice on the same class in q144: exact by construction, not by
    the operands-below-2^53 property of double); the ``greatest(q, 1)``
    guard keeps the untaken branch well-defined when n < k (where
    every row is its own tile via the first branch)."""
    def idiv(a: Column, b: Column) -> Column:
        # SQL `div` (integral division, exact on longs). Operands here
        # are non-negative ranks/counts, so div == floor-div.
        return F.call_function("div", a.cast("long"), b.cast("long"))

    kk = F.lit(k).cast("long")
    q = idiv(n, kk)
    r = (n - q * kk).cast("long")
    thr = r * (q + F.lit(1))
    first = (idiv(rank - F.lit(1), q + F.lit(1)) + 1).cast("long")
    rest = (
        r + idiv(rank - F.lit(1) - thr, F.greatest(q, F.lit(1))) + 1
    ).cast("long")
    return F.when(rank <= thr, first).otherwise(rest)
