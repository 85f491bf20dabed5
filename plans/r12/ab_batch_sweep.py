"""Interleaved A/B for the round-12 batch-query changes:
- pipeline_ivm_retraction: 6-scan union vs lazy-pinned slice source
- q78_fk_orphans: per-relation double child scans vs pinned fk slices
- emb_kmeans_lloyd: per-round centroid collect vs chained rounds

Old forms reconstructed inline (ivm/q78) or via _KM_SYNC_INTERVAL=1
(lloyd — exactly the pre-round-12 loop). Arms alternate rep-by-rep;
results compared for equality.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from spark_stream_kudu_spark.session import get_spark
from spark_stream_kudu_spark.registry import get
from spark_stream_kudu_spark.sources.tables import load_table
import spark_stream_kudu_spark.operators.similarity as sim

SF = "/root/testdata/sf0.1"
REPS = 5

spark = get_spark()


def old_ivm(spark, sf_dir):
    from spark_stream_kudu_spark.functions.hashing import md5_int32
    from spark_stream_kudu_spark.session import tune_session

    tune_session(spark)
    o = load_table(spark, sf_dir, "orders")
    pct = md5_int32(F.col("o_orderkey").cast("string")) % 100
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    bumped = F.floor(F.col("o_totalprice") * 110 + F.lit(0.5)).cast("long")
    base = o.filter(pct < 80).select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("status"),
        cents.alias("price_cents"),
    )
    changes = o.filter((pct >= 80) | (pct < 20)).select(
        F.col("o_orderkey").alias("okey"),
        F.when(pct >= 80, "I").when(pct < 10, "D").otherwise("U").alias("op"),
        F.col("o_orderstatus").alias("status"),
        F.when(pct >= 80, cents).otherwise(bumped).alias("price_cents"),
    )
    mv = base.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("dn"),
        F.sum("price_cents").cast("long").alias("dcents"),
    )
    old = changes.filter(F.col("op") != "I").join(
        base.select("okey", F.col("price_cents").alias("old_cents")), "okey"
    )
    ins = changes.filter(F.col("op") == "I").select(
        "status", F.lit(1).cast("long").alias("dn"),
        F.col("price_cents").cast("long").alias("dcents"),
    )
    dels = old.filter(F.col("op") == "D").select(
        "status", F.lit(-1).cast("long").alias("dn"),
        (-F.col("old_cents")).cast("long").alias("dcents"),
    )
    upd = old.filter(F.col("op") == "U").select(
        "status", F.lit(0).cast("long").alias("dn"),
        (F.col("price_cents") - F.col("old_cents")).cast("long").alias("dcents"),
    )
    return (
        mv.unionByName(ins).unionByName(dels).unionByName(upd)
        .groupBy("status")
        .agg(F.sum("dn").cast("long").alias("n_rows"),
             F.sum("dcents").cast("long").alias("total_cents"))
    )


def old_q78(spark, sf_dir):
    from spark_stream_kudu_spark.operators.profiling import _FK_RELATIONS
    from spark_stream_kudu_spark.session import tune_session

    tune_session(spark)
    out = None
    for name, child, fk_col, parent, pk in _FK_RELATIONS:
        ch = load_table(spark, sf_dir, child)
        pa = load_table(spark, sf_dir, parent).select(pk)
        orphans = (
            ch.join(pa, ch[fk_col] == pa[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("fk"), "n_orphans")
        )
        totals = ch.agg(F.count(F.lit(1)).alias("n_child")).select(
            F.lit(name).alias("fk"), "n_child"
        )
        rel = totals.join(orphans, "fk").select("fk", "n_child", "n_orphans")
        out = rel if out is None else out.unionByName(rel)
    return out


def timed(builder):
    t0 = time.monotonic()
    df = builder(spark, SF)
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def lloyd_old(spark, sf):
    sim._KM_SYNC_INTERVAL = 1
    try:
        return get("emb_kmeans_lloyd").builder(spark, sf)
    finally:
        pass


def lloyd_new(spark, sf):
    sim._KM_SYNC_INTERVAL = 4
    return get("emb_kmeans_lloyd").builder(spark, sf)


CASES = [
    ("pipeline_ivm_retraction", old_ivm, get("pipeline_ivm_retraction").builder),
    ("q78_fk_orphans", old_q78, get("q78_fk_orphans").builder),
    ("emb_kmeans_lloyd", lloyd_old, lloyd_new),
]

for name, oldb, newb in CASES:
    timed(oldb), timed(newb)  # warm both arms
    old_t, new_t = [], []
    for rep in range(REPS):
        spark.sparkContext.setJobDescription(f"ab:{name}:old:{rep}")
        old_t.append(timed(oldb))
        spark.sparkContext.setJobDescription(f"ab:{name}:new:{rep}")
        new_t.append(timed(newb))
    r_old = sorted(map(tuple, oldb(spark, SF).collect()))
    r_new = sorted(map(tuple, newb(spark, SF).collect()))
    print(
        f"RESULT {name}: old min={min(old_t):.3f} med={sorted(old_t)[REPS//2]:.3f} "
        f"| new min={min(new_t):.3f} med={sorted(new_t)[REPS//2]:.3f} "
        f"| equal={r_old == r_new}",
        flush=True,
    )
sim._KM_SYNC_INTERVAL = 4
