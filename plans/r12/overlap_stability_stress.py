"""100 overlapped-commit stress iterations + repeated e2e stream runs:
hunting FileNotFound/rename flakes in the compute/commit overlap."""
import os, sys, traceback
sys.path.insert(0, '/root/repo')
from concurrent.futures import ThreadPoolExecutor
from pyspark.sql import Row, functions as F
from spark_stream_kudu_spark.session import get_spark
from spark_stream_kudu_spark.streaming.sinks import UpsertParquetSink
from spark_stream_kudu_spark.registry import get

spark = get_spark()
fails = 0
import tempfile, shutil
for it in range(100):
    d = tempfile.mkdtemp(prefix="stab")
    try:
        a = UpsertParquetSink(os.path.join(d, "a"), key="k")
        b = UpsertParquetSink(os.path.join(d, "b"), key="k")
        a(spark.createDataFrame([Row(k=0, v=0)]), 0)
        b(spark.createDataFrame([Row(k=0, v=100)]), 0)
        for batch in range(1, 4):
            ca, cb = a.read(spark), b.read(spark)
            ua = cb.select("k", (F.col("v") + 1).alias("v"))
            ub = ca.select("k", (F.col("v") - 1).alias("v"))
            with ThreadPoolExecutor(max_workers=2) as pool:
                fa = pool.submit(a.compute, ua, batch)
                fb = pool.submit(b.compute, ub, batch)
                fa.result(), fb.result()
            a.commit(); b.commit()
        assert a.read(spark).count() == 1
    except Exception:
        fails += 1
        traceback.print_exc()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    if (it + 1) % 25 == 0:
        print(f"iter {it+1}: fails={fails}", flush=True)

SF = '/root/testdata/sf0.1'
for name in ("stream_semantic_dedup_e2e", "stream_incremental_dedup_e2e",
             "stream_substring_audit_e2e"):
    for rep in range(7):
        try:
            get(name).builder(spark, SF).write.format("noop").mode("overwrite").save()
        except Exception:
            fails += 1
            traceback.print_exc()
    print(f"{name}: 7 e2e runs done, fails={fails}", flush=True)
print(f"TOTAL fails={fails}")
