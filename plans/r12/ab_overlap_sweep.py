"""Interleaved A/B: serialized vs overlapped per-batch store writes.

OLD arm emulates the pre-round-12 sequential form by swapping the
ThreadPoolExecutor used in the per-batch bodies for a serial executor
(compute jobs run one after the other; commits unchanged). NEW arm is
the committed code. Arms alternate rep-by-rep in one session; results
are collected and compared for equality.
"""
import concurrent.futures as cf
import sys
import time

sys.path.insert(0, "/root/repo")

from spark_stream_kudu_spark.session import get_spark
from spark_stream_kudu_spark.registry import get

REAL_POOL = cf.ThreadPoolExecutor


class _SerialFuture:
    def __init__(self, fn, args):
        self._fn, self._args = fn, args
        self._done = False

    def result(self):
        if not self._done:
            self._res = self._fn(*self._args)
            self._done = True
        return self._res


class SerialPool:
    def __init__(self, max_workers=None):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def submit(self, fn, *args, **kw):
        f = _SerialFuture(fn, args)
        f.result()  # run immediately, sequentially
        return f


QUERIES = [
    "stream_semantic_dedup_e2e",
    "stream_incremental_dedup_e2e",
    "stream_substring_audit_e2e",
]
SF = "/root/testdata/sf0.1"
REPS = 5

spark = get_spark()
sc = spark.sparkContext


def run(name):
    t0 = time.monotonic()
    df = get(name).builder(spark, SF)
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def canon(name):
    df = get(name).builder(spark, SF)
    return sorted(map(tuple, df.collect()))


for name in QUERIES:
    # warm-up once per query
    run(name)
    old, new = [], []
    for rep in range(REPS):
        for arm, bucket in (("old", old), ("new", new)):
            cf.ThreadPoolExecutor = SerialPool if arm == "old" else REAL_POOL
            sc.setJobDescription(f"ab:{name}:{arm}:{rep}")
            bucket.append(run(name))
    cf.ThreadPoolExecutor = REAL_POOL
    cf.ThreadPoolExecutor = SerialPool
    r_old = canon(name)
    cf.ThreadPoolExecutor = REAL_POOL
    r_new = canon(name)
    eq = r_old == r_new
    print(
        f"RESULT {name}: old min={min(old):.3f} med={sorted(old)[REPS//2]:.3f} "
        f"| new min={min(new):.3f} med={sorted(new)[REPS//2]:.3f} | equal={eq}",
        flush=True,
    )
