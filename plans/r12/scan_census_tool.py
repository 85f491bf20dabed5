import sys, re, json, collections
sys.path.insert(0, '/root/repo')
from spark_stream_kudu_spark.session import get_spark
from spark_stream_kudu_spark.registry import load_all
from spark_stream_kudu_spark.plans.checks import formatted_plan
spark = get_spark()
sf = '/root/testdata/sf0.001'
out = {}
for name, spec in sorted(load_all().items()):
    try:
        df = spec.builder(spark, sf)
        plan = formatted_plan(df)
    except Exception as ex:
        out[name] = {"error": str(ex)[:120]}
        continue
    locs = collections.Counter()
    for m in re.finditer(r"Location:.*?/([a-z_]+)\.parquet", plan):
        locs[m.group(1)] += 1
    multi = {t: c for t, c in locs.items() if c >= 3}
    if multi:
        out[name] = multi
print(json.dumps(out, indent=0, sort_keys=True))
