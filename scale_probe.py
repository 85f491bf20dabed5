"""Scaling demonstration fixture + probe (round-12).

At sf0.1 every bench query is scheduling/fixed-overhead bound — the
round-11 driver's 8-core run BEAT the 32-core run, so "scales on
cores" was unevidenced for all 34 bench queries. This tool builds a
deterministic BLOW-UP of the sf0.1 fixture big enough that core count
matters, then times the heaviest bench queries at two core counts in
fresh processes. Results + diagnosis live in SCALE.md ("Measured
core-scaling demonstration").

Blow-up construction (deterministic, pure relabeling — no RNG):
- lineitem / orders / customer / supplier: REL_FACTOR disjoint copies;
  every key column is shifted by copy * (max_key + 1), so each copy is
  a structurally identical, fully disjoint subgraph and FK integrity
  is preserved per copy.
- documents: REL_FACTOR copies with shifted doc_id and a per-copy text
  suffix (so near-dup clusters stay WITHIN a copy — disjoint work, the
  shape production growth has); n_chars is kept consistent.
- embeddings: EMB_FACTOR copies with shifted vec_id (vectors reused —
  clusters grow by the factor, so the within-cluster pair term grows
  quadratically; EMB_FACTOR is kept smaller for bounded runtime).
- everything else: copied verbatim.

Each table is written as a DIRECTORY of one part-file per copy so the
scan arrives pre-split (the single-file fixture would cap scan
parallelism at 1-2 input splits regardless of cores).

Usage:
    python scale_probe.py build [out_dir]
    SPARK_GRAFT_CPUS=32 python scale_probe.py run [out_dir]
    SPARK_GRAFT_CPUS=8  python scale_probe.py run [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = "/tmp/ssk_scale_fixture"
REL_FACTOR = int(os.environ.get("SCALE_REL_FACTOR", "8"))
EMB_FACTOR = int(os.environ.get("SCALE_EMB_FACTOR", "4"))

QUERIES = os.environ.get(
    "SCALE_QUERIES",
    "q190_kcore,q86_pagerank,q165_shortest_paths,"
    "dedup_clusters_starcontraction,stream_semantic_dedup_e2e",
).split(",")

_KEYED = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
}

# Key domains must shift together across tables (FK integrity).
_DOMAIN = {
    "l_orderkey": "orderkey", "o_orderkey": "orderkey",
    "l_partkey": "partkey",
    "l_suppkey": "suppkey", "s_suppkey": "suppkey",
    "o_custkey": "custkey", "c_custkey": "custkey",
}


def build(out: str) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)

    # one shift unit per key domain: max over every column in the domain
    shift: dict[str, int] = {}
    tables: dict[str, pa.Table] = {}
    for name, keys in _KEYED.items():
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        tables[name] = t
        for k in keys:
            dom = _DOMAIN[k]
            mx = pc.max(t[k]).as_py() or 0
            shift[dom] = max(shift.get(dom, 0), mx + 1)

    def copies(t: pa.Table, keys: list[str], factor: int, mutate=None):
        for c in range(factor):
            cols = {}
            for fld in t.column_names:
                col = t[fld]
                if fld in keys and c > 0:
                    col = pc.add(col, c * shift[_DOMAIN[fld]])
                cols[fld] = col
            ct = pa.table(cols)
            yield mutate(ct, c) if mutate else ct

    def write_dir(name: str, parts) -> int:
        d = os.path.join(out, f"{name}.parquet")
        os.makedirs(d)
        n = 0
        for i, part in enumerate(parts):
            pq.write_table(part, os.path.join(d, f"part-{i:03d}.parquet"))
            n += part.num_rows
        return n

    for name, keys in _KEYED.items():
        n = write_dir(name, copies(tables[name], keys, REL_FACTOR))
        print(f"{name}: {n} rows x1 -> {REL_FACTOR} copies")

    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    dmax = __import__("pyarrow.compute", fromlist=["max"]).max(docs["doc_id"]).as_py() + 1

    def salt_doc(t: pa.Table, c: int) -> pa.Table:
        if c == 0:
            return t
        suffix = f" sc{c}"
        cols = {f: t[f] for f in t.column_names}
        cols["doc_id"] = pc.add(t["doc_id"], c * dmax)
        cols["text"] = pc.binary_join_element_wise(
            pc.cast(t["text"], pa.string()), suffix, ""
        )
        cols["n_chars"] = pc.add(t["n_chars"], len(suffix))
        return pa.table(cols)

    n = write_dir("documents", (salt_doc(docs, c) for c in range(REL_FACTOR)))
    print(f"documents: {n} rows ({REL_FACTOR} salted copies)")

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vmax = pc.max(emb["vec_id"]).as_py() + 1

    def shift_emb(t: pa.Table, c: int) -> pa.Table:
        if c == 0:
            return t
        cols = {f: t[f] for f in t.column_names}
        cols["vec_id"] = pc.add(t["vec_id"], c * vmax)
        return pa.table(cols)

    n = write_dir("embeddings", (shift_emb(emb, c) for c in range(EMB_FACTOR)))
    print(f"embeddings: {n} rows ({EMB_FACTOR} copies)")

    for name in ("region", "nation", "part", "events"):
        shutil.copy(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(out, f"{name}.parquet"),
        )
    print("verbatim: region nation part events")


def run(out: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from spark_stream_kudu_spark.registry import get
    from spark_stream_kudu_spark.session import get_spark

    spark = get_spark()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    res = {}
    for name in QUERIES:
        spec = get(name)
        if spec.prepare is not None:
            spec.prepare(spark, out)
        times = []
        for rep in range(3):  # rep 0 is the warm-up
            spark.sparkContext.setJobDescription(f"scale:{name}:{rep}")
            t0 = time.monotonic()
            spec.builder(spark, out).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.monotonic() - t0, 3))
        res[name] = {"warm": times[0], "timed": times[1:], "min": min(times[1:])}
        print(f"{name} cpus={cpus}: {times}", flush=True)
    print("SCALEJSON " + json.dumps({"cpus": int(cpus), "results": res}))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    out = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    if cmd == "build":
        build(out)
    else:
        run(out)
