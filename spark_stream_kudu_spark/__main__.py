"""Command-line entry point: list, inspect, and run registry queries.

A user of the reference repo runs one hard-coded pipeline; a user of
this engine gets the whole declared surface from a shell:

    python -m spark_stream_kudu_spark list [--category dedup]
    python -m spark_stream_kudu_spark show q01_pricing_summary
    python -m spark_stream_kudu_spark run q01_pricing_summary \
        [--sf-dir /root/testdata/sf0.01] [--limit 20] [--explain]
    python -m spark_stream_kudu_spark catalog > QUERIES.md

`run` builds the query through the same builder the correctness gate
uses; `--explain` prints the formatted physical plan instead of rows
(the .explain("formatted") loop SURVEY.md prescribes per operator).
"""

from __future__ import annotations

import argparse
import os
import sys


def _load():
    from spark_stream_kudu_spark.registry import load_all

    return load_all()


def cmd_list(args) -> int:
    specs = _load()
    rows = [
        (s.category, name)
        for name, s in sorted(specs.items())
        if args.category in (None, s.category)
    ]
    for cat, name in sorted(rows):
        print(f"{cat:12s} {name}")
    print(f"-- {len(rows)} queries", file=sys.stderr)
    return 0


def cmd_show(args) -> int:
    spec = _load()[args.name]
    print(f"name:        {spec.name}")
    print(f"category:    {spec.category}")
    print(f"bench:       {spec.bench}")
    print(f"description: {spec.description}")
    print("oracle:")
    print(spec.oracle if spec.oracle else "  (none)")
    return 0


def cmd_run(args) -> int:
    from spark_stream_kudu_spark.session import get_spark

    spec = _load()[args.name]
    spark = get_spark()
    if spec.prepare is not None:
        spec.prepare(spark, args.sf_dir)
    df = spec.builder(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    return 0


def cmd_catalog(args) -> int:
    specs = _load()
    print("# QUERIES — the declared query catalog")
    print()
    print(
        "Auto-generated (`python -m spark_stream_kudu_spark catalog`): "
        "every registered query, grouped by category. Every entry has a "
        "DuckDB oracle and is hash-checked by the correctness gate."
    )
    by_cat: dict[str, list] = {}
    for name, s in specs.items():
        by_cat.setdefault(s.category, []).append(s)
    for cat in sorted(by_cat):
        print(f"\n## {cat} ({len(by_cat[cat])})\n")
        print("| Query | Description |")
        print("|---|---|")
        for s in sorted(by_cat[cat], key=lambda x: x.name):
            desc = " ".join(s.description.split())
            print(f"| `{s.name}` | {desc} |")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="spark_stream_kudu_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("--category", default=None)
    lp.set_defaults(fn=cmd_list)

    sp = sub.add_parser("show", help="show one query's contract")
    sp.add_argument("name")
    sp.set_defaults(fn=cmd_show)

    rp = sub.add_parser("run", help="run one query")
    rp.add_argument("name")
    rp.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
    )
    rp.add_argument("--limit", type=int, default=20)
    rp.add_argument("--explain", action="store_true")
    rp.set_defaults(fn=cmd_run)

    cp = sub.add_parser("catalog", help="emit the markdown query catalog")
    cp.set_defaults(fn=cmd_catalog)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
