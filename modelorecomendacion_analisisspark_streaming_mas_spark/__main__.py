"""Command-line entry point: run any catalog query by name.

    python -m modelorecomendacion_analisisspark_streaming_mas_spark list [PREFIX]
    python -m modelorecomendacion_analisisspark_streaming_mas_spark run QUERY \
        [--sf-dir DIR] [--limit N] [--explain] [--verify]

`run --verify` executes the query's DuckDB oracle side by side and
compares (sorted columns, sorted rows, rendered values) -- the same
contract as the grading driver, available to any user from the shell.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.001"
_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df):
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True).astype(str)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog=__package__)
    sub = p.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list", help="list catalog queries")
    p_list.add_argument("prefix", nargs="?", default="", help="name prefix filter")
    p_run = sub.add_parser("run", help="run one catalog query")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_run.add_argument("--limit", type=int, default=20, help="rows to show")
    p_run.add_argument("--explain", action="store_true", help="print the physical plan")
    p_run.add_argument(
        "--verify", action="store_true",
        help="also run the DuckDB oracle and compare (driver contract)",
    )
    args = p.parse_args(argv)

    from .plans import REGISTRY

    if args.cmd == "list":
        for name, q in REGISTRY.items():
            if name.startswith(args.prefix):
                mark = "oracle" if q.oracle else "rows-only"
                print(f"{name:40s} [{mark}] {q.doc or ''}")
        return 0

    q = REGISTRY.get(args.query)
    if q is None:
        near = [n for n in REGISTRY if args.query in n]
        print(f"unknown query {args.query!r}" + (f"; did you mean {near}?" if near else ""))
        return 2
    from .session import get_spark

    spark = get_spark(app_name=f"mras-cli-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = q.fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    pdf = df.toPandas()
    print(pdf.head(args.limit).to_string(index=False))
    print(f"[{len(pdf)} rows]")
    if args.verify:
        if q.oracle is None:
            print("verify: rows-only query (no oracle); skipped")
            return 0
        import duckdb

        con = duckdb.connect()
        for t in _TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
            )
        odf = con.execute(q.oracle).df()
        ok = _canon(pdf).equals(_canon(odf))
        print(f"verify: {'MATCH' if ok else 'MISMATCH'} ({len(pdf)} vs {len(odf)} rows)")
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
