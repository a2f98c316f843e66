"""Row-level engine-vs-oracle diff for catalog entries: prints the rows
each side has that the other lacks (multiset difference, canonicalized
like tools/driver_sim.py). The root-cause companion to driver_sim's
MATCH/MISMATCH verdicts.

    python tools/diff_query.py --sf-dir /tmp/v14_nullkeys_sf0001 --queries q78,q86 [--max-rows 10]
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import Counter

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def rows_multiset(df) -> Counter:
    df = df[sorted(df.columns)]
    return Counter(tuple(str(v) for v in row) for row in df.itertuples(index=False))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--max-rows", type=int, default=10)
    args = ap.parse_args()

    import duckdb

    from modelorecomendacion_analisisspark_streaming_mas_spark.plans import REGISTRY
    from modelorecomendacion_analisisspark_streaming_mas_spark.session import get_spark

    spark = get_spark(app_name="mras-diff")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    for n in [x.strip() for x in args.queries.split(",") if x.strip()]:
        hits = [k for k in REGISTRY if k == n or k.startswith(n)]
        assert len(hits) == 1, f"ambiguous or unknown {n!r}: {hits}"
        name = hits[0]
        q = REGISTRY[name]
        print(f"== {name} ==", flush=True)
        try:
            sdf = q.fn(spark, args.sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"  ENGINE ERROR: {type(e).__name__}: {str(e)[:500]}")
            continue
        if not q.oracle:
            print(f"  rows_only entry: engine rows={len(sdf)}")
            continue
        try:
            odf = con.execute(q.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"  ORACLE ERROR: {type(e).__name__}: {str(e)[:500]}")
            continue
        cols_s, cols_o = sorted(sdf.columns), sorted(odf.columns)
        if cols_s != cols_o:
            print(f"  SCHEMA: engine={cols_s} oracle={cols_o}")
            continue
        ms, mo = rows_multiset(sdf), rows_multiset(odf)
        only_s, only_o = ms - mo, mo - ms
        print(f"  engine rows={len(sdf)} oracle rows={len(odf)} "
              f"engine-only={sum(only_s.values())} oracle-only={sum(only_o.values())}")
        print(f"  columns: {cols_s}")
        for label, diff in (("ENGINE-ONLY", only_s), ("ORACLE-ONLY", only_o)):
            for i, (row, cnt) in enumerate(sorted(diff.items())):
                if i >= args.max_rows:
                    print(f"  ... {label}: {sum(diff.values()) - args.max_rows} more")
                    break
                print(f"  {label} x{cnt}: {row}")


if __name__ == "__main__":
    main()
