"""Driver-contract simulator: run catalog queries AND their DuckDB
oracles side-by-side on any parquet directory, compare canonicalized
multisets (the driver's sorted-columns value-hash compare), and print a
per-query MATCH/MISMATCH line plus a JSON summary.

Usage:
    python tools/driver_sim.py [--sf-dir DIR] [--queries q01,s26,...]
                               [--out FILE]

With no --queries it sweeps the FULL registry (oracle-paired entries get
the hash compare; rows_only entries get the rows>0 check, mirroring the
driver). The harness is the committed form of the r5-r11 ad-hoc sweep
scripts (SCALING.md's drift_sweep family) so future rounds rerun it
instead of rewriting it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    import pandas as pd  # noqa: F401

    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True).astype(str)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--queries", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import duckdb

    from modelorecomendacion_analisisspark_streaming_mas_spark.plans import REGISTRY
    from modelorecomendacion_analisisspark_streaming_mas_spark.session import get_spark

    spark = get_spark(app_name="mras-driver-sim")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    names = (
        [n.strip() for n in args.queries.split(",") if n.strip()]
        if args.queries
        else list(REGISTRY)
    )
    # allow bare prefixes like "q01" for full names like "q01_pricing_summary"
    resolved = []
    for n in names:
        if n in REGISTRY:
            resolved.append(n)
        else:
            hits = [k for k in REGISTRY if k.startswith(n)]
            assert len(hits) == 1, f"ambiguous or unknown query {n!r}: {hits}"
            resolved.append(hits[0])

    results: dict[str, dict] = {}
    n_match = n_rows_only = n_bad = 0
    for name in resolved:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            sdf = q.fn(spark, args.sf_dir).toPandas()
            if q.oracle:
                odf = con.execute(q.oracle).fetchdf()
                a, b = canon(sdf), canon(odf)
                ok = sorted(sdf.columns) == sorted(odf.columns) and a.equals(b)
                status = "MATCH" if ok else "MISMATCH"
            else:
                ok = len(sdf) > 0
                status = "ROWS_ONLY" if ok else "ROWS_ONLY_EMPTY"
        except Exception as e:  # noqa: BLE001 -- sweep must report, not die
            ok, status = False, f"ERROR: {type(e).__name__}: {e}"
        wall = round(time.perf_counter() - t0, 2)
        results[name] = {"status": status.split(":")[0], "sec": wall}
        if status == "MATCH":
            n_match += 1
        elif status == "ROWS_ONLY":
            n_rows_only += 1
        else:
            n_bad += 1
        print(f"  {name}: {status} ({wall}s)", flush=True)

    summary = {
        "sf_dir": args.sf_dir,
        "n": len(resolved),
        "match": n_match,
        "rows_only": n_rows_only,
        "bad": n_bad,
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "results": results}, f, indent=1)
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
