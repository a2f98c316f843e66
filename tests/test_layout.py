"""Storage-layout tests: the clustered write must actually produce
prunable statistics (the whole point), and the filter must reach the
scan."""

from __future__ import annotations

import datetime

import pyarrow.parquet as pq

from modelorecomendacion_analisisspark_streaming_mas_spark.plans import REGISTRY
from modelorecomendacion_analisisspark_streaming_mas_spark.plans.layout import (
    clustered_lineitem_dir,
)

_LO = datetime.datetime(1996, 1, 1)
_HI = datetime.datetime(1996, 4, 1)


def _row_group_envelopes(path: str):
    """(min, max) of l_shipdate for every row group of every data file
    (accepts a single parquet file or a directory of part files)."""
    import glob
    import os

    files = [path] if os.path.isfile(path) else glob.glob(os.path.join(path, "*.parquet"))
    envs = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index("l_shipdate")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max
            envs.append((st.min, st.max))
    return envs


def test_clustered_row_groups_prune(spark, sf_dir):
    """After the range-partitioned sorted write, the 1996Q1 window must
    overlap only a small fraction of row-group envelopes -- the scan
    skips the rest from footer statistics alone. The original unsorted
    table is the control: every row group overlaps (no skipping
    possible)."""
    d = clustered_lineitem_dir(spark, sf_dir)
    envs = _row_group_envelopes(d)
    assert len(envs) >= 8  # one file per range partition, >=1 row group each
    overlapping = [e for e in envs if e[0] < _HI and e[1] >= _LO]
    frac = len(overlapping) / len(envs)
    # 1996Q1 is ~3.6% of the 1995-2001 span; disjoint sorted ranges keep
    # the overlap near that. <=25% is a loose bound that still proves
    # real pruning.
    assert frac <= 0.25, f"clustered layout not prunable: {frac:.0%} overlap"

    control = _row_group_envelopes(f"{sf_dir.rstrip('/')}/lineitem.parquet")
    c_frac = len([e for e in control if e[0] < _HI and e[1] >= _LO]) / len(control)
    assert c_frac == 1.0, "control layout unexpectedly clustered"


def test_clustered_scan_pushes_filter(spark, sf_dir):
    plan = (
        REGISTRY["q50_clustered_scan_pruning"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan
