from .etl import (
    bucketize,
    epoch_to_ddmmyyyy,
    extract_year_from_title,
    map_lookup,
    range_lookup_join,
    split_to_array,
    strip_title_year,
    ts_to_ddmmyyyy,
    when_chain,
)

__all__ = [
    "bucketize",
    "epoch_to_ddmmyyyy",
    "extract_year_from_title",
    "map_lookup",
    "range_lookup_join",
    "split_to_array",
    "strip_title_year",
    "ts_to_ddmmyyyy",
    "when_chain",
]
