from .pipelines import (
    demo_latest_topk,
    feedback_age_bins,
    sessionized_counts,
    sliding_counts,
    stream_dedup_counts,
    streaming_group_counts,
    tumbling_counts,
)
from .metrics import TriggerMetricsListener
from .sinks import foreach_batch_json_snapshot

__all__ = [
    "demo_latest_topk",
    "feedback_age_bins",
    "sessionized_counts",
    "sliding_counts",
    "stream_dedup_counts",
    "streaming_group_counts",
    "tumbling_counts",
    "TriggerMetricsListener",
    "foreach_batch_json_snapshot",
]
