from .topk import global_rank, grouped_top_k, top_k

__all__ = ["global_rank", "grouped_top_k", "top_k"]
