from .app import CountsProvider, RecommenderState, make_server

__all__ = ["CountsProvider", "RecommenderState", "make_server"]
