from .catalog import REGISTRY, Query, oracle_map, query_map, register

# Importing the modules populates REGISTRY via their @register decorators.
from . import batch  # noqa: E402,F401
from . import batch2  # noqa: E402,F401
from . import batch3  # noqa: E402,F401
from . import batch4  # noqa: E402,F401
from . import graphq  # noqa: E402,F401
from . import mlq  # noqa: E402,F401
from . import streamq  # noqa: E402,F401
from . import northstar2  # noqa: E402,F401
from . import textops  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "register", "query_map", "oracle_map"]
