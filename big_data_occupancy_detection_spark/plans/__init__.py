from .registry import REGISTRY, QuerySpec, oracle_sql_map, queries_map, register

# Importing the plan modules populates the registry.
from . import relational as _relational  # noqa: E402,F401
from . import events as _events  # noqa: E402,F401
from . import textops as _textops  # noqa: E402,F401
from . import mlplans as _mlplans  # noqa: E402,F401
from . import temporal as _temporal  # noqa: E402,F401
from . import tpch_extra as _tpch_extra  # noqa: E402,F401
from . import functions_surface as _functions_surface  # noqa: E402,F401
from . import curation as _curation  # noqa: E402,F401
from . import analytics as _analytics  # noqa: E402,F401
from . import bi as _bi  # noqa: E402,F401
from . import warehouse as _warehouse  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register", "queries_map", "oracle_sql_map"]
