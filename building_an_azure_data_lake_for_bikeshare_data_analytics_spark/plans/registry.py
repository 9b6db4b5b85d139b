"""Aggregated query registry: importing this module registers every plan
module's queries into ``REGISTRY`` and exposes the driver-contract dicts."""

from __future__ import annotations

from .base import REGISTRY, QuerySpec, QueryFn  # noqa: F401
from . import core  # noqa: F401  (registers q01-q30)
from . import extensions  # noqa: F401  (registers q31-q41)
from . import analytics_ext  # noqa: F401  (registers q42-q52)
from . import sql_entry  # noqa: F401  (registers q57-q58)
from . import training  # noqa: F401  (registers q71-q84)
from . import quality  # noqa: F401  (registers q85-q97)

#: name -> (spark, sf_dir) -> DataFrame
QUERIES: dict[str, QueryFn] = {name: spec.fn for name, spec in REGISTRY.items()}

#: name -> DuckDB oracle SQL (only for SQL-expressible queries)
ORACLES: dict[str, str] = {
    name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
}
