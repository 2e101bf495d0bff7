"""Named query registry — the driver-contract surface.

Every operator from SURVEY §2 (and the §2.10 / north-star extensions)
is registered here as a named query: a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus, where SQL-expressible, a DuckDB
oracle SQL string computing the identical result (same column names,
same rounding) for the driver's differential check.
"""

from .core import all_queries, get, oracle_map, query_map
from . import relational  # noqa: F401  (registration side effects)
from . import timeseries  # noqa: F401
from . import textplans  # noqa: F401
from . import vectorplans  # noqa: F401
from . import streamplans  # noqa: F401
from . import mediaplans  # noqa: F401
from . import sampleplans  # noqa: F401
from . import behavioral  # noqa: F401
from . import layoutplans  # noqa: F401
from . import graphplans  # noqa: F401
from . import jdbcplans  # noqa: F401
from . import sourceplans  # noqa: F401
from . import pipelineplans  # noqa: F401

__all__ = ["all_queries", "get", "oracle_map", "query_map"]
