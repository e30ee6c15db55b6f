"""Oracle-verified query registry — the driver contract.

Every operator claimed in SURVEY.md §2B registers here as a named query:
a PySpark builder ``fn(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) an equivalent DuckDB SQL string the
driver runs side-by-side at sf0.01. Computed columns are aliased to the
SAME name on both sides — the comparator sorts columns by name before
hashing values.

Registration is import-driven: importing this package pulls in every
query module, so ``__spark_entry__.queries()`` is just ``spark_fns()``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver runs rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Register a query builder under ``name`` with an optional oracle."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def spark_fns() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sqls() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}


# Import-for-side-effect: each module registers its queries.
from . import relational  # noqa: E402,F401
from . import window  # noqa: E402,F401
from . import scalar_funcs  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import epipe  # noqa: E402,F401
from . import streaming_q  # noqa: E402,F401
from . import udf_surface  # noqa: E402,F401
from . import sources_q  # noqa: E402,F401
