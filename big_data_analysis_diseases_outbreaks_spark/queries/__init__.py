"""Named-query registry — the driver-facing surface.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) is exposed as a named query: a callable
``(spark, sf_dir) -> DataFrame`` with, where SQL-expressible, a DuckDB
oracle SQL twin producing identical column names and values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, None → rows-only check


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _REGISTRY[name] = Query(name, fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect populates the registry.
    from . import (  # noqa: F401
        embeddings,
        ml,
        multimodal,
        relational,
        streaming,
        text,
        tpch,
        trends,
    )

    return dict(_REGISTRY)
