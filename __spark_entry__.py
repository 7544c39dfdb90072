"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship anomaly query on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as a
named (spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB twin for each SQL-expressible query (same column names/values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_analysis_diseases_outbreaks_spark.plans.anomaly import anomaly_query
from big_data_analysis_diseases_outbreaks_spark.queries import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return anomaly_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
