"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TPC-H-Q1-shape query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2B;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible query (same column aliases on both sides).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_hadoop_framework_for_peptide_identification_spark.queries import (  # noqa: E402
    oracle_sqls,
    spark_fns,
)
from apache_hadoop_framework_for_peptide_identification_spark.queries.relational import (  # noqa: E402
    q01_scan_filter_agg,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q01_scan_filter_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return spark_fns()


def oracle_sql() -> dict[str, str]:
    return oracle_sqls()
