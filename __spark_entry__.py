"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pricing-summary query (scan → filter →
multi-agg groupBy → sort, the reference's dominant shape) at sf0.001.
``queries``/``oracle_sql`` expose the full registry from
``big_data_occupancy_detection_spark.plans`` — every implemented operator
from SURVEY.md §2 plus the scale extension operators, each paired with a
DuckDB oracle where ANSI-SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_occupancy_detection_spark.plans import oracle_sql_map, queries_map


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from big_data_occupancy_detection_spark.plans.relational import pricing_summary

    return pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
