"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship BM25 match query end-to-end (index build
over sf0.001 + search).  ``queries``/``oracle_sql`` expose one entry
per implemented operator from SURVEY.md §2 plus the training-data ops;
implementations live in ``rusticsearch_spark.driver_queries``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 match query through the full engine (analyzer →
    posting-list index → WAND/top-k scoring) on sf0.001."""
    from rusticsearch_spark.driver_queries import get_engine
    eng = get_engine(spark, "/root/testdata/sf0.001")
    return eng.search({"match": {"text": "key value data"}}, size=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rusticsearch_spark.driver_queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from rusticsearch_spark.driver_queries import ORACLES
    return dict(ORACLES)
