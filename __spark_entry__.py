"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``jassjr_spark/`` (a PySpark-native inverted-index
build + BM25 search engine with the capabilities of andrewtrotman/JASSjr,
plus training-data pipeline operators: dedup, similarity search, text
analysis, event-time windows/sessions). EVERY ``queries()`` entry except
one has a DuckDB oracle in ``oracle_sql()`` — including SAAT (integer
micro-unit quantization), LSH (md5-derived plane literals inlined into
the SQL), SimHash, the session windows (gap-island SQL), and MMR (k-step
unrolled greedy CTE). The one exception is ``text_bpe_merges`` (an
iterative corpus-global argmax with no tractable SQL form — pytest-gated
instead, see functions/bpe.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jassjr_spark import driver_queries as dq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batch BM25 disjunctive top-10 over sf0.001 documents."""
    return dq.q_ft_bm25_top10(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in dq.catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in dq.catalog().items() if sql is not None
    }
