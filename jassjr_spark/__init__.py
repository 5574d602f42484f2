"""jassjr_spark — a PySpark-native inverted-index build + BM25 search engine.

Brand-new engine with the query/data-processing capabilities of
andrewtrotman/JASSjr (the SIGIR-2020 "JASSjr: Minimalistic BM25 Search
Engine" teaching reference), re-expressed Spark-first:

* index build = one batch DataFrame job (Arrow `mapInPandas` tokenizer with
  in-batch per-document tf pre-aggregation, i.e. map-side combine),
* the inverted file = term-bucketed, term-sorted Parquet tables,
* BM25 query evaluation = a broadcast semi-join of the query terms against
  the postings store + pure-Column scoring (whole-stage codegen), with a
  deterministic ordered float fold so scores reproduce the reference
  bit-for-bit at 4 decimals.

Reference semantics are documented per-operator in SURVEY.md §2 with
file:line citations into /root/reference (JASSjr_index.py, JASSjr_search.py,
JASSjr_index.cpp, JASSjr_search.cpp).
"""

from jassjr_spark.constants import B, K1, RUN_NAME, TOKEN_RE, TOP_K

__all__ = ["K1", "B", "TOP_K", "RUN_NAME", "TOKEN_RE"]
