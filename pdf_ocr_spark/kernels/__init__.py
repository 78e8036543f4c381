"""Pure-Python compute kernels. No Spark imports allowed in this package:
every kernel must run identically as plain Python/pandas so tests can
assert kernel(doc_bytes) == spark_pipeline_row(url) (local-vs-Spark
equivalence, SURVEY.md §5.3).
"""
