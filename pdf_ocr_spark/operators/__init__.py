"""Reusable DataFrame operators beyond the extraction pipeline: dedup,
similarity search, text analysis, multimodal plumbing.  All built on
pyspark.sql built-ins (JVM-side, whole-stage-codegen) — UDFs only where
Spark genuinely cannot express the semantics.
"""
