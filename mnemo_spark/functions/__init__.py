"""Scalar / higher-order column function library (SURVEY.md §2.6).

Everything here is a pure Column expression built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, no Python
in the hot path. Each function is written so an exactly-equivalent
DuckDB SQL expression exists (the correctness oracle); the SQL twins
live in ``mnemo_spark.oracle``.
"""
