"""Operator library (SURVEY.md §2 inventory, re-expressed Spark-first).

Every operator is a pure DataFrame → DataFrame transformation built
from pyspark.sql.functions / Window — Catalyst owns the physical plan
(join strategy, pushdown, AQE). Python appears only where Spark lacks
the primitive: sequential hash-chain assignment (operators.chain) and
pluggable embedders (functions.embedding).
"""
