"""Vector similarity as pure Column expressions (reference F7).

The reference computes cosine via USearch HNSW
(crates/mnemo-core/src/index/usearch.rs:22, metric cosine, f32) and
pgvector `vector_cosine_ops`. Here similarity is a JVM-side
higher-order-function expression over array<float> columns — no UDF,
no sidecar index; Catalyst/Tungsten codegens the fold.

Precision contract with the DuckDB oracle: cast to double BEFORE any
arithmetic, accumulate left-to-right (both Spark's `aggregate` and
DuckDB's `list_dot_product` fold in element order), round only at the
output edge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(c: Column) -> Column:
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero-norm vectors."""
    d = dot(a, b)
    n = norm(a) * norm(b)
    return F.when(n > 0, d / n)


def squared_l2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
