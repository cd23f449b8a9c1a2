"""golem:vector WIT host imports (reference crates/mnemo-golem-host).

The reference supplies three host imports — host-upsert, host-search,
host-delete (lib.rs:93-109 MnemoGolemProvider) — backed by a real
engine, mapping the golem:vector `collection` to mnemo's agent_id
namespace (lib.rs:111-115). The wasmtime Linker wiring is runtime
transport (out of scope, SURVEY §3.3); the provider SEMANTICS are
engine behavior and live here.

One place the Spark engine is strictly stronger than the reference's
vertical slice: upstream `search_vectors` cannot pass the caller's
precomputed query vector through RecallRequest (it embeds a sentinel
string instead — lib.rs:168-178 documents the gap as a future row);
`topk_cosine` takes query VECTORS natively, so the WIT contract
(search by the vector you stored) holds exactly.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mnemo_spark.operators.upsert import merge_upsert
from mnemo_spark.operators.vector import topk_cosine

_SCHEMA = (
    "collection string, vec_id string, embedding array<float>, version long"
)


class MnemoGolemHost:
    """Provider-shaped verb surface (lib.rs:93-109). State is one
    (collection, vec_id, embedding) DataFrame; upserts are the shared
    LWW merge; search is the vectorized exact top-k scoped to the
    collection (a filter that prunes at the scan when the store is
    persisted partitioned by collection)."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._df = spark.createDataFrame([], _SCHEMA)
        self._clock = 0

    def upsert_vector(self, collection: str, vec_id: str, vector: list[float]) -> None:
        if not vector:
            raise ValueError("Invalid: empty vector")
        self._clock += 1
        row = self._spark.createDataFrame(
            [(collection, vec_id, [float(x) for x in vector], self._clock)], _SCHEMA
        )
        self._df = merge_upsert(self._df, row, ["collection", "vec_id"], "version")

    def search_vectors(
        self, collection: str, query: list[float], limit: int = 10
    ) -> list[tuple[str, float]]:
        if not query:
            raise ValueError("Invalid: empty query")
        corpus = self._df.filter(F.col("collection") == collection)
        queries = self._spark.createDataFrame(
            [("q", [float(x) for x in query])],
            "query_id string, query_vec array<float>",
        )
        hits = topk_cosine(corpus, queries, k=limit).orderBy("rank")
        return [(r["vec_id"], float(r["cos_sim"])) for r in hits.collect()]

    def delete_vectors(self, collection: str, ids: list[str]) -> int:
        hit = (F.col("collection") == collection) & F.col("vec_id").isin(ids)
        n = self._df.filter(hit).count()
        self._df = self._df.filter(~hit)
        return n
