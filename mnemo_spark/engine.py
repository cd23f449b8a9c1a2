"""MnemoSparkEngine — the reference's verb surface (SURVEY §2.9,
query/mod.rs:268-478) as batch DataFrame programs over one memories
table.

Design stance (SURVEY §7): ONE store, no sidecar indexes; BM25 and
cosine are computed relationally per recall batch; every verb is a
pure DataFrame transformation returning a new memories DataFrame (or
a result DataFrame), so the engine composes with Delta/Parquet
persistence at any scale — the tests run it on in-memory frames, a
cluster runs the same code against partitioned tables.

Verb → reference mapping:
  remember_batch   remember.rs:67-270   (validate, hash, embed, TTL,
                                         chain assignment W7)
  recall           recall.rs:332-737    (P1 filters, lanes, RRF A1,
                                         top-k W1; strategies exact/
                                         lexical/semantic/hybrid)
  forget           forget.rs:14-120     (soft/hard/archive/redact —
                                         redact preserves hashes)
  share / visible_to  share.rs, J1      (ACL left-semi visibility)
  verify_integrity hash.rs:41-102, A9   (recompute chain, report
                                         first break per agent)
  run_ttl_sweep    lifecycle.rs:403-553
  run_decay_pass   lifecycle.rs:108-155

Reads have NO side effects here (the reference's touch/audit writes
during recall become explicit follow-up jobs — SURVEY §7 "reads with
side effects are anti-functional").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from mnemo_spark.functions.embedder import token_bucket
from mnemo_spark.functions.text import tokens
from mnemo_spark.io import local_frame, localize_small
from mnemo_spark.operators.bm25 import bm25_score
from mnemo_spark.operators.chain import (
    assign_chain,
    assign_chain_auto,
    verify_chain,
)
from mnemo_spark.operators.rrf import rrf_fuse
from mnemo_spark.operators.window_ops import top_k_ranked

AGENT_ID_RE = r"^[A-Za-z0-9._-]{1,256}$"  # P7, query/mod.rs:42-61

MEMORY_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("agent_id", StringType(), False),
        StructField("content", StringType(), True),
        StructField("memory_type", StringType(), True),  # episodic|semantic|procedural|working
        StructField("scope", StringType(), True),  # private|shared|public|global
        StructField("importance", FloatType(), True),
        StructField("tags", ArrayType(StringType()), True),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("content_hash", StringType(), True),
        StructField("prev_hash", StringType(), True),
        StructField("chain_hash", StringType(), True),
        # per-agent insertion sequence: the chain walks (created_at,
        # chain_seq) — the reference's ORDER BY created_at with
        # insertion-stable ties (duckdb.rs:689), made explicit so the
        # distributed recompute has the same total order
        StructField("chain_seq", LongType(), True),
        StructField("consolidation_state", StringType(), True),
        StructField("metadata", StringType(), True),  # JSON string (plan payloads etc.)
        StructField("access_count", LongType(), True),
        StructField("created_at", TimestampType(), True),
        StructField("expires_at", TimestampType(), True),
        StructField("deleted_at", TimestampType(), True),
        StructField("quarantined", StringType(), True),
    ]
)

ACL_SCHEMA = StructType(
    [
        StructField("memory_id", StringType(), False),
        StructField("principal_id", StringType(), False),
        StructField("permission", StringType(), True),
        StructField("expires_at", TimestampType(), True),
    ]
)

AUDIT_SCHEMA = StructType(
    [
        StructField("event_id", StringType(), False),
        StructField("agent_id", StringType(), False),
        StructField("event_type", StringType(), False),  # MemoryWrite|MemoryDelete|MemoryRedact|MemoryExpired
        StructField("memory_id", StringType(), True),
        StructField("ts", TimestampType(), True),
        # T6: per-agent monotone sequence (reference AgentEvent.
        # logical_clock) — the CHAIN order. Wall-clock ts alone cannot
        # order the chain: two verbs appended in separate batches at
        # the same ts would verify in (ts, event_id) order, not append
        # order, and report a spurious break.
        StructField("logical_clock", LongType(), True),
        StructField("content_hash", StringType(), True),
        StructField("prev_hash", StringType(), True),
        StructField("chain_hash", StringType(), True),
    ]
)

_TYPES = ("episodic", "semantic", "procedural", "working")
_SCOPES = ("private", "shared", "public", "global")
# P5 experience tier (query/experience.rs) — reserved tag + thresholds
EXPERIENCE_PLAN_TAG = "__experience_plan__"
PLAN_SIMILARITY_THRESHOLD = 0.7  # experience.rs:57
PLAN_SUCCESS_THRESHOLD = 0.5  # experience.rs:60
WORKING_TTL_HOURS = 1  # T3, remember.rs:116-124
PROCEDURAL_IMPORTANCE_FLOOR = 0.8  # memory.rs:157-173
RECALL_LANE_OVERFETCH = 3  # recall.rs:397: each lane feeds its top
# limit*3 into fusion — the reference's default; AUTO_LANE_LIMIT
# resolves to k * this. Pass lane_limit=None for full-lane fusion
# (the opt-in exactness mode).
AUTO_LANE_LIMIT = object()  # sentinel: "use the reference default"


class MnemoSparkEngine:
    """Batch engine over a memories DataFrame (+ optional ACL frame)."""

    def __init__(
        self,
        spark: SparkSession,
        memories: DataFrame | None = None,
        acls: DataFrame | None = None,
        embedding_dim: int = 256,
        events: DataFrame | None = None,
        embedder=None,
    ):
        self.spark = spark
        # U1: pluggable provider; default is the deterministic hash-bag
        # stand-in (the reference's own offline fallback). Configure
        # NoopEmbedder to reproduce the reference's unconfigured state,
        # where semantic recall refuses to run (recall.rs:366-375).
        from mnemo_spark.functions.embed_batch import HashBagEmbedder

        self.embedder = embedder if embedder is not None else HashBagEmbedder(embedding_dim)
        # U1: a provider whose dimensionality disagrees with the engine
        # would silently produce unjoinable vectors — refuse at
        # construction, not at the first NULL-similarity recall
        edim = getattr(self.embedder, "dim", embedding_dim)
        if edim != embedding_dim:
            raise ValueError(
                f"embedder dim {edim} != engine embedding_dim {embedding_dim}"
            )
        self.memories = (
            memories
            if memories is not None
            else spark.createDataFrame([], MEMORY_SCHEMA)
        )
        self.acls = acls if acls is not None else spark.createDataFrame([], ACL_SCHEMA)
        # structural emptiness (r12): an engine constructed WITHOUT an
        # ACL frame provably has no grants, so visible_to skips the
        # grant branch at plan-build time. The empty default frame is
        # RDD-backed, so Catalyst cannot prove it empty itself and
        # would keep a semi-join + exchange + second store scan in
        # EVERY recall plan. share()/_clone(acls=...) clears the flag.
        self._acls_known_empty = acls is None
        self.dim = embedding_dim
        # T1: append-only hash-chained audit log, one row per verb
        self.events = (
            events if events is not None else spark.createDataFrame([], AUDIT_SCHEMA)
        )
        # structural emptiness for the state frames (r14, the acls
        # pattern applied to the write path): a FRESH engine provably
        # has no chain heads and no logical-clock base, so the first
        # remember_batch skips the head aggregation + broadcast guard
        # join over provably-empty frames — Catalyst cannot elide them
        # itself (the empty defaults are RDD-backed). The property
        # setters below conservatively clear the flags on ANY direct
        # assignment (`eng.memories = ...`, the queries_recall idiom);
        # the constructor re-asserts the provable value here, after
        # the setter ran.
        self._memories_known_empty = memories is None
        self._events_known_empty = events is None
        # guards the per-store ANN index memo (ADVICE r10): without it
        # two concurrent first routed queries each pay the full
        # codebook build (count, md5 sort, Lloyd passes, cell persist)
        import threading

        self._ann_lock = threading.Lock()

    @property
    def acls(self) -> DataFrame:
        return self._acls

    @acls.setter
    def acls(self, df: DataFrame) -> None:
        # ADVICE r12: a DIRECT assignment (`eng.acls = grants`, the
        # same mutation idiom the repo uses for eng.memories in
        # queries_recall) must never leave _acls_known_empty stale —
        # a stale True makes visible_to silently skip the grant branch
        # and hide granted memories. The setter conservatively assumes
        # grants may now exist; the constructor/_clone/_with paths
        # re-assert the provable flag immediately after it runs.
        self._acls = df
        self._acls_known_empty = False

    @property
    def memories(self) -> DataFrame:
        return self._memories

    @memories.setter
    def memories(self, df: DataFrame) -> None:
        # same contract as the acls setter: direct assignment must
        # never leave a stale known-empty flag (a stale True would
        # make remember_batch skip the chain-head handoff and restart
        # chains at genesis). The constructor re-asserts the provable
        # value after this runs.
        self._memories = df
        self._memories_known_empty = False

    @property
    def events(self) -> DataFrame:
        return self._events

    @events.setter
    def events(self, df: DataFrame) -> None:
        self._events = df
        self._events_known_empty = False

    def materialized(self) -> "MnemoSparkEngine":
        """Eagerly materialize the state frames and truncate their
        lineage (localCheckpoint) — the in-memory analog of a verb
        committing its output table to storage before the next verb
        reads it (DESIGN.md maps every verb output to a Delta write).

        A chain of verbs otherwise re-executes every upstream verb on
        each action, and Catalyst's analysis time grows super-linearly
        with the nested plan (measured: optimizedPlan() alone 0.5 s →
        15 s across five chained forget/sweep verbs; the five-verb
        event collect 85 s vs 0.04 s materialized). Long verb sequences
        (agent loops, test scenarios) call this at step boundaries to
        keep each action O(current verb). Results are identical —
        only physical lineage is cut; the known-empty flags carry
        because truncation preserves emptiness."""
        mem_empty = self._memories_known_empty
        ev_empty = self._events_known_empty
        out = self._clone(
            memories=self.memories.localCheckpoint(eager=True),
            events=self.events.localCheckpoint(eager=True),
        )
        out._memories_known_empty = mem_empty
        out._events_known_empty = ev_empty
        return out

    # -- write path (remember.rs:67-270) --------------------------------

    def remember_batch(
        self, rows: DataFrame, strict: bool = False
    ) -> "MnemoSparkEngine":
        """Validate → defaults → hash → chain → append.

        rows: (id, agent_id, content, memory_type, scope, importance,
        tags, created_at[, expires_at]). Invalid agent ids or enum
        values REJECT the whole batch (fail loud, like the reference's
        per-request validation).

        Deferred-failure contract: the backdated-write guard raises
        IN-PLAN (F.raise_error), so with strict=False this call
        returns successfully and the rejection surfaces on the first
        downstream action — a caller chaining further verbs before
        materializing sees the failure attributed to the later verb.
        strict=True runs an eager (one extra broadcast-join count)
        check so the ValueError raises here, at the cost of an
        immediate job.
        """
        # explicit NULL checks: every predicate below is NULL for NULL
        # inputs, which would silently EXCLUDE the row from `bad` — the
        # reference rejects invalid rows, so NULL required fields must
        # fail loud too
        bad_pred = (
            F.col("agent_id").isNull()
            | ~F.col("agent_id").rlike(AGENT_ID_RE)
            | F.col("memory_type").isNull()
            | ~F.col("memory_type").isin(*_TYPES)
            | F.col("scope").isNull()
            | ~F.col("scope").isin(*_SCOPES)
            | F.col("importance").isNull()
            | (F.col("importance") < 0)
            | (F.col("importance") > 1)
        )
        # ONE validation+routing job: the same agg that surfaces the
        # first invalid row also measures the largest incoming chain
        # and the created_at range, which assign_chain_auto consumes
        # below (VERDICT r9 #6) — keeping the write path at a single
        # decision action instead of validation + stats jobs.
        vstats = (
            rows.groupBy("agent_id")
            .agg(
                F.count("*").alias("_n"),
                F.sum(bad_pred.cast("long")).alias("_nbad"),
                F.min(F.when(bad_pred, F.struct(*rows.columns))).alias("_bad"),
                F.min("created_at").alias("_mn"),
                F.max("created_at").alias("_mx"),
                F.max(F.col("created_at").isNull().cast("int")).alias("_null"),
            )
            .agg(
                F.max("_n").alias("maxn"),
                F.sum("_nbad").alias("nbad"),
                F.min("_bad").alias("bad"),
                F.min("_mn").alias("gmin"),
                F.max("_mx").alias("gmax"),
                F.max("_null").alias("has_null"),
            )
            .collect()
        )
        vrow = vstats[0] if vstats else None
        if vrow is not None and (vrow["nbad"] or 0) > 0:
            raise ValueError(f"invalid memory row: {vrow['bad'].asDict()}")
        chain_stats = (
            (
                vrow["maxn"],
                vrow["gmin"],
                vrow["gmax"],
                bool(vrow["has_null"]),
            )
            if vrow is not None and vrow["maxn"] is not None
            else (0, None, None, True)
        )

        with_defaults = (
            rows.withColumn(
                # procedural floor (memory.rs:157-173)
                "importance",
                F.when(
                    (F.col("memory_type") == "procedural")
                    & (F.col("importance") < PROCEDURAL_IMPORTANCE_FLOOR),
                    F.lit(PROCEDURAL_IMPORTANCE_FLOOR),
                ).otherwise(F.col("importance")).cast("float"),
            )
            .withColumn(
                # working-tier auto-TTL (T3)
                "expires_at",
                F.coalesce(
                    F.col("expires_at") if "expires_at" in rows.columns else F.lit(None).cast("timestamp"),
                    F.when(
                        F.col("memory_type") == "working",
                        F.col("created_at") + F.expr(f"INTERVAL {WORKING_TTL_HOURS} HOUR"),
                    ),
                ),
            )
            .withColumn(
                # F1: sha256(content|agent|ts)
                "content_hash",
                F.sha2(
                    F.concat_ws(
                        "|", F.col("content"), F.col("agent_id"), F.col("created_at").cast("string")
                    ),
                    256,
                ),
            )
            .withColumn(
                "metadata",
                F.col("metadata") if "metadata" in rows.columns else F.lit(None).cast("string"),
            )
            .withColumn("consolidation_state", F.lit("active"))
            .withColumn("access_count", F.lit(0).cast("long"))
            .withColumn("deleted_at", F.lit(None).cast("timestamp"))
            .withColumn("quarantined", F.lit(None).cast("string"))
        )
        # U1: embeddings come from the CONFIGURED provider (ADVICE r2:
        # a non-default provider must not be silently ignored on write)
        with_defaults = self._with_embedding(with_defaults)
        # W7: per-agent chain assignment (sequential within agent,
        # parallel across agents). Cross-batch continuation: a second
        # same-agent batch must link its first row to the CURRENT
        # chain head (reference remember.rs get_latest_memory_hash),
        # not restart at genesis, and continue the per-agent insertion
        # sequence (chain_seq) past the stored maximum — the
        # reference's insertion-stable ORDER BY created_at
        # (duckdb.rs:689) made explicit, so the distributed recompute
        # in verify_integrity walks (created_at, chain_seq) and
        # same-timestamp cross-batch appends stay stable.
        # Precondition: a new row's created_at must not be EARLIER
        # than the head's — a backdated row would chain fine here but
        # diverge from the full-table recompute, reporting a spurious
        # tamper break on untampered data. Fail loud in-plan instead
        # of silently chaining it. (Equal timestamps are fine: the
        # carried chain_seq breaks the tie in append order.)
        # structural emptiness (r14): a provably-empty store has no
        # chain heads — the head aggregation, the backdated guard's
        # broadcast join and the strict probe are all no-ops by
        # construction, so skip building them (Catalyst cannot prove
        # the RDD-backed empty default empty itself; measured 13 → 8
        # jobs per fresh-store write action, and every per-call
        # store-building query — recall_routed, the oracle fixtures —
        # pays this plan on each execution)
        store_empty = self._memories_known_empty
        heads = None if store_empty else (
            self.memories.filter(F.col("chain_hash").isNotNull())
            .groupBy("agent_id")
            .agg(
                F.max_by(
                    "chain_hash", F.struct("created_at", "chain_seq")
                ).alias("chain_head"),
                F.max("chain_seq").alias("head_seq"),
                F.max("created_at").alias("head_ts"),
            )
        )
        backdated = F.col("_head_ts").isNotNull() & (
            F.col("created_at") < F.col("_head_ts")
        )
        if strict and not store_empty:
            first_backdated = (
                with_defaults.join(
                    F.broadcast(
                        heads.select("agent_id", F.col("head_ts").alias("_head_ts"))
                    ),
                    ["agent_id"],
                    "left",
                )
                .filter(backdated)
                .limit(1)
                .collect()
            )
            if first_backdated:
                r = first_backdated[0]
                raise ValueError(
                    f"remember_batch: row {r['id']} (created_at "
                    f"{r['created_at']}) sorts before agent {r['agent_id']}'s"
                    " current chain head — backdated writes would make"
                    " verify_integrity report a spurious tamper break; use a"
                    " created_at at or after the head"
                )
        guarded = with_defaults if store_empty else (
            with_defaults.join(
                F.broadcast(
                    heads.select(
                        "agent_id", F.col("head_ts").alias("_head_ts")
                    )
                ),
                ["agent_id"],
                "left",
            )
            .withColumn(
                "created_at",
                F.when(
                    backdated,
                    F.raise_error(
                        F.concat(
                            F.lit("remember_batch: row "),
                            F.col("id"),
                            F.lit(" (created_at "),
                            F.col("created_at").cast("string"),
                            F.lit(") sorts before agent "),
                            F.col("agent_id"),
                            F.lit(
                                "'s current chain head — backdated writes"
                                " would make verify_integrity report a"
                                " spurious tamper break; use a created_at"
                                " at or after the head"
                            ),
                        )
                    ).cast("timestamp"),
                ).otherwise(F.col("created_at")),
            )
            .drop("_head_ts")
        )
        # auto-select the epoch-sharded fold when one incoming chain
        # exceeds the measured crossover (VERDICT r9 #6 — bulk ingest
        # of a dominant agent; docs/benchmarks/chain_epochs_growth_r9)
        chained = assign_chain_auto(
            guarded,
            ["agent_id"],
            ["created_at", "id"],
            "content_hash",
            prev_head=(
                None
                if store_empty
                else heads.select("agent_id", "chain_head", "head_seq")
            ),
            seq_col="chain_seq",
            stats=chain_stats,
        )
        new_memories = chained.select(*[f.name for f in MEMORY_SCHEMA.fields])
        events = self._append_events(
            new_memories.select(
                F.col("agent_id"),
                F.lit("MemoryWrite").alias("event_type"),
                F.col("id").alias("memory_id"),
                F.col("created_at").alias("ts"),
            )
        )
        return self._clone(
            memories=self.memories.unionByName(new_memories, allowMissingColumns=True),
            events=events,
        )

    def _clone(
        self, memories=None, acls=None, events=None
    ) -> "MnemoSparkEngine":
        """Construction hook every mutating verb routes through, so
        subclasses (VersionedEngine) keep their extra state — the
        checkpoints frame — across remember/forget/share/sweep instead
        of silently degrading to the base class."""
        out = MnemoSparkEngine(
            self.spark,
            memories if memories is not None else self.memories,
            acls if acls is not None else self.acls,
            self.dim,
            events if events is not None else self.events,
            self.embedder,
        )
        # the constructor always receives SOME acls frame here, so the
        # known-empty flag must carry explicitly: inherited when the
        # clone keeps our acls, cleared when a new frame arrives
        out._acls_known_empty = self._acls_known_empty if acls is None else False
        out.experience_enabled = self.experience_enabled
        return out

    def _append_events(self, rows: DataFrame) -> DataFrame:
        """T1 (remember.rs:212-257): every verb appends hash-chained
        audit events; the chain head carries across appends via
        `prev_head` (cross-batch handoff, W7)."""
        # event_id must be unique per event: a bare type-id pair
        # collides when the same verb hits the same memory twice (e.g.
        # soft forget called twice), and duplicate (agent, ts, event_id)
        # keys fan out the verify_event_integrity join into spurious
        # chain-break reports — so the timestamp is folded in
        hashed = rows.select(
            F.concat_ws(
                "-",
                F.col("event_type"),
                F.col("memory_id"),
                F.substring(F.sha2(F.col("ts").cast("string"), 256), 1, 12),
            ).alias("event_id"),
            "agent_id",
            "event_type",
            "memory_id",
            "ts",
            F.sha2(
                F.concat_ws(
                    "|",
                    F.col("event_type"),
                    F.col("memory_id"),
                    F.col("agent_id"),
                    F.col("ts").cast("string"),
                ),
                256,
            ).alias("content_hash"),
        )
        # T6 logical clock: new rows extend each agent's sequence past
        # its stored maximum, so chain order == append order even when
        # several verbs share a wall-clock ts across batches
        from pyspark.sql import Window

        wclk = Window.partitionBy("agent_id").orderBy("ts", "event_id")
        # structural emptiness (r14, the remember_batch elision): a
        # provably-empty log has no clock base and no chain heads —
        # the first append's clock starts at row_number and its chains
        # at genesis, with no aggregation/join over the RDD-backed
        # empty default (which Catalyst cannot prove empty)
        if self._events_known_empty:
            clocked = hashed.withColumn(
                "logical_clock", F.row_number().over(wclk).cast("long")
            )
            chained = assign_chain(
                clocked, ["agent_id"], ["logical_clock"], "content_hash"
            )
            return self.events.unionByName(
                chained.select(*[f.name for f in AUDIT_SCHEMA.fields])
            )
        base = self.events.groupBy("agent_id").agg(
            F.max("logical_clock").alias("_base")
        )
        clocked = (
            hashed.join(F.broadcast(base), "agent_id", "left")
            .withColumn(
                "logical_clock",
                (
                    F.coalesce(F.col("_base"), F.lit(0))
                    + F.row_number().over(wclk)
                ).cast("long"),
            )
            .drop("_base")
        )
        heads = (
            self.events.groupBy("agent_id")
            .agg(F.max(F.struct("logical_clock", "chain_hash")).alias("m"))
            .select("agent_id", F.col("m.chain_hash").alias("chain_head"))
        )
        chained = assign_chain(
            clocked, ["agent_id"], ["logical_clock"], "content_hash", prev_head=heads
        )
        return self.events.unionByName(
            chained.select(*[f.name for f in AUDIT_SCHEMA.fields])
        )

    def _embedder_is_default(self) -> bool:
        from mnemo_spark.functions.embed_batch import HashBagEmbedder

        return type(self.embedder) is HashBagEmbedder and self.embedder.dim == self.dim

    def _with_embedding(self, df: DataFrame, text_col: str = "content",
                        out_col: str = "embedding") -> DataFrame:
        """Embed `text_col` through the CONFIGURED provider (U1,
        embedding/mod.rs:7-53). The JVM hash-bag expression is used
        only when the provider IS the default HashBagEmbedder (it is
        bit-compatible); any other semantic provider runs via the
        mapInPandas batch path, and a non-semantic provider stores
        NULL vectors (writes succeed, semantic recall refuses at the
        gate) — never a silent hash-bag fallback."""
        if out_col in df.columns:
            df = df.drop(out_col)
        if self._embedder_is_default():
            if "id" not in df.columns:
                return df.withColumn(out_col, self._embed(F.col(text_col)))
            vec = self._hash_bag_dense(df, text_col)
            return (
                df.join(vec, "id", "left")
                .withColumn(out_col, F.col("_vec"))
                .drop("_vec")
            )
        if not getattr(self.embedder, "semantic", False):
            return df.withColumn(out_col, F.lit(None).cast("array<float>"))
        from mnemo_spark.functions.embed_batch import embed_batch

        return embed_batch(df, self.embedder, text_col=text_col, out_col=out_col)

    def _hash_bag_dense(self, df: DataFrame, text_col: str) -> DataFrame:
        """Dense hash-bag embeddings for a keyed frame → (id, _vec).

        Same values as the per-row `_embed` expression, computed
        RELATIONALLY: explode tokens → (id, bucket) counts → per-id
        map + L2 → one O(dim) map-lookup assembly per row. The
        per-row HOF form evaluates `size(filter(buckets, = b))` for
        every bucket — dim × |tokens| interpreted-lambda calls per
        ROW, which measured ~80 s to write 500 real documents
        (tools/engine_probe.py); this form is one codegen'd shuffle,
        linear in corpus tokens, like every other corpus operator."""
        cnt = (
            df.select("id", F.explode(tokens(F.col(text_col))).alias("_t"))
            .withColumn("_b", token_bucket(F.col("_t"), self.dim))
            .groupBy("id", "_b")
            .agg(F.count("*").cast("double").alias("_c"))
        )
        per_id = cnt.groupBy("id").agg(
            F.map_from_entries(
                F.collect_list(F.struct("_b", "_c"))
            ).alias("_m"),
            F.sqrt(F.sum(F.col("_c") * F.col("_c"))).alias("_l2"),
        )
        dense = F.transform(
            F.sequence(F.lit(0), F.lit(self.dim - 1)),
            lambda b: (
                F.coalesce(F.element_at(F.col("_m"), b), F.lit(0.0))
                / F.col("_l2")
            ).cast("float"),
        )
        return per_id.select(
            "id",
            F.when(F.col("_l2") > 0, dense)
            .otherwise(F.lit(None).cast("array<float>"))
            .alias("_vec"),
        )

    def _embed_when(self, df: DataFrame, cond, text_src: str) -> DataFrame:
        """Recompute `embedding` from `text_src` only where `cond`
        holds, routed through the configured provider like
        `_with_embedding` (reflection re-embeds use this)."""
        if self._embedder_is_default():
            if "id" not in df.columns:
                return df.withColumn(
                    "embedding",
                    F.when(cond, self._embed(F.col(text_src))).otherwise(
                        F.col("embedding")
                    ),
                )
            vec = self._hash_bag_dense(df.filter(cond), text_src)
            return (
                df.join(vec, "id", "left")
                .withColumn(
                    "embedding",
                    F.when(cond, F.col("_vec")).otherwise(F.col("embedding")),
                )
                .drop("_vec")
            )
        if not getattr(self.embedder, "semantic", False):
            return df.withColumn(
                "embedding",
                F.when(cond, F.lit(None).cast("array<float>")).otherwise(
                    F.col("embedding")
                ),
            )
        from mnemo_spark.functions.embed_batch import embed_batch

        tmp = embed_batch(df, self.embedder, text_col=text_src, out_col="_newemb")
        return tmp.withColumn(
            "embedding",
            F.when(cond, F.col("_newemb")).otherwise(F.col("embedding")),
        ).drop("_newemb")

    def _embed(self, content):
        """Dense hash-bag embedding as a per-row expression: token
        buckets → count vector → L2 normalize via JVM-side HOFs.
        O(dim × tokens) interpreted work per row — used ONLY for the
        single-row query vector and as the no-id-column fallback;
        batch writes go through `_hash_bag_dense` (relational, linear
        in corpus tokens). (The corpus-scale sparse form lives in
        functions.embedder.)"""
        toks = tokens(content)
        buckets = F.transform(toks, lambda t: token_bucket(t, self.dim))
        counts = F.transform(
            F.sequence(F.lit(0), F.lit(self.dim - 1)),
            lambda b: F.size(F.filter(buckets, lambda x: x == b)).cast("double"),
        )
        l2 = F.sqrt(
            F.aggregate(counts, F.lit(0.0), lambda acc, x: acc + x * x)
        )
        return F.when(
            l2 > 0,
            F.transform(counts, lambda x: (x / l2).cast("float")),
        ).otherwise(F.lit(None).cast("array<float>"))

    # -- visibility (J1) ------------------------------------------------

    def visible_to(self, principal: str, now=None) -> DataFrame:
        """Owner ∪ public/global scope ∪ live ACL grant — the
        left-semi ACL join unioned with the ownership filter.

        The two union branches are DISJOINT by construction (the grant
        branch filters to rows that fail the own-or-public predicate),
        so no dropDuplicates is needed: ids are store-unique (the
        upsert contract), a semi join emits each left row at most
        once, and the branches cannot overlap. The previous
        union + dropDuplicates(id) shuffled the ENTIRE visible corpus
        — wide rows, content + embedding — on every recall (r12,
        found profiling recall_routed_docs: the distinct was 0.8 s of
        the 1.3 s warm execution at sf0.1, and at 100 TB it is a
        full-corpus exchange per query). Now only the private-non-own
        slice moves for the ACL semi join, and only when a broadcast
        of the grants frame doesn't absorb it."""
        now = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
        live = self.memories.filter(
            F.col("deleted_at").isNull()
            & (F.col("expires_at").isNull() | (F.col("expires_at") > now))
            & F.col("quarantined").isNull()
        )
        # coalesce: a NULL agent_id/scope row must land in the grant
        # branch (NULL fails BOTH a filter(p) and a filter(~p), which
        # would make it invisible even when granted)
        own_or_public_pred = F.coalesce(
            (F.col("agent_id") == principal)
            | F.col("scope").isin("public", "global"),
            F.lit(False),
        )
        own_or_public = live.filter(own_or_public_pred)
        if self._acls_known_empty:
            # no grant has ever been issued on this engine lineage — a
            # structural fact (the default ACL frame is RDD-backed, so
            # Catalyst cannot prove it empty itself): skip the grant
            # branch's semi join + second store scan at plan-build time
            return own_or_public
        grants = self.acls.filter(
            (F.col("principal_id") == principal)
            & (F.col("expires_at").isNull() | (F.col("expires_at") > now))
        )
        rest = live.filter(~own_or_public_pred)
        granted = rest.join(
            grants, rest.id == grants.memory_id, "left_semi"
        )
        return own_or_public.unionByName(granted)

    def share(self, memory_ids: list[str], principal: str, permission: str = "read",
              expires_at=None) -> "MnemoSparkEngine":
        rows = [(m, principal, permission, expires_at) for m in memory_ids]
        new = self.spark.createDataFrame(rows, ACL_SCHEMA)
        return self._clone(acls=self.acls.unionByName(new))

    # -- read path (recall.rs:332-737) ----------------------------------

    # v0.5.17 forged-reasoning defense: authorship values considered
    # trustworthy by default (retrieval.rs:358-371)
    TRUSTED_REASONING = ("model_authored", "user_provided", "tool_verified")

    def _recall_corpus(
        self,
        principal: str,
        now,
        domain_scope: dict | None,
        reasoning_trust: dict | None,
    ):
        """Shared pre-scoring candidate pipeline for recall verbs:
        visibility (J1) → plan-tier exclusion (P5) → domain scope (P3)
        → reasoning-trust policy (P4). Returns (corpus, rt_admitted)
        where rt_admitted is the down-weight predicate (None unless
        action=down_weight) — recall and recall_batch compose the
        IDENTICAL policy surface, so a batched query can never see a
        record its single-query twin would not (the reference's
        permission-safe-ANN contract, integration_test.rs:2130)."""
        corpus = self.visible_to(principal, now=now).filter(
            # P5: experience-tier plan records never surface in ordinary
            # recall — replayed only via recall_plan (recall.rs:1131-1149)
            ~F.coalesce(
                F.array_contains(F.col("tags"), F.lit(EXPERIENCE_PLAN_TAG)),
                F.lit(False),
            )
        )
        corpus = self._apply_domain_scope(corpus, domain_scope)
        rt_admitted = None
        if reasoning_trust is not None:
            from mnemo_spark.operators.poisoning import reasoning_admitted

            action = reasoning_trust.get("action", "quarantine")
            if action not in ("quarantine", "down_weight"):
                raise ValueError(f"unknown reasoning_trust action {action!r}")
            trusted = list(
                reasoning_trust.get("trusted") or self.TRUSTED_REASONING
            )
            rt_admitted = reasoning_admitted("metadata", trusted)
            if action == "quarantine":
                # read-time quarantine joins the shared pre-scoring
                # post-filter conjunction (P1), like passes_filters
                corpus = corpus.filter(rt_admitted)
                rt_admitted = None  # nothing left to down-weight
        return corpus, rt_admitted

    def recall(
        self,
        query: str,
        principal: str,
        strategy: str = "hybrid",
        k: int = 10,
        now=None,
        rrf_k: int = 30,
        weights: dict[str, float] | None = None,
        domain_scope: dict | None = None,
        edges: DataFrame | None = None,
        reasoning_trust: dict | None = None,
        lane_limit=AUTO_LANE_LIMIT,
        ann: str = "auto",
    ) -> DataFrame:
        """→ (id, agent_id, content, score, rank). Permission filter
        runs BEFORE scoring (the reference's filtered_search contract:
        permission-safe ANN, SURVEY §4).

        lane_limit: per-lane candidate over-fetch feeding RRF fusion.
        Default AUTO = k * RECALL_LANE_OVERFETCH — the reference's
        limit*3 (recall.rs:397), which bounds fusion input to
        O(lanes·3k) instead of O(corpus) per lane (the 100-TB shape;
        r9 flips this to the default, VERDICT r8 #6). Pass None for
        full-lane fusion — the exactness mode where every corpus row
        contributes its reciprocal-rank term.

        domain_scope (P3, retrieval.rs:154-174 DomainScope / the
        v0.4.15 anti-dilution mode): {"namespace": str, "doc_class":
        str, "tags": [..]} — restricts the candidate set BEFORE any
        similarity step, so off-domain-but-semantically-similar
        records cannot dilute the top-k. namespace/doc_class match the
        metadata JSON; tags must ALL be present. Being a pre-scoring
        column predicate, Catalyst pushes it into the scan — at 100 TB
        the domain filter prunes partitions instead of post-filtering
        a diluted candidate list.

        ann: dense-lane execution mode ('auto'|'exact'|'ivf'), same
        contract and default as recall_batch — see its docstring.

        reasoning_trust (v0.5.17 forged-reasoning defense,
        retrieval.rs:216-430 ReasoningTrustPolicy): opt-in
        {"action": "quarantine"|"down_weight",
         "trusted": [authorship...], "down_weight_factor": f}.
        An entry is admitted iff
        metadata.reasoning_provenance.authorship is in `trusted`
        (default: model_authored / user_provided / tool_verified);
        absent or unparseable provenance reads as 'unverified' — the
        reference's FAIL-CLOSED default (an entry that never declared
        how its reasoning was produced cannot pass as
        "already-reasoned"). quarantine excludes pre-scoring;
        down_weight multiplies the final score (default x0.1) and
        re-ranks. None keeps the read path unchanged; composes with
        every strategy."""
        corpus, rt_admitted = self._recall_corpus(
            principal, now, domain_scope, reasoning_trust
        )
        if lane_limit is AUTO_LANE_LIMIT:
            lane_limit = k * RECALL_LANE_OVERFETCH
        # legacy strategy-string aliases (retrieval.rs to_strategy_str):
        # "auto" is the reference's wire name for the hybrid RRF path;
        # "domain_scoped" (v0.4.15 DomainScoped mode) = restrict to the
        # metadata sub-corpus, then a SINGLE vector pass — degrading
        # gracefully to plain vector when no predicate was given
        if strategy == "auto":
            strategy = "hybrid"
        elif strategy == "domain_scoped":
            strategy = "semantic"
        if strategy == "exact":
            hits = corpus.filter(F.col("content") == query).withColumn(
                "score", F.lit(1.0)
            )
        elif strategy == "lexical":
            hits = (
                bm25_score(corpus, query.lower().split(), id_col="id", text_col="content")
                .withColumnRenamed("bm25", "score")
                .join(corpus, "id")
            )
        elif strategy in ("semantic", "hybrid", "graph"):
            # U1 fail-loud gate (embedding/mod.rs:7-53, enforced at
            # recall.rs:366-375): semantic retrieval under a provider
            # that can't embed must refuse, not silently degrade —
            # graph mode seeds from the semantic lane, so it gates too
            if not getattr(self.embedder, "semantic", False):
                raise RuntimeError(
                    f"recall(strategy={strategy!r}) requires a semantic-"
                    f"capable embedder; configured provider "
                    f"{getattr(self.embedder, 'name', type(self.embedder).__name__)!r} "
                    "cannot embed (reference fail-loud contract)"
                )
            # per-strategy lane pruning (margin-safe — see
            # batch_dot_scores): graph consumes only the k*3 seed
            # over-fetch; plain semantic only the final top-k UNLESS a
            # down-weight pass can promote arbitrary ranks; hybrid only
            # each lane's top-lane_limit (None = full-lane exactness)
            if strategy == "graph":
                sem_limit = k * 3
            elif strategy == "semantic":
                sem_limit = None if rt_admitted is not None else k
            else:
                sem_limit = lane_limit
            sem = self._semantic_lane(corpus, query, limit=sem_limit, ann=ann)
            if strategy == "graph":
                hits = self._graph_recall(
                    corpus, sem, edges, k, rrf_k, weights, lane_limit=lane_limit
                )
            elif strategy == "semantic":
                hits = sem.join(corpus, "id")
            else:
                now_c = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
                recency = corpus.select(
                    "id",
                    F.pow(
                        F.lit(2.0),
                        -(
                            (F.unix_micros(now_c) - F.unix_micros(F.col("created_at")))
                            / F.lit(3.6e9)
                        )
                        / F.lit(168.0),
                    ).alias("score"),
                )
                lex = bm25_score(
                    corpus, query.lower().split(), id_col="id", text_col="content"
                ).withColumnRenamed("bm25", "score")
                fused = rrf_fuse(
                    {"semantic": sem.withColumnRenamed("score", "score"),
                     "lexical": lex, "recency": recency},
                    weights or {"semantic": 6.0, "lexical": 3.0, "recency": 1.0},
                    rrf_k,
                    id_col="id",
                    lane_limit=lane_limit,
                )
                hits = fused.withColumnRenamed("rrf_score", "score").join(corpus, "id")
        else:
            raise ValueError(f"unknown strategy {strategy!r}")

        if rt_admitted is not None:
            # DownWeight action (ReasoningTrustPolicy::rerank):
            # untrusted hits keep their row, score x factor, re-ranked
            factor = float(reasoning_trust.get("down_weight_factor", 0.1))
            hits = hits.withColumn(
                "score",
                F.when(rt_admitted, F.col("score")).otherwise(
                    F.col("score") * factor
                ),
            )
        return top_k_ranked(hits, [F.desc("score"), F.asc("id")], k).select(
            "id", "agent_id", "content", F.round("score", 6).alias("score"), "rank"
        )

    def _graph_recall(
        self,
        corpus: DataFrame,
        sem: DataFrame,
        edges: DataFrame | None,
        k: int,
        rrf_k: int,
        weights: dict[str, float] | None,
        max_hops: int = 2,
        lane_limit: int | None = None,
    ) -> DataFrame:
        """RetrievalMode::Graph (recall.rs:479-545): semantic seeds
        (k*3 over-fetch), multi-hop expansion over relation edges with
        exponential score decay (seeds 1.0, hop h at 0.5^h), RRF fusion
        of the vector and graph lanes.

        edges: (src_id, dst_id) frame — the engine's schema carries no
        relations table, so the graph is an input (e.g. extract_edges
        output once the extractor lands). Expansion is hop-bounded
        equi-joins semi-joined against the PERMISSION-FILTERED corpus,
        so a relation can never leak an invisible memory into the
        results — the same per-record check the reference applies."""
        if edges is None:
            raise ValueError(
                "recall(strategy='graph') needs an edges DataFrame "
                "(src_id, dst_id); the schema has no relations table"
            )
        seeds = top_k_ranked(sem, [F.desc("score"), F.asc("id")], k * 3).select(
            "id", "score"
        )
        und = edges.select(
            F.col("src_id").alias("_s"), F.col("dst_id").alias("_d")
        ).unionByName(
            edges.select(F.col("dst_id").alias("_s"), F.col("src_id").alias("_d"))
        )
        visible = corpus.select("id")
        seen = seeds.select("id")
        frontier = seen
        graph_lane = seeds.select("id", F.lit(1.0).alias("score"))
        decay = 0.5
        for _hop in range(max_hops):
            nxt = (
                frontier.join(und, frontier.id == und._s)
                .select(F.col("_d").alias("id"))
                .distinct()
                .join(seen, "id", "left_anti")
                .join(visible, "id", "left_semi")
            )
            graph_lane = graph_lane.unionByName(
                nxt.select("id", F.lit(decay).alias("score"))
            )
            seen = seen.unionByName(nxt)
            frontier = nxt
            decay *= 0.5
        fused = rrf_fuse(
            {"vector": seeds, "graph": graph_lane},
            weights or {"vector": 1.0, "graph": 1.0},
            rrf_k,
            id_col="id",
            lane_limit=lane_limit,
        )
        return fused.withColumnRenamed("rrf_score", "score").drop("rank").join(
            corpus, "id"
        )

    def _graph_recall_batch(
        self,
        corpus: DataFrame,
        sem: DataFrame,
        edges: DataFrame | None,
        k: int,
        rrf_k: int,
        weights: dict[str, float] | None,
        max_hops: int = 2,
        lane_limit: int | None = None,
    ) -> DataFrame:
        """Batched RetrievalMode::Graph (recall.rs:479-545, batched
        across a queries frame — VERDICT r8 #2, the last strategy
        recall_batch lacked): per-query semantic seeds (k*3
        over-fetch, WindowGroupLimit-bounded rank), fixed-depth
        expansion over relation edges with 0.5^hop decay and
        per-(query, node) first-visit dedup, per-query RRF fusion of
        the vector and graph lanes — identical semantics to the
        single-query walk (equivalence pytest) in ONE plan for the
        whole batch. Expansion semi-joins the permission-filtered
        corpus every hop (operators/graph.expand_grouped), so an
        invisible memory neither surfaces nor bridges for ANY query."""
        from mnemo_spark.operators.graph import expand_grouped
        from mnemo_spark.operators.rrf import rrf_fuse_grouped

        if edges is None:
            raise ValueError(
                "recall_batch(strategy='graph') needs an edges DataFrame "
                "(src_id, dst_id); the schema has no relations table"
            )
        w = Window.partitionBy("_qid").orderBy(F.desc("score"), F.asc("id"))
        seeds = (
            sem.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= k * 3)
            .drop("_r")
        )
        # r10 (VERDICT r9 #1): the seed set is structurally tiny
        # (n_queries × k×3 by the rank filter) but feeds BOTH the
        # vector fusion lane and every expansion hop — as lazy lineage
        # it recomputed the whole semantic scan ~4× per call (plans
        # are trees). One bounded collect pins it; each hop join then
        # broadcasts the frontier statically instead of exchanging
        # the edge table.
        # fallback=True: the seed bound scales with the CALLER's batch
        # size (n_queries × k×3) — a batch large enough to exceed the
        # driver bound degrades to the lazy distributed plan instead
        # of refusing the request
        seeds = localize_small(
            seeds.select("_qid", "id", "score"),
            why="graph-recall seeds, n_queries x k*3",
            fallback=True,
        )
        lane = expand_grouped(
            edges,
            seeds,
            hops=max_hops,
            decay=0.5,
            src_col="src_id",
            dst_col="dst_id",
            group_col="_qid",
            seed_col="id",
            visible=corpus.select("id"),
            bidirectional=True,
        ).select("_qid", "id", "score")
        fused = rrf_fuse_grouped(
            {"vector": seeds.select("_qid", "id", "score"), "graph": lane},
            weights or {"vector": 1.0, "graph": 1.0},
            rrf_k,
            group_col="_qid",
            id_col="id",
            score_col="score",
            lane_limit=lane_limit,
        )
        return fused.withColumnRenamed("rrf_score", "score").join(corpus, "id")

    def recall_batch(
        self,
        queries: DataFrame,
        principal: str,
        strategy: str = "hybrid",
        k: int = 10,
        now=None,
        rrf_k: int = 30,
        weights: dict[str, float] | None = None,
        domain_scope: dict | None = None,
        edges: DataFrame | None = None,
        reasoning_trust: dict | None = None,
        lane_limit=AUTO_LANE_LIMIT,
        qid_col: str = "query_id",
        query_col: str = "query",
        ann: str = "auto",
        ann_nprobe: int | None = None,
    ) -> DataFrame:
        """A DATAFRAME OF QUERIES through the full recall pipeline in
        ONE plan → (query_id, id, agent_id, content, score, rank ≤ k
        per query) — the engine-batches-queries serving posture
        (SURVEY §6; the reference serves recall one request at a time,
        recall.rs:332, and its J6 many-queries analog is the
        golem:vector batch search surface).

        Semantics contract: recall_batch(queries=[q]) ≡ recall(q) row
        for row, for every strategy and policy knob — the permission
        filter, plan-tier exclusion, domain scope and reasoning-trust
        policy all run through the SAME `_recall_corpus` pipeline
        BEFORE scoring (permission-safe ANN,
        integration_test.rs:2130), and lane ranking/fusion use the
        same 6dp-round + id tiebreak. Enforced by
        tests/test_recall_batch.py's equivalence property.

        Batch economics: the corpus side of every lane is computed
        once — BM25 corpus statistics (batch_bm25), one corpus scan
        for the semantic dot, one recency projection shared by all
        queries — so per-query marginal cost is a broadcast join, not
        a corpus pass. lane_limit is the reference's per-lane
        candidate over-fetch (limit*3, recall.rs:397) and defaults to
        AUTO = k*3 (r9, VERDICT r8 #6): each lane feeds only its
        per-query top-N into fusion (WindowGroupLimit keeps the rank
        filter a bounded heap, not a sort) — the 100-TB shape, and
        what the reference always does. Pass lane_limit=None for
        full-lane fusion (the opt-in exactness mode); `recall` shares
        the same default, so the batch≡single equivalence holds at
        every setting.

        strategy='graph' (r9): per-query semantic seeds expanded over
        the `edges` frame — see _graph_recall_batch.

        ann='auto'|'exact'|'ivf' (r10, VERDICT r9 #3): execution mode
        of the dense lane. 'auto' (default) serves exact dot scores
        below params.ANN_ROUTE_MIN_CORPUS store rows and routes
        through IVF cell probing above it — sub-O(corpus) per query,
        the reference's serve-from-index posture (usearch.rs:18-28).
        `recall` takes the same knob with the same default, so the
        batch(1) ≡ recall equivalence holds in every regime. Routed
        recall@10 vs exact is gated ≥0.95 by tools/eval_ann.py
        --routed at the 10x corpus.
        """
        corpus, rt_admitted = self._recall_corpus(
            principal, now, domain_scope, reasoning_trust
        )
        if lane_limit is AUTO_LANE_LIMIT:
            lane_limit = k * RECALL_LANE_OVERFETCH
        if strategy == "auto":
            strategy = "hybrid"
        elif strategy == "domain_scoped":
            strategy = "semantic"
        q = queries.select(
            F.col(qid_col).alias("_qid"), F.col(query_col).alias("_q")
        )

        def lexical_lane():
            from mnemo_spark.operators.bm25 import batch_bm25

            qterms = q.select(
                "_qid",
                F.filter(
                    F.split(F.lower(F.col("_q")), r"\s+"), lambda t: t != ""
                ).alias("_terms"),
            )
            return batch_bm25(
                corpus,
                qterms,
                id_col="id",
                text_col="content",
                qid_col="_qid",
                qterms_col="_terms",
            ).withColumnRenamed("bm25", "score")

        def semantic_lane(limit: int | None = None):
            # U1 fail-loud gate, identical to recall's
            if not getattr(self.embedder, "semantic", False):
                raise RuntimeError(
                    f"recall_batch(strategy={strategy!r}) requires a semantic-"
                    f"capable embedder; configured provider "
                    f"{getattr(self.embedder, 'name', type(self.embedder).__name__)!r} "
                    "cannot embed (reference fail-loud contract)"
                )
            if self._embedder_is_default():
                qvecs = q.select("_qid", self._embed(F.col("_q")).alias("_qv"))
            else:
                # ONE provider batch call for the whole query frame —
                # the point of the batch verb (vs recall's call-per-
                # query); the query side is definitionally small
                from pyspark.sql.types import (
                    ArrayType,
                    FloatType,
                    StructField,
                    StructType,
                )

                self.embedder.load()
                qrows = q.collect()
                vecs = self.embedder.embed([r["_q"] for r in qrows])
                schema = StructType(
                    [
                        StructField("_qid", q.schema["_qid"].dataType),
                        StructField("_qv", ArrayType(FloatType())),
                    ]
                )
                qvecs = local_frame(
                    self.spark,
                    [
                        (r["_qid"], [float(v) for v in vec])
                        for r, vec in zip(qrows, vecs)
                    ],
                    schema,
                )
            return self._dot_lane(
                corpus, qvecs, limit=limit, ann=ann, ann_nprobe=ann_nprobe
            )

        if strategy == "exact":
            hits = (
                corpus.join(
                    F.broadcast(q), F.col("content") == F.col("_q"), "inner"
                )
                .withColumn("score", F.lit(1.0))
                .drop("_q")
            )
        elif strategy == "lexical":
            hits = lexical_lane().join(corpus, "id")
        elif strategy == "semantic":
            # margin-safe pruning to the final top-k unless a
            # down-weight pass can promote arbitrary ranks (the same
            # per-strategy policy recall applies)
            hits = semantic_lane(
                limit=None if rt_admitted is not None else k
            ).join(corpus, "id")
        elif strategy == "graph":
            hits = self._graph_recall_batch(
                corpus, semantic_lane(limit=k * 3), edges, k, rrf_k, weights,
                lane_limit=lane_limit,
            )
        elif strategy == "hybrid":
            from mnemo_spark.operators.rrf import rrf_fuse_grouped

            now_c = (
                F.lit(now).cast("timestamp")
                if now is not None
                else F.current_timestamp()
            )
            # recency is query-independent: rrf_fuse_grouped ranks it
            # ONCE and replicates only the ranked rows per query
            recency = corpus.select(
                "id",
                F.pow(
                    F.lit(2.0),
                    -(
                        (
                            F.unix_micros(now_c)
                            - F.unix_micros(F.col("created_at"))
                        )
                        / F.lit(3.6e9)
                    )
                    / F.lit(168.0),
                ).alias("score"),
            )
            fused = rrf_fuse_grouped(
                {
                    "semantic": semantic_lane(limit=lane_limit),
                    "lexical": lexical_lane(),
                    "recency": recency,
                },
                weights or {"semantic": 6.0, "lexical": 3.0, "recency": 1.0},
                rrf_k,
                group_col="_qid",
                id_col="id",
                score_col="score",
                lane_limit=lane_limit,
                groups=q.select("_qid"),
            )
            hits = fused.withColumnRenamed("rrf_score", "score").join(
                corpus, "id"
            )
        else:
            raise ValueError(f"unknown strategy {strategy!r}")

        if rt_admitted is not None:
            factor = float(reasoning_trust.get("down_weight_factor", 0.1))
            hits = hits.withColumn(
                "score",
                F.when(rt_admitted, F.col("score")).otherwise(
                    F.col("score") * factor
                ),
            )
        w_final = Window.partitionBy("_qid").orderBy(
            F.desc("score"), F.asc("id")
        )
        return (
            hits.withColumn("rank", F.row_number().over(w_final))
            .filter(F.col("rank") <= k)
            .select(
                F.col("_qid").alias(qid_col),
                "id",
                "agent_id",
                "content",
                F.round("score", 6).alias("score"),
                "rank",
            )
        )

    @staticmethod
    def _apply_domain_scope(df: DataFrame, domain_scope: dict | None) -> DataFrame:
        """P3 domain-scope predicates (retrieval.rs:154-174 DomainScope):
        namespace (metadata OR tag), doc_class (metadata), required tags.
        Shared by the recall corpus AND every linked-record lookup — the
        reference runs linked context through the full passes_filters, so
        a domain-scoped reconstruct must never pull out-of-scope records
        into the belief summary."""
        if not domain_scope:
            return df
        ns = domain_scope.get("namespace")
        if ns is not None:
            df = df.filter(
                (F.get_json_object("metadata", "$.namespace") == ns)
                | F.coalesce(
                    F.array_contains(F.col("tags"), F.lit(ns)), F.lit(False)
                )
            )
        dc = domain_scope.get("doc_class")
        if dc is not None:
            df = df.filter(F.get_json_object("metadata", "$.doc_class") == dc)
        for t in domain_scope.get("tags") or []:
            df = df.filter(
                F.coalesce(F.array_contains(F.col("tags"), F.lit(t)), F.lit(False))
            )
        return df

    @staticmethod
    def _excerpt(content: str, max_chars: int) -> str:
        """First non-empty line, char-truncated with an ellipsis —
        recall.rs:1102-1113 `excerpt`."""
        line = next(
            (ln.strip() for ln in (content or "").splitlines() if ln.strip()), ""
        )
        return line if len(line) <= max_chars else line[:max_chars] + "…"

    def recall_reconstruct(
        self,
        query: str,
        principal: str,
        k: int = 10,
        edges: DataFrame | None = None,
        now=None,
        rrf_k: int = 30,
        weights: dict[str, float] | None = None,
        domain_scope: dict | None = None,
    ) -> tuple[DataFrame, dict]:
        """v0.5.1 `reconstruct` recall strategy (recall.rs:862-871 +
        reconstruct_belief at :1019-1106; MRAgent, arXiv:2606.06036):
        run hybrid recall, then walk ONE hop of memory-graph relations
        outward from the hits to gather linked/causal context, and
        synthesise a deterministic rule-based belief node returned
        ALONGSIDE the untouched hits:

          {"cue", "summary", "source_ids", "linked_context_ids",
           "confidence"}  (confidence = mean hit score)

        Deterministic order like the reference: hits in rank order;
        within a hit, outgoing relations before incoming, each side in
        neighbor-id order. Linked records pass the SAME visibility,
        experience-tier, AND domain-scope filters as the recall corpus
        (reconstruct_belief runs them through the full passes_filters —
        a relation can never leak an invisible or out-of-scope memory
        into the summary). `edges` is the (src_id,
        dst_id) relations frame, same convention as strategy='graph'.
        The belief node is k-sized driver-side state by definition —
        the hits DataFrame stays distributed."""
        hits = self.recall(
            query,
            principal,
            strategy="hybrid",
            k=k,
            now=now,
            rrf_k=rrf_k,
            weights=weights,
            domain_scope=domain_scope,
        )
        rows = sorted(hits.collect(), key=lambda r: r["rank"])
        if not rows:
            return hits, {
                "cue": query,
                "summary": f'No memories matched the cue "{query}".',
                "source_ids": [],
                "linked_context_ids": [],
                "confidence": 0.0,
            }
        source_ids = [r["id"] for r in rows]
        seen = set(source_ids)
        linked: list[tuple[str, str]] = []
        if edges is not None:
            adj = (
                edges.filter(
                    F.col("src_id").isin(source_ids)
                    | F.col("dst_id").isin(source_ids)
                )
                .collect()
            )
            out_of: dict[str, list[str]] = {}
            in_to: dict[str, list[str]] = {}
            for e in adj:
                out_of.setdefault(e["src_id"], []).append(e["dst_id"])
                in_to.setdefault(e["dst_id"], []).append(e["src_id"])
            candidates: list[str] = []
            for sid in source_ids:
                for nid in sorted(out_of.get(sid, [])) + sorted(in_to.get(sid, [])):
                    if nid not in seen:
                        seen.add(nid)
                        candidates.append(nid)
            if candidates:
                vis = (
                    self._apply_domain_scope(
                        self.visible_to(principal, now=now).filter(
                            ~F.coalesce(
                                F.array_contains(
                                    F.col("tags"), F.lit(EXPERIENCE_PLAN_TAG)
                                ),
                                F.lit(False),
                            )
                        ),
                        domain_scope,
                    )
                    .filter(F.col("id").isin(candidates))
                    .select("id", "content")
                )
                contents = {r["id"]: r["content"] for r in vis.collect()}
                linked = [
                    (nid, contents[nid]) for nid in candidates if nid in contents
                ]

        parts = [f'Reconstructed belief for cue "{query}":', "", "Direct evidence:"]
        for i, r in enumerate(rows):
            parts.append(f"{i + 1}. {self._excerpt(r['content'], 200)}")
        if not linked:
            parts += ["", "(No linked context found in the memory graph.)"]
        else:
            parts += ["", "Linked context (from graph relations):"]
            parts += [f"- {self._excerpt(c, 160)}" for _, c in linked]
        belief = {
            "cue": query,
            "summary": "\n".join(parts) + "\n",
            "source_ids": source_ids,
            "linked_context_ids": [nid for nid, _ in linked],
            "confidence": round(sum(r["score"] for r in rows) / len(rows), 6),
        }
        return hits, belief

    def _semantic_lane(
        self,
        corpus: DataFrame,
        query: str,
        limit: int | None = None,
        ann: str = "auto",
    ) -> DataFrame:
        """(id, score=dot) for one query — a 1-query view of the same
        Arrow matmul kernel the batch verb uses (operators/vector.
        batch_dot_scores; r9 — the interpreted zip_with/aggregate dot
        was measured 10-100× slower per row, the known HOF-vs-kernel
        gap). `limit` margin-prunes per Arrow batch when the caller
        only consumes a per-query top-N (see batch_dot_scores); the
        callers pass it ONLY where truncation provably cannot change
        their output."""
        if self._embedder_is_default():
            # local_frame, not createDataFrame(list): the one-row query
            # frame's pickled-slice scan schedules 32 near-empty Python
            # tasks every time a plan built on it executes (r13,
            # guide §4)
            qdf = local_frame(self.spark, [(query,)], "content string")
            qvec = qdf.select(self._embed(F.col("content")).alias("qv"))
        else:
            # one query string: embed driver-side through the configured
            # provider (ADVICE r2 — query vectors must come from the
            # same provider as stored vectors) and fold to a literal
            self.embedder.load()
            vec = [float(v) for v in self.embedder.embed([query])[0]]
            qvec = self.spark.range(1).select(
                F.array(*[F.lit(v) for v in vec]).cast("array<float>").alias("qv")
            )
        lane = self._dot_lane(
            corpus,
            qvec.select(F.lit(0).alias("_qid"), F.col("qv").alias("_qv")),
            limit=limit,
            ann=ann,
        )
        return lane.select("id", "score")

    def _ann_route(self, Q, ann: str, ann_nprobe: int | None = None):
        """Resolve the dense-lane execution mode (VERDICT r9 #3) and,
        when routed, return (codebook, cell→queries probe map, cell
        frame — the persisted id→cell index artifact).

        'auto' routes through IVF once the STORE's row count exceeds
        params.ANN_ROUTE_MIN_CORPUS — an index-time choice, like the
        reference serving every dense query from its HNSW index rather
        than an exact scan (index/usearch.rs:18-28). 'exact' and 'ivf'
        force a mode. ann_nprobe overrides the constant probe count
        for this call (nprobe ≥ n_cells probes everything — routed
        becomes exact with the routing machinery still exercised,
        which is what the recall_routed_docs oracle query pins).

        Index-time artifacts, memoized per store version (any verb
        that replaces self.memories invalidates by identity) and paid
        ONCE per corpus, never per query:
        - codebook: √n cells (≥ ANN_ROUTE_CELLS, ≤ ANN_ROUTE_MAX_CELLS
          — the FAISS nlist≈√n convention; with nprobe CONSTANT
          (VERDICT r10 #2) per-query probe cost is O(nprobe·√n) as
          implemented: probed fraction nprobe/√n FALLS as the corpus
          grows — measured 7.2% at 50k docs, 2.3% at 500k
          (docs/benchmarks/ann_route_r11.json), recall@10 gate ≥0.95
          at both); seeds are the md5-ordered first n_cells vectors
          (a deterministic uniform sample — first-N-by-id seeds
          cluster and measured recall@10 0.83), Lloyd-refined
          ANN_ROUTE_KMEANS_ITERS times.
        - cell frame (id, _cell): nearest-centroid assignment of the
          whole store, persisted under the serving cache — the query
          path never pays the assignment matmul. At 100 TB this is
          the ivf_write_partitioned layout: _cell is a partition
          column and probes prune at the FileScan.
        """
        import numpy as np

        from mnemo_spark import params as P

        if ann not in ("auto", "exact", "ivf"):
            raise ValueError(
                f"unknown ann mode {ann!r}: expected 'auto', 'exact' or 'ivf'"
            )
        if ann == "exact":
            return None
        # the memo keys on the memories OBJECT (held strongly — an
        # id() key would silently match a recycled address after the
        # old frame is garbage-collected, serving a stale cell index
        # for a different corpus)
        def _memo_usable(m) -> bool:
            if m is None or m[0] is not self.memories:
                return False
            if m[2] is None and ann == "ivf" and m[1] > 0:
                # memo was built under 'auto' below the threshold (no
                # codebook); a forced 'ivf' needs the artifacts — rebuild
                return False
            return True

        memo = getattr(self, "_ann_memo", None)
        if not _memo_usable(memo):
            # double-checked per-engine lock (ADVICE r10): only one
            # thread pays the index build per store version — a
            # concurrent first routed query waits and reuses it instead
            # of duplicating the count + md5 sort + Lloyd refinement.
            # The hit path above never takes the lock.
            with self._ann_lock:
                memo = getattr(self, "_ann_memo", None)
                if not _memo_usable(memo):
                    memo = self._ann_build(ann)
                    self._ann_memo = memo
        _, n, C, cell_frame = memo
        if ann == "auto" and n < P.ANN_ROUTE_MIN_CORPUS:
            return None
        if C is None:
            if ann == "ivf":
                # forced IVF on an empty/vectorless store: refuse loud
                raise RuntimeError(
                    "ann='ivf' requires a store with non-null embeddings"
                )
            return None
        from mnemo_spark.functions.similarity import cosine_matrix

        # CONSTANT probes per query (FAISS convention; VERDICT r10 #2
        # — the old n_cells//8 floor made per-query work n/8, linear in
        # the corpus). nprobe caps at n_cells: probing every cell is
        # the exact scan, which the recall_routed_docs oracle query
        # exploits to pin routed ≡ exact.
        nprobe = min(
            len(C), ann_nprobe if ann_nprobe is not None else P.ANN_ROUTE_NPROBE
        )
        # nprobe == n_cells probes EVERY cell: routed is definitionally
        # the exact scan (scores are exact on every emitted candidate —
        # the ann_route contract, gated byte-for-byte by
        # test_routed_scores_are_exact_on_candidates), so short-circuit
        # to the exact dense kernel and skip the probe-map/cell-join
        # bookkeeping that buys nothing in this regime (r14, VERDICT
        # r13 #3: the oracle-pinned recall_routed_docs configuration
        # paid full routing machinery for zero pruning — its DuckDB
        # twin computes exact directly and ran 2.56x faster). The
        # index artifacts above are still built and memoized, so a
        # later sub-full-probe query reuses them, and a forced 'ivf'
        # on a vectorless store still refuses loudly above.
        if nprobe >= len(C):
            return None
        order = np.argsort(-cosine_matrix(Q, C), axis=1, kind="stable")
        cell_queries: dict[int, list[int]] = {}
        for qi in range(Q.shape[0]):
            for ci in order[qi, :nprobe]:
                cell_queries.setdefault(int(ci), []).append(qi)
        return (C, cell_queries, cell_frame)

    def _ann_build(self, ann: str):
        """Build the per-store ANN index memo (store handle, row count,
        codebook, persisted cell frame) — caller holds self._ann_lock.

        The driver-side artifacts (row count, Lloyd-refined codebook)
        route through cache.cached_value keyed on the store's plan
        (VERDICT r11 #2): they are corpus-only statistics under the
        serving-cache doctrine, so a fresh engine over a semantically
        equal store plan (recall_routed_docs builds one per bench
        execution) reuses them instead of re-paying the count + seed
        collect + ANN_ROUTE_KMEANS_ITERS Lloyd passes. The cell frame
        was already plan-keyed via cached_persist."""
        import numpy as np

        from mnemo_spark import params as P
        from mnemo_spark.cache import cached_value

        n = cached_value(
            self.memories.count, "ann_store_count", key_plan=self.memories
        )
        C, cell_frame = None, None
        if n >= P.ANN_ROUTE_MIN_CORPUS or ann == "ivf":
            from mnemo_spark.operators.vector import (
                assign_cells,
                refine_centroids,
            )

            # nlist ≈ √n, unclamped up to ANN_ROUTE_MAX_CELLS (65536 →
            # 4.3B vectors): per-query probe work is nprobe·(n/√n) =
            # O(nprobe·√n). Past max_cells use a two-level split (IMI
            # / per-shard codebooks) — params.py documents the bound.
            n_cells = max(
                P.ANN_ROUTE_CELLS, min(P.ANN_ROUTE_MAX_CELLS, int(n**0.5))
            )
            vecs = self.memories.filter(
                F.col("embedding").isNotNull()
            ).select("id", "embedding")

            def _build_codebook():
                rows = (
                    vecs.orderBy(F.md5(F.col("id")), F.col("id"))
                    .limit(n_cells)
                    .select("embedding")
                    .collect()
                )
                if not rows:
                    return None
                C0 = np.asarray(
                    [[float(x) for x in r["embedding"]] for r in rows],
                    dtype=np.float64,
                )
                return refine_centroids(
                    vecs, C0, iters=P.ANN_ROUTE_KMEANS_ITERS
                )

            C = cached_value(
                _build_codebook,
                "ann_codebook",
                n_cells,
                P.ANN_ROUTE_KMEANS_ITERS,
                key_plan=vecs,
            )
            if C is not None:
                cents = local_frame(
                    self.spark,
                    [(i, [float(x) for x in C[i]]) for i in range(len(C))],
                    "cent_id int, cent_vec array<double>",
                )
                from mnemo_spark.cache import cached_persist

                cell_frame = cached_persist(
                    assign_cells(
                        vecs, cents, corpus_id="id", corpus_vec="embedding"
                    ).select("id", F.col("cent_id").alias("_cell")),
                    "ann_route_cells",
                    len(C),
                    P.ANN_ROUTE_KMEANS_ITERS,
                    key_plan=vecs,
                    compact=True,
                )
        return (self.memories, n, C, cell_frame)

    def _dot_lane(
        self,
        corpus: DataFrame,
        qvecs: DataFrame,
        limit: int | None = None,
        ann: str = "auto",
        ann_nprobe: int | None = None,
    ) -> DataFrame:
        """(\\_qid, id, score) dense dot scores for a (small) query-
        vector frame against the permission-filtered corpus.

        Kernel path: collect the query vectors (definitionally small —
        the same data movement their broadcast performed) and run one
        numpy matmul per corpus Arrow batch. NOTE: the collect means
        BUILDING a recall/recall_batch plan triggers one small Spark
        job (the query-embedding scan) before the returned frame is
        acted on — callers that require a fully-lazy plan should use
        the expression fallback. The collected matrix ships to
        executors via sparkContext.broadcast (once per executor), not
        the task closure (ADVICE r9). NULL query vectors (a zero-token
        query) fall back to the expression form so the
        NULL-propagation contract stays exact."""
        # validate HERE, not only in _ann_route: the expression
        # fallback below never reaches _ann_route, and a typo'd mode
        # must refuse rather than silently serve exact
        if ann not in ("auto", "exact", "ivf"):
            raise ValueError(
                f"unknown ann mode {ann!r}: expected 'auto', 'exact' or 'ivf'"
            )
        rows = qvecs.collect()
        ids = [r["_qid"] for r in rows]
        vecs = [r["_qv"] for r in rows]
        qid_type = qvecs.schema["_qid"].dataType
        if ids and not any(v is None for v in vecs):
            import numpy as np

            from mnemo_spark.operators.vector import batch_dot_scores

            Q = np.asarray([[float(x) for x in v] for v in vecs], dtype=np.float64)
            route = self._ann_route(Q, ann, ann_nprobe=ann_nprobe)
            if route is not None:
                C, cellq, cell_frame = route
                # inner join with the index artifact narrows the scan
                # to probed cells BEFORE Arrow transfer; on the
                # partitioned layout the isin prunes at the FileScan
                probed = sorted(cellq)
                routed_corpus = corpus.join(cell_frame, "id").filter(
                    F.col("_cell").isin(probed)
                )
                return batch_dot_scores(
                    routed_corpus,
                    ids,
                    Q,
                    corpus_id="id",
                    corpus_vec="embedding",
                    query_id="_qid",
                    qid_type=qid_type,
                    score_col="score",
                    limit=limit,
                    route=(None, cellq),
                    cell_col="_cell",
                )
            return batch_dot_scores(
                corpus,
                ids,
                Q,
                corpus_id="id",
                corpus_vec="embedding",
                query_id="_qid",
                qid_type=qid_type,
                score_col="score",
                limit=limit,
            )
        joined = corpus.select("id", "embedding").crossJoin(F.broadcast(qvecs))
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.col("_qv").cast("array<double>"),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return joined.select("_qid", "id", dot.alias("score")).filter(
            F.col("score").isNotNull()
        )

    # -- forget (forget.rs:14-120) --------------------------------------

    DECAY_RATE = 0.1  # forget.rs:205: decay_rate.unwrap_or(0.1)

    def forget(self, ids: list[str], strategy: str = "soft", now=None) -> "MnemoSparkEngine":
        return self._forget_where(F.col("id").isin(ids), strategy, now)

    def forget_ids_df(
        self, ids: DataFrame, strategy: str = "soft", now=None
    ) -> "MnemoSparkEngine":
        """Forget a DataFrame of ids (column `id`) — membership is a
        join, so a computed id set (e.g. conflict-resolution losers)
        never materializes on the driver."""
        marked = self.memories.join(
            ids.select("id", F.lit(True).alias("_hit")).distinct(), "id", "left"
        ).withColumn("_hit", F.coalesce(F.col("_hit"), F.lit(False)))
        return self._forget_marked(marked, strategy, now)

    def forget_by_criteria(
        self,
        agent_id: str | None = None,
        strategy: str = "soft",
        max_age_hours: float | None = None,
        min_importance_below: float | None = None,
        memory_type: str | None = None,
        tags: list[str] | None = None,
        now=None,
    ) -> "MnemoSparkEngine":
        """Criteria-driven forget (forget.rs:82-117 ForgetCriteria):
        age floor, importance ceiling, type and tag filters — all as
        one column predicate, never a listed id set."""
        now_c = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
        pred = F.col("deleted_at").isNull()
        if agent_id is not None:
            pred = pred & (F.col("agent_id") == agent_id)
        if memory_type is not None:
            pred = pred & (F.col("memory_type") == memory_type)
        if tags:
            pred = pred & F.arrays_overlap(
                F.col("tags"), F.array(*[F.lit(t) for t in tags])
            )
        if max_age_hours is not None:
            # keep only rows AT LEAST max_age_hours old (forget.rs:97-106)
            age_h = (F.unix_micros(now_c) - F.unix_micros(F.col("created_at"))) / 3.6e9
            pred = pred & (age_h >= max_age_hours)
        if min_importance_below is not None:
            pred = pred & (F.col("importance") < min_importance_below)
        return self._forget_where(pred, strategy, now)

    def _forget_where(self, hit, strategy: str = "soft", now=None) -> "MnemoSparkEngine":
        """Forget every row matching a Column predicate — the predicate
        stays IN the plan (no driver-side id materialization), so an
        erasure matching millions of rows is just a column filter."""
        return self._forget_marked(
            self.memories.withColumn("_hit", hit), strategy, now
        )

    def _forget_marked(
        self, marked: DataFrame, strategy: str = "soft", now=None
    ) -> "MnemoSparkEngine":
        """Strategy dispatch over a memories frame carrying a boolean
        `_hit` column (forget.rs:14-120 — all six strategies)."""
        # NULL predicate = not hit, for EVERY strategy: without this,
        # `hard`'s filter(~hit) silently drops rows where the predicate
        # is NULL (e.g. NULL content under forget_subject) — destructive
        # AND unaudited, since doomed=filter(hit) excludes them too
        marked = marked.withColumn("_hit", F.coalesce(F.col("_hit"), F.lit(False)))
        hit = F.col("_hit")
        now_c = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
        if strategy == "hard":
            mem = marked.filter(~hit)
        elif strategy == "soft":
            mem = marked.withColumn(
                "deleted_at", F.when(hit, now_c).otherwise(F.col("deleted_at"))
            )
        elif strategy == "archive":
            mem = marked.withColumn(
                "consolidation_state",
                F.when(hit, "archived").otherwise(F.col("consolidation_state")),
            )
        elif strategy == "decay":
            # forget.rs:205-210: importance -= decay_rate, floored at 0;
            # the memory stays recallable, just weaker
            mem = marked.withColumn(
                "importance",
                F.when(
                    hit,
                    F.greatest(
                        F.col("importance") - F.lit(self.DECAY_RATE), F.lit(0.0)
                    ),
                )
                .otherwise(F.col("importance"))
                .cast("float"),
            )
        elif strategy == "consolidate":
            # forget.rs:259-270: mark Consolidated — the row is folded
            # into a summary elsewhere (consolidation pass) and excluded
            # from active recall by state
            mem = marked.withColumn(
                "consolidation_state",
                F.when(hit, "consolidated").otherwise(F.col("consolidation_state")),
            )
        elif strategy == "redact":
            # GDPR redact: blank content but PRESERVE hashes so the
            # chain still verifies (integration_test.rs:2684)
            mem = marked.withColumn(
                "content", F.when(hit, F.lit("[REDACTED]")).otherwise(F.col("content"))
            ).withColumn(
                "embedding",
                F.when(hit, F.lit(None).cast("array<float>")).otherwise(F.col("embedding")),
            )
        else:
            raise ValueError(f"unknown forget strategy {strategy!r}")
        etype = {"hard": "MemoryDelete", "soft": "MemoryDelete",
                 "archive": "MemoryArchive", "redact": "MemoryRedact",
                 "decay": "MemoryDecay", "consolidate": "MemoryConsolidate"}[strategy]
        mem = mem.drop("_hit")
        doomed = marked.filter(hit).select(
            "agent_id",
            F.lit(etype).alias("event_type"),
            F.col("id").alias("memory_id"),
            now_c.alias("ts"),
        )
        events = self._append_events(doomed)
        return self._clone(memories=mem, events=events)

    def forget_subject(
        self, subject_pattern: str, strategy: str = "redact", now=None
    ) -> "MnemoSparkEngine":
        """GDPR/DPDPA subject erasure (reference forget_subject):
        select every memory mentioning the subject, apply the forget
        strategy (default redact — blanks content, preserves chain).
        The subject match is a column predicate, never a collected id
        list — a subject with millions of mentions can't OOM the
        driver."""
        return self._forget_where(
            F.col("content").rlike(subject_pattern), strategy=strategy, now=now
        )

    # -- cold storage tier (S7, storage/cold.rs) -------------------------

    def tier_out(self, cold_path: str, now=None) -> "MnemoSparkEngine":
        """S7 archive (storage/cold.rs:82 `archive`): move every
        archived-state row to the cold parquet tier and drop it from
        the hot frame. Cold layout is parquet partitioned by agent_id
        — at 100 TB that is object-store prefixes per agent, and
        restore prunes on the partition column."""
        now_c = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
        cold = self.memories.filter(F.col("consolidation_state") == "archived")
        cold.write.mode("append").partitionBy("agent_id").parquet(cold_path)
        hot = self.memories.filter(
            F.col("consolidation_state").isNull()
            | (F.col("consolidation_state") != "archived")
        )
        events = self._append_events(
            cold.select(
                "agent_id",
                F.lit("MemoryTieredOut").alias("event_type"),
                F.col("id").alias("memory_id"),
                now_c.alias("ts"),
            )
        )
        return self._clone(memories=hot, events=events)

    def tier_in(self, cold_path: str, ids: DataFrame | None = None) -> "MnemoSparkEngine":
        """S7 restore (storage/cold.rs:87 `restore`): read rows back
        from the cold tier — all of them, or the subset in `ids`
        (a one-column `id` frame; membership is a join) — skipping any
        id already hot."""
        back = self.spark.read.parquet(cold_path).select(
            *[f.name for f in MEMORY_SCHEMA.fields]
        )
        if ids is not None:
            back = back.join(ids.select("id").distinct(), "id", "left_semi")
        # tier_out appends: archive→restore→re-archive cycles leave the
        # same id multiple times INSIDE the cold data — keep only the
        # latest copy per id (created_at, then content_hash as a
        # deterministic tie-break) before the hot anti-join
        w = Window.partitionBy("id").orderBy(
            F.col("created_at").desc(), F.col("content_hash").desc()
        )
        back = (
            back.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        back = back.join(self.memories.select("id"), "id", "left_anti")
        # allowMissingColumns: a VersionedEngine's hot frame carries
        # `branch`, which the cold schema doesn't — restored rows land
        # with NULL branch and are defaulted to 'main'
        mem = self.memories.unionByName(back, allowMissingColumns=True)
        if "branch" in self.memories.columns:
            mem = mem.withColumn("branch", F.coalesce(F.col("branch"), F.lit("main")))
        return self._clone(memories=mem)

    # -- experience tier (P5, query/experience.rs) -----------------------

    experience_enabled = False  # experience.rs: gated, off by default

    def with_experience_memory(self) -> "MnemoSparkEngine":
        out = self._clone()
        out.experience_enabled = True
        return out

    @staticmethod
    def _signature_tokens(query: str) -> list[str]:
        """experience.rs:152-162: >=3-char alphanumeric runs,
        lowercased, sorted, deduped."""
        import re as _re

        toks = [
            t.lower() for t in _re.split(r"[^0-9A-Za-z]+", query) if len(t) >= 3
        ]
        return sorted(set(toks))

    def remember_plan(
        self,
        plan_id: str,
        agent_id: str,
        query: str,
        steps: list[str],
        chunk_ids: list[str],
        outcome_score: float,
        created_at,
        scope: str = "private",
    ) -> tuple["MnemoSparkEngine", bool]:
        """REMEMBER_PLAN (experience.rs:205-256): cache a confirmed-good
        retrieval plan as an ordinary memory row carrying the reserved
        tag + JSON payload — hashing/embedding/audit come free from the
        normal write path. Failures (< success threshold) are never
        cached. Returns (engine, stored)."""
        import json as _json

        if not self.experience_enabled:
            raise ValueError(
                "experience memory mode is disabled; enable it with "
                "with_experience_memory() (experience.rs gate)"
            )
        if not (outcome_score >= PLAN_SUCCESS_THRESHOLD):  # NaN rejects
            return self, False
        toks = self._signature_tokens(query)
        payload = _json.dumps(
            {
                "query": query,
                "signature_tokens": toks,
                "steps": list(steps),
                "chunk_ids": list(chunk_ids),
                "outcome_score": max(0.0, min(1.0, outcome_score)),
            }
        )
        row = self.spark.createDataFrame(
            [
                (
                    plan_id,
                    agent_id,
                    query,
                    "procedural",
                    scope,
                    float(max(0.0, min(1.0, outcome_score))),
                    [EXPERIENCE_PLAN_TAG],
                    payload,
                    created_at,
                )
            ],
            "id string, agent_id string, content string, memory_type string, "
            "scope string, importance float, tags array<string>, "
            "metadata string, created_at timestamp",
        )
        return self.remember_batch(row), True

    def recall_plan(
        self, query: str, principal: str, threshold: float | None = None, now=None
    ) -> DataFrame:
        """RECALL_PLAN (experience.rs:259-330): best stored plan whose
        signature-token Jaccard clears the threshold, or an empty frame
        (miss). Disabled mode always misses. The signature match is one
        filtered aggregation: query tokens are plan-time literals, the
        per-plan intersection is array_intersect — no UDF, no collect."""
        if not self.experience_enabled:
            return self.spark.createDataFrame(
                [], "id string, query string, outcome_score double, similarity double"
            )
        threshold = (
            threshold if threshold is not None else PLAN_SIMILARITY_THRESHOLD
        )
        qsig = self._signature_tokens(query)
        qlit = F.array(*[F.lit(t) for t in qsig])
        plans = self.visible_to(principal, now=now).filter(
            F.coalesce(
                F.array_contains(F.col("tags"), F.lit(EXPERIENCE_PLAN_TAG)),
                F.lit(False),
            )
        )
        sig = F.from_json(
            F.get_json_object("metadata", "$.signature_tokens"), "array<string>"
        )
        inter = F.size(F.array_intersect(sig, qlit)).cast("double")
        union = (F.size(sig) + F.lit(len(qsig))).cast("double") - inter
        sim = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
        scored = plans.select(
            "id",
            F.get_json_object("metadata", "$.query").alias("query"),
            F.get_json_object("metadata", "$.outcome_score")
            .cast("double")
            .alias("outcome_score"),
            F.round(sim, 6).alias("similarity"),
        ).filter(F.col("similarity") >= threshold)
        return scored.orderBy(F.desc("similarity"), F.asc("id")).limit(1)

    # -- consolidation with maturity gate (A7, maturity.rs) --------------

    def consolidate(
        self,
        memory_ids: list[str],
        topic_name: str,
        agent_id: str | None = None,
        summary: str | None = None,
        supersede: str | None = None,
        now=None,
        new_id: str | None = None,
    ) -> tuple["MnemoSparkEngine", dict]:
        """v0.5.0 caller-driven topic-document consolidation (reference
        query/consolidate.rs `execute`; Infini-Memory,
        arXiv:2606.10677): collect an explicit member set into ONE
        revisable topic document —

        - deterministic body when no `summary`: '# topic' heading plus
          the member contents joined in request order (same inputs →
          same document),
        - provenance preserved in metadata: `topic`,
          `consolidated_from` (member ids), `members` (per-member
          created_at/importance), `revision_of` on revision,
        - fact revision via `supersede`: the old document is RETAINED
          (marked consolidated + metadata.superseded_by — never
          deleted, the hash chain stays whole) and the new one carries
          version = old + 1,
        - the document is a normal recallable memory (semantic type,
          topic tag, max member importance, first member's scope),
          written through remember_batch so it hashes, chains, and
          embeds like any write,
        - audit: MemoryConsolidated always, MemoryRevised on revision.

        Validation mirrors the reference: non-empty member set,
        non-blank topic, every member must exist, be un-deleted, and
        be VISIBLE to the owning agent (PermissionDenied otherwise);
        a superseded document must exist and belong to the same agent.
        The member set is caller-chosen and id-addressed — k-sized
        driver-side state by definition."""
        import json as _json
        import uuid as _uuid

        if not memory_ids:
            raise ValueError("consolidate: memory_ids must be non-empty")
        topic = topic_name.strip()
        if not topic:
            raise ValueError("consolidate: topic_name must be non-blank")
        ids = list(dict.fromkeys(memory_ids))
        rows = {
            r["id"]: r
            for r in self.memories.filter(F.col("id").isin(ids)).collect()
        }
        for i in ids:
            if i not in rows:
                raise ValueError(f"consolidate: memory {i} not found")
            if rows[i]["deleted_at"] is not None:
                raise ValueError(f"consolidate: memory {i} is deleted")
        # default agent comes from the FIRST member in the deterministic
        # (created_at, id) order, not caller argument order — otherwise
        # an omitted agent_id makes the document's owner (and the
        # permission-check outcome) depend on how the caller happened to
        # order the ids (ADVICE r6; the reference takes agent_id from
        # the request, consolidate.rs:179)
        agent = (
            agent_id
            if agent_id is not None
            else min(rows.values(), key=lambda m: (m["created_at"], m["id"]))[
                "agent_id"
            ]
        )
        visible = {
            r["id"]
            for r in self.visible_to(agent, now=now)
            .filter(F.col("id").isin(ids))
            .select("id")
            .collect()
        }
        for i in ids:
            if i not in visible:
                raise PermissionError(
                    f"consolidate: agent {agent!r} cannot read memory {i}"
                )

        version, superseded_id = 1, None
        eng = self
        if supersede is not None:
            old = self.memories.filter(F.col("id") == supersede).collect()
            if not old:
                raise ValueError(
                    f"consolidate: topic document {supersede} to supersede not found"
                )
            old = old[0]
            if old["agent_id"] != agent:
                raise PermissionError(
                    "consolidate: cannot supersede another agent's document"
                )
            try:
                version = int(
                    _json.loads(old["metadata"] or "{}").get("version", 1)
                ) + 1
            except (ValueError, TypeError):
                version = 2
            superseded_id = supersede

        # Deterministic synthesis order: the reference sorts the deduped
        # member set by (created_at, id) BEFORE building the body, the
        # members provenance, consolidated_from, and even the scope pick
        # (consolidate.rs:179, :254) — the same member set in any caller
        # order must yield an identical document / content_hash. This is
        # also the order the batch twin topic_doc_bodies_events uses.
        members = sorted(
            (rows[i] for i in ids),
            key=lambda m: (m["created_at"], m["id"]),
        )
        ids = [m["id"] for m in members]
        if summary is not None and summary.strip():
            body = summary
        else:
            body = f"# {topic}\n\n" + "\n\n".join(
                m["content"] or "" for m in members
            )
        meta = {
            "topic": topic,
            "version": version,
            "consolidated_from": ids,
            "members": [
                {
                    "id": m["id"],
                    "created_at": str(m["created_at"]),
                    "importance": float(m["importance"]),
                }
                for m in members
            ],
        }
        if superseded_id is not None:
            meta["revision_of"] = superseded_id

        doc_id = new_id if new_id is not None else _uuid.uuid4().hex
        now_py = now if now is not None else __import__("datetime").datetime.utcnow()
        new_row = self.spark.createDataFrame(
            [
                (
                    doc_id,
                    agent,
                    body,
                    "semantic",
                    members[0]["scope"],
                    max(float(m["importance"]) for m in members),
                    [topic],
                    now_py,
                    _json.dumps(meta),
                )
            ],
            "id string, agent_id string, content string, memory_type string,"
            " scope string, importance float, tags array<string>,"
            " created_at timestamp, metadata string",
        )
        eng = self.remember_batch(new_row)
        now_c = F.lit(now_py).cast("timestamp")
        audit = [("MemoryConsolidated", doc_id)]
        if superseded_id is not None:
            audit.append(("MemoryRevised", superseded_id))
            # retain the old document: state flip + superseded_by marker
            old_meta_raw = old["metadata"]
            try:
                old_meta = _json.loads(old_meta_raw) if old_meta_raw else {}
            except ValueError:
                old_meta = {}
            old_meta["superseded_by"] = doc_id
            hit = F.col("id") == superseded_id
            eng = eng._clone(
                memories=eng.memories.withColumns(
                    {
                        "consolidation_state": F.when(
                            hit, "consolidated"
                        ).otherwise(F.col("consolidation_state")),
                        "metadata": F.when(
                            hit, F.lit(_json.dumps(old_meta))
                        ).otherwise(F.col("metadata")),
                    }
                )
            )
        events = eng._append_events(
            self.spark.createDataFrame(
                [(agent, et, mid) for et, mid in audit],
                "agent_id string, event_type string, memory_id string",
            ).select("agent_id", "event_type", "memory_id", now_c.alias("ts"))
        )
        eng = eng._clone(events=events)
        stored = eng.memories.filter(F.col("id") == doc_id).collect()[0]
        return eng, {
            "topic_document_id": doc_id,
            "topic_name": topic,
            "source_count": len(ids),
            "version": version,
            "superseded_id": superseded_id,
            "member_ids": ids,
            "content_hash": stored["content_hash"],
        }

    def run_consolidation(
        self,
        policy: str = "fixed",
        similarity_threshold: float = 0.92,
        maturity_threshold: float = 0.55,
        min_cluster_size: int = 2,
        now=None,
    ) -> "MnemoSparkEngine":
        """Cluster near-duplicate live memories (per-agent cosine pairs
        → connected components) and mark members of qualifying clusters
        consolidated. policy='fixed' consolidates every cluster at the
        size floor (the reference default); policy='maturity' gates
        each cluster on the four-component maturity score
        (maturity.rs:52-230)."""
        from mnemo_spark.operators.consolidate import connected_components
        from mnemo_spark.operators.maturity import cluster_maturity, mature_clusters
        from mnemo_spark.operators.vector import cosine_pairs

        live = self.memories.filter(
            F.col("deleted_at").isNull()
            & (F.col("consolidation_state") == "active")
            & F.col("embedding").isNotNull()
        )
        pairs = cosine_pairs(
            live.select("id", "agent_id", "embedding"),
            similarity_threshold,
            id_col="id",
            vec_col="embedding",
            group_col="agent_id",
        )
        labels = connected_components(pairs, "id_a", "id_b")  # (node, cluster)
        members = labels.join(
            live.select(
                F.col("id").alias("node"),
                # no last_accessed_at column in this schema: creation
                # time is the access-recency anchor, like the reference
                # falls back to created_at (maturity.rs:247)
                F.col("created_at").alias("last_accessed_at"),
                "access_count",
                "embedding",
            ),
            "node",
        )
        sizes = members.groupBy("cluster").agg(F.count("*").alias("n_members"))
        if policy == "maturity":
            scores = cluster_maturity(
                members.select(
                    "cluster",
                    F.col("node").alias("id"),
                    "last_accessed_at",
                    "access_count",
                    "embedding",
                ),
                now if now is not None else __import__("datetime").datetime.utcnow(),
            )
            keep = mature_clusters(
                scores, maturity_threshold, min_cluster_size
            ).select("cluster")
        elif policy == "fixed":
            keep = sizes.filter(F.col("n_members") >= min_cluster_size).select(
                "cluster"
            )
        else:
            raise ValueError(f"unknown consolidation policy {policy!r}")
        doomed = members.join(keep, "cluster").select(F.col("node").alias("id"))
        return self.forget_ids_df(doomed, "consolidate", now)

    # -- conflicts (conflict.rs:84-260) ----------------------------------

    def detect_conflicts(self, threshold: float = 0.85) -> DataFrame:
        """Same-agent high-similarity different-content pairs
        (conflict.rs:84-151). → (agent_id, id_a, id_b, similarity).

        Scoped per agent exactly like the reference (the candidate
        search is per-record within the agent's memories), so the
        pairwise term is bounded by the largest single agent, never
        the corpus."""
        from mnemo_spark.operators.vector import cosine_pairs

        live = self.memories.filter(
            F.col("deleted_at").isNull()
            & F.col("quarantined").isNull()
            & F.col("embedding").isNotNull()
        ).select("id", "agent_id", "content", "embedding")
        pairs = cosine_pairs(
            live, threshold, id_col="id", vec_col="embedding", group_col="agent_id"
        )
        content = live.select("id", "content")
        return (
            pairs.join(
                content.select(
                    F.col("id").alias("id_a"), F.col("content").alias("_ca")
                ),
                "id_a",
            )
            .join(
                content.select(
                    F.col("id").alias("id_b"), F.col("content").alias("_cb")
                ),
                "id_b",
            )
            .filter(F.col("_ca") != F.col("_cb"))  # conflict.rs:135
            .select(
                "agent_id",
                "id_a",
                "id_b",
                F.col("cos_sim").alias("similarity"),
            )
        )

    def resolve_conflicts(
        self, pairs: DataFrame, strategy: str = "keep_newest", now=None
    ) -> "MnemoSparkEngine":
        """Batch conflict resolution (conflict.rs:154-260).

        pairs: (id_a, id_b) — typically detect_conflicts output.
        Strategies: keep_newest (soft-delete the older), keep_highest_
        importance (soft-delete the less important), merge_into_semantic
        (write one combined Semantic memory per pair — content joined
        with ' | ', averaged importance, unioned tags — then soft-delete
        both originals), manual (no-op flag-for-review).

        All set algebra is joins; loser ids never touch the driver.
        """
        if strategy == "manual":
            return self  # conflict.rs:247: flag only
        m = self.memories
        a = m.select(
            F.col("id").alias("id_a"),
            F.col("created_at").alias("_ca"),
            F.col("importance").alias("_ia"),
            F.col("content").alias("_cta"),
            F.col("tags").alias("_tga"),
            F.col("agent_id").alias("_aga"),
            F.col("scope").alias("_sa"),
        )
        b = m.select(
            F.col("id").alias("id_b"),
            F.col("created_at").alias("_cb"),
            F.col("importance").alias("_ib"),
            F.col("content").alias("_ctb"),
            F.col("tags").alias("_tgb"),
        )
        j = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
        if strategy == "keep_newest":
            # a wins ties, mirroring `mem_a.created_at >= mem_b.created_at`
            loser = F.when(F.col("_ca") >= F.col("_cb"), F.col("id_b")).otherwise(
                F.col("id_a")
            )
            return self.forget_ids_df(j.select(loser.alias("id")), "soft", now)
        if strategy == "keep_highest_importance":
            loser = F.when(F.col("_ia") >= F.col("_ib"), F.col("id_b")).otherwise(
                F.col("id_a")
            )
            return self.forget_ids_df(j.select(loser.alias("id")), "soft", now)
        if strategy == "merge_into_semantic":
            now_lit = now if now is not None else None
            merged = j.select(
                # deterministic merged id (the reference mints UUIDv7;
                # here the pair defines the merge, so hash it)
                F.concat_ws(
                    "-", F.lit("merged"), F.substring(
                        F.sha2(F.concat_ws("|", F.col("id_a"), F.col("id_b")), 256), 1, 16
                    )
                ).alias("id"),
                F.col("_aga").alias("agent_id"),
                F.concat_ws(" | ", F.col("_cta"), F.col("_ctb")).alias("content"),
                F.lit("semantic").alias("memory_type"),
                F.col("_sa").alias("scope"),
                ((F.col("_ia") + F.col("_ib")) / 2.0).cast("float").alias("importance"),
                # a's tags in order, then b's novel tags (conflict.rs:196)
                F.array_union(F.col("_tga"), F.col("_tgb")).alias("tags"),
                (
                    F.lit(now_lit).cast("timestamp")
                    if now_lit is not None
                    else F.current_timestamp()
                ).alias("created_at"),
            )
            grown = self.remember_batch(merged)
            losers = pairs.select(F.col("id_a").alias("id")).unionByName(
                pairs.select(F.col("id_b").alias("id"))
            )
            return grown.forget_ids_df(losers, "soft", now)
        raise ValueError(f"unknown resolution strategy {strategy!r}")

    # -- reflection (reflection.rs:147-301) ------------------------------

    REFLECTION_DEDUP_THRESHOLD = 0.92  # reflection.rs:39
    REFLECTION_LOW_IMPORTANCE = 0.3  # reflection.rs:40
    ARCHIVE_IMPORTANCE = 0.2  # reflection.rs:41
    ARCHIVE_AGE_HOURS = 168.0  # reflection.rs:42 (24*7)

    def run_reflection_pass(
        self, agent_id: str | None = None, now=None
    ) -> tuple["MnemoSparkEngine", dict]:
        """The reference's full 5-stage reflection pass
        (reflection.rs:147-301), each stage a DataFrame program:

        1. date absolutization — relative phrases rewritten to ISO
           dates anchored at created_at; changed rows re-hash + re-embed
        2. Auto-Dream accept — rows carrying a 'dreamed_at' tag marker
           (metadata analog) re-hash/re-embed once, then get the
           idempotent 'dreamed_processed' marker
        3. semantic dedup — cosine >= 0.92 same-agent pairs: the newer
           side keeps (tags unioned, access counts summed), the older
           is marked consolidated
        4. low-importance conflict resolution — different-content pairs
           where BOTH importances < 0.3 resolve keep_newest
        5. stale archival — age >= 168h, access_count == 0, effective
           importance < 0.2 (exponential decay + access boost), not
           consolidated in stage 3 → archived

        Returns (new_engine, report) with per-stage counts, mirroring
        ReflectionReport. The reference's greedy in-memory scan becomes
        batch set algebra: all qualifying pairs resolve in one round
        (tested upstream at integration_test.rs:3143-3326).
        """
        from mnemo_spark.functions.decay import effective_importance
        from mnemo_spark.functions.reflection import absolutize_dates

        now_c = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
        scope = (
            (F.col("agent_id") == agent_id) if agent_id is not None else F.lit(True)
        ) & F.col("deleted_at").isNull()
        mem = self.memories
        report: dict[str, int] = {"total_scanned": mem.filter(scope).count()}

        # -- 1. date absolutization ------------------------------------
        # materialize the rewrite as a column FIRST, then apply every
        # dependent rewrite (content/hash/embedding) in ONE projection:
        # sequential withColumns would re-reference the rewritten
        # content and flip the change predicate
        mem = mem.withColumn(
            "_nc", absolutize_dates(F.col("content"), F.col("created_at"))
        ).withColumn("_chg", scope & (F.col("_nc") != F.col("content")))
        report["absolutized_dates"] = mem.filter(F.col("_chg")).count()
        new_hash = F.sha2(
            F.concat_ws(
                "|", F.col("_nc"), F.col("agent_id"), F.col("created_at").cast("string")
            ),
            256,
        )
        mem = mem.withColumns(
            {
                "content": F.when(F.col("_chg"), F.col("_nc")).otherwise(
                    F.col("content")
                ),
                "content_hash": F.when(F.col("_chg"), new_hash).otherwise(
                    F.col("content_hash")
                ),
            }
        )
        mem = self._embed_when(mem, F.col("_chg"), "_nc").drop("_nc", "_chg")

        # -- 2. Auto-Dream accept --------------------------------------
        dreamed = (
            scope
            & F.array_contains(F.col("tags"), "dreamed_at")
            & ~F.array_contains(F.col("tags"), "dreamed_processed")
        )
        report["dreamed_accepted"] = mem.filter(dreamed).count()
        mem = self._embed_when(mem, dreamed, "content").withColumn(
            "tags",
            F.when(
                dreamed,
                F.array_union(F.col("tags"), F.array(F.lit("dreamed_processed"))),
            ).otherwise(F.col("tags")),
        )
        # barrier: stages 3-5 join this frame against itself several
        # times — materialize once so the rewrite/re-embed expressions
        # don't re-execute per join branch (same localCheckpoint
        # pattern as the connected-components loop)
        mem = mem.localCheckpoint(eager=True)

        # pair detection shared by stages 3 and 4 (the reference uses
        # the same 0.92 threshold for both): same-agent cosine pairs
        from mnemo_spark.operators.vector import cosine_pairs

        live = mem.filter(scope & F.col("quarantined").isNull() & F.col("embedding").isNotNull())
        pairs = cosine_pairs(
            live.select("id", "agent_id", "embedding"),
            self.REFLECTION_DEDUP_THRESHOLD,
            id_col="id",
            vec_col="embedding",
            group_col="agent_id",
        ).localCheckpoint(eager=True)  # reused 3x below; don't re-run the matmul

        attrs = mem.select(
            "id",
            F.col("created_at").alias("_t"),
            F.col("importance").alias("_imp"),
            F.col("content").alias("_ct"),
            F.col("tags").alias("_tg"),
            F.col("access_count").alias("_ac"),
        )
        j = (
            pairs.join(
                attrs.select(
                    F.col("id").alias("id_a"),
                    F.col("_t").alias("_ta"),
                    F.col("_imp").alias("_ia"),
                    F.col("_ct").alias("_cta"),
                    F.col("_tg").alias("_tga"),
                    F.col("_ac").alias("_aca"),
                ),
                "id_a",
            )
            .join(
                attrs.select(
                    F.col("id").alias("id_b"),
                    F.col("_t").alias("_tb"),
                    F.col("_imp").alias("_ib"),
                    F.col("_ct").alias("_ctb"),
                    F.col("_tg").alias("_tgb"),
                    F.col("_ac").alias("_acb"),
                ),
                "id_b",
            )
        )

        # -- 3. semantic dedup (consolidate_duplicates) ----------------
        # newer keeps; pair order (id_a < id_b) breaks created_at ties
        # toward a, like the reference's scan order
        victim = F.when(F.col("_ta") >= F.col("_tb"), F.col("id_b")).otherwise(F.col("id_a"))
        keeper = F.when(F.col("_ta") >= F.col("_tb"), F.col("id_a")).otherwise(F.col("id_b"))
        vtags = F.when(F.col("_ta") >= F.col("_tb"), F.col("_tgb")).otherwise(F.col("_tga"))
        vac = F.when(F.col("_ta") >= F.col("_tb"), F.col("_acb")).otherwise(F.col("_aca"))
        dedup_sets = j.select(
            victim.alias("_victim"), keeper.alias("_keeper"),
            vtags.alias("_vtags"), vac.alias("_vac"),
        )
        victims = dedup_sets.select(F.col("_victim").alias("id")).distinct()
        report["consolidated"] = victims.count()
        # keeper absorbs: union of victim tags, sum of victim access
        keeper_gain = dedup_sets.groupBy(F.col("_keeper").alias("id")).agg(
            F.flatten(F.collect_list("_vtags")).alias("_gain_tags"),
            F.sum("_vac").alias("_gain_ac"),
        )
        mem = (
            mem.join(victims.select(F.col("id"), F.lit(True).alias("_isv")), "id", "left")
            .join(keeper_gain, "id", "left")
            .withColumn(
                "consolidation_state",
                F.when(F.col("_isv"), "consolidated").otherwise(
                    F.col("consolidation_state")
                ),
            )
            .withColumn(
                "tags",
                F.when(
                    F.col("_gain_tags").isNotNull(),
                    F.array_union(F.col("tags"), F.col("_gain_tags")),
                ).otherwise(F.col("tags")),
            )
            .withColumn(
                "access_count",
                F.when(
                    F.col("_gain_ac").isNotNull(),
                    (F.col("access_count") + F.col("_gain_ac")).cast("long"),
                ).otherwise(F.col("access_count")),
            )
            .drop("_isv", "_gain_tags", "_gain_ac")
        )

        # -- 4. low-importance conflict resolution (keep_newest) -------
        low_pairs = j.filter(
            (F.col("_cta") != F.col("_ctb"))
            & (F.col("_ia") < self.REFLECTION_LOW_IMPORTANCE)
            & (F.col("_ib") < self.REFLECTION_LOW_IMPORTANCE)
        )
        losers = low_pairs.select(
            F.when(F.col("_ta") >= F.col("_tb"), F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("id")
        ).distinct()
        report["conflicts_resolved"] = losers.count()
        mem = mem.join(
            losers.select("id", F.lit(True).alias("_loser")), "id", "left"
        ).withColumn(
            "deleted_at",
            F.when(F.col("_loser") & F.col("deleted_at").isNull(), now_c).otherwise(
                F.col("deleted_at")
            ),
        ).drop("_loser")

        # -- 5. stale archival -----------------------------------------
        eff = effective_importance(
            F.col("importance"),
            F.col("created_at"),
            now_c,
            F.col("access_count"),
            F.lit(None),
            F.lit(None),
        )
        age_h = (F.unix_micros(now_c) - F.unix_micros(F.col("created_at"))) / 3.6e9
        stale = (
            scope
            & F.col("deleted_at").isNull()
            & (F.col("consolidation_state") == "active")
            & (F.col("access_count") == 0)
            & (eff < self.ARCHIVE_IMPORTANCE)
            & (age_h >= self.ARCHIVE_AGE_HOURS)
        )
        report["archived"] = mem.filter(stale).count()
        mem = mem.withColumn(
            "consolidation_state",
            F.when(stale, "archived").otherwise(F.col("consolidation_state")),
        )

        scoped = (
            self.memories.filter(F.col("agent_id") == agent_id)
            if agent_id is not None
            else self.memories
        )
        events = self._append_events(
            scoped.select("agent_id")
            .distinct()
            .select(
                "agent_id",
                F.lit("ReflectionCompleted").alias("event_type"),
                F.lit("reflection-pass").alias("memory_id"),
                now_c.alias("ts"),
            )
        )
        return self._clone(memories=mem, events=events), report

    # v0.3.1 Coordinated-mode cadence gates (reflection.rs:66,70)
    MIN_NEW_RECORDS_FOR_COORDINATED_RUN = 5
    MIN_HOURS_BETWEEN_COORDINATED_RUNS = 24

    def run_reflection_pass_with_mode(
        self,
        agent_id: str | None = None,
        mode: str = "coordinated",
        force: bool = False,
        now=None,
    ) -> tuple["MnemoSparkEngine", dict]:
        """Reflection pass honouring the v0.3.1 `ReflectionMode` gate
        (reference reflection.rs:44-141, coordinated_skip_reason at
        :531-575): `coordinated` (the reference default) skips the
        expensive phases when

        - fewer than MIN_HOURS_BETWEEN_COORDINATED_RUNS hours passed
          since this agent's last ReflectionCompleted event
          (skipped='too_soon'), or
        - fewer than MIN_NEW_RECORDS_FOR_COORDINATED_RUN records were
          created since that pass (skipped='not_enough_new_records').

        `force=True` overrides the gates; mode `always` is the
        pre-v0.3.1 unconditional pass. A skipped run mutates NOTHING
        and reports skipped=<reason>. After a pass that runs, any
        Auto-Dream organization-report trailers are ingested
        idempotently (report['dream_report_ingested'])."""
        import datetime as _dt

        if mode not in ("coordinated", "always"):
            raise ValueError(f"unknown reflection mode {mode!r}")
        now_py = now if now is not None else _dt.datetime.utcnow()
        if mode == "coordinated" and not force:
            scope_ev = F.col("event_type") == "ReflectionCompleted"
            if agent_id is not None:
                scope_ev = scope_ev & (F.col("agent_id") == agent_id)
            last_row = self.events.filter(scope_ev).agg(F.max("ts")).first()
            last = last_row[0] if last_row else None
            skip = None
            if last is not None and (
                (now_py - last).total_seconds()
                < self.MIN_HOURS_BETWEEN_COORDINATED_RUNS * 3600
            ):
                skip = "too_soon"
            else:
                live = F.col("deleted_at").isNull()
                if agent_id is not None:
                    live = live & (F.col("agent_id") == agent_id)
                if last is not None:
                    live = live & (F.col("created_at") > F.lit(last))
                if (
                    self.memories.filter(live).count()
                    < self.MIN_NEW_RECORDS_FOR_COORDINATED_RUN
                ):
                    skip = "not_enough_new_records"
            if skip is not None:
                return self, {
                    "skipped": skip,
                    "total_scanned": 0,
                    "absolutized_dates": 0,
                    "dreamed_accepted": 0,
                    "consolidated": 0,
                    "conflicts_resolved": 0,
                    "archived": 0,
                    "dream_report_ingested": 0,
                }
        out, report = self.run_reflection_pass(agent_id=agent_id, now=now_py)
        report["skipped"] = None
        out, report["dream_report_ingested"] = out._ingest_dream_reports(
            agent_id, now_py
        )
        return out, report

    def _ingest_dream_reports(
        self, agent_id: str | None, now
    ) -> tuple["MnemoSparkEngine", int]:
        """Auto-Dream organization-report trailer ingestion
        (reflection.rs:639-724): records whose content carries an
        '## Organization Report' trailer get a DreamReportIngested
        audit event and the idempotent metadata marker
        `dream_report_ingested_at`, so the next pass skips them. The
        reference's permissive per-record regex parse becomes one
        filtered projection; the parsed counts ride in the event
        stream via the per-record marker."""
        now_c = F.lit(now).cast("timestamp")
        scope = F.col("deleted_at").isNull()
        if agent_id is not None:
            scope = scope & (F.col("agent_id") == agent_id)
        marker = F.get_json_object(
            F.col("metadata"), "$.dream_report_ingested_at"
        )
        hit = (
            scope
            & marker.isNull()
            & F.lower(F.col("content")).contains("## organization report")
        )
        n = self.memories.filter(hit).count()
        if n == 0:
            return self, 0
        stamp = F.concat(
            F.lit('{"dream_report_ingested_at":"'),
            now_c.cast("string"),
            F.lit('"'),
        )
        # insert the marker key into the JSON object string; splicing is
        # only valid when metadata IS an object — null/empty/non-object
        # metadata (array, string, number) gets a fresh object instead,
        # as ReasoningProvenance::attach does in the reference
        empty = F.col("metadata").isNull() | (
            F.regexp_replace(F.col("metadata"), r"\s", "") == "{}"
        )
        # a '{'-prefix alone is not an object: malformed metadata like
        # '{bad' would splice into invalid JSON and break the
        # idempotence marker on every later pass (ADVICE r6) — gate on
        # actual parseability (get_json_object returns NULL for
        # unparseable input, non-NULL '{...}' for a real object)
        # NULL-safe: get_json_object returns NULL for unparseable input,
        # and TRUE & NULL = NULL would fall through when() into the
        # splice branch (ADVICE r7) — coalesce the whole predicate to
        # FALSE so malformed metadata always takes the fresh-object arm.
        is_object = F.coalesce(
            F.col("metadata").rlike(r"^\s*\{")
            & F.get_json_object(F.col("metadata"), "$").rlike(r"^\{"),
            F.lit(False),
        )
        new_meta = F.when(
            empty | ~is_object, F.concat(stamp, F.lit("}"))
        ).otherwise(
            F.concat(
                stamp,
                F.lit(","),
                F.regexp_replace(F.col("metadata"), r"^\s*\{", ""),
            )
        )
        stamped = self.memories.withColumn(
            "metadata", F.when(hit, new_meta).otherwise(F.col("metadata"))
        )
        events = self._append_events(
            self.memories.filter(hit).select(
                "agent_id",
                F.lit("DreamReportIngested").alias("event_type"),
                F.col("id").alias("memory_id"),
                now_c.alias("ts"),
            )
        )
        return self._clone(memories=stamped, events=events), n

    def verify_event_integrity(self) -> DataFrame:
        """A9 on the audit log itself (verify_event_chain); chain
        order is the T6 logical clock, not wall-clock ts."""
        return verify_chain(self.events, ["agent_id"], ["logical_clock"])

    # -- integrity (A9) --------------------------------------------------

    def verify_integrity(self) -> DataFrame:
        """Recompute each agent's chain from content hashes and diff
        against stored chain_hash → (agent_id, first break position);
        empty result = intact. Chain order is (created_at, chain_seq):
        the reference's insertion-stable ORDER BY created_at
        (duckdb.rs:689) — chain_seq carries the append order across
        batches so same-timestamp writes recompute deterministically."""
        return verify_chain(
            self.memories.filter(F.col("content_hash").isNotNull()),
            ["agent_id"],
            ["created_at", "chain_seq"],
        )

    # -- lifecycle -------------------------------------------------------

    def quarantine(
        self, ids: list[str], reason: str = "Quarantined by admin", now=None
    ) -> "MnemoSparkEngine":
        """Poisoning-defense quarantine (reference
        mnemo-admin/src/handlers.rs:301-321): stamp `quarantined` with
        the reason; every recall path already excludes quarantined
        rows (visible_to / conflict / consolidation filters), so the
        record is replayable-but-invisible, never deleted. Appends a
        MemoryQuarantine audit event per target."""
        now_c = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
        hit = F.col("id").isin(ids)
        stamped = self.memories.withColumn(
            "quarantined", F.when(hit, F.lit(reason)).otherwise(F.col("quarantined"))
        )
        events = self._append_events(
            self.memories.filter(hit).select(
                "agent_id",
                F.lit("MemoryQuarantine").alias("event_type"),
                F.col("id").alias("memory_id"),
                now_c.alias("ts"),
            )
        )
        return self._clone(memories=stamped, events=events)

    def unquarantine(self, ids: list[str], now=None) -> "MnemoSparkEngine":
        """Release from quarantine (handlers.rs:324-344): clear the
        flag, append a MemoryUnquarantine audit event."""
        now_c = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
        hit = F.col("id").isin(ids)
        stamped = self.memories.withColumn(
            "quarantined",
            F.when(hit, F.lit(None).cast("string")).otherwise(F.col("quarantined")),
        )
        events = self._append_events(
            self.memories.filter(hit).select(
                "agent_id",
                F.lit("MemoryUnquarantine").alias("event_type"),
                F.col("id").alias("memory_id"),
                now_c.alias("ts"),
            )
        )
        return self._clone(memories=stamped, events=events)

    def replay_quarantine(
        self, agent_id: str | None = None, since=None
    ) -> DataFrame:
        """List quarantined records for operator review (reference
        query/mod.rs:321-330, query/poisoning.rs:268-305
        `replay_quarantine` → QuarantineReplayEntry): the review verb
        a user of the poisoning defense hits the first time a
        quarantine fires. Soft-DELETED rows are INCLUDED — the
        reference passes include_deleted because an operator may have
        hard-purged via forget_subject and still needs visibility.

        agent_id=None reviews every agent (the batch engine's stance;
        the reference defaults to its single configured agent).
        `since` filters on created_at >= since. Ordered oldest-first
        by (created_at, id) like the reference's final sort; a
        filtered, ordered projection — no MAX_BATCH_QUERY_LIMIT
        paging cap, no shuffle beyond the ordering."""
        m = self.memories.filter(F.col("quarantined").isNotNull())
        if agent_id is not None:
            m = m.filter(F.col("agent_id") == agent_id)
        if since is not None:
            m = m.filter(F.col("created_at") >= F.lit(since).cast("timestamp"))
        return m.select(
            "id",
            "agent_id",
            "content",
            # the reason string IS the quarantine flag here, so the
            # reference's `unwrap_or("unspecified")` case can't arise
            F.col("quarantined").alias("reason"),
            "created_at",
            F.col("memory_type").alias("source_type"),
            "tags",
            "deleted_at",
        ).orderBy("created_at", "id")

    def admin_stats(self) -> dict:
        """Admin dashboard stats (handlers.rs:128-158 StatsResponse).
        The reference pages through list_memories/list_events with a
        10k limit per agent because its storage trait lacks count and
        distinct queries; the relational engine computes the same
        three numbers as two exact aggregations — no cap, no paging
        loop."""
        mem = self.memories.agg(
            F.count("*").alias("n"),
            F.sort_array(F.collect_set("agent_id")).alias("agents"),
        ).collect()[0]
        return {
            "memory_count": mem["n"],
            "event_count": self.events.count(),
            "agent_ids": list(mem["agents"]),
        }

    def serving(self):
        """Scoped serving session (VERDICT r8 #5 — the first-class form
        of the MNEMO_CACHE_TABLES switch): inside the context, shared
        intermediates (range-pin exchanges, graph edge frames, BM25
        postings, table scans, prepared plans) persist ONCE and are
        reused across repeated queries; the context exit releases every
        tracked block.

            with engine.serving():
                engine.recall_batch(...)   # repeated calls share work
            # ← all persisted intermediates released here

        Re-entrant; see mnemo_spark.cache.serving()."""
        from mnemo_spark import cache

        return cache.serving()

    def release(self, force: bool = False) -> None:
        """Explicitly drop every tracked persisted intermediate (the
        imperative form of exiting `serving()`); safe to call anytime.
        While ANY serving() context is still active (this engine's or
        a sibling engine's on the same SparkSession) this warns and
        does nothing — releasing would unpersist frames the open
        session relies on (ADVICE r9). force=True overrides."""
        from mnemo_spark import cache

        cache.clear(force=force)

    def expire(
        self, ids: list[str], ttl_seconds: int | None = None, now=None
    ) -> "MnemoSparkEngine":
        """AMP `expire` (reference mnemo-amp/src/lib.rs op table: thin
        composition "set expires_at + run_ttl_sweep" — there is no
        engine.expire upstream either): stamp expires_at = now +
        ttl_seconds on the targets (omitted/0 → immediate), then run
        the ordinary TTL sweep so an immediate expire removes the rows
        and appends their MemoryExpired audit events in one verb."""
        now_c = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
        exp = (
            F.timestamp_add("SECOND", F.lit(int(ttl_seconds)), now_c)
            if ttl_seconds
            else now_c
        )
        stamped = self.memories.withColumn(
            "expires_at",
            F.when(F.col("id").isin(ids), exp).otherwise(F.col("expires_at")),
        )
        return self._clone(memories=stamped).run_ttl_sweep(now=now)

    def run_ttl_sweep(self, now=None) -> "MnemoSparkEngine":
        now_c = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
        expired = self.memories.filter(
            F.col("expires_at").isNotNull() & (F.col("expires_at") <= now_c)
        ).select(
            "agent_id",
            F.lit("MemoryExpired").alias("event_type"),
            F.col("id").alias("memory_id"),
            now_c.alias("ts"),
        )
        return self._clone(
            memories=self.memories.filter(
                F.col("expires_at").isNull() | (F.col("expires_at") > now_c)
            ),
            events=self._append_events(expired),
        )

    # -- diagnostics: doctor report --------------------------------------

    def doctor(self, now=None) -> DataFrame:
        """Typed health report (reference `mnemo doctor`, v0.4.1
        DoctorReport/DoctorFix): one row per check with status
        (ok | warn | fail) and a recommendation. Checks: memory-chain
        integrity, audit-log integrity, embedder configuration,
        embedding coverage of live memories, TTL backlog (expired but
        still present), and soft-delete backlog (deleted but never
        vacuumed to cold storage)."""
        now_c = (
            F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
        )
        mem_breaks = (
            self.verify_integrity().agg(F.sum("n_breaks")).collect()[0][0] or 0
        )
        ev_breaks = (
            self.verify_event_integrity().agg(F.sum("n_breaks")).collect()[0][0]
            or 0
        )
        live = self.memories.filter(F.col("deleted_at").isNull())
        counts = live.agg(
            F.count("*").alias("n_live"),
            F.count_if(F.col("embedding").isNull()).alias("n_unembedded"),
            F.count_if(
                F.col("expires_at").isNotNull() & (F.col("expires_at") < now_c)
            ).alias("n_expired"),
        ).collect()[0]
        n_soft = self.memories.filter(F.col("deleted_at").isNotNull()).count()
        semantic = getattr(self.embedder, "semantic", True) is not False

        def status(bad, warn_at=1, fail_at=None):
            if bad == 0:
                return "ok"
            if fail_at is not None and bad >= fail_at:
                return "fail"
            return "warn" if fail_at is not None else "fail"

        rows = [
            ("memory_chain", "fail" if mem_breaks else "ok", int(mem_breaks),
             "re-run verify_integrity per agent and restore from the last "
             "intact checkpoint" if mem_breaks else "chains verify"),
            ("audit_chain", "fail" if ev_breaks else "ok", int(ev_breaks),
             "audit log tampered or truncated — restore from the txlog "
             "snapshot" if ev_breaks else "chains verify"),
            ("embedder", "ok" if semantic else "warn", 0 if semantic else 1,
             "semantic recall refuses without a real embedder; configure "
             "one (U1)" if not semantic else
             f"{type(self.embedder).__name__} dim={self.dim}"),
            ("embedding_coverage",
             "ok" if counts["n_unembedded"] == 0 else "warn",
             int(counts["n_unembedded"]),
             "run an embed backfill batch" if counts["n_unembedded"]
             else "all live memories embedded"),
            ("ttl_backlog", "ok" if counts["n_expired"] == 0 else "warn",
             int(counts["n_expired"]),
             "run run_ttl_sweep" if counts["n_expired"] else "no expired rows"),
            ("soft_delete_backlog", "ok" if n_soft == 0 else "warn",
             int(n_soft),
             "tier out or vacuum soft-deleted rows" if n_soft
             else "no soft-deleted rows"),
        ]
        return self.spark.createDataFrame(
            rows, "check string, status string, affected long, recommendation string"
        )

    # -- behavioural baseline (reference crates/mnemo-baseline) ----------

    def baseline(self, window_minutes: float = 5.0) -> DataFrame:
        """Per-agent rolling behavioural profile over the engine's own
        hash-chained audit log (reference mnemo-baseline
        profile.rs:11-26 AgentBaseline; VERDICT r10 missing #1): one
        row per (agent, tumbling window) with per-minute op rates,
        namespace fanout, tool mix and REAL HMAC-chain continuity —
        prev_hash checked against the running chain head in
        logical-clock order, so a tampered or replayed audit row
        drags the agent's continuity below 1.0.

        Column mapping from the audit log: tools are the audit verb
        types (MemoryWrite → write ops; the removal verbs → forget
        ops; recall verbs appear when the caller audits reads — the
        default engine, like the reference store, audits mutations);
        namespaces are the touched memories' scopes (one broadcast-
        size join on memory_id). Feed the result to
        baseline_deltas / export_otel / export_ocsf
        (mnemo_spark.baseline) for the detector + SOC renderings."""
        from mnemo_spark.baseline import baseline_profile
        from mnemo_spark.io import broadcast_if_small

        scopes = self.memories.select(
            F.col("id").alias("memory_id"), F.col("scope")
        )
        ev = self.events.join(broadcast_if_small(scopes), "memory_id", "left")
        return baseline_profile(
            ev,
            agent_col="agent_id",
            tool_col="event_type",
            ts_col="ts",
            namespace_col="scope",
            window_minutes=window_minutes,
            recall_tools=("MemoryRecall",),
            write_tools=("MemoryWrite",),
            forget_tools=self.REMOVAL_EVENT_TYPES,
            prev_hash_col="prev_hash",
            chain_hash_col="chain_hash",
            chain_order_cols=("logical_clock", "event_id"),
        )

    # -- compliance: GEM trajectory audit --------------------------------

    REMOVAL_EVENT_TYPES = (
        "MemoryDelete",
        "MemoryExpired",
        "MemoryRedact",
        "MemoryArchive",
        "MemoryConsolidate",
    )

    def trajectory_audit(
        self,
        active_bank_ceiling: int = 1000,
        named_removal_types: tuple[str, ...] | None = None,
        facts: DataFrame | None = None,
        reads: DataFrame | None = None,
    ) -> DataFrame:
        """GEM trajectory-correctness audit (reference
        mnemo-compliance::trajectory_audit, trajectory.rs:233-430):
        replay the hash-chained event log and report four
        trajectory-level signals per agent:

        (a) unregulated growth — running active-bank size (+1 per
            write, −1 per removal, in logical-clock order) vs the
            ceiling; severity warn on any breach, fail when the peak
            exceeds 2× the ceiling.
        (b) missing semantic revision — facts written ≥2 times whose
            earlier memories were never retired (needs a `facts`
            mapping (memory_id, fact_id) — the reference reads a
            payload fact key; NULL signal when not provided). 1-5
            stale facts warn, more fail.
        (c) capacity-driven forgetting — removal events whose type is
            outside the named strategy set (the engine always labels;
            foreign/synced logs may not). 1-3 unlabelled warn, more
            fail.
        (d) read-only retrieval — agents that appear in the `reads`
            log but never write (reads are side-effect-free here, so
            the read log is the caller's explicit touch job; NULL
            signal when not provided).

        → one row per agent with the finding columns + severities and
        `trajectory_ok` (reference `is_ok`: every severity ok).
        """
        named = tuple(named_removal_types or self.REMOVAL_EVENT_TYPES)
        ev = self.events
        removal = F.col("event_type").isin(list(self.REMOVAL_EVENT_TYPES))
        delta = (
            F.when(F.col("event_type") == "MemoryWrite", F.lit(1))
            .when(removal, F.lit(-1))
            .otherwise(F.lit(0))
        )
        w = (
            Window.partitionBy("agent_id")
            .orderBy("logical_clock")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        sized = ev.withColumn("_active", F.sum(delta).over(w))
        growth = sized.groupBy("agent_id").agg(
            F.max("_active").cast("long").alias("peak_active_size"),
            F.count_if(F.col("_active") > active_bank_ceiling)
            .cast("long")
            .alias("growth_breaches"),
        )
        growth = growth.withColumn(
            "growth_severity",
            F.when(F.col("growth_breaches") == 0, "ok")
            .when(F.col("peak_active_size") <= 2 * active_bank_ceiling, "warn")
            .otherwise("fail"),
        )

        unl = (
            ev.filter(removal & ~F.col("event_type").isin(list(named)))
            .groupBy("agent_id")
            .agg(F.count("*").cast("long").alias("unlabelled_forgets"))
        )

        base = growth.join(unl, "agent_id", "left").withColumn(
            "unlabelled_forgets",
            F.coalesce("unlabelled_forgets", F.lit(0)).cast("long"),
        )
        base = base.withColumn(
            "forgetting_severity",
            F.when(F.col("unlabelled_forgets") == 0, "ok")
            .when(F.col("unlabelled_forgets") <= 3, "warn")
            .otherwise("fail"),
        )

        if facts is not None:
            writes = (
                ev.filter(F.col("event_type") == "MemoryWrite")
                .join(facts, "memory_id")
                .select("agent_id", "fact_id", "memory_id", "logical_clock")
            )
            wf = Window.partitionBy("agent_id", "fact_id").orderBy(
                F.desc("logical_clock")
            )
            earlier = writes.withColumn(
                "_rn", F.row_number().over(wf)
            ).filter(F.col("_rn") > 1)
            retired = (
                ev.filter(removal).select("memory_id").distinct()
            )
            stale = (
                earlier.join(retired, "memory_id", "left_anti")
                .groupBy("agent_id")
                .agg(F.count("*").cast("long").alias("stale_facts"))
            )
            base = base.join(stale, "agent_id", "left").withColumn(
                "stale_facts", F.coalesce("stale_facts", F.lit(0)).cast("long")
            )
            base = base.withColumn(
                "revision_severity",
                F.when(F.col("stale_facts") == 0, "ok")
                .when(F.col("stale_facts") <= 5, "warn")
                .otherwise("fail"),
            )
        else:
            base = base.withColumn(
                "stale_facts", F.lit(None).cast("long")
            ).withColumn("revision_severity", F.lit(None).cast("string"))

        if reads is not None:
            writers = (
                ev.filter(F.col("event_type") == "MemoryWrite")
                .select("agent_id")
                .distinct()
                .withColumn("_writes", F.lit(True))
            )
            readers = reads.select("agent_id").distinct()
            ro = readers.join(writers, "agent_id", "left").select(
                "agent_id",
                F.coalesce(~F.col("_writes"), F.lit(True)).alias("read_only"),
            )
            base = base.join(ro, "agent_id", "left").withColumn(
                "read_only", F.coalesce("read_only", F.lit(False))
            )
        else:
            base = base.withColumn("read_only", F.lit(None).cast("boolean"))

        ok = (
            (F.col("growth_severity") == "ok")
            & (F.col("forgetting_severity") == "ok")
            & F.coalesce(F.col("revision_severity") == "ok", F.lit(True))
            & F.coalesce(~F.col("read_only"), F.lit(True))
        )
        return base.withColumn("trajectory_ok", ok)

    # -- durable store (sources/txlog.py) -------------------------------

    def save(
        self, store_path: str, mode: str = "overwrite", layout_files: int = 8
    ) -> int:
        """Persist the memory state as one transactional commit
        (memories + audit events in sibling TxTables, committed
        memories-first). Returns the memories-table version. Each save
        is a durable, time-travelable snapshot — the store-level form
        of the reference's checkpointing, with readers isolated from
        in-flight saves by the manifest protocol.

        Layout (r5): memories are range-laid-out by (agent_id,
        created_at) and events by ts across `layout_files` files, with
        per-file min/max recorded in the manifest — so a recall-shaped
        read (one agent, a time window) opens only the overlapping
        files via snapshot(where=...) instead of scanning the store.
        At 100 TB `layout_files` scales with data volume; the layout
        cost is one range shuffle per save, the same work a Delta
        OPTIMIZE ZORDER pays."""
        import os as _os

        from mnemo_spark.sources.txlog import TxTable

        mems = self.memories.repartitionByRange(
            layout_files, "agent_id", "created_at"
        )
        v = TxTable(_os.path.join(store_path, "memories")).commit(
            mems, mode=mode, stats_cols=["agent_id", "created_at"]
        )
        # audit log is append-only BY CONSTRUCTION at the store level:
        # every save appends the full current log as a new snapshot
        # would double rows, so persist only rows not yet stored
        ev_table = TxTable(_os.path.join(store_path, "events"))
        if ev_table.latest_version() is None:
            fresh = self.events
        else:
            stored = ev_table.snapshot(self.spark).select("event_id")
            fresh = self.events.join(stored, "event_id", "left_anti")
        ev_table.commit(
            fresh.repartitionByRange(layout_files, "ts"),
            mode="append",
            stats_cols=["ts"],
        )
        # Record the embedder identity (class + dim) at store level so
        # load() can refuse a dim-incompatible reconstruction instead
        # of crashing later inside the matmul kernel or — worse —
        # letting remember_batch append wrong-width vectors (ADVICE
        # r9 medium). Atomic replace: readers see old or new, never a
        # torn file.
        import json as _json
        import uuid as _uuid

        meta = {
            "embedder": type(self.embedder).__name__,
            "embedding_dim": self.dim,
        }
        tmp = _os.path.join(store_path, f".engine_meta.{_uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            _json.dump(meta, fh)
        _os.replace(tmp, _os.path.join(store_path, "engine_meta.json"))
        return v

    @classmethod
    def load(
        cls,
        spark: SparkSession,
        store_path: str,
        version: int | None = None,
        embedding_dim: int | None = None,
        embedder=None,
        mem_where: tuple[str, object, object] | None = None,
        events_where: tuple[str, object, object] | None = None,
    ) -> "MnemoSparkEngine":
        """Reconstruct an engine from a stored snapshot — pass
        `version` for point-in-time recovery of the memory state (the
        audit log always loads in full: history is never rolled
        back, matching the append-only trigger semantics).

        Embedder identity (ADVICE r9 medium): `save` records the
        embedder class + dim in `engine_meta.json`; load defaults to
        the STORED dim (embedding_dim=None) and raises with a
        diagnostic when an explicit embedding_dim or embedder
        disagrees with the store — a mismatch would otherwise surface
        as an opaque numpy shape error in the dense kernel, or as
        wrong-width vectors appended by remember_batch. Stores written
        before the meta file existed fall back to a one-row probe of
        the stored vector width.

        mem_where / events_where = (col, lo, hi): metadata-only file
        pruning against the manifest stats `save` records (memories:
        agent_id / created_at; events: ts) — a recall-shaped load
        ("agent A's memories", "events since T") opens only the
        overlapping files. The pruned engine is a PARTIAL view: verbs
        that need global state (chain verification across agents,
        admin stats) should load unpruned."""
        import json as _json
        import os as _os
        import warnings as _warnings

        from mnemo_spark.sources.txlog import TxTable

        mems = TxTable(_os.path.join(store_path, "memories")).snapshot(
            spark, version, where=mem_where
        )
        events = TxTable(_os.path.join(store_path, "events")).snapshot(
            spark, where=events_where
        )
        meta_path = _os.path.join(store_path, "engine_meta.json")
        stored_dim = stored_name = None
        if _os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = _json.load(fh)
            stored_dim = meta.get("embedding_dim")
            stored_name = meta.get("embedder")
        else:
            # legacy store (pre-meta): probe one non-NULL vector's
            # width — a single limit-1 scan, cheap next to the load
            row = (
                mems.select(F.size("embedding").alias("_w"))
                .filter(F.col("_w") >= 0)
                .first()
            )
            if row is not None:
                stored_dim = row["_w"]
        req_dim = embedding_dim
        if embedder is not None:
            req_dim = getattr(embedder, "dim", embedding_dim)
        if stored_dim is not None and req_dim is not None and req_dim != stored_dim:
            raise ValueError(
                f"store at {store_path!r} holds {stored_dim}-d vectors "
                f"(embedder {stored_name or 'unknown'}) but load() was "
                f"asked for {req_dim}-d; pass embedding_dim={stored_dim} "
                f"(or a matching embedder) — or re-embed the store"
            )
        if (
            embedder is not None
            and stored_name is not None
            and type(embedder).__name__ != stored_name
        ):
            _warnings.warn(
                f"store was written by embedder {stored_name}; loading "
                f"with {type(embedder).__name__} — stored vectors are "
                "only comparable to queries embedded by the same provider",
                stacklevel=2,
            )
        resolved = req_dim if req_dim is not None else (stored_dim or 256)
        return cls(
            spark,
            memories=mems,
            events=events,
            embedding_dim=resolved,
            embedder=embedder,
        )


CHECKPOINT_SCHEMA = StructType(
    [
        StructField("checkpoint_id", StringType(), False),
        StructField("thread_id", StringType(), False),
        StructField("branch", StringType(), False),
        StructField("parent_id", StringType(), True),
        StructField("as_of", TimestampType(), False),
    ]
)


class VersionedEngine(MnemoSparkEngine):
    """MnemoSparkEngine + checkpoint/branch/merge/replay (reference
    §2.9 version-control verbs; lineage shapes J8, replay T5).

    Memories carry a `branch` column (default 'main'); checkpoints
    are rows (id, thread, branch, parent, as_of). A branch's visible
    set = memories written on the branch itself plus everything
    visible at its fork checkpoint (recursively) — ancestry resolved
    by iterative joins over the checkpoint lineage, the J8 shape.
    """

    def __init__(self, spark, memories=None, acls=None, checkpoints=None,
                 embedding_dim: int = 256, events=None, embedder=None):
        if memories is not None and "branch" not in memories.columns:
            memories = memories.withColumn("branch", F.lit("main"))
        super().__init__(spark, memories, acls, embedding_dim, events, embedder)
        if memories is None:
            self.memories = self.memories.withColumn("branch", F.lit("main"))
            # the setter conservatively cleared the flag; the frame is
            # still the provably-empty default, just branch-tagged
            self._memories_known_empty = True
        self.checkpoints = (
            checkpoints
            if checkpoints is not None
            else spark.createDataFrame([], CHECKPOINT_SCHEMA)
        )

    def _with(self, memories=None, acls=None, checkpoints=None) -> "VersionedEngine":
        out = VersionedEngine(
            self.spark,
            memories if memories is not None else self.memories,
            acls if acls is not None else self.acls,
            checkpoints if checkpoints is not None else self.checkpoints,
            self.dim,
            self.events,
            self.embedder,
        )
        out._acls_known_empty = self._acls_known_empty if acls is None else False
        return out

    def _clone(self, memories=None, acls=None, events=None) -> "VersionedEngine":
        # inherited verbs (remember_batch/forget/share/run_ttl_sweep)
        # stay VersionedEngine: checkpoints and the branch column
        # survive every mutation instead of degrading to the base class
        out = VersionedEngine(
            self.spark,
            memories if memories is not None else self.memories,
            acls if acls is not None else self.acls,
            self.checkpoints,
            self.dim,
            events if events is not None else self.events,
            self.embedder,
        )
        out._acls_known_empty = self._acls_known_empty if acls is None else False
        out.experience_enabled = self.experience_enabled
        return out

    def remember_on(self, rows: DataFrame, branch: str = "main") -> "VersionedEngine":
        grown = self.remember_batch(rows)
        # membership via join, not a collected id list: arbitrarily
        # large batches never materialize on the driver
        tag = rows.select("id", F.lit(True).alias("_isnew"))
        mem = (
            grown.memories.join(tag, "id", "left")
            .withColumn(
                "branch",
                F.when(F.col("_isnew"), F.lit(branch)).otherwise(
                    F.coalesce(F.col("branch"), F.lit("main"))
                ),
            )
            .drop("_isnew")
        )
        return self._with(memories=mem)

    # -- checkpoint / branch lineage (J8) --------------------------------

    def checkpoint(self, thread_id: str, branch: str, as_of) -> "VersionedEngine":
        """Record a named point-in-time for (thread, branch).
        checkpoint_id is deterministic: sha256(thread|branch|as_of)."""
        import hashlib as _h

        cid = _h.sha256(f"{thread_id}|{branch}|{as_of}".encode()).hexdigest()[:16]
        parent = (
            self.latest_checkpoints()
            .filter((F.col("thread_id") == thread_id) & (F.col("branch") == branch))
            .select("checkpoint_id")
            .collect()
        )
        row = [(cid, thread_id, branch, parent[0][0] if parent else None, as_of)]
        new = self.spark.createDataFrame(row, CHECKPOINT_SCHEMA)
        return self._with(checkpoints=self.checkpoints.unionByName(new))

    def branch(self, from_checkpoint: str, new_branch: str) -> "VersionedEngine":
        """Fork: a new branch whose parent is the given checkpoint."""
        src = self.checkpoints.filter(F.col("checkpoint_id") == from_checkpoint).collect()
        if not src:
            raise ValueError(f"unknown checkpoint {from_checkpoint!r}")
        s = src[0]
        row = [(f"{from_checkpoint}-{new_branch}"[:32], s["thread_id"], new_branch,
                from_checkpoint, s["as_of"])]
        new = self.spark.createDataFrame(row, CHECKPOINT_SCHEMA)
        return self._with(checkpoints=self.checkpoints.unionByName(new))

    def latest_checkpoints(self) -> DataFrame:
        """Latest checkpoint per (thread, branch) — the W4/J8 window."""
        w = Window.partitionBy("thread_id", "branch").orderBy(
            F.desc("as_of"), F.desc("checkpoint_id")
        )
        return (
            self.checkpoints.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def ancestry(self, branch: str, max_depth: int = 8) -> list[str]:
        """Branch → its ancestor branch names (iterative parent joins
        over the checkpoint lineage — J8)."""
        chain = [branch]
        cur = branch
        for _ in range(max_depth):
            parent_rows = (
                self.checkpoints.alias("c")
                .filter(F.col("c.branch") == cur)
                .join(
                    self.checkpoints.alias("p"),
                    F.col("c.parent_id") == F.col("p.checkpoint_id"),
                )
                .select(F.col("p.branch").alias("pb"))
                .filter(F.col("pb") != cur)
                .limit(1)
                .collect()
            )
            if not parent_rows:
                break
            cur = parent_rows[0]["pb"]
            chain.append(cur)
        return chain

    def visible_on_branch(self, branch: str, as_of=None) -> DataFrame:
        """Memories visible on a branch: rows written on the branch or
        any ancestor branch, optionally as-of a point in time (P2)."""
        branches = self.ancestry(branch)
        out = self.memories.filter(F.col("branch").isin(branches))
        if as_of is not None:
            t = F.lit(as_of).cast("timestamp")
            out = out.filter(
                (F.col("created_at") <= t)
                & (F.col("deleted_at").isNull() | (F.col("deleted_at") > t))
            )
        return out

    # -- replay (T5) -----------------------------------------------------

    def replay(self, checkpoint_id: str) -> DataFrame:
        """State at a checkpoint: as-of filter at its timestamp on its
        branch — plus chain verification of the replayed slice (the
        reference's synthesized-checkpoint integrity check)."""
        cp = self.checkpoints.filter(F.col("checkpoint_id") == checkpoint_id).collect()
        if not cp:
            raise ValueError(f"unknown checkpoint {checkpoint_id!r}")
        return self.visible_on_branch(cp[0]["branch"], as_of=cp[0]["as_of"])

    # -- merge (merge.rs: FullMerge / CherryPick / Squash) ---------------

    def merge(
        self,
        src_branch: str,
        dst_branch: str,
        strategy: str = "full",
        ids: list[str] | None = None,
        now=None,
    ) -> "VersionedEngine":
        src_rows = F.col("branch") == src_branch
        if strategy == "full":
            mem = self.memories.withColumn(
                "branch", F.when(src_rows, dst_branch).otherwise(F.col("branch"))
            )
        elif strategy == "cherry_pick":
            if not ids:
                raise ValueError("cherry_pick needs ids")
            mem = self.memories.withColumn(
                "branch",
                F.when(src_rows & F.col("id").isin(ids), dst_branch).otherwise(
                    F.col("branch")
                ),
            )
        elif strategy == "squash":
            # one consolidated semantic record on dst; originals marked
            # consolidated (the A5 rollup applied to a branch)
            now_c = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
            src_df = self.memories.filter(src_rows)
            # deterministic order: collect structs, sort, then project
            # (collect_list order is NOT defined, even after orderBy)
            ordered = F.sort_array(
                F.collect_list(F.struct("created_at", "id", "content"))
            )
            rollup = src_df.agg(
                F.concat_ws(
                    "\n", F.transform(ordered, lambda r: r["content"])
                ).alias("content"),
                F.max("agent_id").alias("agent_id"),
                F.round(F.avg("importance"), 6).cast("float").alias("importance"),
                F.array_distinct(F.flatten(F.collect_list("tags"))).alias("tags"),
            )
            squashed = rollup.select(
                F.concat(F.lit("squash-"), F.lit(src_branch)).alias("id"),
                "agent_id",
                "content",
                F.lit("semantic").alias("memory_type"),
                F.lit("private").alias("scope"),
                "importance",
                "tags",
                now_c.alias("created_at"),
            )
            merged = self.remember_on(squashed, branch=dst_branch)
            mem = merged.memories.withColumn(
                "consolidation_state",
                F.when(
                    F.col("branch") == src_branch, F.lit("consolidated")
                ).otherwise(F.col("consolidation_state")),
            )
            return self._with(memories=mem)
        else:
            raise ValueError(f"unknown merge strategy {strategy!r}")
        return self._with(memories=mem)


DELEGATION_SCHEMA = StructType(
    [
        StructField("delegator", StringType(), False),
        StructField("delegatee", StringType(), False),
        StructField("permission", StringType(), True),
        StructField("depth_cap", IntegerType(), True),
        StructField("expires_at", TimestampType(), True),
    ]
)


def delegated_principals(
    delegations: DataFrame, principal: str, now=None, max_depth: int = 4
) -> DataFrame:
    """Transitive delegation resolution (reference J2, duckdb.rs:761-798):
    who has delegated (directly or through a chain) to `principal`?
    Iterative self-joins up to max_depth, honoring each grant's
    expiry and per-grant depth cap (a chain dies where a hop's
    remaining cap reaches 0). → (delegator, depth)."""
    now_c = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    live = delegations.filter(
        F.col("expires_at").isNull() | (F.col("expires_at") > now_c)
    ).select(
        "delegator",
        "delegatee",
        F.coalesce(F.col("depth_cap"), F.lit(max_depth)).alias("cap"),
    )
    frontier = live.filter(F.col("delegatee") == principal).select(
        F.col("delegator").alias("_cur"),
        F.lit(1).alias("depth"),
        (F.col("cap") - 1).alias("budget"),
    )
    out = frontier
    # fixed-depth unroll with NO per-hop emptiness probe: the old
    # `frontier.limit(1).count()` serialized every hop into its own
    # driver round-trip/job (VERDICT r7 — 0.44 s where the recursive-CTE
    # oracle spends 0.03); as one plan, AQE sees an empty hop's shuffle
    # stats at runtime and collapses the remaining joins to empty
    # relations, so a short chain costs nothing beyond the plan
    for _ in range(1, max_depth):
        frontier = (
            live.join(
                frontier.filter(F.col("budget") > 0),
                F.col("delegatee") == F.col("_cur"),
            )
            .select(
                F.col("delegator").alias("_cur"),
                (F.col("depth") + 1).alias("depth"),
                F.least(F.col("budget") - 1, F.col("cap") - 1).alias("budget"),
            )
        )
        out = out.unionByName(frontier)
    return out.groupBy(F.col("_cur").alias("delegator")).agg(
        F.min("depth").alias("depth")
    )


def reconstruct_belief(hits: DataFrame, content_col: str = "content",
                       score_col: str = "score", max_items: int = 5) -> str:
    """§2.9 `reconstruct`: collapse the top recall hits into one
    belief summary string (rank-ordered excerpts). Driver-side by
    design — the output is a single answer payload, not a dataset."""
    rows = (
        hits.orderBy(F.desc(score_col))
        .limit(max_items)
        .select(content_col)
        .collect()
    )
    return " | ".join(r[0] for r in rows if r[0])
