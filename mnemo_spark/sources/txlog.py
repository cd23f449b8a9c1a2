"""Minimal parquet transaction log: versioned snapshots, time travel,
optimistic concurrency — the Delta/Iceberg mechanism DESIGN.md maps
`merge_upsert` / `changes_since` onto, implemented honestly at file
level so the engine's versioning story does not depend on an absent
lakehouse library.

Layout (reference: the DuckDB store's transactional guarantees,
`storage/duckdb.rs:136-256`, re-expressed as a log of immutable
parquet files):

    table_dir/
      data/<uuid>.parquet          immutable data files
      _txlog/<version>.json        one manifest per commit:
                                   {"version", "adds", "removes", "ts"}

Protocol:
- A commit writes its data files FIRST, then publishes the manifest
  with `open(path, "x")` — create-exclusive, so two writers racing to
  the same version get exactly one winner; the loser re-reads the log
  and retries at the next version (optimistic concurrency). On an
  object store the `x`-open becomes put-if-absent / CAS; the protocol
  is unchanged.
- Readers list manifests up to a version and fold adds/removes into
  the live file set — a snapshot is immutable by construction, so a
  reader pinned to version V is isolated from every later commit
  (overwrites REMOVE files from the log but never delete them from
  disk until `vacuum`).
- `append` never removes; `overwrite` removes the current live set.

Scale notes: manifests are O(files-touched) JSON, the fold is
O(commits) driver-side metadata work (checkpoint-compaction of the
log is the standard fix at millions of commits); data-file IO is all
executor-side parquet. Nothing here shuffles.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(Exception):
    """Another writer published this version first."""


def _norm_stat(v):
    """Manifest stats live in JSON, so non-JSON-native footer values
    (timestamps, dates, binary) are stored as fixed-width strings whose
    LEXICOGRAPHIC order equals the value order — pruning comparisons
    stay correct as long as predicate bounds pass through the same
    normalization (snapshot() does)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v


class TxTable:
    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.log_dir = os.path.join(path, "_txlog")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)

    # -- log ----------------------------------------------------------------

    def versions(self) -> list[int]:
        return sorted(
            int(f[: -len(".json")])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json") and not f.endswith(".checkpoint.json")
        )

    def checkpoints(self) -> list[int]:
        return sorted(
            int(f[: -len(".checkpoint.json")])
            for f in os.listdir(self.log_dir)
            if f.endswith(".checkpoint.json")
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self.log_dir, f"{version}.json")) as fh:
            return json.load(fh)

    def live_files(self, version: int | None = None) -> list[str]:
        """Fold the log up to `version` (inclusive; default latest).
        Starts from the newest checkpoint ≤ version, so the fold is
        O(commits since checkpoint), not O(all commits) — the log-
        compaction move that keeps metadata cost flat at millions of
        commits."""
        upto = self.latest_version() if version is None else version
        live: list[str] = []
        start = 0
        cps = [c for c in self.checkpoints() if upto is not None and c <= upto]
        if cps:
            cp = cps[-1]
            with open(
                os.path.join(self.log_dir, f"{cp}.checkpoint.json")
            ) as fh:
                live = json.load(fh)["live"]
            start = cp + 1
        for v in self.versions():
            if v < start:
                continue
            if upto is None or v > upto:
                break
            m = self._manifest(v)
            removed = set(m.get("removes", []))
            live = [f for f in live if f not in removed]
            live.extend(m.get("adds", []))
        return live

    def checkpoint_log(self) -> int:
        """Write a checkpoint of the CURRENT version's live set so
        later reads fold from here. Returns the checkpointed version."""
        v = self.latest_version()
        if v is None:
            raise ValueError("nothing to checkpoint")
        live = self.live_files(v)
        tmp = os.path.join(self.log_dir, f".cp.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": v, "live": live}, fh)
        os.replace(tmp, os.path.join(self.log_dir, f"{v}.checkpoint.json"))
        return v

    # -- write --------------------------------------------------------------

    def _write_data_files(self, df: DataFrame) -> list[str]:
        """Write df as immutable parquet under data/<uuid>/ and return
        the file paths. Files are invisible until a manifest lists
        them — a crashed writer leaves only unreferenced garbage.

        Timestamps are forced to TIMESTAMP_MICROS for the write:
        Spark's default INT96 encoding carries no trustworthy footer
        min/max, which would silently drop every timestamp column from
        the manifest stats and disable time-predicate file pruning."""
        sub = os.path.join(self.data_dir, uuid.uuid4().hex)
        spark = df.sparkSession
        conf_key = "spark.sql.parquet.outputTimestampType"
        prev = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "TIMESTAMP_MICROS")
        try:
            df.write.parquet(sub)
        finally:
            if prev is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prev)
        return sorted(
            os.path.join(sub, f)
            for f in os.listdir(sub)
            if f.endswith(".parquet")
        )

    @staticmethod
    def _file_stats(files: list[str], stats_cols: list[str]) -> dict:
        """Per-file min/max from parquet FOOTERS (pyarrow metadata
        read, no data IO) — the Delta/Iceberg file-statistics that
        make predicate-pruned snapshots possible.

        Long string/binary stats in parquet footers are truncated
        bounds (min is a ≤-prefix, max an incremented prefix), which
        stay CONSERVATIVE for overlap pruning — a file can survive
        pruning spuriously but never be skipped wrongly; numeric
        stats are exact."""
        import pyarrow.parquet as pq

        out: dict[str, dict] = {}
        for path in files:
            md = pq.read_metadata(path)
            names = md.schema.names
            stats: dict[str, list] = {}
            for c in stats_cols:
                if c not in names:
                    continue
                ci = names.index(c)
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    s = md.row_group(rg).column(ci).statistics
                    if s is None or not s.has_min_max:
                        mins, maxs = [], []
                        break
                    mins.append(s.min)
                    maxs.append(s.max)
                if mins:
                    stats[c] = [_norm_stat(min(mins)), _norm_stat(max(maxs))]
            out[path] = stats
        return out

    def _publish(self, manifest: dict, version: int) -> None:
        tmp = os.path.join(self.log_dir, f".{version}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        target = os.path.join(self.log_dir, f"{version}.json")
        try:
            # create-exclusive link publishes atomically; EEXIST means
            # another writer won this version
            os.link(tmp, target)
        except FileExistsError as e:
            raise CommitConflict(version) from e
        finally:
            os.unlink(tmp)

    def last_txn(self, app_id: str) -> int | None:
        """Highest txn_version committed by app_id, or None — the
        idempotence watermark for exactly-once writers (Delta's
        txnAppId/txnVersion pattern): a replayed micro-batch checks
        this before committing."""
        best: int | None = None
        for v in self.versions():
            txn = self._manifest(v).get("txn")
            if txn and txn[0] == app_id:
                best = txn[1] if best is None else max(best, txn[1])
        return best

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        max_retries: int = 10,
        stats_cols: list[str] | None = None,
        txn: tuple[str, int] | None = None,
        expect_live: list[str] | None = None,
    ) -> int:
        """Commit df (append | overwrite). Returns the version written.
        Data files are written ONCE; only the manifest publish retries
        on conflict. An `overwrite` means "table := df": its removes
        are recomputed from the FRESH log before each retry, so it
        replaces whatever is current — including a concurrent writer's
        commit, which is exactly overwrite semantics. Writers whose df
        was DERIVED from a snapshot (merge / delete_where) must pass
        `expect_live` = that snapshot's file list: if the live set has
        moved since, the commit raises CommitConflict instead of
        silently losing the concurrent update (Delta's serializable
        write-conflict check); the caller re-reads and re-derives.
        stats_cols records per-file min/max in the manifest for
        predicate-pruned snapshots."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown commit mode {mode!r}")
        if txn is not None:
            last = self.last_txn(txn[0])
            if last is not None and txn[1] <= last:
                # replayed writer epoch: already durable, skip silently
                return self.latest_version()
        adds = self._write_data_files(df)
        stats = self._file_stats(adds, stats_cols) if stats_cols else {}
        for _ in range(max_retries):
            latest = self.latest_version()
            version = 0 if latest is None else latest + 1
            removes = self.live_files() if mode == "overwrite" else []
            if expect_live is not None and sorted(removes) != sorted(
                expect_live
            ):
                raise CommitConflict(
                    f"live set moved since the snapshot this commit was "
                    f"derived from (expected {len(expect_live)} files, "
                    f"found {len(removes)}); re-read and retry"
                )
            manifest = {
                "version": version,
                "mode": mode,
                "adds": adds,
                "removes": removes,
                "stats": stats,
                "ts": time.time(),
            }
            if txn is not None:
                manifest["txn"] = [txn[0], txn[1]]
            try:
                self._publish(manifest, version)
                return version
            except CommitConflict:
                continue  # re-read log, retry at the next version
        raise CommitConflict(
            f"gave up after {max_retries} retries at version {version}"
        )

    def file_stats(self, version: int | None = None) -> dict:
        """Manifest stats for the live files at `version` (files from
        commits without stats_cols map to {})."""
        live = set(self.live_files(version))
        out: dict[str, dict] = {}
        for v in self.versions():
            if version is not None and v > version:
                break
            for path, st in self._manifest(v).get("stats", {}).items():
                if path in live:
                    out[path] = st
        return {p: out.get(p, {}) for p in live}

    def merge(
        self, spark: SparkSession, updates: DataFrame, key: str
    ) -> int:
        """Transactional MERGE (last-writer-wins upsert on `key`):
        copy-on-write — survivors (anti-join on the update keys) union
        the updates into one overwrite commit. The file-level form of
        operators/upsert.merge_upsert; at scale the rewrite scopes to
        the files whose key ranges intersect the updates (file-level
        stats pruning), which this minimal log omits."""
        if self.latest_version() is None:
            return self.commit(updates, mode="append")
        base_live = self.live_files()
        current = self.snapshot(spark)
        survivors = current.join(
            updates.select(key).distinct(), key, "left_anti"
        )
        # expect_live pins the snapshot the survivors were derived
        # from: a concurrent commit landing in between raises
        # CommitConflict instead of being silently overwritten
        return self.commit(
            survivors.unionByName(updates),
            mode="overwrite",
            expect_live=base_live,
        )

    def delete_where(self, spark: SparkSession, condition: str) -> int:
        """Row-level DELETE, copy-on-write: survivors rewrite as one
        overwrite commit. Deleted rows stay reachable by time travel
        until vacuum — the GDPR-forget pattern is delete_where +
        vacuum(retain after the delete), which the reference models
        with redact-preserving-chain semantics."""
        from pyspark.sql import functions as F

        base_live = self.live_files()
        survivors = self.snapshot(spark).filter(~F.expr(condition))
        return self.commit(
            survivors, mode="overwrite", expect_live=base_live
        )

    # -- read ---------------------------------------------------------------

    def snapshot(
        self,
        spark: SparkSession,
        version: int | None = None,
        where: tuple[str, object, object] | None = None,
    ) -> DataFrame:
        """Point-in-time read: the file list is resolved NOW, so the
        returned frame is pinned to the snapshot even if later commits
        overwrite the table (files are never deleted until vacuum).

        where=(col, lo, hi) prunes by manifest file statistics BEFORE
        any file opens: only files whose [min, max] overlaps [lo, hi]
        are read (files without stats are conservatively kept), then
        the row-level filter applies on top — the metadata-only data
        skipping that makes a Z-ordered layout pay off at 100 TB."""
        files = self.live_files(version)
        if not files:
            raise ValueError(f"no data at version {version!r}")
        if where is not None:
            col, lo, hi = where
            lo_k, hi_k = _norm_stat(lo), _norm_stat(hi)
            stats = self.file_stats(version)
            files = [
                f
                for f in files
                if col not in stats.get(f, {})
                or not (stats[f][col][1] < lo_k or stats[f][col][0] > hi_k)
            ]
            if not files:
                raise ValueError(f"no file overlaps {where!r}")
            from pyspark.sql import functions as F

            return (
                spark.read.parquet(*files)
                .filter(F.col(col).between(lo, hi))
            )
        # mergeSchema: commits may add columns over time (schema
        # evolution); the union schema surfaces old files' missing
        # columns as NULL, exactly like Delta's additive evolution
        return spark.read.option("mergeSchema", "true").parquet(*files)

    def changes_between(
        self, spark: SparkSession, v0: int, v1: int
    ) -> DataFrame:
        """CDF stand-in: rows added by commits in (v0, v1] — append
        workloads only (an overwrite's delta is the snapshot diff)."""
        added: list[str] = []
        for v in self.versions():
            if v0 < v <= v1:
                added.extend(self._manifest(v).get("adds", []))
        if not added:
            raise ValueError(f"no adds in ({v0}, {v1}]")
        return spark.read.parquet(*added)

    # -- maintenance --------------------------------------------------------

    def compact(
        self,
        spark: SparkSession,
        target_files: int = 1,
        stats_cols: list[str] | None = None,
    ) -> int:
        """OPTIMIZE: rewrite the current snapshot into target_files
        files as one overwrite commit. Data is unchanged (same rows,
        new layout); prior versions stay time-travelable until
        vacuum. Small-file compaction is what keeps the manifest fold
        and the scan task count flat under high-frequency commits."""
        cur = self.snapshot(spark)
        return self.commit(
            cur.repartition(target_files),
            mode="overwrite",
            stats_cols=stats_cols,
        )

    def optimize_zorder(
        self,
        spark: SparkSession,
        col_a: str,
        col_b: str,
        target_files: int = 8,
        bits: int = 16,
    ) -> int:
        """OPTIMIZE ZORDER: rewrite the snapshot range-clustered by
        the Morton interleave of (col_a, col_b) and record min/max
        stats for BOTH dimensions — after this, a range snapshot on
        EITHER column prunes files (each file covers a compact
        z-curve segment, so both dimensions' spans are tight)."""
        from pyspark.sql import functions as F

        terms = []
        for i in range(bits):
            terms.append(f"((({col_a} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({col_b} >> {i}) & 1) << {2 * i + 1})")
        zexpr = " + ".join(terms)
        cur = self.snapshot(spark).withColumn("_z", F.expr(zexpr))
        clustered = (
            cur.repartitionByRange(target_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
        )
        return self.commit(
            clustered, mode="overwrite", stats_cols=[col_a, col_b]
        )

    def vacuum(self, retain_version: int) -> list[str]:
        """Delete data files not live in ANY version ≥ retain_version.
        Readers pinned at or after retain_version keep working;
        earlier time travel is given up explicitly."""
        keep: set[str] = set()
        for v in self.versions():
            if v >= retain_version:
                keep.update(self.live_files(v))
        deleted = []
        for sub in os.listdir(self.data_dir):
            subdir = os.path.join(self.data_dir, sub)
            for f in os.listdir(subdir):
                p = os.path.join(subdir, f)
                if p.endswith(".parquet") and p not in keep:
                    os.unlink(p)
                    deleted.append(p)
        return deleted
