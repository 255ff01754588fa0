"""Minimal Delta-style transactional table layer over parquet.

The north star is "DataFrame transformations over Delta/Parquet"; delta-rs is
not available in this environment, so this module implements the subset of the
Delta Lake protocol the Gold maintenance path actually needs, from scratch and
Spark-first:

* **Atomic versioned commits** — a table is a ``_txn_log/`` of JSON commit
  files ``%020d.json`` plus immutable parquet data files under ``_data/``.
  A commit becomes visible by an O_EXCL exclusive create of the next version
  file (the same atomicity primitive delta-rs uses on local/HDFS stores);
  readers never see half-written state because data files are written *before*
  the commit that references them.
* **Idempotent writer transactions** — each commit may carry a
  ``{"app_id", "batch_id"}`` marker (Delta's ``txn`` action). A replayed
  Structured Streaming micro-batch (same app_id, batch_id ≤ last committed)
  is skipped, which upgrades foreachBatch from at-least-once to exactly-once.
* **MERGE-style partition upsert** — ``merge_overwrite_partitions`` adds the
  new files and removes the superseded files of exactly the partitions present
  in the incoming DataFrame, in one atomic commit (Delta's
  ``replaceWhere``/MERGE-by-partition pattern).
* **Row-level MERGE** — ``merge_upsert`` is keyed ``WHEN MATCHED THEN UPDATE
  SET * / WHEN NOT MATCHED THEN INSERT *``: it locates the partitions holding
  matched keys (column-pruned scan of key + partition columns only), rewrites
  just those partitions read-modify-write, and publishes adds+removes in one
  atomic commit.
* **Schema evolution** — ``add_columns`` commits a widened schema as a pure
  metadata action; readers apply the committed schema explicitly, so old
  files surface the new columns as NULL and time travel to a pre-evolution
  version reads back the old schema.
* **File skipping** — the log stores each file's partition value, so readers
  prune files driver-side from log metadata alone, like Delta data skipping
  (no directory listing on the read path).
* **Time travel** — ``read(spark, version=N)`` reconstructs any historical
  snapshot, because removed files are logically deleted (dropped from the
  snapshot) but physically retained until ``vacuum()``.
* **Log checkpointing** — ``checkpoint()`` collapses the snapshot into a
  ``NNN.checkpoint.json`` (Delta's checkpoint file); replay cost becomes
  O(commits since checkpoint), the metadata fix for long-lived tables.

Scale notes: the log is O(commits + live files) JSON — the same driver-side
metadata cost Delta pays before checkpointing; data files never move or
rewrite except for the partitions a MERGE touches, and concurrent writers are
serialized by the exclusive-create commit race (optimistic concurrency: losers
re-read the log, re-validate their transaction, and retry).

Reference behavior being replaced: the reference's Gold sink is a bare
timestamped-file append with no transactionality at all
(``/root/reference/storage/local_storage.py:144-155``); its ingest ledger has
a write-then-commit crash window (SURVEY.md §3.2). Both failure modes are
closed here rather than ported.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_LOG_DIR = "_txn_log"
_DATA_DIR = "_data"
_CHECKPOINT_EVERY = 10  # auto-checkpoint cadence, like Delta's default


def _file_column_stats(path: str) -> dict:
    """Per-column [min, max] from the parquet footer (Delta-style data
    skipping stats), collected once at staging time — a driver-side metadata
    read, no data scan. Only JSON-faithful types are kept (int/float/str/
    bool); columns without usable footer stats are simply absent, which the
    reader treats as un-prunable."""
    import pyarrow.parquet as pq

    meta = pq.read_metadata(path)
    out: dict = {}
    for rg in range(meta.num_row_groups):
        group = meta.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode(), hi.decode()
                except UnicodeDecodeError:
                    continue
            if not isinstance(lo, (int, float, str, bool)):
                continue
            name = col.path_in_schema
            if name in out:
                out[name] = [min(out[name][0], lo), max(out[name][1], hi)]
            else:
                out[name] = [lo, hi]
    return out


def _file_may_match(stats: dict, where: list) -> bool:
    """Can a file with these footer stats contain a row satisfying every
    (col, op, value) predicate? Missing stats → maybe (never prune)."""
    for col, op, val in where:
        if col not in stats:
            continue
        lo, hi = stats[col]
        # Parquet footer min/max EXCLUDE NaN, but Spark SQL orders NaN above
        # every numeric — a file whose only rows matching `col > v` are NaN
        # would be wrongly pruned from its NaN-free footer stats. Float is
        # the only stat type that can hide NaN rows, so its upper bound is
        # untrusted for >/>= pruning; a NaN comparison value likewise never
        # prunes (Spark evaluates NaN = NaN as true). </ >= stay safe: NaN
        # sorts above everything, so it can never satisfy them.
        is_float = isinstance(lo, float) or isinstance(hi, float)
        if is_float and op in (">", ">="):
            continue
        if isinstance(val, float) and val != val:
            continue
        if (
            (op == "=" and not (lo <= val <= hi))
            or (op == "<" and not lo < val)
            or (op == "<=" and not lo <= val)
            or (op == ">" and not hi > val)
            or (op == ">=" and not hi >= val)
        ):
            return False
    return True


class ConcurrentModificationError(RuntimeError):
    """A concurrent commit changed files this transaction read and rewrote.

    Raised by the row-level paths (``merge_upsert``, ``delete_keys``,
    ``compact``) when the commit race is lost AND the fresh log shows a
    different file set for an affected partition than the one the rewrite was
    computed from — committing the staged files anyway would silently undo
    the concurrent writer's rows (Delta raises
    ``ConcurrentAppendException``/``ConcurrentDeleteReadException`` here).
    Conflicts are detected at PARTITION granularity: concurrent commits to
    disjoint partitions retry and land; the caller of a conflicted commit
    should re-run the whole operation against the new table state.
    """


class ConstraintViolationError(ValueError):
    """Incoming rows violate a table CHECK constraint.

    Delta semantics: a row violates when the constraint expression evaluates
    to FALSE; NULL passes (SQL-standard CHECK). The write is rejected before
    any commit, so the table never holds a violating row — readers can rely
    on the invariant without re-filtering.
    """


@dataclass
class Snapshot:
    """Materialized table state at one log version."""

    version: int = -1
    # relative file path -> partition value (string form, or None)
    files: dict = field(default_factory=dict)
    # app_id -> highest committed batch_id
    txns: dict = field(default_factory=dict)
    schema_json: str | None = None
    partition_col: str | None = None
    # constraint name -> SQL boolean expression (CHECK constraints)
    constraints: dict = field(default_factory=dict)
    # relative file path -> {column: [min, max]} data-skipping stats
    stats: dict = field(default_factory=dict)
    # deletion vector file (relative path) -> list of covered partition values
    dvs: dict = field(default_factory=dict)
    # generated column name -> SQL expression (computed at write time)
    generated: dict = field(default_factory=dict)


class TxnTable:
    """A single transactional parquet table rooted at ``path``."""

    def __init__(self, path: str):
        self.path = path
        self.log_dir = os.path.join(path, _LOG_DIR)
        self.data_dir = os.path.join(path, _DATA_DIR)

    # ------------------------------------------------------------------ log

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(parts[0])
            for f in os.listdir(self.log_dir)
            if (parts := f.split(".")) and len(parts) == 2
            and parts[1] == "json" and parts[0].isdigit()
        )

    def _checkpoints(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(parts[0])
            for f in os.listdir(self.log_dir)
            if (parts := f.split(".")) and len(parts) == 3
            and parts[1:] == ["checkpoint", "json"] and parts[0].isdigit()
        )

    def checkpoint(self) -> int:
        """Collapse the current snapshot into a checkpoint file (Delta-style):
        later ``snapshot()`` calls load it and replay only newer commits, so
        log replay stays O(commits since checkpoint) instead of O(all
        commits) on long-lived tables. Pure metadata; every commit file is
        retained, so time travel to pre-checkpoint versions still full-replays.
        Returns the checkpointed version. Atomic via write-then-rename."""
        snap = self.snapshot()
        if snap.version < 0:
            raise ValueError("nothing to checkpoint")
        payload = {
            "version": snap.version,
            "files": snap.files,
            "txns": snap.txns,
            "schema_json": snap.schema_json,
            "partition_col": snap.partition_col,
            "constraints": snap.constraints,
            "stats": snap.stats,
            "dvs": snap.dvs,
            "generated": snap.generated,
        }
        target = os.path.join(self.log_dir, f"{snap.version:020d}.checkpoint.json")
        tmp = target + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, target)
        return snap.version

    def snapshot(self, version: int | None = None) -> Snapshot:
        """Replay the log up to (and including) ``version`` (default: head),
        starting from the newest checkpoint at or below the target."""
        snap = Snapshot()
        base = [
            c for c in self._checkpoints() if version is None or c <= version
        ]
        if base:
            with open(
                os.path.join(self.log_dir, f"{base[-1]:020d}.checkpoint.json")
            ) as fh:
                ck = json.load(fh)
            snap.version = int(ck["version"])
            snap.files = dict(ck["files"])
            snap.txns = dict(ck["txns"])
            snap.schema_json = ck.get("schema_json")
            snap.partition_col = ck.get("partition_col")
            snap.constraints = dict(ck.get("constraints", {}))
            snap.stats = dict(ck.get("stats", {}))
            snap.dvs = dict(ck.get("dvs", {}))
            snap.generated = dict(ck.get("generated", {}))
        for v in self._versions():
            if v <= snap.version:
                continue
            if version is not None and v > version:
                break
            with open(os.path.join(self.log_dir, f"{v:020d}.json")) as fh:
                commit = json.load(fh)
            for add in commit.get("add", []):
                snap.files[add["path"]] = add.get("partition")
                if add.get("stats"):
                    snap.stats[add["path"]] = add["stats"]
            for rm in commit.get("remove", []):
                snap.files.pop(rm, None)
                snap.stats.pop(rm, None)
            txn = commit.get("txn")
            if txn:
                prev = snap.txns.get(txn["app_id"], -1)
                snap.txns[txn["app_id"]] = max(prev, int(txn["batch_id"]))
            if commit.get("schema_json"):
                snap.schema_json = commit["schema_json"]
            if commit.get("partition_col"):
                snap.partition_col = commit["partition_col"]
            if "dv_reset" in commit:
                snap.dvs = dict(commit["dv_reset"])
            for p in commit.get("dv_remove", []):
                snap.dvs.pop(p, None)
            if commit.get("dv_add"):
                dv = commit["dv_add"]
                # Single dict (delete_keys_dv) or list (compact's partial-DV
                # rewrite can replace several DVs in one atomic commit).
                for d in dv if isinstance(dv, list) else [dv]:
                    snap.dvs[d["path"]] = d.get("partitions", [])
            if commit.get("set_generated"):
                g = commit["set_generated"]
                snap.generated[g["name"]] = g["expr"]
            if commit.get("set_constraint"):
                sc = commit["set_constraint"]
                snap.constraints[sc["name"]] = sc["expr"]
            if commit.get("drop_constraint"):
                snap.constraints.pop(commit["drop_constraint"], None)
            snap.version = v
        return snap

    @staticmethod
    def _dv_cover(snap: Snapshot, affected: set) -> frozenset:
        return frozenset(
            p
            for p, parts in snap.dvs.items()
            if not parts or affected & set(parts)
        )

    def _check_unchanged(
        self,
        fresh: Snapshot,
        affected: list,
        read_files: frozenset,
        op: str,
        read_dvs: frozenset = frozenset(),
    ) -> None:
        """Conflict detection after a lost commit race: raise unless the
        affected partitions hold exactly the files the transaction read AND
        no rival landed a deletion vector over them (a rewrite computed
        without the rival's DV would resurrect its deleted rows)."""
        aff = set(affected)
        fresh_files = frozenset(p for p, pv in fresh.files.items() if pv in aff)
        if fresh_files != read_files or self._dv_cover(fresh, aff) != read_dvs:
            raise ConcurrentModificationError(
                f"{op} lost the commit race and a concurrent commit changed "
                f"partitions {sorted(aff)}; re-run against the new "
                "table state"
            )

    def _validate_constraints(self, df: DataFrame, snap: Snapshot, op: str) -> None:
        """Reject ``df`` if any row evaluates a CHECK constraint to FALSE
        (NULL passes). One filter per constraint, limit(1) — the scan stops
        at the first violation and never materializes the violating set."""
        for name, expr in snap.constraints.items():
            bad = df.filter(F.expr(f"NOT ({expr})")).limit(1).collect()
            if bad:
                raise ConstraintViolationError(
                    f"{op}: constraint {name!r} ({expr}) violated, e.g. "
                    f"{bad[0].asDict()}"
                )

    def set_generated_column(self, name: str, expr: str) -> int:
        """Declare ``name`` as a generated column (Delta GENERATED ALWAYS
        AS): every future write computes it from ``expr`` when the source
        omits it, and REJECTS a source that supplies a conflicting value —
        the standard guard for derived partition columns (a fact's date
        partition derived from its timestamp cannot silently disagree).
        Metadata-only commit; returns the commit version."""
        while True:
            snap = self.snapshot()
            if self._try_commit(
                snap.version + 1, {"set_generated": {"name": name, "expr": expr}}
            ):
                return snap.version + 1

    def _apply_generated(self, df: DataFrame, snap: Snapshot, op: str) -> DataFrame:
        for name, expr in snap.generated.items():
            if name not in df.columns:
                df = df.withColumn(name, F.expr(expr))
            else:
                bad = (
                    df.filter(~F.col(name).eqNullSafe(F.expr(expr)))
                    .limit(1)
                    .collect()
                )
                if bad:
                    raise ValueError(
                        f"{op}: generated column {name!r} = ({expr}) "
                        f"conflicts with supplied value, e.g. {bad[0].asDict()}"
                    )
        return df

    def add_constraint(self, spark: SparkSession, name: str, expr: str) -> int:
        """ALTER TABLE ADD CONSTRAINT ... CHECK (expr), Delta-style: existing
        rows are validated first (a constraint the table already violates
        would make every future write fail), then a metadata-only commit
        records it; every subsequent write validates incoming rows against
        it. Returns the commit version."""
        while True:
            snap = self.snapshot()
            if name in snap.constraints:
                raise ValueError(f"constraint {name!r} already exists")
            if snap.files:
                probe = Snapshot(constraints={name: expr})
                self._validate_constraints(
                    self.read(spark, version=snap.version), probe, "add_constraint"
                )
            if self._try_commit(
                snap.version + 1, {"set_constraint": {"name": name, "expr": expr}}
            ):
                return snap.version + 1

    def drop_constraint(self, name: str) -> int:
        """Remove a CHECK constraint (metadata-only commit)."""
        while True:
            snap = self.snapshot()
            if name not in snap.constraints:
                raise ValueError(f"no such constraint {name!r}")
            if self._try_commit(snap.version + 1, {"drop_constraint": name}):
                return snap.version + 1

    def _try_commit(self, version: int, commit: dict) -> bool:
        """Exclusive-create of the version file — the atomicity point. Returns
        False if another writer won this version (optimistic-concurrency
        loser retries against the fresh log). Every ``_CHECKPOINT_EVERY``-th
        version auto-checkpoints (the winner pays the small metadata write;
        a crash before it costs nothing — checkpoints are pure optimization)."""
        os.makedirs(self.log_dir, exist_ok=True)
        target = os.path.join(self.log_dir, f"{version:020d}.json")
        try:
            with open(target, "x") as fh:
                json.dump(commit, fh)
        except FileExistsError:
            return False
        if version > 0 and version % _CHECKPOINT_EVERY == 0:
            # Pure optimization: the commit above already landed, so a failed
            # checkpoint (transient I/O) must not surface as a commit failure
            # — callers without (app_id, batch_id) markers would re-apply.
            try:
                self.checkpoint()
            except OSError:
                pass
        return True

    # ----------------------------------------------------------------- write

    def _stage_partitioned(self, df: DataFrame, partition_col: str) -> list[dict]:
        """Write ``df`` to a fresh staging dir partitioned by ``partition_col``
        and return the ``add`` actions. Files are invisible until a commit
        references them; a crash here leaves only vacuum-able orphans."""
        staging = os.path.join(self.data_dir, uuid.uuid4().hex)
        (
            df.withColumn("__part", F.col(partition_col).cast("string"))
            .write.partitionBy("__part")
            .parquet(staging)
        )
        adds = []
        for root, _dirs, names in os.walk(staging):
            part = None
            base = os.path.basename(root)
            if base.startswith("__part="):
                part = base.split("=", 1)[1]
            for n in names:
                if n.endswith(".parquet"):
                    full = os.path.join(root, n)
                    rel = os.path.relpath(full, self.path)
                    adds.append(
                        {
                            "path": rel,
                            "partition": part,
                            "stats": _file_column_stats(full),
                        }
                    )
        return adds

    def merge_overwrite_partitions(
        self,
        df: DataFrame,
        partition_col: str,
        app_id: str | None = None,
        batch_id: int | None = None,
    ) -> list[str]:
        """MERGE-by-partition upsert: atomically replace exactly the
        ``partition_col`` partitions present in ``df``.

        Returns the list of partition values written, or ``[]`` when the
        (app_id, batch_id) transaction was already committed — the replayed
        micro-batch no-op that makes foreachBatch exactly-once. Data files are
        written before the commit, so a crash anywhere before the O_EXCL
        rename-equivalent leaves only invisible orphans (cleaned by
        ``vacuum``), never partial table state.
        """
        snap = self.snapshot()
        if app_id is not None and batch_id is not None:
            if snap.txns.get(app_id, -1) >= int(batch_id):
                return []

        df = self._apply_generated(df, snap, "merge_overwrite_partitions")

        # Schema guard: readers apply the COMMITTED schema, so source columns
        # the table doesn't know about would be written into the files and
        # then silently dropped on every read. A source narrower than the
        # committed schema is fine (evolution survives: this commit carries no
        # schema_json on an existing table, and the missing columns read back
        # as NULL for the overwritten partitions).
        if snap.schema_json is not None:
            committed = {
                f.name
                for f in StructType.fromJson(json.loads(snap.schema_json)).fields
            }
            unknown = [c for c in df.columns if c not in committed]
            if unknown:
                raise ValueError(
                    f"source has columns unknown to the table {unknown}; "
                    "add_columns() the table first"
                )

        self._validate_constraints(df, snap, "merge_overwrite_partitions")

        # Stage the new files under a unique dir; __part mirrors the partition
        # column so the directory layout carries the value while the original
        # column stays inside the data files (readers need no path inference).
        adds = self._stage_partitioned(df, partition_col)
        new_parts = sorted({a["partition"] for a in adds})

        while True:
            commit = {
                "add": adds,
                "remove": [p for p, pv in snap.files.items() if pv in new_parts],
                "partition_col": partition_col,
            }
            if app_id is not None and batch_id is not None:
                commit["txn"] = {"app_id": app_id, "batch_id": int(batch_id)}
            if snap.version < 0:
                commit["schema_json"] = df.drop("__part").schema.json()
            if self._try_commit(snap.version + 1, commit):
                return new_parts
            # Lost the commit race: re-read, re-validate idempotency, retry.
            snap = self.snapshot()
            if app_id is not None and batch_id is not None:
                if snap.txns.get(app_id, -1) >= int(batch_id):
                    return []

    def merge_upsert(
        self,
        spark: SparkSession,
        df: DataFrame,
        keys: list[str],
        partition_col: str | None = None,
        app_id: str | None = None,
        batch_id: int | None = None,
    ) -> list[str]:
        """Row-level MERGE: ``WHEN MATCHED THEN UPDATE SET * / WHEN NOT
        MATCHED THEN INSERT *`` on ``keys``, in one atomic commit.

        Delta-style two-phase plan, partition-scoped so work is O(affected
        partitions), never O(table):

        1. **Find** — the affected partitions are the source rows' own
           partition values plus every target partition holding a matched key
           (a column-pruned scan of only ``keys + partition_col``, with the
           source keyset broadcast into a semi-join).
        2. **Rewrite** — read just those partitions (file-pruned from log
           metadata), anti-join out the matched rows, union the source rows,
           and stage the result; the commit atomically swaps the affected
           partitions' files.

        The source must be key-unique (same precondition as Delta MERGE —
        two source rows matching one target row is ambiguous); violations
        raise. Returns the affected partition values, or ``[]`` when the
        (app_id, batch_id) transaction was already committed.

        Optimistic concurrency: the whole transaction is pinned to one
        snapshot version. Losing the commit race retries ONLY if the fresh
        log shows the affected partitions' files unchanged (the rival
        touched disjoint partitions); otherwise
        ``ConcurrentModificationError`` — committing the staged rewrite
        would silently clobber the rival's rows. Partition granularity:
        a rival inserting a matched key into a partition outside the
        affected set is not detected — co-partition keys with their rows
        (key includes the partition column) for full serializability.
        """
        snap = self.snapshot()
        if app_id is not None and batch_id is not None:
            if snap.txns.get(app_id, -1) >= int(batch_id):
                return []

        # Generated columns first: a derived partition column must exist
        # before the presence check below.
        df = self._apply_generated(df, snap, "merge_upsert")
        part_col = partition_col or snap.partition_col
        if part_col is None:
            raise ValueError("partition_col required for a new table")
        if part_col not in df.columns:
            raise ValueError(f"source is missing partition column {part_col!r}")

        dup = (
            df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"source has duplicate merge keys (e.g. {dup[0].asDict()}); "
                "MERGE requires a key-unique source"
            )

        self._validate_constraints(df, snap, "merge_upsert")

        if snap.version < 0 or not snap.files:
            # Empty table: everything is an insert.
            adds = self._stage_partitioned(df, part_col)
            commit = {
                "add": adds,
                "remove": [],
                "partition_col": part_col,
                "schema_json": df.schema.json(),
            }
            if app_id is not None and batch_id is not None:
                commit["txn"] = {"app_id": app_id, "batch_id": int(batch_id)}
            if self._try_commit(snap.version + 1, commit):
                return sorted({a["partition"] for a in adds})
            # Lost the race to create the table: it may have rows now, so
            # restart the whole merge against the fresh log (staged files
            # stay invisible orphans for vacuum).
            return self.merge_upsert(spark, df, keys, partition_col, app_id, batch_id)

        # Phase 1 — find affected partitions. The target scan reads only the
        # key + partition columns (column pruning), and the source keyset is
        # broadcast: no target shuffle, no wide rows moved. All reads pin to
        # snap.version so the rewrite is computed from ONE snapshot.
        src_keys = df.select(*keys).distinct()
        src_parts = {
            str(r[0])
            for r in df.select(F.col(part_col).cast("string")).distinct().collect()
        }
        matched_parts = {
            str(r[0])
            for r in self.read(spark, version=snap.version)
            .select(*keys, part_col)
            .join(F.broadcast(src_keys), keys, "left_semi")
            .select(F.col(part_col).cast("string"))
            .distinct()
            .collect()
        }
        affected = sorted(src_parts | matched_parts)
        read_files = frozenset(
            p for p, pv in snap.files.items() if pv in affected
        )
        read_dvs = self._dv_cover(snap, set(affected))

        # Phase 2 — partition-scoped read-modify-write.
        old = self.read(spark, partition_values=affected, version=snap.version)
        missing = [c for c in old.columns if c not in df.columns]
        if missing:
            raise ValueError(
                f"source is missing table columns {missing}; align the source "
                "or add_columns() the table first"
            )
        unknown = [c for c in df.columns if c not in old.columns]
        if unknown:
            raise ValueError(
                f"source has columns unknown to the table {unknown}; "
                "add_columns() the table first"
            )
        merged = old.join(F.broadcast(src_keys), keys, "left_anti").unionByName(
            df.select(*old.columns)
        )
        adds = self._stage_partitioned(merged, part_col)

        while True:
            commit = {
                "add": adds,
                "remove": [p for p, pv in snap.files.items() if pv in affected],
                "partition_col": part_col,
            }
            if app_id is not None and batch_id is not None:
                commit["txn"] = {"app_id": app_id, "batch_id": int(batch_id)}
            if self._try_commit(snap.version + 1, commit):
                return affected
            # Lost the commit race: re-read, re-validate idempotency, then
            # retry only if the rival left our read set untouched.
            snap = self.snapshot()
            if app_id is not None and batch_id is not None:
                if snap.txns.get(app_id, -1) >= int(batch_id):
                    return []
            self._check_unchanged(snap, affected, read_files, "merge_upsert", read_dvs)

    def delete_keys(
        self,
        spark: SparkSession,
        keys_df: DataFrame,
        keys: list[str],
        app_id: str | None = None,
        batch_id: int | None = None,
    ) -> list[str]:
        """Row-level DELETE: remove every row whose key appears in
        ``keys_df`` — the right-to-be-forgotten primitive. Same partition-
        scoped shape as ``merge_upsert``: find the partitions holding matched
        keys via a column-pruned broadcast semi-join, rewrite only those
        partitions with the matches anti-joined out, publish in one atomic
        commit. Partitions whose rewrite comes back empty are simply removed.
        Returns the affected partition values ([] if no key matched or the
        (app_id, batch_id) transaction was already committed).

        Deleted rows remain physically present in superseded files until
        ``vacuum()`` — for a compliance delete, follow with ``vacuum``.
        """
        snap = self.snapshot()
        if app_id is not None and batch_id is not None:
            if snap.txns.get(app_id, -1) >= int(batch_id):
                return []
        part_col = snap.partition_col
        if part_col is None or not snap.files:
            return []

        targets = keys_df.select(*keys).distinct()
        affected = sorted(
            str(r[0])
            for r in self.read(spark, version=snap.version)
            .select(*keys, part_col)
            .join(F.broadcast(targets), keys, "left_semi")
            .select(F.col(part_col).cast("string"))
            .distinct()
            .collect()
        )
        if not affected:
            return []
        read_files = frozenset(
            p for p, pv in snap.files.items() if pv in set(affected)
        )
        read_dvs = self._dv_cover(snap, set(affected))

        kept = self.read(
            spark, partition_values=affected, version=snap.version
        ).join(F.broadcast(targets), keys, "left_anti")
        adds = self._stage_partitioned(kept, part_col)

        while True:
            commit = {
                "add": adds,
                "remove": [p for p, pv in snap.files.items() if pv in affected],
            }
            if app_id is not None and batch_id is not None:
                commit["txn"] = {"app_id": app_id, "batch_id": int(batch_id)}
            if self._try_commit(snap.version + 1, commit):
                return affected
            snap = self.snapshot()
            if app_id is not None and batch_id is not None:
                if snap.txns.get(app_id, -1) >= int(batch_id):
                    return []
            self._check_unchanged(snap, affected, read_files, "delete_keys", read_dvs)

    def delete_keys_dv(
        self,
        spark: SparkSession,
        keys_df: DataFrame,
        keys: list[str],
        app_id: str | None = None,
        batch_id: int | None = None,
    ) -> int:
        """Merge-on-read DELETE via a deletion vector: instead of rewriting
        every affected partition (``delete_keys``, write cost O(partition
        bytes)), record the matched rows' (file, row position) in a DV file
        and commit that — write cost O(matched rows). Readers anti-join live
        DVs, so deleted rows vanish immediately; ``compact()`` later folds
        DVs into rewritten files (its read applies them), which is Delta's
        deletion-vector protocol shape. Returns the number of rows deleted.

        Trade: reads pay the DV anti-join until compaction — the standard
        merge-on-read bargain (cheap deletes now, deferred rewrite later).
        Rows stay physically present until compact + vacuum; a compliance
        purge should use ``delete_keys`` + ``vacuum`` or follow up with
        ``compact``."""
        snap = self.snapshot()
        if app_id is not None and batch_id is not None:
            if snap.txns.get(app_id, -1) >= int(batch_id):
                return 0
        if snap.partition_col is None or not snap.files:
            return 0

        targets = keys_df.select(*keys).distinct()
        # Raw scan (NOT self.read): _metadata only resolves on the file-scan
        # relation, and the positions must be physical-file positions — the
        # DV-filtered view would both break resolution and skew row_index
        # semantics. Rows already covered by live DVs are anti-joined out so
        # a re-delete neither double-counts nor bloats the new DV.
        scan_files = [os.path.join(self.path, p) for p in sorted(snap.files)]
        reader = spark.read
        if snap.schema_json:
            reader = reader.schema(StructType.fromJson(json.loads(snap.schema_json)))
        raw = reader.parquet(*scan_files)
        rel = F.expr(
            "substring(_metadata.file_path, "
            "instr(_metadata.file_path, '/_data/') + 1)"
        )
        # Project the metadata columns BEFORE the join: _metadata resolves
        # only directly against the file-scan relation.
        tagged = raw.select(
            *keys,
            rel.alias("file"),
            F.col("_metadata.row_index").alias("pos"),
            F.col(snap.partition_col).cast("string").alias("__part"),
        )
        matches = tagged.join(F.broadcast(targets), keys, "left_semi").select(
            "file", "pos", "__part"
        )
        if snap.dvs:
            prior = spark.read.parquet(
                *[os.path.join(self.path, p) for p in sorted(snap.dvs)]
            ).select("file", "pos")
            matches = matches.join(prior, ["file", "pos"], "left_anti")
        staging = os.path.join(self.data_dir, f"dv_{uuid.uuid4().hex}")
        matches.write.parquet(staging)
        written = spark.read.parquet(staging)
        n = written.count()
        if n == 0:
            return 0
        parts = sorted(r[0] for r in written.select("__part").distinct().collect())
        dv_rel = os.path.relpath(staging, self.path)
        read_files = frozenset(
            p for p, pv in snap.files.items() if pv in set(parts)
        )
        read_dvs = self._dv_cover(snap, set(parts))
        while True:
            commit = {"dv_add": {"path": dv_rel, "partitions": parts}}
            if app_id is not None and batch_id is not None:
                commit["txn"] = {"app_id": app_id, "batch_id": int(batch_id)}
            if self._try_commit(snap.version + 1, commit):
                return n
            snap = self.snapshot()
            if app_id is not None and batch_id is not None:
                if snap.txns.get(app_id, -1) >= int(batch_id):
                    return 0
            # The DV's row positions are pinned to the files it was computed
            # from: any rival rewrite of those partitions invalidates it.
            self._check_unchanged(snap, parts, read_files, "delete_keys_dv", read_dvs)

    # ------------------------------------------------------- schema evolution

    def add_columns(self, new_fields: "StructType | list") -> int:
        """Widen the table schema — a pure metadata commit (no data rewrite),
        like Delta's ADD COLUMNS. Existing files surface the new columns as
        NULL because readers apply the committed schema; time travel to an
        earlier version still reads the pre-evolution schema. Returns the new
        log version."""
        snap = self.snapshot()
        if snap.schema_json is None:
            raise ValueError("cannot evolve an empty table")
        current = StructType.fromJson(json.loads(snap.schema_json))
        existing = {f.name for f in current.fields}
        fields = list(new_fields.fields) if isinstance(new_fields, StructType) else list(new_fields)
        for f in fields:
            if f.name in existing:
                raise ValueError(f"column {f.name!r} already exists")
        evolved = StructType(current.fields + fields)
        while True:
            version = self.snapshot().version + 1
            if self._try_commit(version, {"schema_json": evolved.json()}):
                return version

    # ------------------------------------------------------------------ read

    def read(
        self,
        spark: SparkSession,
        partition_values: list | None = None,
        version: int | None = None,
        where: list | None = None,
    ) -> DataFrame:
        """Read the committed snapshot (optionally time-traveled / pruned).

        ``partition_values`` prunes at FILE granularity from log metadata —
        the scan never lists or touches other partitions' files. ``where``
        is a list of (column, op, value) with op in =/</<=/>/>=: files whose
        footer min/max stats cannot satisfy every predicate are skipped
        (Delta-style data skipping), and the predicates are ALSO applied as
        row filters, so correctness never depends on stats — files without
        stats simply aren't skipped. The scan applies the schema committed
        as of ``version``, so files written before an ``add_columns``
        evolution surface the new columns as NULL, and time travel to a
        pre-evolution version reads the old schema.
        """
        snap = self.snapshot(version)
        wanted = (
            None
            if partition_values is None
            else {str(v) for v in partition_values}
        )
        files = [
            os.path.join(self.path, rel)
            for rel, pv in sorted(snap.files.items())
            if (wanted is None or pv in wanted)
            and (
                not where
                or _file_may_match(snap.stats.get(rel, {}), where)
            )
        ]
        schema = (
            StructType.fromJson(json.loads(snap.schema_json))
            if snap.schema_json
            else None
        )
        if not files:
            return spark.createDataFrame([], schema or StructType([]))
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.parquet(*files)
        if snap.dvs:
            # Merge-on-read: anti-join the deletion vectors on the scan's
            # (relative path, row position) — deleted rows vanish without
            # their files ever having been rewritten.
            out_cols = df.columns
            rel = F.expr(
                "substring(_metadata.file_path, "
                "instr(_metadata.file_path, '/_data/') + 1)"
            )
            dv = spark.read.parquet(
                *[os.path.join(self.path, p) for p in sorted(snap.dvs)]
            )
            df = (
                df.withColumn("__dv_file", rel)
                .withColumn("__dv_pos", F.col("_metadata.row_index"))
                .join(
                    # No forced broadcast: DV volume is O(deleted rows) and
                    # unbounded — AQE broadcasts it while it is small.
                    dv.withColumnRenamed("file", "__dv_file")
                    .withColumnRenamed("pos", "__dv_pos"),
                    ["__dv_file", "__dv_pos"],
                    "left_anti",
                )
                .select(*out_cols)
            )
        for col, op, val in where or []:
            ops = {
                "=": F.col(col) == val,
                "<": F.col(col) < val,
                "<=": F.col(col) <= val,
                ">": F.col(col) > val,
                ">=": F.col(col) >= val,
            }
            df = df.filter(ops[op])
        return df

    # -------------------------------------------------------------- compact

    def compact(
        self,
        spark: SparkSession,
        partition_values: list | None = None,
        zorder_cols: list[str] | None = None,
        n_files: int = 1,
    ) -> int:
        """OPTIMIZE-style compaction: rewrite each targeted partition's live
        files, in a single atomic commit per run (readers see either all old
        files or all new ones — never a mix).

        Default mode collapses multi-file partitions to one file each (the
        small-files fix for streaming-MERGE-heavy tables). With
        ``zorder_cols`` this is ``OPTIMIZE ZORDER BY``: every targeted
        partition (even single-file ones) is rewritten through
        ``storage/layout.py:zorder_by`` into ``n_files`` z-clustered files,
        so selective filters on ANY of the z columns prune files from footer
        stats alone. Returns the number of files replaced. Old files stay on
        disk for time travel until ``vacuum``.
        """
        snap = self.snapshot()
        by_part: dict = {}
        for rel, pv in snap.files.items():
            by_part.setdefault(pv, []).append(rel)
        wanted = None if partition_values is None else {str(v) for v in partition_values}
        dv_covered = {p for parts in snap.dvs.values() for p in parts}
        targets = {
            pv: rels
            for pv, rels in by_part.items()
            # DV-covered partitions compact even at one file: compaction is
            # what materializes merge-on-read deletes into real files.
            if (len(rels) > 1 or zorder_cols is not None or pv in dv_covered)
            and (wanted is None or pv in wanted)
        }
        if not targets:
            return 0
        adds, removes = [], []
        staged_dirs: list[str] = []
        for pv, rels in sorted(targets.items()):
            staging = os.path.join(self.data_dir, uuid.uuid4().hex)
            staged_dirs.append(staging)
            # Read THROUGH the snapshot (committed schema + deletion vectors
            # applied), not the raw files: a DV-hidden row must not survive
            # into the rewritten partition.
            src = self.read(spark, partition_values=[pv], version=snap.version)
            if zorder_cols is not None:
                from .layout import zorder_by

                out = zorder_by(src, zorder_cols, n_files)
            else:
                out = src.coalesce(1)
            out.write.parquet(staging)
            for root, _dirs, names in os.walk(staging):
                for n in names:
                    if n.endswith(".parquet"):
                        adds.append(
                            {
                                "path": os.path.relpath(os.path.join(root, n), self.path),
                                "partition": pv,
                            }
                        )
            removes.extend(rels)
        read_files = frozenset(removes)
        targeted = sorted(targets, key=str)
        targeted_set = set(targeted)
        read_dvs = self._dv_cover(snap, targeted_set)
        # DV entries whose every covered partition was rewritten are fully
        # materialized by this compaction — drop them from the live set.
        dv_drop = [
            p
            for p, parts in snap.dvs.items()
            if parts and set(parts) <= targeted_set
        ]
        # DVs that cover a targeted partition only PARTIALLY: their (file,
        # pos) entries for the rewritten files are dead, but entries for the
        # untouched partitions must survive. Rewrite each such DV without the
        # dead rows and shrink its partition list, so partition-at-a-time
        # compaction retires the DV incrementally instead of pinning its
        # partitions merge-on-read (and blocking symlink manifests) forever.
        removed_set = sorted(set(removes))
        dv_adds = []
        for p, parts in snap.dvs.items():
            if not parts or p in dv_drop or not (set(parts) & targeted_set):
                continue
            keep = spark.read.parquet(os.path.join(self.path, p)).filter(
                # DV volume is O(deleted rows) metadata and removed_set is
                # the targeted partitions' file list — driver-side isin is
                # the right size here, no join needed.
                ~F.col("file").isin(removed_set)
            )
            if keep.limit(1).count() == 0:
                dv_drop.append(p)
                continue
            staging = os.path.join(self.data_dir, f"dv_{uuid.uuid4().hex}")
            staged_dirs.append(staging)
            keep.coalesce(1).write.parquet(staging)
            dv_drop.append(p)
            dv_adds.append(
                {
                    "path": os.path.relpath(staging, self.path),
                    "partitions": sorted(set(parts) - targeted_set, key=str),
                }
            )
        try:
            while True:
                head = self.snapshot()
                # A rival rewriting a targeted partition (MERGE, DELETE,
                # another OPTIMIZE) invalidates the staged compaction —
                # committing it would resurrect the pre-rival rows.
                self._check_unchanged(head, targeted, read_files, "compact", read_dvs)
                commit = {"add": adds, "remove": removes}
                if dv_drop:
                    commit["dv_remove"] = dv_drop
                if dv_adds:
                    commit["dv_add"] = dv_adds
                if self._try_commit(head.version + 1, commit):
                    return len(removes)
        except ConcurrentModificationError:
            # The staged rewrite (data AND DV parquet) will never be
            # committed — best-effort removal now instead of orphaning it
            # until vacuum. Never committed, so no reader can hold a
            # snapshot that references these paths.
            import shutil

            for d in staged_dirs:
                shutil.rmtree(d, ignore_errors=True)
            raise

    # ------------------------------------------------------------- history

    def detail(self) -> dict:
        """DESCRIBE DETAIL: one metadata dict for operators and dashboards —
        current version, file/partition/byte counts, constraint and DV
        state. Driver-side log + filesystem metadata only; no data scan."""
        snap = self.snapshot()
        n_bytes = 0
        for rel in snap.files:
            p = os.path.join(self.path, rel)
            if os.path.exists(p):
                n_bytes += os.path.getsize(p)
        return {
            "path": self.path,
            "version": snap.version,
            "num_files": len(snap.files),
            "size_bytes": n_bytes,
            "partition_col": snap.partition_col,
            "partitions": sorted({pv for pv in snap.files.values() if pv is not None}),
            "constraints": dict(snap.constraints),
            "num_deletion_vectors": len(snap.dvs),
            "num_checkpoints": len(self._checkpoints()),
            "apps": dict(snap.txns),
        }

    def history(self) -> list[dict]:
        """DESCRIBE HISTORY: one entry per commit, newest first — version,
        counts of add/remove actions, txn marker, and whether the commit was
        a pure schema change. Driver-side metadata read only."""
        out = []
        for v in self._versions():
            with open(os.path.join(self.log_dir, f"{v:020d}.json")) as fh:
                commit = json.load(fh)
            out.append(
                {
                    "version": v,
                    "n_added": len(commit.get("add", [])),
                    "n_removed": len(commit.get("remove", [])),
                    "txn": commit.get("txn"),
                    "schema_change": bool(commit.get("schema_json"))
                    and not commit.get("add")
                    and not commit.get("remove"),
                }
            )
        return out[::-1]

    def restore(self, version: int) -> int:
        """RESTORE TABLE TO VERSION: a NEW commit whose file set equals the
        old snapshot's (Delta's writeable time travel) — history is preserved
        and the restore itself is undoable. Requires the old files to still
        exist, i.e. no ``vacuum`` since ``version``. Returns the new head
        version."""
        old = self.snapshot(version)
        if old.version != version:
            raise ValueError(f"version {version} does not exist")
        for rel in old.files:
            if not os.path.exists(os.path.join(self.path, rel)):
                raise ValueError(
                    f"cannot restore to v{version}: {rel} was vacuumed"
                )
        while True:
            head = self.snapshot()
            commit = {
                "add": [
                    {
                        "path": rel,
                        "partition": pv,
                        "stats": old.stats.get(rel),
                    }
                    for rel, pv in old.files.items()
                ],
                "remove": [rel for rel in head.files if rel not in old.files],
                # Restore must also restore deletion-vector state: without
                # this, DVs committed after `version` would keep deleting
                # rows from the re-added files.
                "dv_reset": old.dvs,
            }
            if old.schema_json:
                commit["schema_json"] = old.schema_json
            if self._try_commit(head.version + 1, commit):
                return head.version + 1

    # --------------------------------------------------------------- vacuum

    def vacuum(self, retain_last: int = 0, dry_run: bool = False) -> int:
        """Physically delete data files not referenced by the last
        ``retain_last + 1`` snapshots: superseded versions and crash orphans.
        The default (0) keeps only the CURRENT snapshot's files — Delta
        VACUUM with retention 0, forfeiting all time travel; ``retain_last=N``
        preserves time travel to the N most recent prior versions (Delta's
        retention window, counted in versions rather than hours so tests and
        batch jobs stay deterministic). ``dry_run=True`` counts what WOULD
        be removed without deleting (Delta's VACUUM DRY RUN — the sanity
        check before an irreversible purge, and the way to audit whether a
        shallow clone still depends on files a purge would take). Returns
        the number of files removed (or would-be removed)."""
        head = self.snapshot().version
        live: set = set()
        for v in range(max(0, head - retain_last), head + 1):
            s = self.snapshot(v)
            live |= {
                os.path.normpath(os.path.join(self.path, rel))
                for rel in s.files
            }
            # Deletion-vector files are metadata the live snapshots depend
            # on — every parquet under a live DV path is retained.
            for dv in s.dvs:
                dv_abs = os.path.join(self.path, dv)
                for root, _dirs, names in os.walk(dv_abs):
                    live |= {
                        os.path.normpath(os.path.join(root, f))
                        for f in names
                        if f.endswith(".parquet")
                    }
        removed = 0
        for root, _dirs, names in os.walk(self.data_dir):
            for n in names:
                p = os.path.normpath(os.path.join(root, n))
                if n.endswith(".parquet") and p not in live:
                    if not dry_run:
                        os.remove(p)
                    removed += 1
        return removed


def clone_shallow(src: TxnTable, dst_path: str) -> TxnTable:
    """Zero-copy table fork (Delta SHALLOW CLONE): the clone's first commit
    references the source snapshot's data files by ABSOLUTE path — no bytes
    move, however large the table. Reads resolve absolute entries as-is
    (``os.path.join`` passes them through); writes to the clone stage fresh
    files under the clone's own ``_data/`` and never touch the source, so
    the two tables diverge copy-on-write at partition granularity.

    The clone carries the source's schema, constraints, data-skipping stats,
    and live deletion vectors (also by absolute path) — the full read
    contract, not just the file list. Standard shallow-clone caveat, same as
    Delta's: ``vacuum`` on the SOURCE may delete files the clone still
    references; clones are for experiments/dev-on-prod-data, not archival.
    """
    snap = src.snapshot()
    if snap.version < 0:
        raise ValueError("cannot clone an empty table")
    dst = TxnTable(dst_path)
    if dst.snapshot().version >= 0:
        raise ValueError(f"{dst_path} already holds a table")
    commit = {
        "add": [
            {
                "path": os.path.abspath(os.path.join(src.path, rel)),
                "partition": pv,
                "stats": snap.stats.get(rel),
            }
            for rel, pv in sorted(snap.files.items())
        ],
        "remove": [],
        "partition_col": snap.partition_col,
        "dv_reset": {
            os.path.abspath(os.path.join(src.path, p)): parts
            for p, parts in snap.dvs.items()
        },
    }
    if snap.schema_json:
        commit["schema_json"] = snap.schema_json
    if not dst._try_commit(0, commit):
        raise ValueError(f"{dst_path} already holds a table")
    # Retry-loop these metadata commits like add_constraint does: a lost
    # version race silently dropping a CHECK constraint or generated-column
    # rule would make later clone writes skip validation.
    for name, expr in snap.constraints.items():
        while not dst._try_commit(
            dst.snapshot().version + 1,
            {"set_constraint": {"name": name, "expr": expr}},
        ):
            pass
    for name, expr in snap.generated.items():
        while not dst._try_commit(
            dst.snapshot().version + 1,
            {"set_generated": {"name": name, "expr": expr}},
        ):
            pass
    return dst
