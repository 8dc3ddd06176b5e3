"""Thin Iceberg-style table catalog over partitioned parquet + a commit ledger.

Re-expresses the reference's persistence/incrementality behaviors
(SURVEY §2.2 K1/K2/K7, §2.10 I1-I4):

* index create / createOrReplace DDL  (/root/reference/src/datastore.py:80-95)
* change-detection ledger (`file_list.json` name→last_modified snapshot,
  /root/reference/src/query_api.py:55-70)
* skip-existing idempotency          (/root/reference/src/query_api.py:86-88,113-115)

On a real cluster this layer is Iceberg (``df.writeTo(...).createOrReplace()``,
``overwritePartitions()``, snapshot diffs); no Iceberg runtime jars exist in
the sandbox, so the same API is implemented over directory-partitioned
parquet plus atomic JSON commit markers.  The commit marker IS the
Iceberg-manifest analog: one file per (table, partition) recording lineage
(source snapshot, row/triple counts, timestamps); a partition is visible
iff its marker exists, and re-running a partition atomically replaces data
then marker — idempotent resume by construction.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import logging
from dataclasses import dataclass, fields
from typing import Any

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger("cdrc_semantic_search_spark")


@dataclass
class CommitRecord:
    table: str
    partition: str
    source_snapshot: str
    row_count: int
    metrics: dict[str, Any]
    committed_at: float
    status: str = "committed"


class SnapshotUnavailableError(RuntimeError):
    """A time-travel read asked for a snapshot whose bytes were reclaimed
    (partition overwritten or retired since ``as_of``)."""


_RECORD_FIELDS = {f.name for f in fields(CommitRecord)}


def _record_from_json(rec: dict) -> CommitRecord:
    """Schema-tolerant CommitRecord parse: a marker written by another
    (newer/older) writer version may carry extra fields or omit optional
    ones; only the identity fields are hard requirements. Raises KeyError
    on a marker missing those — callers decide whether that blocks
    (reading a specific ledger) or degrades (scanning retirement markers
    on the commit hot path)."""
    return CommitRecord(
        table=rec["table"],
        partition=rec["partition"],
        source_snapshot=rec.get("source_snapshot", ""),
        row_count=rec.get("row_count", -1),
        metrics=rec.get("metrics") or {},
        committed_at=rec.get("committed_at", 0.0),
        status=rec.get("status", "committed"),
    )


class ParquetTableCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._recover_interrupted_swaps()
        # retirement markers are immutable once written, so parsed records
        # are cached per table keyed by the filename set; only files not
        # yet seen are opened (retired_partitions sits on the per-commit
        # hot path — without this, G generations × P partitions means G·P
        # file opens + JSON parses on EVERY overwrite_partition call)
        self._retired_cache: dict[str, dict[str, tuple]] = {}

    def _recover_interrupted_swaps(self) -> None:
        """Roll back any ``replace_via_staging`` swap that crashed between
        its two renames.  The crash window leaves ``<name>__old`` (the
        last good table) next to a MISSING ``<name>``; rolling the old
        directory back restores the pre-replace state automatically at
        catalog open instead of requiring hand recovery.  If ``<name>``
        EXISTS alongside ``__old``, the swap completed and only the
        cleanup rmtree was lost — drop the leftover.  Orphaned
        ``__staging`` dirs (crash during the staging write) are always
        safe to drop: the live table was never touched."""
        try:
            entries = os.listdir(self.root)
        except FileNotFoundError:
            return
        for e in entries:
            p = os.path.join(self.root, e)
            if not os.path.isdir(p):
                continue
            if e.endswith("__old"):
                name = e[: -len("__old")]
                dst = os.path.join(self.root, name)
                if os.path.exists(dst):
                    # swap completed but the post-rename cleanup was lost:
                    # finish ALL of replace_via_staging's postconditions,
                    # not just the __old rmtree — the stale ledger/history
                    # still describe the REPLACED bytes, and resume logic
                    # would treat those partitions as committed against
                    # the new table
                    shutil.rmtree(p, ignore_errors=True)
                    shutil.rmtree(self._ledger_dir(name), ignore_errors=True)
                    shutil.rmtree(self._history_dir(name), ignore_errors=True)
                    log.info("catalog recovery: dropped completed-swap leftover %s", e)
                else:
                    os.rename(p, dst)
                    log.warning(
                        "catalog recovery: rolled back interrupted swap %s -> %s",
                        e, os.path.basename(dst),
                    )
            elif e.endswith("__staging"):
                shutil.rmtree(p, ignore_errors=True)
                log.info("catalog recovery: dropped orphaned staging dir %s", e)

    # ---- paths -----------------------------------------------------------
    def table_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _partition_path(self, name: str, partition: str) -> str:
        return os.path.join(self.table_path(name), f"part={partition}")

    def _ledger_dir(self, name: str) -> str:
        return os.path.join(self.root, "_ledger", name)

    def _marker_path(self, name: str, partition: str) -> str:
        return os.path.join(self._ledger_dir(name), f"{partition}.json")

    def _retired_dir(self, name: str) -> str:
        return os.path.join(self.root, "_ledger_retired", name)

    def _history_dir(self, name: str) -> str:
        return os.path.join(self.root, "_ledger_history", name)

    # ---- DDL / writes ----------------------------------------------------
    def create_or_replace(self, df: DataFrame, name: str) -> None:
        """K2 analog: full-table replace (reference `overwrite=true`,
        /root/reference/src/datastore.py:88-95)."""
        df.write.mode("overwrite").parquet(self.table_path(name))
        shutil.rmtree(self._ledger_dir(name), ignore_errors=True)
        shutil.rmtree(self._history_dir(name), ignore_errors=True)

    def drop_table(self, name: str) -> None:
        """Remove a table's data, ledger, and retirement marks entirely
        (rebuild prep: e.g. a PQ index rebuild must also retire the
        streamed code-delta generation, or stale deltas would override
        the fresh base on merge-on-read)."""
        shutil.rmtree(self.table_path(name), ignore_errors=True)
        shutil.rmtree(self._ledger_dir(name), ignore_errors=True)
        shutil.rmtree(self._retired_dir(name), ignore_errors=True)
        shutil.rmtree(self._history_dir(name), ignore_errors=True)

    def replace_via_staging(self, df: DataFrame, name: str) -> None:
        """Full-table replace SAFE for a plan that reads the table it
        replaces (e.g. merge-upsert of a table into itself):
        ``create_or_replace`` would delete the directory the plan is
        still reading — Spark fails with FAILED_READ_FILE mid-write and
        the only copy is gone. Here the plan materializes into a staging
        dir first, then swaps in by rename. A crash between the two
        renames leaves ``<name>__old`` intact next to a missing table —
        rolled back automatically by :meth:`_recover_interrupted_swaps`
        at the next catalog open (single-writer assumption, same as the
        rest of this file-based catalog: recovery at open must not race
        a concurrent in-flight swap by another writer).
        """
        staging = self.table_path(f"{name}__staging")
        shutil.rmtree(staging, ignore_errors=True)
        df.write.mode("overwrite").parquet(staging)
        dst = self.table_path(name)
        old = dst + "__old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(dst):
            os.rename(dst, old)
        os.rename(staging, dst)
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(self._ledger_dir(name), ignore_errors=True)
        shutil.rmtree(self._history_dir(name), ignore_errors=True)

    def retire_partitions(self, name: str, partitions: list[str]) -> None:
        """Retire delta partitions that were folded into a base table: the
        commit marker MOVES to the retired ledger (lineage preserved; the
        partition stops being 'committed' so reads exclude it and resume
        logic won't re-run it), then the data is deleted.  Marker-first
        ordering means a crash mid-retire leaves an invisible partition,
        never a double-counted one."""
        os.makedirs(self._retired_dir(name), exist_ok=True)
        retired_at = time.time()
        for p in partitions:
            marker = self._marker_path(name, p)
            if os.path.exists(marker):
                # stamp WHEN retirement happened: time travel must
                # distinguish snapshots that contained this partition
                # (unreconstructable — bytes folded away) from snapshots
                # taken after the compaction (fully live)
                with open(marker) as f:
                    rec = json.load(f)
                rec["retired_at"] = retired_at
                # filename carries the record's commit stamp (same scheme
                # as _history_dir): a retire → re-commit → retire sequence
                # on the same partition name must keep EVERY retirement
                # generation, or snapshot_partitions silently serves a
                # snapshot missing a partition that was visible at as_of
                # external writers may omit committed_at; stamp with the
                # retirement time then (uniqueness is what the filename
                # needs, and retired_at is unique per retire call)
                dst = os.path.join(
                    self._retired_dir(name),
                    f"{p}.{rec.get('committed_at', retired_at):.6f}.json",
                )
                with open(dst + ".tmp", "w") as f:
                    json.dump(rec, f)
                os.replace(dst + ".tmp", dst)
                os.remove(marker)
            # delete data even if the marker already moved (a crash between
            # the move and this delete must not orphan the bytes forever)
            shutil.rmtree(self._partition_path(name, p), ignore_errors=True)

    def retired_partitions(self, name: str) -> set[str]:
        """Partition names with ≥1 retirement record. Read from record
        CONTENTS, not filenames — stamped (``p.<ts>.json``) and legacy
        (``p.json``) markers coexist and dots in partition names would
        make filename parsing ambiguous."""
        return {rec.partition for rec, _ in self._retired_records(name)}

    def overwrite_partition(
        self,
        df: DataFrame,
        name: str,
        partition: str,
        source_snapshot: str = "",
        metrics: dict[str, Any] | None = None,
        metrics_fn: Any = None,
    ) -> CommitRecord:
        """Idempotent per-partition overwrite + ledger commit (I2 analog).

        Data lands first, the marker second — a crash between the two
        leaves an uncommitted (thus invisible, re-runnable) partition.
        ``metrics_fn`` (if given) is called AFTER the data actions ran —
        the hook for ``Observation`` metrics collected during the write.
        """
        if partition in self.retired_partitions(name):
            raise ValueError(
                f"{name}/{partition} was retired by compaction (folded into "
                "a base table); re-committing it would double-count on "
                "merge-on-read. Replays need a fresh catalog."
            )
        path = self._partition_path(name, partition)
        # write FIRST, then count the written files: counting the input
        # DataFrame up front would execute the (possibly expensive) plan
        # twice, while a count over freshly written parquet is satisfied
        # from file metadata/footers
        df.write.mode("overwrite").parquet(path)
        row_count = df.sparkSession.read.parquet(path).count()
        extra = dict(metrics_fn()) if metrics_fn is not None else {}
        rec = CommitRecord(
            table=name,
            partition=partition,
            source_snapshot=source_snapshot,
            row_count=row_count,
            metrics={**(metrics or {}), **extra},
            committed_at=time.time(),
        )
        os.makedirs(self._ledger_dir(name), exist_ok=True)
        marker = self._marker_path(name, partition)
        if os.path.exists(marker):
            # preserve the superseded commit record: time travel
            # (read_as_of) needs to KNOW an older version existed even
            # though merge-on-write reclaimed its bytes
            with open(marker) as f:
                prev = json.load(f)
            os.makedirs(self._history_dir(name), exist_ok=True)
            hist = os.path.join(
                self._history_dir(name),
                f"{partition}.{prev['committed_at']:.6f}.json",
            )
            with open(hist + ".tmp", "w") as f:
                json.dump(prev, f)
            os.replace(hist + ".tmp", hist)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec.__dict__, f)
        os.replace(tmp, marker)  # atomic commit
        return rec

    # ---- reads -----------------------------------------------------------
    def read_table(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.table_path(name))

    def read_partition(self, spark: SparkSession, name: str, partition: str) -> DataFrame:
        """One partition's data, committed or not (caller checks the ledger
        when commit visibility matters — e.g. deriving downstream deltas
        from exactly the bytes a previous commit wrote)."""
        return spark.read.parquet(self._partition_path(name, partition))

    def read_committed(self, spark: SparkSession, name: str) -> DataFrame:
        """Union of committed partitions only (uncommitted data invisible)."""
        parts = sorted(self.committed_partitions(name))
        paths = [self._partition_path(name, p) for p in parts]
        if not paths:
            raise FileNotFoundError(f"no committed partitions for {name}")
        return spark.read.parquet(*paths)

    # ---- ledger ----------------------------------------------------------
    def committed_partitions(self, name: str) -> set[str]:
        d = self._ledger_dir(name)
        if not os.path.isdir(d):
            return set()
        return {f[:-5] for f in os.listdir(d) if f.endswith(".json")}

    def ledger(self, name: str) -> list[CommitRecord]:
        out = []
        for p in sorted(self.committed_partitions(name)):
            with open(self._marker_path(name, p)) as f:
                out.append(_record_from_json(json.load(f)))
        return out

    def _retired_records(self, name: str) -> list[tuple[CommitRecord, float | None]]:
        """(record, retired_at) per retired partition; retired_at is None
        for markers written before retirement stamping existed (treated
        conservatively by snapshot_partitions)."""
        d = self._retired_dir(name)
        if not os.path.isdir(d):
            return []
        files = [f for f in os.listdir(d) if f.endswith(".json")]
        cache = self._retired_cache.setdefault(name, {})
        for f in files:
            if f not in cache:
                # tolerant parse: this runs on EVERY overwrite_partition
                # (the retired-check), so one malformed or
                # schema-divergent marker — e.g. left by another writer
                # version — must degrade to a warning, not permanently
                # block all ingestion for the table
                try:
                    with open(os.path.join(d, f)) as fh:
                        rec = json.load(fh)
                    retired_at = rec.pop("retired_at", None)
                    cache[f] = (_record_from_json(rec), retired_at)
                except (OSError, ValueError, KeyError, TypeError):
                    log.warning(
                        "skipping unreadable retirement marker %s/%s",
                        d, f, exc_info=True,
                    )
                    cache[f] = None
        # a marker file never mutates or disappears under normal operation,
        # but honor external deletion anyway: serve only files present now
        return [cache[f] for f in sorted(files) if cache[f] is not None]

    def _history_records(self, name: str) -> list[CommitRecord]:
        d = self._history_dir(name)
        if not os.path.isdir(d):
            return []
        out = []
        for f in sorted(os.listdir(d)):
            if f.endswith(".json"):
                with open(os.path.join(d, f)) as fh:
                    out.append(_record_from_json(json.load(fh)))
        return out

    def snapshot_partitions(self, name: str, as_of: float) -> set[str]:
        """Partitions visible at time ``as_of`` — Iceberg-style snapshot
        membership from the commit ledger.

        This catalog is merge-on-WRITE (one live version per partition),
        so a snapshot is reconstructable only while none of its member
        versions were reclaimed since.  Rather than silently returning
        current bytes for an old snapshot (Iceberg would return the OLD
        bytes), raise :class:`SnapshotUnavailableError` when:

        * a partition was OVERWRITTEN after ``as_of`` (its superseded
          commit record sits in the history ledger) — the as-of version's
          bytes are gone;
        * a partition visible at ``as_of`` was RETIRED by compaction —
          its rows live on in a folded base table, but the partition
          itself is unreadable.

        At real scale this layer is Iceberg and both cases disappear
        (old data files survive until snapshot expiry); the ledger
        algebra here is the same, minus file retention.
        """
        current = {
            r.partition: r for r in self.ledger(name)
        }
        visible = {p for p, r in current.items() if r.committed_at <= as_of}
        gone = []
        for h in self._history_records(name):
            cur = current.get(h.partition)
            if h.committed_at <= as_of and (
                cur is None or cur.committed_at > as_of
            ):
                gone.append(f"{h.partition} (overwritten)")
        for r, retired_at in self._retired_records(name):
            # unreconstructable only if the partition was VISIBLE at
            # as_of: committed by then and not yet retired. Snapshots
            # taken after the compaction never contained it and stay
            # readable. Unstamped legacy markers (retired_at None) are
            # treated conservatively: any as_of >= commit raises.
            if r.committed_at <= as_of and (
                retired_at is None or as_of < retired_at
            ):
                gone.append(f"{r.partition} (retired by compaction)")
        if gone:
            raise SnapshotUnavailableError(
                f"snapshot of {name!r} as of {as_of} is not reconstructable: "
                f"{', '.join(sorted(set(gone)))} — this catalog keeps one "
                "live version per partition (Iceberg retains old data "
                "files until snapshot expiry)"
            )
        return visible

    def read_as_of(
        self, spark: SparkSession, name: str, as_of: float
    ) -> DataFrame:
        """Time-travel read: the union of partitions committed at or
        before ``as_of`` (raises if that snapshot's bytes were since
        overwritten or retired — see :meth:`snapshot_partitions`)."""
        parts = sorted(self.snapshot_partitions(name, as_of))
        if not parts:
            raise FileNotFoundError(
                f"no partitions of {name} were committed at {as_of}"
            )
        return spark.read.parquet(
            *[self._partition_path(name, p) for p in parts]
        )

    def uncommitted(self, name: str, all_partitions: list[str]) -> list[str]:
        """Resume set = all − committed − retired (the reference's
        changed-file diff, /root/reference/src/query_api.py:55-70, as a
        set difference; retired partitions were folded into a base table
        by compaction — re-running them would double-count on read)."""
        done = self.committed_partitions(name) | self.retired_partitions(name)
        return [p for p in all_partitions if p not in done]
