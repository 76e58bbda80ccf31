"""Atomic manifest-commit protocol for parquet ledgers and sinks.

Plain ``df.write.mode("append"/"overwrite").parquet(path)`` is not
crash-atomic: the Hadoop committer moves task files into the target
during job commit, so a crash mid-commit leaves a TORN directory — a
subset of new part-files visible next to old ones (append) or a
half-deleted table (overwrite). For the pipeline's ledgers that means
a crashed cycle could double-count or lose attempt history.

This module is the minimal transactional-table fix (the Delta/Iceberg
log idea, reduced to what a single-writer ledger needs):

Layout::

    root/
      data/v0000000001-<uuid>/   one immutable parquet dir per commit
      manifest-0000000001.json   {"version": 1, "dirs": [...]}

Protocol per commit:

1. write the new data dir (readers never look at unlisted dirs, so a
   crash here leaves an invisible orphan — reclaim with ``vacuum``);
2. ``fsync`` every file and directory of the new data dir (a durable
   manifest must never reference non-durable data after power loss),
   then write ``manifest-<v+1>`` to a temp name, ``flush`` + ``fsync``;
3. publish via ``os.link(tmp, final)`` — atomic, and *create-new*
   semantics (unlike ``rename``, which silently replaces): if another
   writer published ``v+1`` first this raises, the orphan data dir
   stays invisible, and the caller can simply re-run (single-writer
   is the supported mode; the link gives conflict *detection*, not
   serialization);
4. ``fsync`` the root directory so the link itself is durable.

Readers resolve ``max(version)`` and read exactly the listed dirs, so
every read observes a complete commit or the previous one — never a
torn mix. ``append`` lists old dirs + the new one; ``overwrite``
lists only the new one (old dirs stay on disk until ``vacuum``, which
also makes overwrite time-travel-friendly for free).

Scale: the manifest holds directory names, not file names — O(commits)
bytes, independent of data size. On HDFS/S3A, swap ``os.link`` for
the store's conditional-put; the protocol is unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentWriteError(RuntimeError):
    """Another writer published this version first; re-run to retry."""


class AtomicParquetTable:
    def __init__(self, root: str):
        self.root = root

    # -- manifest resolution ----------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, f"manifest-{version:010d}.json")

    def _latest_version(self) -> int:
        """0 = no commits yet."""
        if not os.path.isdir(self.root):
            return 0
        best = 0
        for name in os.listdir(self.root):
            if name.startswith("manifest-") and name.endswith(".json"):
                try:
                    best = max(best, int(name[len("manifest-"):-len(".json")]))
                except ValueError:
                    continue
        return best

    def version(self) -> int:
        return self._latest_version()

    def current_dirs(self, version: int | None = None) -> list[str]:
        v = self._latest_version() if version is None else version
        if v == 0:
            return []
        path = self._manifest_path(v)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"no manifest for version {v} at {path} "
                "(vacuumed or never committed)"
            )
        with open(path) as f:
            m = json.load(f)
        return [os.path.join(self.root, d) for d in m["dirs"]]

    def partition_schemas(self, version: int | None = None) -> dict:
        """{rel_dir: {partition_col: ddl_type}} recorded at write time.

        Hive directory names carry VALUES, not types — Spark re-infers
        partition-column types on read, so a numeric-looking STRING
        shard column ('01', '1') silently reads back as int, collapsing
        distinct partition values; a compact() rewrite would then make
        the inference permanent on disk.  Recording the writer's types
        here lets ``read`` disable inference and cast back exactly.
        """
        v = self._latest_version() if version is None else version
        if v == 0:
            return {}
        with open(self._manifest_path(v)) as f:
            return json.load(f).get("partition_schemas", {})

    def meta(self, version: int | None = None) -> dict:
        """Caller-supplied metadata recorded with the commit (e.g. the
        last streaming batch_id) — the hook that makes foreachBatch
        replays idempotent: a replayed batch compares its batch_id
        against the committed one and no-ops if already applied."""
        v = self._latest_version() if version is None else version
        if v == 0:
            return {}
        with open(self._manifest_path(v)) as f:
            return json.load(f).get("meta", {})

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        merge_schema: bool = False,
    ) -> DataFrame | None:
        """Read the table at ``version`` (time travel), or the latest.

        Old versions stay readable until ``vacuum`` — manifests are
        never deleted, and an overwrite only unlists (not removes)
        prior data dirs, so any un-vacuumed version resolves exactly
        as it was committed.

        ``merge_schema``: reconcile footers across the version's data
        dirs (schema EVOLUTION — appends that added columns read as
        one relation, absent columns null-filled).  Off by default:
        merging reads every file footer up front, which a fixed-schema
        table shouldn't pay.
        """
        # resolve the version ONCE: current_dirs and partition_schemas
        # must come from the SAME manifest, or a commit racing this
        # read could pair version-v dirs with version-v+1 schemas and
        # silently revive hive partition-type inference for them
        v = self._latest_version() if version is None else version
        dirs = self.current_dirs(v)
        # an empty commit (e.g. a foreachBatch replay with zero rows)
        # writes only _SUCCESS — reading such a dir in isolation
        # raises UNABLE_TO_INFER_SCHEMA and would brick the table, so
        # data-less dirs are skipped up front
        dirs = [d for d in dirs if self._dir_has_parquet(d)]
        if not dirs:
            return None
        part_schemas = self.partition_schemas(v)

        def read_dir(d: str) -> DataFrame:
            reader = spark.read
            if merge_schema:
                reader = reader.option("mergeSchema", "true")
            ps = part_schemas.get(os.path.relpath(d, self.root))
            if not ps:
                # legacy commit (pre-typed-partition manifests): keep
                # the old inference behavior
                return reader.parquet(d)
            # partition dirs carry values, not types. Hand the reader
            # an EXPLICIT schema — data fields from a footer, partition
            # fields at the writer-recorded types — so hive type
            # inference never runs and '01' vs '1' shard values can
            # never collapse. Per-read, unlike the old session-global
            # partitionColumnTypeInference conf toggle, which raced
            # concurrent reads on the same session (a foreachBatch or
            # another thread reading mid-window silently lost/gained
            # inference — r06 ADVICE).
            return reader.schema(
                self._dir_schema(spark, d, ps, merge_schema)
            ).parquet(d)

        if len(dirs) == 1:
            return read_dir(dirs[0])
        # multi-dir versions read per dir + unionByName: a multi-path
        # scan samples ONE footer for the schema, silently
        # dropping/null-filling evolved columns, and cannot infer
        # hive partitioning across independent version dirs
        # ([CONFLICTING_DIRECTORY_STRUCTURES]).  Per-dir resolution
        # errors LOUDLY on a schema mismatch unless merge_schema
        # opts into reconciliation.  Cost is O(#append dirs)
        # driver-side footer loads — compact() collapses them.
        out = None
        for d in dirs:
            df = read_dir(d)
            out = (
                df
                if out is None
                else out.unionByName(
                    df, allowMissingColumns=merge_schema
                )
            )
        return out

    def _dir_schema(
        self,
        spark: SparkSession,
        d: str,
        part_schema: dict,
        merge: bool,
    ) -> "StructType":
        """Explicit read schema for one version dir: data fields from
        the dir's parquet footers + partition fields at the
        writer-recorded types.

        Footers are loaded via single-FILE reads — a concrete file
        path carries no partition dirs, so Spark runs no partition
        discovery (and hence no type inference) resolving it; no
        session conf is touched, making concurrent reads safe. A
        commit dir is one Spark write, so its footers agree; the
        ``merge`` walk (schema-evolution reads) still reconciles
        per-file fields by name, first-seen order, for belt and
        braces.
        """
        from pyspark.sql.types import StructType

        files: list[str] = []
        for base, _dirs, fs in os.walk(d):
            files.extend(
                os.path.join(base, f)
                for f in fs
                if f.endswith(".parquet")
            )
        files.sort()
        fields = list(spark.read.parquet(files[0]).schema.fields)
        if merge:
            names = {f.name for f in fields}
            for f in files[1:]:
                for fld in spark.read.parquet(f).schema.fields:
                    if fld.name not in names:
                        names.add(fld.name)
                        fields.append(fld)
        part_fields = [
            StructType.fromDDL(f"`{c}` {t}")[0]
            for c, t in part_schema.items()
            if c not in {f.name for f in fields}
        ]
        return StructType(fields + part_fields)

    @staticmethod
    def _dir_has_parquet(d: str) -> bool:
        for _base, _dirs, files in os.walk(d):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    # -- commits -----------------------------------------------------------
    def _write_data(
        self,
        df: DataFrame,
        version: int,
        partition_by: list[str] | None = None,
    ) -> str:
        rel = os.path.join("data", f"v{version:010d}-{uuid.uuid4().hex[:8]}")
        w = df.write
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(os.path.join(self.root, rel))
        return rel

    def _fsync_tree(self, rel_dir: str) -> None:
        """fsync every file and directory under the new data dir so a
        durable manifest can never reference non-durable data after
        power loss (process-crash atomicity needs no fsync — the
        manifest link alone covers it).  Local-filesystem semantics;
        on HDFS/S3A durability is the store's close/conditional-put
        contract and this walk is a no-op concern."""
        top = os.path.join(self.root, rel_dir)
        for dirpath, _dirnames, filenames in os.walk(top, topdown=False):
            for name in filenames:
                fd = os.open(os.path.join(dirpath, name), os.O_RDONLY)
                try:
                    os.fsync(fd)
                finally:
                    os.close(fd)
            dfd = os.open(dirpath, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        # the PARENT (data/) holds the new dir's dirent — without this
        # fsync a durable manifest could reference a dir whose entry
        # was lost on power loss
        pfd = os.open(os.path.dirname(top), os.O_RDONLY)
        try:
            os.fsync(pfd)
        finally:
            os.close(pfd)

    def _publish(
        self,
        version: int,
        rel_dirs: list[str],
        meta: dict | None = None,
        partition_schemas: dict | None = None,
    ) -> None:
        final = self._manifest_path(version)
        tmp = os.path.join(
            self.root, f".manifest-{version:010d}.{uuid.uuid4().hex[:8]}.tmp"
        )
        fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
        try:
            os.write(
                fd,
                json.dumps(
                    {
                        "version": version,
                        "dirs": rel_dirs,
                        "meta": meta or {},
                        "partition_schemas": partition_schemas or {},
                    }
                ).encode(),
            )
            os.fsync(fd)
        finally:
            os.close(fd)
        try:
            os.link(tmp, final)  # atomic create-new publish
        except FileExistsError:
            os.unlink(tmp)
            raise ConcurrentWriteError(
                f"{final} already published by another writer"
            ) from None
        os.unlink(tmp)
        dfd = os.open(self.root, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def _commit(
        self,
        df: DataFrame,
        keep_old: bool,
        partition_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> int:
        os.makedirs(os.path.join(self.root, "data"), exist_ok=True)
        v = self._latest_version()
        prev_rel: list[str] = []
        prev_ps: dict = {}
        if keep_old and v:
            with open(self._manifest_path(v)) as f:
                prev_manifest = json.load(f)
            prev_rel = prev_manifest["dirs"]
            prev_ps = {
                d: s
                for d, s in prev_manifest.get(
                    "partition_schemas", {}
                ).items()
                if d in prev_rel
            }
        new_rel = self._write_data(df, v + 1, partition_by)
        if partition_by:
            # record the WRITER's partition-column types so reads can
            # undo hive type inference (see partition_schemas())
            prev_ps[new_rel] = {
                c: df.schema[c].dataType.simpleString()
                for c in partition_by
            }
        self._fsync_tree(new_rel)
        self._publish(v + 1, prev_rel + [new_rel], meta, prev_ps)
        return v + 1

    def append(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> int:
        return self._commit(
            df, keep_old=True, partition_by=partition_by, meta=meta
        )

    def overwrite(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> int:
        """``partition_by``: hive-partition the version's data dir
        (e.g. by export shard) — readers are unaffected (Spark
        resolves partition dirs transparently), writers get
        file-per-partition layout for downstream per-shard consumers.
        """
        return self._commit(
            df, keep_old=False, partition_by=partition_by, meta=meta
        )

    # -- maintenance --------------------------------------------------------
    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 << 20,
        partition_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> int:
        """Rewrite the CURRENT version into right-sized files and
        publish the rewrite as a new version — the small-file
        maintenance job every append-heavy table needs (each
        streaming micro-batch / incremental append adds a data dir
        with its own files; readers eventually pay per-file open
        cost and tiny-task scheduling).

        Same commit path as any write: the rewrite lands in a fresh
        fsync'd data dir and the manifest flips atomically, so
        readers never see a half-compacted table, a crash mid-compact
        leaves an orphan dir for ``vacuum``, and the pre-compaction
        version stays time-travelable until vacuumed.  Commit
        ``meta`` (e.g. the streaming batch_id stamp) carries over so
        a foreachBatch writer's replay-idempotence survives
        compaction; pass ``meta`` to extend it.

        Scale: one distributed read + write (no driver data path);
        the target file count derives from the CURRENT on-disk bytes,
        so output files land near ``target_file_bytes`` regardless of
        how fragmented the input was.
        """
        dirs = self.current_dirs()
        if not dirs:
            return self.version()
        # a hive-partitioned version must be compacted WITH its
        # partition columns or the layout contract silently flattens
        # (downstream per-shard readers lose their directories)
        if partition_by is None:
            for d in dirs:
                for name in os.listdir(d):
                    if "=" in name and os.path.isdir(
                        os.path.join(d, name)
                    ):
                        raise ValueError(
                            f"current version is hive-partitioned "
                            f"({name!r} under {d!r}); pass partition_by "
                            "to preserve the layout"
                        )
        total = 0
        for d in dirs:
            for base, _, files in os.walk(d):
                total += sum(
                    os.path.getsize(os.path.join(base, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        n_files = max(1, -(-total // target_file_bytes))
        # merge_schema: a rewrite must carry EVERY column any append
        # introduced — a single sampled footer could silently drop
        # later-evolved columns, permanently once vacuumed
        df = self.read(spark, merge_schema=True)
        if df is None:
            # only data-less commits: nothing to rewrite
            return self.version()
        df = df.repartition(n_files)
        carried = {**self.meta(), **(meta or {})}
        return self._commit(
            df, keep_old=False, partition_by=partition_by, meta=carried
        )

    def update_meta(self, meta: dict) -> int:
        """Publish a new manifest version carrying the SAME data dirs
        and partition schemas as the current one, with ``meta`` as
        the complete REPLACEMENT metadata (start from ``self.meta()``
        to edit incrementally — replacement, not merge, so callers
        can remove keys, e.g. the legacy replay-stamp migration in
        pipeline/replay.py). Data files are untouched; only the
        manifest advances."""
        v = self._latest_version()
        if not v:
            # nothing committed yet: publishing would create a ghost
            # data-less version 1 that a later first write() treats
            # as a real predecessor
            raise ValueError(
                f"update_meta on {self.root}: no committed version"
            )
        with open(self._manifest_path(v)) as f:
            prev_manifest = json.load(f)
        self._publish(
            v + 1,
            prev_manifest["dirs"],
            meta,
            prev_manifest.get("partition_schemas", {}),
        )
        return v + 1

    def vacuum(self) -> list[str]:
        """Delete data dirs not referenced by the CURRENT manifest
        (crashed-commit orphans, pre-overwrite versions) and stale
        manifest temp files. Safe whenever no writer is mid-commit."""
        data_root = os.path.join(self.root, "data")
        if not os.path.isdir(data_root):
            return []
        live = {os.path.relpath(d, self.root) for d in self.current_dirs()}
        removed = []
        for name in sorted(os.listdir(data_root)):
            rel = os.path.join("data", name)
            if rel not in live:
                shutil.rmtree(os.path.join(data_root, name))
                removed.append(rel)
        latest = self._latest_version()
        for name in os.listdir(self.root):
            if name.startswith(".manifest-") and name.endswith(".tmp"):
                os.unlink(os.path.join(self.root, name))
            # superseded manifests go with their data: time travel is
            # until-vacuum, and a missing manifest fails cleanly where
            # a manifest with deleted dirs would fail inside Spark
            elif name.startswith("manifest-") and name.endswith(".json"):
                try:
                    v = int(name[len("manifest-"):-len(".json")])
                except ValueError:
                    continue
                if v < latest:
                    os.unlink(os.path.join(self.root, name))
        return removed
