"""Checkpoint-scoped replay guards for ``foreachBatch`` sinks.

Structured Streaming's ``foreachBatch`` is at-least-once: the
checkpoint commits only after the batch function returns, so a crash
mid-function re-delivers the batch on restart. The sinks here
(pipeline/dedup_index.py, streaming/corpus_ingest.py,
streaming/watch.py) make that exactly-once by stamping a
``last_batch_id`` HIGH-WATERMARK into the table's manifest metadata
and no-opping any ``batch_id <= last_batch_id``.

The watermark alone has a failure mode (r06 ADVICE): batch ids are
monotonic only *per checkpoint lifetime*. If the checkpoint is
deleted and recreated while the table is kept, ids restart at 0 and
the bare watermark silently DROPS every new batch until ids exceed
the stale stamp. So the stamp also records the streaming query's
identity — the ``id`` persisted in the checkpoint's ``metadata``
file, which is stable across restarts from the same checkpoint but
regenerated for a fresh one — and the watermark only applies when
the identities match. A mismatch means "different checkpoint
lifetime": the batch is processed and the stamp rolls over to the
new identity.

Legacy compatibility: tables stamped before identities existed (no
``last_run_id`` in meta), and callers that pass no identity, keep
the bare-watermark behavior. A legacy table CANNOT self-migrate
after a checkpoint recreation — the bare watermark drops every
restarted batch, so ``stamp()`` never runs to roll the identity
over (r07 ADVICE). Either run :func:`adopt_identity` once against
the NEW checkpoint before restarting the stream, or never recreate
a legacy table's checkpoint without it.
"""

from __future__ import annotations

import json
import os


def _read_checkpoint_metadata(checkpoint_dir: str) -> str | None:
    """Contents of ``<checkpoint>/metadata`` via the Hadoop
    FileSystem API, so the guard works when the checkpoint lives on a
    DFS (``hdfs://``, ``s3a://``, ``file:`` URIs) as it would on a
    real cluster — ``foreachBatch`` runs on the driver, where the
    active session's JVM is available. Falls back to a local
    ``open()`` only when no JVM is up (unit-test or backfill
    contexts driving the sink without Spark streaming)."""
    rel = checkpoint_dir.rstrip("/") + "/metadata"
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    except Exception:
        spark = None
    if spark is not None:
        try:
            jvm = spark._jvm
            hconf = spark._jsc.hadoopConfiguration()
            jpath = jvm.org.apache.hadoop.fs.Path(rel)
            fs = jpath.getFileSystem(hconf)
            if not fs.exists(jpath):
                return None
            stream = fs.open(jpath)
            try:
                return jvm.org.apache.commons.io.IOUtils.toString(
                    stream, "UTF-8"
                )
            finally:
                stream.close()
        except Exception:
            # fall through: path may be local-only in this context
            pass
    local = checkpoint_dir
    if local.startswith("file:"):
        # no-JVM contexts can still resolve file: URIs locally
        from urllib.parse import urlparse
        from urllib.request import url2pathname

        local = url2pathname(urlparse(local).path)
    try:
        with open(os.path.join(local, "metadata")) as f:
            return f.read()
    except OSError:
        return None


def checkpoint_identity(checkpoint_dir: str) -> str | None:
    """The streaming query id persisted in ``<checkpoint>/metadata``.

    Written when the query starts, BEFORE any batch runs, so reading
    it lazily from inside the ``foreachBatch`` function always
    succeeds for a live query. Returns None when unreadable (e.g.
    the sink is driven outside a streaming query, as in batch
    backfills) — callers then fall back to the bare watermark.
    """
    raw = _read_checkpoint_metadata(checkpoint_dir)
    if raw is None:
        return None
    try:
        ident = json.loads(raw).get("id")
        return str(ident) if ident is not None else None
    except ValueError:
        return None


def is_replay(meta: dict, batch_id: int | None, run_id: str | None) -> bool:
    """True iff ``batch_id`` is a re-delivery of a batch already
    committed under the SAME checkpoint lifetime."""
    last = meta.get("last_batch_id")
    if batch_id is None or last is None or batch_id > last:
        return False
    stored = meta.get("last_run_id")
    if run_id is None or stored is None:
        # legacy stamp or identity-less caller: watermark decides
        return True
    return stored == run_id


def adopt_identity(table, checkpoint_dir: str) -> str | None:
    """One-time migration for a LEGACY-stamped table (meta carries
    ``last_batch_id`` but no ``last_run_id``) whose checkpoint is
    being recreated: inject the new checkpoint's identity with the
    watermark RESET, so the restarted stream's batch 0.. are
    processed instead of silently dropped by the stale stamp.

    Run AFTER the new checkpoint exists (start the query once, or
    pre-create its ``metadata`` file) and BEFORE any batch commits.
    No-op when the table already carries an identity-scoped stamp or
    has no stamp at all. Returns the adopted identity, or None when
    nothing was migrated."""
    meta = table.meta()
    if meta.get("last_batch_id") is None or "last_run_id" in meta:
        return None
    ident = checkpoint_identity(checkpoint_dir)
    if ident is None:
        return None
    out = dict(meta)
    # reset: batches under the NEW identity start at 0 again
    del out["last_batch_id"]
    out["last_run_id"] = ident
    table.update_meta(out)
    return ident


def stamp(meta: dict, batch_id: int | None, run_id: str | None) -> dict:
    """Copy ``meta`` with the watermark (and identity, when known)
    advanced to this batch."""
    out = dict(meta)
    if batch_id is not None:
        out["last_batch_id"] = batch_id
        if run_id is not None:
            out["last_run_id"] = run_id
    return out
