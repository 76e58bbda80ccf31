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
the bare-watermark behavior.
"""

from __future__ import annotations

import json
import os


def checkpoint_identity(checkpoint_dir: str) -> str | None:
    """The streaming query id persisted in ``<checkpoint>/metadata``.

    Written when the query starts, BEFORE any batch runs, so reading
    it lazily from inside the ``foreachBatch`` function always
    succeeds for a live query. Returns None when unreadable (e.g.
    the sink is driven outside a streaming query, as in batch
    backfills) — callers then fall back to the bare watermark.
    """
    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            ident = json.load(f).get("id")
        return str(ident) if ident is not None else None
    except (OSError, ValueError):
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


def stamp(meta: dict, batch_id: int | None, run_id: str | None) -> dict:
    """Copy ``meta`` with the watermark (and identity, when known)
    advanced to this batch."""
    out = dict(meta)
    if batch_id is not None:
        out["last_batch_id"] = batch_id
        if run_id is not None:
            out["last_run_id"] = run_id
    return out
