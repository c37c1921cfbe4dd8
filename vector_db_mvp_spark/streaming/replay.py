"""Run-scoped replay keys for foreachBatch idempotency markers.

foreachBatch delivers each epoch at-least-once, so handlers that mutate
external state (rollup_stream, neardup_stream, index_stream) guard every
batch with an applied marker. Keying the marker by the epoch id ALONE is
wrong: epoch ids restart at 0 whenever a stream starts from a fresh
checkpoint, so a legitimate new run over NEW source data would collide with
markers left by an earlier run and silently skip its first batches — data
loss dressed up as idempotency.

The correct key is (stream run identity, epoch id). Spark writes the
streaming query id to ``<checkpoint>/metadata`` (a one-line JSON
``{"id": "<uuid>"}``) when a checkpoint is first created, and PRESERVES it
across restarts of the same checkpoint — exactly the identity under which
epoch ids are stable and a re-delivered epoch really is a replay. A fresh
checkpoint gets a new uuid, so its epoch 0 never collides with an old
run's.
"""

from __future__ import annotations

import json
import os


def stream_run_id(checkpoint_dir: str | None) -> str:
    """Stable identity of the checkpointed stream feeding a foreachBatch
    handler: the query id from ``<checkpoint>/metadata``. Falls back to
    ``"run"`` when no checkpoint metadata is readable (e.g. the handler is
    invoked directly in tests) — within one process that still scopes
    markers consistently."""
    if not checkpoint_dir:
        return "run"
    try:
        with open(os.path.join(checkpoint_dir, "metadata"), encoding="utf-8") as f:
            qid = json.load(f).get("id")
        return str(qid) if qid else "run"
    except (OSError, ValueError):
        return "run"


def batch_key(checkpoint_dir: str | None, batch_id: int | str) -> str:
    """Marker key for one delivered epoch: ``<run id>_<epoch id>``."""
    return f"{stream_run_id(checkpoint_dir)}_{batch_id}"
