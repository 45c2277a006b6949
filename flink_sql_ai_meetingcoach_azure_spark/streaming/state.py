"""Offset / state reset utilities (SURVEY.md §2.10 T6).

The reference ships an admin script that moves a Kafka consumer group's
offsets to OFFSET_END so the consumer skips the backlog
(app/scripts/kafka/reset_consumer_group.py:22-44). Spark Structured
Streaming keeps the equivalent position — source offsets plus operator
state — in the query's CHECKPOINT, so the reset primitive here is
checkpoint surgery:

- :func:`reset_stream_state` deletes a query's checkpoint, so the next
  start re-reads from ``startingOffsets`` ("earliest" reprocesses the
  backlog; "latest" skips it — the reference script's semantics).
- a restart WITHOUT reset resumes exactly where the stream left off —
  that resume path is what the checkpoint exists for, and is covered by
  the restart-resume test.
"""

from __future__ import annotations

import os
import shutil


def is_checkpoint_dir(path: str) -> bool:
    """True iff ``path`` looks like a Structured Streaming checkpoint
    (guards the destructive reset against a mistyped path)."""
    if not os.path.isdir(path):
        return False
    entries = set(os.listdir(path))
    return bool({"offsets", "commits", "metadata"} & entries)


def reset_stream_state(checkpoint_location: str, *, force: bool = False) -> bool:
    """Delete a streaming query's checkpoint so the next start replays from
    ``startingOffsets`` instead of resuming.

    Refuses to delete a directory that doesn't look like a checkpoint
    unless ``force`` (an empty/never-started location returns False —
    nothing to reset). Returns True iff state was removed. Stop the query
    before calling; Spark holds no lock on the directory but a running
    query will recreate and corrupt interleaved state.
    """
    if not os.path.exists(checkpoint_location):
        return False
    if not force and not is_checkpoint_dir(checkpoint_location):
        raise ValueError(
            f"{checkpoint_location!r} does not look like a streaming checkpoint "
            "(no offsets/commits/metadata); pass force=True to delete anyway"
        )
    shutil.rmtree(checkpoint_location)
    return True
