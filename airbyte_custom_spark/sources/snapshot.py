"""Resumable chunked initial snapshot (SURVEY.md §2.1 S3/S4 + §2.6 C1).

The reference checkpoints each chunk boundary during an initial load so a
crashed snapshot resumes at the last finished chunk instead of restarting
from zero (`source-postgres/.../ctid/CtidStateIterator.java:1-107`,
`source-mysql/.../MySqlInitialLoadRecordIterator.java:119-167`).

Spark mapping: the chunk plan is a list of pk-range predicates
(`sources/jdbc.py::chunk_predicates`); each chunk is read and MERGEd into
the LakeTable as one batch whose batch_id IS the chunk index.  Two layers
make the resume exactly-once:

  * a chunk-state manifest (``<state_dir>/chunks.json``) records the chunk
    plan and which chunk indices completed — a restarted job reads it and
    never re-reads a completed chunk (no wasted source I/O, the point of
    the reference's per-chunk state);
  * the LakeTable batch manifest (keyed by this snapshot's query_id) makes
    the WRITE side idempotent — a crash after a chunk's commit but before
    the state-file update replays that chunk's merge as a no-op skip.

Chunks are applied in order, one commit per chunk, so the table is always
a consistent prefix of the chunk plan (the reference streams state after
each chunk the same way).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

from airbyte_custom_spark.lake.table import LakeTable

_STATE_FILE = "chunks.json"


class ChunkPlanMismatchError(RuntimeError):
    """Saved chunk state belongs to a DIFFERENT chunk plan (bounds or
    chunk size changed between runs) — resuming would skip or double-read
    rows; the caller must finish with the original plan or reset state."""


class ChunkedSnapshotJob:
    """Drive a chunk-predicate snapshot into a LakeTable, resumably.

    ``read_chunk`` maps one predicate string to its DataFrame of snapshot
    rows (payload columns only) — a JDBC single-predicate read in
    production (`sources/jdbc.py::chunked_read` with one predicate), any
    filterable DataFrame in tests.  Rows are loaded as synthetic inserts
    at ``base_lsn`` so the subsequent CDC tail (lsn > base) wins overlaps,
    same as `streaming/pipeline.py::backfill` (S8)."""

    def __init__(
        self,
        table: LakeTable,
        read_chunk: Callable[[str], DataFrame],
        predicates: list[str],
        state_dir: str,
        base_lsn: int = 0,
        query_id: str = "initial-snapshot",
    ):
        self.table = table
        self.read_chunk = read_chunk
        self.predicates = list(predicates)
        self.state_dir = state_dir
        self.base_lsn = base_lsn
        self.query_id = query_id
        # test hook: raise after N chunks to simulate a crash
        self.fail_after_chunks: int | None = None

    # ------------------------------------------------------------- state

    def _state_path(self) -> str:
        return os.path.join(self.state_dir, _STATE_FILE)

    def _load_state(self) -> dict:
        try:
            with open(self._state_path()) as f:
                state = json.load(f)
        except OSError:
            return {"predicates": self.predicates, "completed": []}
        if state["predicates"] != self.predicates:
            raise ChunkPlanMismatchError(
                f"saved chunk state at {self._state_path()!r} was written for "
                "a different chunk plan — finish the snapshot with the "
                "original (pk bounds, chunk size), or remove the state dir "
                "and the target table to restart from scratch"
            )
        return state

    def _save_state(self, state: dict) -> None:
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_path())

    def completed_chunks(self) -> list[int]:
        return sorted(self._load_state()["completed"])

    # --------------------------------------------------------------- run

    def run(self) -> dict:
        """Apply every incomplete chunk in order; returns summary stats.
        Safe to call again after any crash — completed chunks are never
        re-read, and a chunk whose merge committed but whose state write
        was lost replays as a manifest skip."""
        state = self._load_state()
        done = set(state["completed"])
        applied = 0
        for idx, pred in enumerate(self.predicates):
            if idx in done:
                continue
            if (
                self.fail_after_chunks is not None
                and applied >= self.fail_after_chunks
            ):
                raise RuntimeError(f"injected failure before chunk {idx}")
            rows = self.read_chunk(pred)
            events = rows.withColumn(
                "lsn", F.lit(self.base_lsn).cast("long")
            ).withColumn("op", F.lit("c"))
            self.table.merge(events, batch_id=idx, query_id=self.query_id)
            done.add(idx)
            state["completed"] = sorted(done)
            self._save_state(state)
            applied += 1
        return {
            "chunks_total": len(self.predicates),
            "chunks_applied_this_run": applied,
            "chunks_completed": len(done),
        }
