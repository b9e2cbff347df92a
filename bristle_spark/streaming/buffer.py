"""Bounded FIFO row buffer with overflow policies — the reference's
MemoryRowBuffer (reference memory_row_buffer.go:47-107) with *intended*
semantics:

- TOO_BIG: a single batch larger than capacity is rejected outright
  (memory_row_buffer.go:52-61);
- drop-oldest: evict the front of the buffer to make room
  (memory_row_buffer.go:75-77);
- drop-newest: keep the head of the incoming batch that fits, drop its
  tail — i.e. the *newest* messages. (The reference actually truncates
  the batch's front, dropping its oldest rows — SURVEY.md §8.6; we do
  not replicate the bug.)
- block: reject the batch with FULL (memory_row_buffer.go:81-84);
- flush drains a FIFO prefix of up to max_batch_size rows
  (memory_row_buffer.go:91-107).

In the Spark engine this exists for D8 *accounting parity* inside
``foreachBatch``: Structured Streaming itself is lossless+checkpointed,
so the buffer wraps the sink write to surface the drop/reject metrics a
bristle operator would see, without giving up exactly-once on the kept
rows (SURVEY.md §7 P5).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class BatchResult(str, Enum):
    OK = "OK"
    TOO_BIG = "TOO_BIG"
    FULL = "FULL"


POLICIES = ("drop-oldest", "drop-newest", "block")


@dataclass
class BufferStats:
    written: int = 0
    dropped_oldest: int = 0
    dropped_newest: int = 0
    rejected_full: int = 0
    rejected_too_big: int = 0
    flushed: int = 0


@dataclass
class BoundedBuffer:
    max_size: int
    on_full: str = "block"
    rows: list = field(default_factory=list)
    stats: BufferStats = field(default_factory=BufferStats)

    def __post_init__(self) -> None:
        if self.on_full not in POLICIES:
            raise ValueError(f"unknown overflow policy {self.on_full!r}")

    def write_batch(self, batch: list) -> BatchResult:
        if len(batch) > self.max_size:
            self.stats.rejected_too_big += len(batch)
            return BatchResult.TOO_BIG
        overflow = len(self.rows) + len(batch) - self.max_size
        if overflow > 0:
            if self.on_full == "block":
                self.stats.rejected_full += len(batch)
                return BatchResult.FULL
            if self.on_full == "drop-oldest":
                del self.rows[:overflow]
                self.stats.dropped_oldest += overflow
            else:  # drop-newest: keep the prefix of the incoming batch
                keep = len(batch) - overflow
                self.stats.dropped_newest += overflow
                batch = batch[:keep]
        self.rows.extend(batch)
        self.stats.written += len(batch)
        return BatchResult.OK

    def flush_batch(self, max_batch_size: int) -> list:
        out = self.rows[:max_batch_size]
        del self.rows[:max_batch_size]
        self.stats.flushed += len(out)
        return out

    def __len__(self) -> int:
        return len(self.rows)
