"""Incremental driver-side consumption — the reference's "streaming" API.

Reference (SURVEY §2.9): step/chunk callbacks with an abort handle
(parser.ts:16-56, 1124-1249) and Readable-stream row iteration
(stream.ts:32-150). Spark's analog is ``toLocalIterator`` — partitions
stream to the driver one at a time, so memory stays bounded by one
partition regardless of dataset size. pause/resume are inherent to pull
iteration; ``abort()`` stops consumption (remaining partitions are never
fetched).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame


@dataclass
class StepHandle:
    """The callback control handle (parser.ts:16-33): ``abort()`` stops
    the iteration after the current row/chunk."""

    aborted: bool = field(default=False)
    rows_emitted: int = 0

    def abort(self) -> None:
        self.aborted = True


def iterate_rows(df: DataFrame) -> Iterator[dict[str, Any]]:
    """Pull-based row stream (stream.ts CSVReadStream): rows arrive one
    partition at a time; no full collect."""
    for row in df.toLocalIterator():
        yield row.asDict()


def consume(
    df: DataFrame,
    step: Callable[[dict, StepHandle], None] | None = None,
    chunk: Callable[[list[dict], StepHandle], None] | None = None,
    chunk_size: int = 1000,
) -> StepHandle:
    """Push-style consumption: fire ``step`` per row and/or ``chunk`` per
    ``chunk_size`` rows (parser.ts:1124-1249; default chunk size 1000 per
    parser.ts:101-104). Returns the handle with the emitted-row count."""
    handle = StepHandle()
    buf: list[dict] = []
    for row in df.toLocalIterator():
        if handle.aborted:
            break
        d = row.asDict()
        handle.rows_emitted += 1
        if step is not None:
            step(d, handle)
        if chunk is not None:
            buf.append(d)
            if len(buf) >= chunk_size:
                chunk(buf, handle)
                buf = []
        if handle.aborted:
            break
    if chunk is not None and buf and not handle.aborted:
        chunk(buf, handle)
    return handle
