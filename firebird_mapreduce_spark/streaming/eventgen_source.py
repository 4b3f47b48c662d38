"""Custom STREAMING data source (Spark 4 Python DataSource API): a
deterministic event generator with real offset management — the
integration pattern for a bespoke queue/feed Spark has no connector for
(the reference engine's input surface is an in-memory vector,
``firebird.h:174-179``; a production successor must ingest from
somewhere, and this is the template).

What makes it production-shaped rather than a toy:
- **Offsets are the contract**: ``initialOffset``/``latestOffset``
  bound each micro-batch as a half-open row range ``[start, end)``;
  Spark persists them in the checkpoint's offset log, so a restarted
  query RESUMES where the killed one stopped (pinned by test — the
  restart run must produce the NEXT batch of rows, no replays, no
  gaps).  Exactly-once falls out of offsets + a deterministic payload.
- **Partition-aware**: each batch's range splits into
  ``partitionsPerBatch`` sub-ranges read in parallel tasks, like a
  partitioned queue's consumer group.
- **Deterministic payload**: every row is a pure function of its global
  index (``row_at``), so any re-read after a crash reproduces identical
  data — the property a replayable source must have for end-to-end
  exactly-once.

Options: ``rowsPerBatch`` (default 1000), ``partitionsPerBatch``
(default 4), ``headFile`` (required: where the "external system's"
head pointer lives — ``latestOffset`` advances it like a feed growing
between triggers, and a RESTARTED query consults it rather than a
reset in-memory counter, which is exactly why real connectors ask the
broker for the head instead of remembering it).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = "event_id LONG, user_id LONG, event_type STRING, value DOUBLE"
_TYPES = ("click", "view", "purchase")


def row_at(i: int) -> Tuple[int, int, str, float]:
    """The deterministic payload for global row index ``i`` — shared with
    the tests so expectations are computed independently."""
    return (i, i % 50, _TYPES[i % 3], float(i % 100) / 2.0)


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class EventGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return SCHEMA

    def streamReader(self, schema) -> "EventGenStreamReader":
        return EventGenStreamReader(self.options)


class EventGenStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", "1000"))
        self.parts_per_batch = int(options.get("partitionsPerBatch", "4"))
        self.head_file = options.get("headfile") or options.get("headFile")
        if not self.head_file:
            raise ValueError("eventgen requires a headFile option")

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # the external system's head advances by one batch per trigger;
        # it lives OUTSIDE the query (head file) because a restarted
        # query must see where the feed is, not a reset local counter —
        # the same reason real connectors ask the broker, not themselves
        import os

        head = 0
        if os.path.exists(self.head_file):
            with open(self.head_file) as fh:
                head = int(fh.read().strip() or 0)
        head += self.rows_per_batch
        tmp = self.head_file + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(head))
        os.replace(tmp, self.head_file)
        return {"index": head}

    def partitions(self, start: dict, end: dict) -> Sequence[_Range]:
        lo, hi = start["index"], end["index"]
        n = max(1, min(self.parts_per_batch, hi - lo))
        step = (hi - lo) // n
        bounds = [lo + i * step for i in range(n)] + [hi]
        return [_Range(bounds[i], bounds[i + 1]) for i in range(n)]

    def read(self, partition: _Range) -> Iterator[Tuple]:
        for i in range(partition.start, partition.end):
            yield row_at(i)

    def commit(self, end: dict) -> None:
        # external systems would ack/trim up to `end` here; the generator
        # keeps nothing, so this is a no-op
        pass


def register(spark) -> None:
    spark.dataSource.register(EventGenDataSource)


_QUERY_COUNTER = 0


def stream_custom_source_query(spark, sf_dir: str):
    """Declared query: one availableNow batch from the registered custom
    source, replayed to a memory sink — 1000 generated events whose
    payload is a pure function of the row index, so a DuckDB ``range``
    expression regenerates them exactly (the custom-source path gets a
    hash oracle, not just a smoke check).  ``sf_dir`` is unused: the
    source IS the data."""
    import os
    import tempfile

    global _QUERY_COUNTER
    _QUERY_COUNTER += 1
    register(spark)
    # a FRESH head per call: the query must be deterministic (always the
    # feed's first batch), so the "external system" starts empty
    fd, head = tempfile.mkstemp(prefix="eventgen_head_")
    os.close(fd)
    os.remove(head)
    name = f"q_eventgen_{_QUERY_COUNTER}"
    stream = (
        spark.readStream.format("eventgen")
        .option("rowsPerBatch", "1000")
        .option("partitionsPerBatch", "4")
        .option("headFile", head)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
