"""Custom connector via the Python Data Source API (Spark 4).

The reference's only custom "connector" behavior is registry-routed CSV
ingest (`jobs/01_ingest_bronze.py:43-63`); this shows the engine-native
way to add a NEW source format: a `DataSource` subclass whose reader
declares its own partitioning, so Spark schedules one task per input
split exactly like a file scan — the pattern for wrapping any external
system (an API, a queue, a proprietary store) as a first-class table.

The implementation here is a deterministic synthetic documents
generator (seeded per partition, no RNG state shared across tasks):
useful for tests and load generation, and honest about the scale
contract — partitions() defines parallelism, read() streams rows
without materializing the partition.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("rows", N)`` after
    ``spark.dataSource.register(SyntheticDocsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, part int"

    def reader(self, schema) -> DataSourceReader:  # noqa: ARG002 (API signature)
        return _SyntheticDocsReader(self.options)


_WORDS = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 100))
        self.parts = int(options.get("partitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        i = partition.value
        for d in range(i, self.rows, self.parts):
            text = " ".join(_WORDS[(d + j) % len(_WORDS)] for j in range(5 + d % 7))
            yield (d, text, i)


# --------------------------------------------------------------------------
# Streaming side of the same connector: a SimpleDataSourceStreamReader
# that emits the document sequence in offset-tracked micro-batches.
# Offsets are {"index": n} dicts checkpointed by Spark — restarts resume
# from the committed offset, and readBetweenOffsets() regenerates any
# replayed range deterministically (same contract a Kafka-style source
# honors; determinism here plays the role of the broker's log).
# The simple reader runs on the driver, which is the documented fit for
# low-rate control-plane streams; high-throughput sources implement the
# partition-planning DataSourceStreamReader instead.
# --------------------------------------------------------------------------


def _doc_row(d: int) -> tuple:
    text = " ".join(_WORDS[(d + j) % len(_WORDS)] for j in range(5 + d % 7))
    return (d, text, d % 4)


class _SyntheticDocsStreamReader:
    def __init__(self, options: dict) -> None:
        self.max_rows = int(options.get("maxrows", 200))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        # Contract: return ALL data available past `start` plus the next
        # start offset — availableNow snapshots exactly one read() call,
        # so chunking here would silently truncate the drain. `maxrows`
        # is the source's current high-water mark (a later run with a
        # higher mark resumes from the checkpointed offset).
        i = int(start["index"])
        end = max(i, self.max_rows)
        return (iter([_doc_row(d) for d in range(i, end)]), {"index": end})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_doc_row(d) for d in range(int(start["index"]), int(end["index"]))])

    def commit(self, end: dict) -> None:
        pass  # nothing external to ack; determinism is the replay log


class SyntheticDocsStreamDataSource(DataSource):
    """``spark.readStream.format("synthetic_docs_stream")`` with option
    ``maxrows``, the source's current high-water mark: an availableNow
    run drains up to it and terminates; a later run with a higher mark
    resumes from the checkpointed offset."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs_stream"

    def schema(self) -> str:
        return "doc_id bigint, text string, part int"

    def simpleStreamReader(self, schema):  # noqa: ARG002 (API signature)
        return _SyntheticDocsStreamReader(self.options)
