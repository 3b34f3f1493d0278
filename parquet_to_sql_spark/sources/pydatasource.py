"""Custom Python Data Source (Spark 4 DataSource API).

The reference's extension point is a duck-typed row reader
(Contracts/ParquetRowReader.php:5-20 — anything with rows()/columns()
can feed the importer). Spark's native generalization is the
DataSource V2 Python API: a source declares a schema and a set of
partitions, and executors pull each partition independently — so a
custom source is partition-parallel from day one instead of a
single-threaded iterator.

`SyntheticEventsDataSource` is a deterministic seeded event generator
(the shape used to smoke-test streaming/event pipelines at arbitrary
scale without any input files): N partitions × rows_per_partition,
reproducible from (seed, partition_index) alone, so a 100 TB synth
load is just more partitions.

Usage:
    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("partitions", 8).option("rows_per_partition", 1000)
          .option("seed", 42).load())
"""

from __future__ import annotations


def _naive_utc(ts: float):
    """utcfromtimestamp replacement (deprecated in 3.12): same naive-
    UTC value via an aware conversion."""
    import datetime

    return datetime.datetime.fromtimestamp(ts, datetime.timezone.utc).replace(
        tzinfo=None
    )

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)
_EPOCH_2024 = 1_704_067_200  # 2024-01-01 00:00:00 UTC in seconds


class _LCG:
    """Tiny deterministic PRNG (numerical-recipes LCG) — no global
    random state, reproducible per (seed, partition)."""

    def __init__(self, seed: int):
        self.state = (seed * 6364136223846793005 + 1442695040888963407) % 2**64

    def next(self) -> int:
        self.state = (self.state * 6364136223846793005 + 1442695040888963407) % 2**64
        return self.state >> 33


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_partitions = int(options.get("partitions", 4))
        self.rows_per_partition = int(options.get("rows_per_partition", 1000))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("users", 50))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition):
        import datetime

        pid = partition.value
        rng = _LCG(self.seed * 1_000_003 + pid)
        base_id = pid * self.rows_per_partition
        ts_cursor = _EPOCH_2024 + pid * 86_400  # one day per partition
        for i in range(self.rows_per_partition):
            ts_cursor += rng.next() % 120  # 0-2 min gaps
            yield (
                base_id + i,
                _naive_utc(ts_cursor),
                rng.next() % self.n_users,
                EVENT_TYPES[rng.next() % len(EVENT_TYPES)],
                (rng.next() % 20_000) / 100.0,
            )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant: each micro-batch emits `batch_rows` events;
    the offset is just the global row counter, so replay from any
    checkpointed offset regenerates identical rows (exactly-once
    semantics come free from determinism)."""

    def __init__(self, options: dict):
        self.batch_rows = int(options.get("batch_rows", 100))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("users", 50))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        start_row = start["row"]
        end = {"row": start_row + self.batch_rows}
        return self._rows(start_row, end["row"]), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery
        return self._rows(start["row"], end["row"])

    def _rows(self, start_row: int, end_row: int) -> list:
        # a LIST, not a generator: the returned batch crosses the
        # driver/worker boundary by pickling
        import datetime

        out = []
        for rid in range(start_row, end_row):
            rng = _LCG(self.seed * 1_000_003 + rid)
            ts = _EPOCH_2024 + rid * (rng.next() % 120)
            out.append(
                (
                    rid,
                    _naive_utc(ts),
                    rng.next() % self.n_users,
                    EVENT_TYPES[rng.next() % len(EVENT_TYPES)],
                    (rng.next() % 20_000) / 100.0,
                )
            )
        return out
