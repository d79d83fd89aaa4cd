"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
deterministic synthetic-events generator with real partition planning and
filter pushdown.

Why it exists: the reference ingests only live pandas frames; a Spark-first
engine's equivalent extension point is the data source plugin. This one
demonstrates the full surface — `partitions()` splits the keyspace so the
generate runs parallel on executors, `pushFilters()` consumes `EqualTo`
/`In` filters on `event_type` so filtered scans generate less data instead
of discarding rows after the fact (the Python-source analogue of parquet
predicate pushdown).

Determinism: every row is a pure function of its global row index (splitmix
mixing), so any partitioning yields the same multiset — asserted in
tests/test_synthetic_source.py.

Usage:
    register_synthetic_source(spark)
    df = (spark.read.format("synthetic_events")
          .option("n_rows", 100000).option("n_partitions", 8).load())
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
_SCHEMA_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)
_EPOCH = datetime(1997, 1, 1, tzinfo=timezone.utc)


def _mix(i: int) -> int:
    """splitmix64 — deterministic row randomness with no RNG state."""
    z = (i + 0x9E3779B97F4A7C15) & (2**64 - 1)
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (2**64 - 1)
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (2**64 - 1)
    return z ^ (z >> 31)


def row_at(i: int) -> tuple:
    """The pure row function: global index -> event row."""
    h = _mix(i)
    ts = _EPOCH + timedelta(seconds=30 * i)
    return (
        i,
        ts.replace(tzinfo=None),
        h % 1000,
        EVENT_TYPES[(h >> 10) % len(EVENT_TYPES)],
        round(((h >> 13) % 10_000) / 100.0, 2),
    )


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class _SyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.keep_types: set[str] | None = None  # None = no pushed filter

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume event_type equality/IN filters; return the rest to Spark.

        Spark still re-applies what we keep (safe), but consumed filters cut
        generation work at the source — the pushdown contract.

        SHARP EDGE (Spark 4.1, measured in tests/test_synthetic_source.py):
        Spark caches this reader — including pushed-filter state — on the
        DataFrameReader relation, so reusing ONE load() handle for a
        filtered query and then an unfiltered one replays the stale pushed
        filters into the second query. Always go through `read_synthetic`
        (fresh relation per call); the reset below covers re-planning of the
        same handle with different filters, but no callback runs for a
        filterless re-plan, so the reset alone cannot close the hole.
        """
        self.keep_types = None
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("event_type",):
                matched: set[str] = {f.value}
            elif isinstance(f, In) and f.attribute == ("event_type",):
                matched = set(f.value)
            else:
                yield f  # unsupported — Spark evaluates it post-scan
                continue
            # conjunctive filters INTERSECT: consuming `IN ('a','b')` and
            # `= 'b'` must keep only 'b' (Catalyst doesn't fold same-column
            # equalities, and consumed filters are never re-applied)
            self.keep_types = (
                matched if self.keep_types is None else self.keep_types & matched
            )

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, self.n_rows // self.n_partitions)
        bounds = list(range(0, self.n_rows, step)) + [self.n_rows]
        return [_Range(a, b) for a, b in zip(bounds, bounds[1:])]

    def read(self, partition: _Range) -> Iterator[tuple]:
        keep = self.keep_types
        for i in range(partition.start, partition.end):
            row = row_at(i)
            if keep is None or row[3] in keep:
                yield row


class _SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked STREAMING read of the same row function: each
    micro-batch emits the next `batch_rows` indices, capped at `n_rows` so
    `trigger(availableNow=True)` drains the source to a finite end — the
    batch-equivalence testing mode. Offsets are plain dicts checkpointed by
    the engine; `commit` has nothing to clean up because the generator is
    stateless."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.batch_rows = int(options.get("batch_rows", 1_000))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + self.batch_rows, self.n_rows)
        return (iter([row_at(i) for i in range(lo, hi)]), {"i": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([row_at(i) for i in range(start["i"], end["i"])])

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType | str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> _SyntheticReader:
        return _SyntheticReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> _SyntheticStreamReader:
        return _SyntheticStreamReader(self.options)


def register_synthetic_source(spark: SparkSession) -> None:
    """Idempotent registration of the synthetic_events format."""
    spark.dataSource.register(SyntheticEventsDataSource)


def read_synthetic(
    spark: SparkSession, n_rows: int = 10_000, n_partitions: int = 8
):
    """THE way to read this source: registers the format and returns a FRESH
    relation, sidestepping the pushed-filter caching sharp edge documented
    on `pushFilters` (one relation per query → no stale state)."""
    register_synthetic_source(spark)
    return (
        spark.read.format("synthetic_events")
        .option("n_rows", n_rows)
        .option("n_partitions", n_partitions)
        .load()
    )
