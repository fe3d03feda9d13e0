"""Spark 4 Python DataSource for the pozo scrape sources:

    spark.dataSource.register(PozosDataSource)
    df = (spark.read.format("pozos")
          .option("sources", "openloto,polla")
          .option("url.openloto", "file:///captured/page.html")
          .load())

One input partition per source — Spark schedules each fetch as its
own task, so sources download in parallel on executors (the reference
loops them sequentially on one process, pipeline.py:102,371). The
payload schema is the engine's SOURCE_PAYLOAD contract; failures obey
degraded-mode semantics (a failing source yields an error row, never
a task failure) so confidence scoring downstream sees exactly which
sources died — at 1000 sources a task-retry storm would be the
alternative.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: SOURCE_PAYLOAD minus run_id/priority (read-time concerns) plus a
#: degraded-mode ``error`` column.
READER_SCHEMA = T.StructType(
    [
        T.StructField("source_name", T.StringType(), False),
        T.StructField("fuente", T.StringType(), False),
        T.StructField("fetched_at", T.TimestampType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("estimado", T.BooleanType(), True),
        T.StructField("user_agent", T.StringType(), True),
        T.StructField("sorteo", T.LongType(), True),
        T.StructField("fecha", T.DateType(), True),
        T.StructField("montos", T.MapType(T.StringType(), T.LongType()), True),
        T.StructField("error", T.StringType(), True),
    ]
)


class _SourcePartition(InputPartition):
    def __init__(self, name: str, url: str | None) -> None:
        self.name = name
        self.url = url


def _payload_row(
    name: str, url: str | None, timeout: int, retries: int, strict: bool
) -> tuple | None:
    """Fetch one source and shape it as a READER_SCHEMA tuple; in
    degraded mode failures become error ROWS, never exceptions."""
    from .pozos import SOURCE_LOADERS

    loader = SOURCE_LOADERS[name]
    try:
        if url:
            p = loader(url, timeout=timeout, retries=retries)
        else:
            p = loader(timeout=timeout, retries=retries)
    except Exception as exc:  # noqa: BLE001 — degraded mode: error as data
        if strict:
            raise
        return (name, url or "", None, None, None, None, None, None,
                None, f"{type(exc).__name__}: {exc}")
    fetched = p.get("fetched_at")
    if isinstance(fetched, str):
        fetched = dt.datetime.fromisoformat(fetched).replace(tzinfo=None)
    fecha = p.get("fecha")
    if isinstance(fecha, str):
        fecha = dt.date.fromisoformat(fecha)
    return (
        name,
        p["fuente"],
        fetched,
        p.get("sha256"),
        bool(p.get("estimado", True)),
        p.get("user_agent"),
        p.get("sorteo"),
        fecha,
        {str(k): int(v) for k, v in (p.get("montos") or {}).items()},
        None,
    )


def _requested_sources(options: dict) -> list[tuple[str, str | None]]:
    from .pozos import normalize_sources

    requested = normalize_sources(
        [s for s in options.get("sources", "all").split(",") if s.strip()]
    )
    out = []
    for name in requested:
        url = options.get(f"url.{name}")
        if url == "skip":
            continue
        out.append((name, url))
    return out


class PozosReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.options = options

    def partitions(self) -> Sequence[InputPartition]:
        parts = [
            _SourcePartition(name, url)
            for name, url in _requested_sources(self.options)
        ]
        if not parts:
            # all sources skipped: Spark requires >=1 partition; yield
            # an empty one so the result is a 0-row frame, not an error
            parts.append(_SourcePartition("", None))
        return parts

    def read(self, partition: _SourcePartition) -> Iterator[tuple]:
        if not partition.name:  # empty sentinel partition (all skipped)
            return
        row = _payload_row(
            partition.name,
            partition.url,
            int(self.options.get("timeout", 30)),
            int(self.options.get("retries", 3)),
            self.options.get("strict", "false").lower() == "true",
        )
        if row is not None:
            yield row


class PozosSimpleStreamReader(SimpleDataSourceStreamReader):
    """``spark.readStream.format("pozos")`` — the reference's cron
    cadence (daily scrape workflows, ``scrape.yml``/``update.yml``)
    modeled as a native streaming source: each micro-batch is ONE poll
    of every requested source; the offset is the poll counter.

    Simple stream readers run on the driver — correct here because a
    poll is 2 HTTP fetches (the reference's entire workload). The
    partitioned batch reader above stays the scale path for bulk
    backfills. Replay (``readBetweenOffsets``) re-fetches, i.e.
    at-least-once; downstream the pipeline's sha256 delta (A9) makes
    re-polled unchanged payloads idempotent.

    Option ``maxpolls`` (default 0 = unbounded) stops advancing the
    offset after N polls — the test/backfill bound.
    """

    def __init__(self, options: dict) -> None:
        self.options = dict(options)

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def _poll_rows(self) -> list[tuple]:
        timeout = int(self.options.get("timeout", 30))
        retries = int(self.options.get("retries", 3))
        strict = self.options.get("strict", "false").lower() == "true"
        rows = []
        for name, url in _requested_sources(self.options):
            row = _payload_row(name, url, timeout, retries, strict)
            if row is not None:
                rows.append(row)
        return rows

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        poll = int(start["poll"])
        maxpolls = int(self.options.get("maxpolls", 0) or 0)
        if maxpolls and poll >= maxpolls:
            return iter([]), start  # caught up: offset stops advancing
        return iter(self._poll_rows()), {"poll": poll + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        rows: list[tuple] = []
        for _ in range(int(start["poll"]), int(end["poll"])):
            rows.extend(self._poll_rows())
        return iter(rows)


class PozosDataSource(DataSource):
    """``spark.read.format("pozos")`` — options: ``sources`` (csv,
    default ``all``), ``url.<name>`` (override or ``skip``),
    ``timeout``, ``retries``, ``strict`` (fail tasks instead of
    yielding error rows)."""

    @classmethod
    def name(cls) -> str:
        return "pozos"

    def schema(self) -> T.StructType:
        return READER_SCHEMA

    def reader(self, schema: T.StructType) -> PozosReader:
        return PozosReader(dict(self.options))

    def simpleStreamReader(self, schema: T.StructType) -> PozosSimpleStreamReader:
        return PozosSimpleStreamReader(dict(self.options))
