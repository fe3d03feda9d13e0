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
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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


class PozosReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.options = options

    def partitions(self) -> Sequence[InputPartition]:
        from .pozos import normalize_sources

        requested = normalize_sources(
            [s for s in self.options.get("sources", "all").split(",") if s.strip()]
        )
        parts = []
        for name in requested:
            url = self.options.get(f"url.{name}")
            if url == "skip":
                continue
            parts.append(_SourcePartition(name, url))
        if not parts:
            # all sources skipped: Spark requires >=1 partition; yield
            # an empty one so the result is a 0-row frame, not an error
            parts.append(_SourcePartition("", None))
        return parts

    def read(self, partition: _SourcePartition) -> Iterator[tuple]:
        from .pozos import SOURCE_LOADERS

        name = partition.name
        if not name:  # empty sentinel partition (all sources skipped)
            return
        timeout = int(self.options.get("timeout", 30))
        retries = int(self.options.get("retries", 3))
        strict = self.options.get("strict", "false").lower() == "true"
        loader = SOURCE_LOADERS[name]
        try:
            if partition.url:
                p = loader(partition.url, timeout=timeout, retries=retries)
            else:
                p = loader(timeout=timeout, retries=retries)
        except Exception as exc:  # noqa: BLE001 — degraded mode: error as data
            if strict:
                raise
            yield (name, partition.url or "", None, None, None, None, None, None,
                   None, f"{type(exc).__name__}: {exc}")
            return
        fetched = p.get("fetched_at")
        if isinstance(fetched, str):
            fetched = dt.datetime.fromisoformat(fetched).replace(tzinfo=None)
        fecha = p.get("fecha")
        if isinstance(fecha, str):
            fecha = dt.date.fromisoformat(fecha)
        yield (
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
