"""Custom Python DataSource (Spark 4): parallel paged-API ingestion.

The reference ingests external systems by enumerating items on the
driver and fetching each one serially (mitodl/odl-etl
``mitx/mitx_etl.py:67-105`` — ``dump_course_ids`` then a per-id
``export_olx`` subprocess loop; SURVEY §2A row A5). The Spark-native
generalization is a DataSource whose ``partitions()`` IS the
enumeration: each page/item becomes an ``InputPartition``, and the
per-partition ``read()`` runs the fetch IN EXECUTORS — N pages pull
concurrently across the cluster instead of one at a time on the
driver, and a failed page retries as a task, not a whole job.

The transport is injectable by name so the harness stays offline: the
default ``fake`` transport synthesizes deterministic records (seeded by
page), and a real HTTPS transport drops into the same ``fetch_page``
contract. Options arrive as strings (the DataSource options model), so
everything is parameterized by simple scalars.

Usage::

    spark.dataSource.register(PagedApiDataSource)
    df = (spark.read.format("paged_api")
          .option("pages", "8").option("rows_per_page", "100").load())
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "id bigint, page int, name string, score double"


def fake_fetch_page(page: int, rows_per_page: int) -> Iterator[tuple]:
    """Deterministic stand-in for one HTTPS page fetch: same (page, n)
    always yields the same records, so tests are replayable and the
    parallel read's union is order-independently checkable."""
    for i in range(rows_per_page):
        rid = page * rows_per_page + i
        digest = hashlib.md5(f"rec-{rid}".encode()).hexdigest()
        yield (
            rid,
            page,
            f"item_{digest[:8]}",
            int(digest[8:12], 16) / 65535.0,
        )


_TRANSPORTS = {"fake": fake_fetch_page}


class PagedApiReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.pages = int(options.get("pages", "4"))
        self.rows_per_page = int(options.get("rows_per_page", "50"))
        transport = options.get("transport", "fake")
        if transport not in _TRANSPORTS:
            raise ValueError(
                f"unknown transport {transport!r}; known: {sorted(_TRANSPORTS)}"
            )
        self.transport = transport

    def partitions(self) -> list[InputPartition]:
        # One partition per page: the enumeration step of the reference's
        # loop, expressed as the source's parallelism contract.
        return [InputPartition(p) for p in range(self.pages)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        fetch = _TRANSPORTS[self.transport]
        yield from fetch(partition.value, self.rows_per_page)


class PagedApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> PagedApiReader:
        return PagedApiReader(self.options)
