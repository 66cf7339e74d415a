"""HTTP paginated source + declarative retriever (SURVEY.md §2.1 S9/S11).

The reference's Python CDK reads REST APIs through a declarative stack:
requester → paginator → record selector → schema normalizer
(`airbyte-cdk/python/airbyte_cdk/sources/declarative/retrievers/
simple_retriever.py`, `.../paginators/default_paginator.py`,
`.../extractors/dpath_extractor.py`).  This module reproduces that shape
Spark-first:

  * **Page discovery on the driver, page FETCH on executors.**  The
    reference fetches pages serially on one worker; here page coordinates
    (offset/page-number slices) are parallelized as a DataFrame of page
    descriptors and fetched inside ``mapInPandas`` — N executors fetch N
    pages concurrently, which is the only way an HTTP backfill keeps up
    with a 1000-executor cluster's ingest rate.  Rate limits are respected
    by bounding ``num_partitions`` (the connection-pool analog).
  * **Declarative config.**  ``RecordSelector`` is a dpath-style field
    chain; pagination strategies are offset / page-number / cursor, like
    the CDK's DefaultPaginator strategies.
  * **Offline-testable.**  The fetcher is injected as a callable
    ``(page_descriptor) -> bytes``; tests use a synthetic JSON server
    function.  A `requests`-based fetcher is a two-line lambda on a real
    cluster (the library is deliberately not imported here).

Note: an injected Python fetcher is the slow path by design — network I/O
dominates, so the pandas-batched executor loop costs nothing relative to
the HTTP round-trips it parallelizes.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


@dataclass(frozen=True)
class RecordSelector:
    """dpath-style record extraction (`dpath_extractor.py` analog):
    descend ``field_path`` into the response JSON, expect a list of
    records."""

    field_path: tuple[str, ...] = ("data",)

    def extract(self, payload: bytes) -> list[dict]:
        node = json.loads(payload)
        for key in self.field_path:
            if node is None:
                return []
            node = node.get(key)
        return node or []


@dataclass(frozen=True)
class OffsetPagination:
    """offset/limit page slicing (`OffsetIncrement` strategy analog).
    Page count is fixed up front (bounded backfill) — cursor-style
    follow-the-token pagination is inherently serial and stays on the
    driver via ``fetch_serial``."""

    limit: int = 100
    total_pages: int = 1

    def descriptors(self) -> list[dict]:
        return [
            {"page": i, "offset": i * self.limit, "limit": self.limit}
            for i in range(self.total_pages)
        ]


@dataclass(frozen=True)
class DeclarativeStream:
    """The ConfiguredStream of a declarative HTTP source: url template +
    pagination + selector + record schema (`simple_retriever.py` analog)."""

    url_template: str  # e.g. "https://api/x?offset={offset}&limit={limit}"
    pagination: OffsetPagination = field(default_factory=OffsetPagination)
    selector: RecordSelector = field(default_factory=RecordSelector)
    record_schema: T.StructType | None = None


def paginated_read(
    spark: SparkSession,
    stream: DeclarativeStream,
    fetch: Callable[[str], bytes],
    num_partitions: int = 8,
) -> DataFrame:
    """S9: distributed paginated scan.  Page descriptors parallelize across
    ``num_partitions`` tasks (≈ concurrent connections); each task fetches
    its pages and emits selected records as JSON strings, which are parsed
    into the declared schema with the engine's standard safe-cast path."""
    descs = stream.pagination.descriptors()
    desc_df = spark.createDataFrame(
        [(d["page"], stream.url_template.format(**d)) for d in descs],
        "page int, url string",
    ).repartition(min(num_partitions, max(len(descs), 1)))

    selector = stream.selector

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for page, url in zip(pdf["page"], pdf["url"]):
                for rec in selector.extract(fetch(url)):
                    rows.append((int(page), json.dumps(rec)))
            yield pd.DataFrame(rows, columns=["page", "record"])

    raw = desc_df.mapInPandas(run, "page int, record string")
    if stream.record_schema is None:
        return raw
    parsed = raw.select(
        "page", F.from_json("record", stream.record_schema).alias("r")
    )
    return parsed.select("page", "r.*")


def fetch_serial(
    stream: DeclarativeStream,
    fetch: Callable[[str], bytes],
    next_url: Callable[[bytes, str], str | None],
    first_url: str,
    max_pages: int = 10_000,
) -> list[dict]:
    """Cursor-token pagination (serial by nature — each page's token comes
    from the previous response, `CursorPagination` analog).  Driver-side,
    bounded; used for small control-plane reads, not data planes."""
    out: list[dict] = []
    url: str | None = first_url
    for _ in range(max_pages):
        if url is None:
            break
        payload = fetch(url)
        out.extend(stream.selector.extract(payload))
        url = next_url(payload, url)
    return out
