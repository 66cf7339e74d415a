"""S9/S11: declarative HTTP paginated source against a synthetic in-process
'API' (no network; the fetcher is injected, as on a real cluster where it
would be a requests call)."""

import json

from pyspark.sql import types as T

from airbyte_custom_spark.sources.http import (
    DeclarativeStream,
    OffsetPagination,
    RecordSelector,
    fetch_serial,
    paginated_read,
)

def _mk_fake_api():
    """Built as a closure so cloudpickle ships it by VALUE to executors
    (a module-level function in a test file isn't importable there)."""

    def fake_api(url: str) -> bytes:
        import json as _json

        db = [{"id": i, "name": f"user-{i}", "score": i * 0.5} for i in range(257)]
        q = dict(kv.split("=") for kv in url.split("?", 1)[1].split("&"))
        o, l = int(q["offset"]), int(q["limit"])
        return _json.dumps({"data": db[o : o + l]}).encode()

    return fake_api


_fake_api = _mk_fake_api()


def test_paginated_read_distributed(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    stream = DeclarativeStream(
        url_template="http://fake/api?offset={offset}&limit={limit}",
        pagination=OffsetPagination(limit=100, total_pages=3),
        selector=RecordSelector(("data",)),
        record_schema=schema,
    )
    df = paginated_read(spark, stream, _fake_api, num_partitions=3)
    rows = df.collect()
    assert len(rows) == 257  # last page short — no phantom records
    assert {r["id"] for r in rows} == set(range(257))
    assert df.where("page = 2").count() == 57


def test_selector_missing_path_is_empty(spark):
    stream = DeclarativeStream(
        url_template="http://fake/api?offset={offset}&limit={limit}",
        pagination=OffsetPagination(limit=10, total_pages=1),
        selector=RecordSelector(("nope",)),
    )
    assert paginated_read(spark, stream, _fake_api).count() == 0


def test_cursor_pagination_serial():
    pages = {
        "p1": {"data": [{"id": 1}], "next": "p2"},
        "p2": {"data": [{"id": 2}], "next": "p3"},
        "p3": {"data": [{"id": 3}], "next": None},
    }

    def fetch(url):
        return json.dumps(pages[url]).encode()

    def next_url(payload, _url):
        return json.loads(payload).get("next")

    stream = DeclarativeStream(url_template="", selector=RecordSelector(("data",)))
    out = fetch_serial(stream, fetch, next_url, "p1")
    assert [r["id"] for r in out] == [1, 2, 3]
