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


def test_paginated_read_auth_and_429_backoff(spark):
    """round-3 VERDICT item 5: a page that 429s (with Retry-After) twice
    then succeeds must be retried inside the executor fetch loop, with the
    auth header present on every attempt — no task failure, no dropped
    records (`airbyte-cdk/.../streams/http/rate_limiting.py` analog)."""
    from pyspark.sql import types as T

    from airbyte_custom_spark.sources.http import (
        HttpStatusError,
        RetryPolicy,
        TokenAuthenticator,
    )

    def flaky_fetch(url, headers, _state={}):
        assert headers == {"Authorization": "Bearer tok-123"}, headers
        n = _state[url] = _state.get(url, 0) + 1
        if n <= 2:
            raise HttpStatusError(429, "rate limited", retry_after=0.0)
        offset = int(url.split("offset=")[1].split("&")[0])
        return json.dumps(
            {"data": [{"id": offset + i} for i in range(10)]}
        ).encode()

    stream = DeclarativeStream(
        url_template="http://fake/api?offset={offset}&limit={limit}",
        pagination=OffsetPagination(limit=10, total_pages=3),
        record_schema=T.StructType([T.StructField("id", T.LongType())]),
        auth=TokenAuthenticator(token="tok-123"),
        retry=RetryPolicy(max_retries=3),
    )
    df = paginated_read(spark, stream, flaky_fetch, num_partitions=1)
    assert {r["id"] for r in df.collect()} == set(range(30))


def test_retry_policy_units():
    """Backoff schedule, Retry-After override, non-retryable passthrough,
    retry exhaustion — all deterministic, no sleeping (injected clock)."""
    import pytest

    from airbyte_custom_spark.sources.http import (
        HttpStatusError,
        RetryPolicy,
        fetch_with_policy,
    )

    p = RetryPolicy(max_retries=3, backoff_base_sec=0.5, backoff_max_sec=10.0)
    assert [p.backoff(a) for a in range(6)] == [0.5, 1.0, 2.0, 4.0, 8.0, 10.0]
    assert p.backoff(0, retry_after=7.0) == 7.0
    assert p.backoff(0, retry_after=99.0) == 10.0  # capped

    waits: list[float] = []
    calls = {"n": 0}

    def f503(url, headers):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise HttpStatusError(503)
        return b"ok"

    assert fetch_with_policy(f503, "u", {}, p, sleep=waits.append) == b"ok"
    assert waits == [0.5, 1.0]

    def f404(url, headers):
        raise HttpStatusError(404, "gone")

    with pytest.raises(HttpStatusError) as ei:
        fetch_with_policy(f404, "u", {}, p, sleep=waits.append)
    assert ei.value.status == 404 and len(waits) == 2  # no retry on 4xx

    def always429(url, headers):
        raise HttpStatusError(429, retry_after=0.0)

    with pytest.raises(HttpStatusError):
        fetch_with_policy(always429, "u", {}, p, sleep=waits.append)
    assert len(waits) == 5  # 2 + max_retries sleeps, then give up


def test_token_provider_resolves_at_fetch_time():
    from airbyte_custom_spark.sources.http import TokenAuthenticator

    vals = iter(["t1", "t2"])
    auth = TokenAuthenticator(token=lambda: next(vals), prefix="")
    assert auth.headers() == {"Authorization": "t1"}
    assert auth.headers() == {"Authorization": "t2"}
# To append to tests/test_http_source.py


def test_oauth2_refreshes_on_expiry_and_caches():
    """OAuth2Authenticator fetches lazily, caches until expires_in minus
    margin, refreshes after expiry (`abstract_oauth.py:41-52` semantics)."""
    import json as _json

    from airbyte_custom_spark.sources.http import OAuth2Authenticator

    calls = []
    now = [1000.0]

    def post(url, body):
        calls.append((url, dict(body)))
        return _json.dumps(
            {"access_token": f"tok{len(calls)}", "expires_in": 300}
        ).encode()

    auth = OAuth2Authenticator(
        token_endpoint="https://idp/token",
        client_id="cid",
        client_secret="sec",
        refresh_token="rtok",
        grant_type="refresh_token",
        post=post,
        expiry_margin_sec=60.0,
        clock=lambda: now[0],
    )
    assert auth.headers() == {"Authorization": "Bearer tok1"}
    assert auth.headers() == {"Authorization": "Bearer tok1"}  # cached
    assert len(calls) == 1
    assert calls[0][0] == "https://idp/token"
    assert calls[0][1]["grant_type"] == "refresh_token"
    assert calls[0][1]["refresh_token"] == "rtok"
    now[0] += 239.0  # inside expiry (300 - 60 margin)
    assert auth.headers() == {"Authorization": "Bearer tok1"}
    now[0] += 2.0  # past it
    assert auth.headers() == {"Authorization": "Bearer tok2"}
    assert len(calls) == 2


def test_oauth2_plugs_into_paginated_read(spark):
    """DeclarativeStream duck-types on .headers(): the distributed page
    fetch carries the OAuth bearer token on every request."""
    import json as _json

    from airbyte_custom_spark.sources.http import (
        DeclarativeStream,
        OAuth2Authenticator,
        OffsetPagination,
        RecordSelector,
        paginated_read,
    )

    def post(url, body):
        return _json.dumps({"access_token": "T", "expires_in": 3600}).encode()

    auth = OAuth2Authenticator(
        token_endpoint="https://idp/token", client_id="c", client_secret="s",
        post=post,
    )

    def fetch(url, headers=None):
        assert headers == {"Authorization": "Bearer T"}, headers
        page = int(url.rsplit("=", 1)[1]) // 2
        return _json.dumps(
            {"data": [{"id": page * 2 + i} for i in range(2)]}
        ).encode()

    stream = DeclarativeStream(
        url_template="https://api/items?limit={limit}&offset={offset}",
        pagination=OffsetPagination(limit=2, total_pages=3),
        selector=RecordSelector(("data",)),
        record_schema=None,
        auth=auth,
    )
    out = paginated_read(spark, stream, fetch, num_partitions=2)
    assert out.count() == 6
