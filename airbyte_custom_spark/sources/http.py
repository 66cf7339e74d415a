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
  * **Auth + rate limiting.**  ``TokenAuthenticator`` injects header
    credentials per request (CDK `requests_native_auth` analog) and
    ``RetryPolicy`` applies bounded exponential backoff with Retry-After
    support on 429/5xx (`airbyte-cdk/.../streams/http/http.py:454`,
    `rate_limiting.py`) — applied INSIDE the executor fetch loop so a
    rate-limited page retries locally without failing the Spark task.
  * **Offline-testable.**  The fetcher is injected as a callable
    ``(url[, headers]) -> bytes`` raising ``HttpStatusError`` on non-2xx;
    tests use a synthetic JSON server function.  A `requests`-based
    fetcher is a two-line lambda on a real cluster (the library is
    deliberately not imported here).

Note: an injected Python fetcher is the slow path by design — network I/O
dominates, so the pandas-batched executor loop costs nothing relative to
the HTTP round-trips it parallelizes.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


class HttpStatusError(RuntimeError):
    """A fetcher signals a non-2xx response by raising this; the retry
    policy decides whether to back off and retry (429/5xx) or fail the
    task (4xx).  ``retry_after`` carries the server's Retry-After seconds
    when present (the CDK honors it the same way —
    `airbyte-cdk/.../streams/http/rate_limiting.py`)."""

    def __init__(self, status: int, msg: str = "", retry_after: float | None = None):
        super().__init__(f"HTTP {status}{': ' + msg if msg else ''}")
        self.status = status
        self.retry_after = retry_after


@dataclass(frozen=True)
class TokenAuthenticator:
    """Header-token auth (`airbyte-cdk/.../requests_native_auth/token.py`
    analog): injects ``{header: "<prefix> <token>"}`` into every request.
    ``token`` may be a callable for short-lived credentials — it is
    resolved INSIDE the executor task at fetch time, so a refreshed token
    is picked up without replanning (cloudpickle ships the provider)."""

    token: str | Callable[[], str]
    header: str = "Authorization"
    prefix: str = "Bearer"

    def headers(self) -> dict[str, str]:
        tok = self.token() if callable(self.token) else self.token
        return {self.header: f"{self.prefix} {tok}" if self.prefix else tok}


@dataclass(frozen=True)
class RetryPolicy:
    """Bounded exponential backoff on rate-limit / transient-server
    statuses (`rate_limiting.py` default_backoff_handler analog:
    exponential on 429/5xx, honor Retry-After, give up after
    ``max_retries``).  Deterministic (no jitter): concurrent page tasks
    already de-synchronize naturally through data skew, and determinism
    keeps the retry schedule testable."""

    max_retries: int = 5
    backoff_base_sec: float = 0.5
    backoff_max_sec: float = 60.0
    retry_statuses: tuple[int, ...] = (429, 500, 502, 503, 504)

    def backoff(self, attempt: int, retry_after: float | None = None) -> float:
        if retry_after is not None:
            return min(float(retry_after), self.backoff_max_sec)
        return min(self.backoff_base_sec * (2**attempt), self.backoff_max_sec)


def fetch_with_policy(
    fetch: Callable,
    url: str,
    headers: dict[str, str] | None,
    policy: RetryPolicy | None,
    sleep: Callable[[float], None] = time.sleep,
) -> bytes:
    """Run one fetch under the retry policy.  The fetcher is called as
    ``fetch(url, headers)`` when auth headers exist, else ``fetch(url)``
    (back-compatible with header-less fetchers).  Non-retryable statuses
    and exhausted retries re-raise — a failed page fails the task loudly
    rather than silently dropping records."""
    policy = policy or RetryPolicy()
    attempt = 0
    while True:
        try:
            return fetch(url, headers) if headers is not None else fetch(url)
        except HttpStatusError as e:
            if e.status not in policy.retry_statuses or attempt >= policy.max_retries:
                raise
            sleep(policy.backoff(attempt, e.retry_after))
            attempt += 1


@dataclass
class OAuth2Authenticator:
    """OAuth2 token-refresh auth (`airbyte-cdk/.../requests_native_auth/
    abstract_oauth.py:23-106`, `oauth.py:14` analog): lazily fetches an
    access token from ``token_endpoint`` and re-fetches when it expires
    (``expires_in`` minus a safety margin).  The HTTP POST is an injected
    callable ``post(url, form: dict) -> bytes`` returning the token JSON —
    offline-testable; a `requests`-based post is a one-liner on a real
    cluster.

    Works everywhere a `TokenAuthenticator` does (``DeclarativeStream.
    auth`` duck-types on ``.headers()``).  Executor semantics: cloudpickle
    ships the authenticator per task, so each task refreshes independently
    under its own clock — at most one refresh per task per expiry window
    (the reference's per-process token cache behaves the same way)."""

    token_endpoint: str
    client_id: str
    client_secret: str
    post: Callable[[str, dict], bytes]
    refresh_token: str | None = None
    grant_type: str = "client_credentials"
    scopes: tuple[str, ...] = ()
    access_token_name: str = "access_token"
    expires_in_name: str = "expires_in"
    expiry_margin_sec: float = 120.0
    header: str = "Authorization"
    prefix: str = "Bearer"
    clock: Callable[[], float] = time.monotonic
    _token: str | None = field(default=None, init=False, repr=False)
    _expires_at: float = field(default=0.0, init=False, repr=False)

    def refresh_request_body(self) -> dict:
        """`abstract_oauth.py:54-84` build_refresh_request_body analog."""
        body = {
            "grant_type": self.grant_type,
            "client_id": self.client_id,
            "client_secret": self.client_secret,
        }
        if self.refresh_token is not None:
            body["refresh_token"] = self.refresh_token
        if self.scopes:
            body["scopes"] = " ".join(self.scopes)
        return body

    def access_token(self) -> str:
        """Cached token, refreshed on expiry (`abstract_oauth.py:41-52`)."""
        if self._token is None or self.clock() >= self._expires_at:
            payload = json.loads(
                self.post(self.token_endpoint, self.refresh_request_body())
            )
            self._token = str(payload[self.access_token_name])
            ttl = float(payload.get(self.expires_in_name, 3600))
            self._expires_at = self.clock() + max(
                ttl - self.expiry_margin_sec, 1.0
            )
        return self._token

    def headers(self) -> dict[str, str]:
        tok = self.access_token()
        return {self.header: f"{self.prefix} {tok}" if self.prefix else tok}


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
    auth: TokenAuthenticator | OAuth2Authenticator | None = None
    retry: RetryPolicy = field(default_factory=RetryPolicy)


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
    auth, retry = stream.auth, stream.retry

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        # auth headers resolved once per task, inside the executor (a
        # callable token provider refreshes here, not on the driver)
        headers = auth.headers() if auth is not None else None
        for pdf in batches:
            rows = []
            for page, url in zip(pdf["page"], pdf["url"]):
                payload = fetch_with_policy(fetch, url, headers, retry)
                for rec in selector.extract(payload):
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
    headers = stream.auth.headers() if stream.auth is not None else None
    for _ in range(max_pages):
        if url is None:
            break
        payload = fetch_with_policy(fetch, url, headers, stream.retry)
        out.extend(stream.selector.extract(payload))
        url = next_url(payload, url)
    return out
