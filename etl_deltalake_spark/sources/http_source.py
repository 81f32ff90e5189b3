"""First-class Spark data source for paged HTTP JSON (round 8).

The reference pulls the CoinLore API through a single-process loop
(main.py:79-128: one GET per id, pandas normalize, concat).
``sources/http_json.py`` reproduces that shape driver-side; THIS
module is the 100 TB form: Spark 4's Python DataSource API
(``pyspark.sql.datasource``) turns each page URL into an
``InputPartition``, so the cluster fetches pages IN PARALLEL on the
executors and the result is a plain DataFrame feeding any downstream
plan — no driver bottleneck, retries per-task, locality-free.

Design choices mirroring the reference's data model:

 - All payload fields surface as STRINGS (+ a ``_src`` provenance
   column). The reference's JSON arrives stringly and is coerced in
   Silver (SURVEY §1.2); typing at the edge would hide coercion
   errors the cleaning stage is built to audit.
 - ``urls`` option: semicolon-separated page URLs → one partition
   each. ``file://`` URLs work, which is how tests stay hermetic
   (the injectable-fetcher equivalent at the DataSource layer).
 - ``data_key`` option: unwrap ``{"data": [...]}`` envelopes (the
   ticker endpoint shape, main.py:123).
 - ``lenient=true``: a page that fails to fetch/parse yields ONE
   all-null row carrying its ``_src`` instead of killing the job —
   the corrupt-record quarantine contract at page granularity.

Register once per session: ``spark.dataSource.register(
HttpJsonDataSource)``; then ``spark.read.format("httpjson")
.option("urls", ...).option("fields", "id,name,price_usd").load()``.
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class PagePartition(InputPartition):
    def __init__(self, url: str):
        self.url = url


def _iter_records(payload, data_key: str | None):
    if data_key and isinstance(payload, dict):
        payload = payload.get(data_key, [])
    if isinstance(payload, dict):
        # wide dict-of-dicts envelope: one record per entry
        payload = list(payload.values())
    if not isinstance(payload, list):
        raise ValueError("payload is not a list of records")
    return payload


class HttpJsonReader(DataSourceReader):
    def __init__(self, options):
        urls = options.get("urls", "")
        if not urls:
            raise ValueError("httpjson requires the 'urls' option")
        self.urls = [u for u in urls.split(";") if u]
        fields = options.get("fields", "")
        if not fields:
            raise ValueError("httpjson requires the 'fields' option")
        self.fields = [f.strip() for f in fields.split(",") if f.strip()]
        self.data_key = options.get("data_key") or None
        self.lenient = str(options.get("lenient", "false")).lower() == "true"

    def partitions(self):
        return [PagePartition(u) for u in self.urls]

    def read(self, part: PagePartition):
        try:
            with urllib.request.urlopen(part.url, timeout=30) as resp:
                payload = json.load(resp)
            records = _iter_records(payload, self.data_key)
        except Exception:
            if not self.lenient:
                raise
            yield tuple([None] * len(self.fields) + [part.url])
            return
        for rec in records:
            if not isinstance(rec, dict):
                rec = {}
            vals = [
                None if rec.get(f) is None else str(rec.get(f))
                for f in self.fields
            ]
            yield tuple(vals + [part.url])


class HttpJsonDataSource(DataSource):
    """``format("httpjson")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "httpjson"

    def schema(self) -> str:
        fields = [
            f.strip()
            for f in self.options.get("fields", "").split(",")
            if f.strip()
        ]
        if not fields:
            raise ValueError("httpjson requires the 'fields' option")
        cols = ", ".join(f"`{f}` string" for f in fields)
        return f"{cols}, `_src` string"

    def reader(self, schema) -> HttpJsonReader:
        return HttpJsonReader(self.options)

    def streamReader(self, schema) -> "HttpJsonStreamReader":
        return HttpJsonStreamReader(self.options)


class HttpJsonStreamReader(DataSourceStreamReader):
    """Micro-batch stream over a growing page sequence — the
    reference's incremental polling (S2: re-poll, consume from the
    watermark, main.py:131-159) as a REAL Structured Streaming source
    with engine-managed offsets: the offset is the next unread page
    number, ``latestOffset`` probes forward for newly published
    pages, each batch's pages become InputPartitions (parallel fetch,
    per-task retry), and the checkpoint makes consumption
    exactly-once across restarts — the two-phase watermark store
    (sources/watermark.py) generalized to engine machinery.

    Options: ``url_template`` containing ``{page}``; plus the batch
    reader's ``fields`` / ``data_key`` / ``lenient``.
    """

    MAX_PROBE = 100_000  # runaway-discovery backstop

    def __init__(self, options):
        tmpl = options.get("url_template", "")
        if "{page}" not in tmpl:
            raise ValueError(
                "httpjson streaming requires a url_template with {page}"
            )
        self.tmpl = tmpl
        self.batch = HttpJsonReader(
            {**{k: options.get(k) for k in ("data_key",)},
             "urls": "_placeholder_",
             "fields": options.get("fields", ""),
             "lenient": options.get("lenient", "false")}
        )

    def _exists(self, page: int) -> bool:
        try:
            with urllib.request.urlopen(
                self.tmpl.format(page=page), timeout=10
            ):
                return True
        except Exception:
            return False

    def initialOffset(self):
        return {"page": 0}

    def latestOffset(self):
        n = 0
        while n < self.MAX_PROBE and self._exists(n):
            n += 1
        return {"page": n}

    def partitions(self, start, end):
        return [
            PagePartition(self.tmpl.format(page=p))
            for p in range(start["page"], end["page"])
        ]

    def read(self, partition):
        return self.batch.read(partition)

    def commit(self, end):
        pass
