"""HTTP JSON ingestion (SURVEY §2.1 S1–S3, §2.3 note).

The reference GETs the CoinLore API and ``pd.json_normalize``s the
payload (main.py:79-128, 162-192). Spark-first shape:

 - Fetch is a DRIVER-side callable returning the payload (a list of
   records or a dict-of-dicts). Network is injected (``fetcher``
   argument) so tests/pipelines run hermetically; a requests-based
   default is provided for real deployments. At 100 TB you don't
   pull an API through the driver at all — you land raw JSON files
   on object storage and ``spark.read.json`` them; ``json_to_df``
   below is exactly that reader applied to an in-memory payload.

 - **Long-format payloads** (list of flat records — the ``ticker``
   endpoint): ``spark.read.json`` on a parallelized JSON-lines
   dataset → schema inference at the ingestion edge only.

 - **Wide dict-of-dicts payloads** (the ``exchanges`` endpoint,
   ``{"122": {...}, "123": {...}}``): the reference flattens to
   dotted columns and melts them back (main.py:216-222). The
   idiomatic path (SURVEY §2.3 note) skips the wide detour: parse as
   a MapType and ``explode`` the map — one row per entry, no
   melt/pivot. ``wide_json_to_long`` implements that; the melt/pivot
   operators still exist in operators/reshape.py as first-class
   engine capabilities.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def default_fetcher(url: str, params: Mapping | None = None,
                    headers: Mapping | None = None):
    """S1/S2 network kernel: GET → parsed JSON. Driver-side, tiny
    payloads only (see module docstring for the at-scale pattern)."""
    import requests  # gated: not exercised in hermetic environments

    resp = requests.get(url, params=params, headers=headers, timeout=30)
    resp.raise_for_status()
    return resp.json(), dict(resp.headers)


def json_to_df(spark: SparkSession, records: Sequence[Mapping]) -> DataFrame:
    """S3 for long payloads: list-of-records → DataFrame via
    ``spark.read.json`` (inference at the edge; nested structs stay
    typed instead of the reference's dotted-string columns)."""
    if not records:
        raise ValueError("empty payload: nothing to ingest")
    rdd = spark.sparkContext.parallelize([json.dumps(r) for r in records])
    return spark.read.json(rdd)


def wide_json_to_long(
    spark: SparkSession, payload: Mapping[str, Mapping], key_name: str = "id"
) -> DataFrame:
    """S3 for wide dict-of-dicts payloads: one row per top-level key.

    The idiomatic replacement for the reference's json_normalize →
    melt → regex-split → pivot chain (main.py:195-234): inject the
    key into each record and read as JSON lines — no wide frame ever
    exists, so nothing needs unpivoting.
    """
    if not payload:
        raise ValueError("empty payload: nothing to ingest")
    rows = []
    for k, rec in payload.items():
        r = dict(rec)
        r[key_name] = r.get(key_name, k)
        rows.append(json.dumps(r))
    return spark.read.json(spark.sparkContext.parallelize(rows))


def http_extract_full(
    spark: SparkSession,
    url: str,
    endpoint: str,
    params: Mapping | None = None,
    headers: Mapping | None = None,
    fetcher: Callable = default_fetcher,
) -> DataFrame:
    """S1+S3 (reference ``aplicar_extraccion_full``, main.py:162-192):
    full extraction of a long-format endpoint."""
    payload, _ = fetcher(f"{url.rstrip('/')}/{endpoint}", params, headers)
    data = payload.get("data", payload) if isinstance(payload, Mapping) else payload
    return json_to_df(spark, data)


def http_extract_incremental(
    spark: SparkSession,
    url: str,
    endpoint: str,
    params: Mapping | None = None,
    headers: Mapping | None = None,
    fetcher: Callable = default_fetcher,
) -> tuple[DataFrame, str]:
    """S2+S3+S8 (reference ``aplicar_extraccion_incremental``,
    main.py:131-159): extraction + watermark value derived from the
    response Date header (ingest timestamp when absent). The caller
    commits it via sources/watermark.commit_watermark — read AND
    used, unlike the reference's dead S7 (SURVEY §2.1)."""
    from datetime import datetime, timezone
    from email.utils import parsedate_to_datetime

    payload, resp_headers = fetcher(f"{url.rstrip('/')}/{endpoint}", params, headers)
    data = payload.get("data", payload) if isinstance(payload, Mapping) else payload
    hdr = (resp_headers or {}).get("Date")
    ts = parsedate_to_datetime(hdr) if hdr else datetime.now(timezone.utc)
    return json_to_df(spark, data), ts.strftime("%Y-%m-%d %H:%M:%S")


def flatten_struct_cols(df: DataFrame) -> DataFrame:
    """Utility: expand every top-level struct column to flat columns
    (`s.a` → `s_a`) — the typed counterpart of json_normalize's
    dotted names for consumers that need a flat schema."""
    cols = []
    for f in df.schema.fields:
        if f.dataType.typeName() == "struct":
            cols.extend(
                F.col(f"{f.name}.{sub.name}").alias(f"{f.name}_{sub.name}")
                for sub in f.dataType.fields
            )
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)
