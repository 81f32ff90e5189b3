"""URL canonicalization + feature extraction: the crawl-pipeline
companion to HTML extraction (SURVEY §2.9 extensions). Web-scale
corpora dedup and quota BY URL before they ever fetch or parse a
page — that only works if syntactic variants of the same resource
map to one canonical key.

Canonical form (deterministic; the contract the oracle grades):
 - scheme and host lowercase; a trailing dot on the host drops;
 - default ports drop (``:80`` for http, ``:443`` for https);
 - path dot-segments resolve (``/a/./b/../c`` → ``/a/c``, via
   ``posixpath.normpath`` — note this also collapses ``//`` and
   drops trailing slashes, a documented canonicalization choice);
   an empty path becomes ``/``;
 - query parameters sort by (key, value), blank values kept —
   param ORDER never distinguishes resources;
 - the fragment drops (client-side only).

Execution split (both strategies on purpose): cheap per-component
EXTRACTION uses Spark's built-in ``parse_url`` (JVM-side, codegen,
no Python); full canonicalization needs query-param sorting and
dot-segment resolution, which is one Arrow-batched pandas UDF over
stdlib ``urllib.parse`` — scan-side, zero shuffle. Dedup/quota then
run as plain relational ops on the canonical column.

No counterpart in the reference (JSON text only, main.py:1-638);
north-star extension per SURVEY §2.9.
"""

from __future__ import annotations

import posixpath
from urllib.parse import parse_qsl, urlencode, urlsplit

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEFAULT_PORTS = {"http": 80, "https": 443}


def canonical_url_py(url: str) -> str:
    """Pure-function canonical form (kernel and tests share it).
    Malformed URLs canonicalize best-effort — never raise — because
    a crawl frontier always contains garbage."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower().rstrip(".")
    try:
        port = parts.port
    except ValueError:
        port = None
    netloc = host
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    norm = posixpath.normpath(path)
    if norm == ".":
        norm = "/"
    query = urlencode(
        sorted(parse_qsl(parts.query, keep_blank_values=True))
    )
    out = f"{scheme}://{netloc}{norm}"
    if query:
        out += f"?{query}"
    return out


def canonical_url(url_col: str | Column) -> Column:
    """Column form: Arrow-batched pandas UDF applying
    ``canonical_url_py`` (null in → null out)."""
    from pyspark.sql.pandas.functions import pandas_udf

    def _kernel(s):
        return s.map(lambda v: None if v is None else canonical_url_py(v))

    fn = pandas_udf(_kernel, "string")
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return fn(c)


def url_features(df: DataFrame, url_col: str) -> DataFrame:
    """JVM-side per-component extraction via the built-in
    ``parse_url`` — host, path, query, plus path depth — no Python
    in the plan. Pairs with ``canonical_url`` the way built-in
    functions pair with kernels everywhere else in this repo: stay
    JVM-side until the semantics genuinely need Python."""
    c = F.col(url_col)
    host = F.lower(F.parse_url(c, F.lit("HOST")))
    path = F.parse_url(c, F.lit("PATH"))
    return df.select(
        "*",
        host.alias("url_host"),
        path.alias("url_path"),
        F.parse_url(c, F.lit("QUERY")).alias("url_query"),
        F.size(
            F.filter(F.split(path, "/"), lambda s: s != F.lit(""))
        ).cast("int").alias("url_depth"),
    )


def dedup_by_canonical_url(
    df: DataFrame, id_col: str, url_col: str
) -> DataFrame:
    """Keep one row (min id) per canonical URL — the frontier-dedup
    primitive. One shuffle on the canonical key; at crawl scale this
    is the shape that keeps refetch rates down."""
    canon = df.withColumn("_canon", canonical_url(url_col))
    keep = canon.groupBy("_canon").agg(F.min(F.col(id_col)).alias(id_col))
    return (
        canon.join(keep, [id_col, "_canon"], "left_semi").drop("_canon")
    )
