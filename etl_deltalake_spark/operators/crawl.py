"""Crawl-politeness + corpus-quality signals that complete the
round-8 crawl→corpus path (SURVEY §2.9 extensions): robots.txt
fetchability filtering and the compression-ratio text-quality
heuristic.

robots.txt (stdlib ``urllib.robotparser``): a training-data crawl
must honor robots before a page ever reaches extraction. The
operator joins a frontier of URLs against per-host robots.txt
payloads and evaluates ``can_fetch`` per (agent, url) — Python's
parser implements the original first-match rule semantics
(prefix-matching rule lines, most-specific user-agent section
wins). Execution: the robots side is per-HOST (tiny — one row per
domain), so it broadcasts; evaluation happens inside one
Arrow-batched kernel on the frontier's partitions, zero shuffle of
the frontier.

Compression ratio (the Gopher/C4-family quality rule): natural
prose compresses to a mid-range fraction of its size; highly
repetitive boilerplate compresses far smaller and random/encrypted
junk barely compresses at all, so ``zlib_ratio`` (compressed/raw at
a FIXED zlib level, deterministic) is a cheap scalar that separates
both failure modes from prose. No SQL engine exposes zlib
deterministically, so this signal is pytest-gated by its
separation properties rather than a DuckDB oracle (the honest-gate
precedent: engine-specific sketches like HLL are graded the same
way).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ROBOTS_SCHEMA = StructType(
    [
        StructField("url_id", LongType()),
        StructField("url", StringType()),
        StructField("host", StringType()),
        StructField("fetchable", BooleanType()),
    ]
)


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    agent: str,
    id_col: str = "url_id",
    url_col: str = "url",
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Per-URL fetchability under each host's robots.txt for
    ``agent``. ``urls`` carries (id, url, host); ``robots`` carries
    (host, robots_txt) — one small row per host, broadcast into the
    frontier's partitions. A host with no robots row (or an
    unparseable file) is fetchable, per crawler convention. Returns
    the frontier with a ``fetchable`` boolean; filter on it for the
    polite frontier, audit its complement."""
    import pandas as pd

    joined = urls.select(
        F.col(id_col).cast("long").alias("url_id"),
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
    ).join(
        F.broadcast(
            robots.select(
                F.col(host_col).alias("host"),
                F.col(robots_col).alias("robots_txt"),
            )
        ),
        "host",
        "left",
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from urllib.robotparser import RobotFileParser

        # Cache key includes the payload hash, not just the host
        # (ADVICE r8): if the robots join upstream ever yields more
        # than one robots_txt per host, each distinct payload parses
        # once and every URL row evaluates against ITS OWN payload —
        # never silently against whichever arrived first.
        cache: dict[tuple[str, int], RobotFileParser] = {}
        for pdf in batches:
            out = []
            for uid, url, host, txt in zip(
                pdf["url_id"], pdf["url"], pdf["host"], pdf["robots_txt"]
            ):
                if txt is None or pd.isna(txt):
                    out.append(True)
                    continue
                txt = str(txt)
                key = (str(host), hash(txt))
                rp = cache.get(key)
                if rp is None:
                    rp = RobotFileParser()
                    rp.parse(txt.splitlines())
                    cache[key] = rp
                out.append(bool(rp.can_fetch(agent, str(url))))
            yield pd.DataFrame(
                {
                    "url_id": pdf["url_id"].astype("int64"),
                    "url": pdf["url"],
                    "host": pdf["host"],
                    "fetchable": pd.Series(out, dtype="bool"),
                }
            )

    return joined.mapInPandas(kernel, schema=ROBOTS_SCHEMA)


def zlib_ratio(text_col: str | Column, level: int = 6) -> Column:
    """compressed_bytes / raw_bytes of the UTF-8 text at a fixed
    zlib level (deterministic across platforms — zlib output is
    pinned by level + input). Empty/null-safe: null in → null out,
    empty string → 1.0 (nothing to compress). Measured bands (the
    separation the tests pin): document-scale prose ~0.25–0.6,
    heavily repeated boilerplate < 0.1, random printable junk
    ~0.84+ (random ASCII carries ~6.6 bits/char)."""
    from pyspark.sql.pandas.functions import pandas_udf

    def _kernel(s):
        def one(v):
            if v is None:
                return None
            raw = v.encode("utf-8")
            if not raw:
                return 1.0
            return len(zlib.compress(raw, level)) / len(raw)

        return s.map(one)

    fn = pandas_udf(_kernel, "double")
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return fn(c)


def repetition_gate_by_compression(
    df: DataFrame,
    text_col: str,
    min_ratio: float = 0.15,
    max_ratio: float = 0.8,
    out_col: str = "zlib_ratio",
) -> DataFrame:
    """The Gopher-style corpus gate: keep documents whose
    compression ratio sits in the prose band — drop the
    boilerplate/looping tail (ratio below ``min_ratio``) and the
    non-text tail (above ``max_ratio``). Composes with the quality
    and dedup funnel stages as one more scan-side filter."""
    with_ratio = df.withColumn(out_col, zlib_ratio(text_col))
    return with_ratio.filter(
        F.col(out_col).isNotNull()
        & (F.col(out_col) >= min_ratio)
        & (F.col(out_col) <= max_ratio)
    )
