"""End-to-end medallion pipeline tests: the reference's three entry
points (SURVEY §3) over a deterministic fake CoinLore API."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_deltalake_spark import pipelines as P
from etl_deltalake_spark.sources.table_format import read_table
from etl_deltalake_spark.sources.watermark import (
    commit_watermark,
    incremental_load,
    read_watermark,
)

# ---------------------------------------------------- fake CoinLore API


def make_ticker_fetcher(poll: int):
    """Deterministic ticker payload: 3 coins, values shift per poll.
    Numeric fields are STRINGS, as the real API sends them (SURVEY
    §1.2) — the Silver clean must coerce."""

    def fetcher(url, params=None, headers=None):
        coins = []
        for i, (cid, sym) in enumerate([("90", "BTC"), ("80", "ETH"), ("58", "XRP")]):
            coins.append(
                {
                    "id": cid,
                    "symbol": sym,
                    "name": sym.lower(),
                    "nameid": sym.lower(),
                    "rank": str(i + 1),
                    "price_usd": f"{1000 * (i + 1) + poll:.2f}",
                    "percent_change_24h": "1.5",
                    "percent_change_1h": "",  # empty → null → 0
                    "percent_change_7d": "bogus",  # coerce → null → 0
                    "price_btc": "1.0",
                    "market_cap_usd": f"{10_000 * (i + 1) * poll}",
                    "volume24": f"{100 * poll}",
                    "volume24a": f"{50 * poll}",
                    "csupply": "1",
                    "tsupply": "1",
                    "msupply": "",
                }
            )
        headers_out = {"Date": f"Mon, 0{poll} Jan 2024 00:00:0{poll} GMT"}
        return {"data": coins}, headers_out

    return fetcher


EXCHANGES_PAYLOAD = {
    "122": {
        "name": "Binance",
        "name_id": "binance",
        "volume_usd": 12345678.9,
        "active_pairs": 1500,
        "url": "https://binance.com",
        "country": "Cayman Islands; Japan",
    },
    "37": {
        "name": "CoinBene",
        "name_id": "coinbene",
        "volume_usd": 98765.4,
        "active_pairs": 300,
        "url": "",
        "country": "EU",
    },
    "16": {
        "name": "Kraken",
        "name_id": "kraken",
        "volume_usd": 555555.5,
        "active_pairs": 700,
        "url": "https://kraken.com",
        "country": "USA, EU",
    },
}


# ------------------------------------------------------------- entry 1


def test_ticker_incremental_two_polls(spark, tmp_path):
    root = str(tmp_path / "lake")
    P.run_ticker_incremental(
        spark, root, "https://fake.api", make_ticker_fetcher(1), params={"id": "90,80,58"}
    )
    gold2 = P.run_ticker_incremental(
        spark, root, "https://fake.api", make_ticker_fetcher(2), params={"id": "90,80,58"}
    )

    silver = read_table(spark, f"{root}/Silver/CoinLore/ticker")
    assert silver.count() == 6  # 3 coins × 2 polls, no duplicates
    # coercion quirks: '' and 'bogus' → 0.0
    row = silver.filter((F.col("id") == "90")).orderBy("ingested_at").collect()[0]
    assert row["percent_change_1h"] == 0.0
    assert row["percent_change_7d"] == 0.0

    g = {
        (r["id"], r["ingested_at"]): r
        for r in gold2.select(
            "id", "ingested_at", "diff_market_cap_usd", "cumsum_volume24a"
        ).collect()
    }
    # poll-1 row: diff = own value (first in group); poll-2: delta
    assert g[("90", "2024-01-01 00:00:01")]["diff_market_cap_usd"] == 10_000.0
    assert g[("90", "2024-01-02 00:00:02")]["diff_market_cap_usd"] == 10_000.0
    assert g[("90", "2024-01-02 00:00:02")]["cumsum_volume24a"] == 150.0

    wm = read_watermark(spark, f"{root}/control/watermarks", "ticker")
    assert wm == "2024-01-02 00:00:02"


def test_incremental_gold_equals_full_recompute(spark, tmp_path):
    """Three polls through the incremental Gold path must produce the
    exact table a full gold_aggregation over Silver would — diff
    splicing across batch boundaries and cumsum carry-over included."""
    from etl_deltalake_spark.operators.window_agg import gold_aggregation

    root = str(tmp_path / "lake")
    for poll in (1, 2, 3):
        P.run_ticker_incremental(
            spark, root, "https://fake.api", make_ticker_fetcher(poll)
        )
    gold = read_table(spark, f"{root}/Gold/CoinLore/ticker")
    full = gold_aggregation(
        read_table(spark, f"{root}/Silver/CoinLore/ticker"),
        group_col="id",
        diff_cols=["market_cap_usd", "volume24"],
        cumsum_cols=["volume24a"],
        order_cols=["ingested_at"],
    )
    cols = sorted(gold.columns)
    assert cols == sorted(full.columns)
    got = sorted(map(tuple, gold.select(*cols).collect()))
    want = sorted(map(tuple, full.select(*cols).collect()))
    assert got == want


def test_ticker_repoll_same_watermark_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "lake")
    P.run_ticker_incremental(spark, root, "https://fake.api", make_ticker_fetcher(1))
    P.run_ticker_incremental(spark, root, "https://fake.api", make_ticker_fetcher(1))
    silver = read_table(spark, f"{root}/Silver/CoinLore/ticker")
    assert silver.count() == 3  # second identical poll adds nothing


# ------------------------------------------------------------- entry 2


def test_exchanges_full_pipeline(spark, tmp_path):
    root = str(tmp_path / "lake")
    confidential, masked = P.run_exchanges_full(spark, root, EXCHANGES_PAYLOAD)

    conf_rows = {r["id"]: r for r in confidential.collect()}
    # junk countries dropped: CoinBene's only country is 'EU'
    assert "37" not in conf_rows
    # Binance exploded to 2 countries, both remapped
    binance = confidential.filter(F.col("id") == "122").collect()
    assert sorted(r["country"] for r in binance) == ["Japan", "United Kingdom"]
    # kraken: 'USA, EU' → USA kept (remapped), EU dropped
    kraken = confidential.filter(F.col("id") == "16").collect()
    assert [r["country"] for r in kraken] == ["United States"]
    # volume is a fixed-3-decimals string (C9)
    assert binance[0]["volume_usd"] == "12345678.900"
    # synthetic email is deterministic: local@nameid.org
    assert binance[0]["email"].endswith("@binance.org")

    m = masked.filter(F.col("id") == "122").collect()[0]
    assert m["email_masked"] == "*****@binance.org"
    assert "email" not in masked.columns

    # Silver is partitioned by country on disk (partition pruning path)
    import os

    parts = os.listdir(f"{root}/Silver/CoinLore/exchanges")
    assert any(p.startswith("country=") for p in parts)


def test_exchanges_schema_guard_raises_on_truncated_payload(spark, tmp_path):
    """P1 (reference main.py:209-210): fewer than 17 wide source
    columns must fail fast, not print-and-return-None."""
    truncated = {"122": EXCHANGES_PAYLOAD["122"], "37": EXCHANGES_PAYLOAD["37"]}
    with pytest.raises(ValueError, match="source columns"):
        P.run_exchanges_full(spark, str(tmp_path / "lake"), truncated)


def test_require_min_columns_guard(spark):
    from etl_deltalake_spark.operators.cleaning import require_min_columns

    df = spark.createDataFrame([(1, "a")], ["x", "y"])
    assert require_min_columns(df, 2) is df
    with pytest.raises(ValueError, match="at least 3 columns"):
        require_min_columns(df, 3, context="unit")


# ------------------------------------------------- watermark machinery


def test_commit_watermark_is_monotonic(spark, tmp_path):
    """A stale/backwards commit (clock skew, dropped re-poll batch)
    must not rewind the watermark and re-admit an ingested window."""
    store = str(tmp_path / "wm")
    commit_watermark(spark, store, "t", "ts", "2024-01-05")
    commit_watermark(spark, store, "t", "ts", "2024-01-03")  # dropped
    assert read_watermark(spark, store, "t") == "2024-01-05"
    commit_watermark(spark, store, "t", "ts", "2024-01-06")  # advances
    assert read_watermark(spark, store, "t") == "2024-01-06"



def test_incremental_load_filters_and_advances(spark, tmp_path):
    store = str(tmp_path / "wm")
    src = spark.createDataFrame(
        [("a", "2024-01-01"), ("b", "2024-01-02"), ("c", "2024-01-03")],
        ["k", "ts"],
    )
    delta, wm = incremental_load(spark, src, store, "t", "ts")
    assert delta.count() == 3 and wm == "2024-01-03"
    commit_watermark(spark, store, "t", "ts", wm)

    src2 = src.union(
        spark.createDataFrame([("d", "2024-01-04")], ["k", "ts"])
    )
    delta2, wm2 = incremental_load(spark, src2, store, "t", "ts")
    assert [r["k"] for r in delta2.collect()] == ["d"]
    assert wm2 == "2024-01-04"
    # second table's watermark doesn't clobber the first
    commit_watermark(spark, store, "other", "ts", "1999-01-01")
    assert read_watermark(spark, store, "t") == "2024-01-03"


def test_incremental_load_empty_delta_keeps_watermark(spark, tmp_path):
    store = str(tmp_path / "wm")
    src = spark.createDataFrame([("a", "2024-01-01")], ["k", "ts"])
    _, wm = incremental_load(spark, src, store, "t", "ts")
    commit_watermark(spark, store, "t", "ts", wm)
    delta, wm2 = incremental_load(spark, src, store, "t", "ts")
    assert delta.count() == 0 and wm2 is None


# ------------------------------------------------------- wide JSON path


def test_wide_json_to_long_idiomatic(spark):
    from etl_deltalake_spark.sources.http_json import wide_json_to_long

    df = wide_json_to_long(spark, EXCHANGES_PAYLOAD, key_name="id")
    assert df.count() == 3
    assert set(df.columns) >= {"id", "name", "volume_usd", "country"}
    with pytest.raises(ValueError):
        wide_json_to_long(spark, {}, key_name="id")


def test_crash_before_gold_recovers_without_duplicates(spark, tmp_path, monkeypatch):
    """Crash between the Silver merge and the Gold append, then re-run
    with a LATER clock: the pending-batch marker pins the original
    batch identity, so Bronze/Silver gain no duplicate rows, Gold gets
    the batch exactly once, and the watermark commits the ORIGINAL
    stamp — not the re-poll's."""
    from etl_deltalake_spark.sources.watermark import read_pending

    root = str(tmp_path / "lake")
    wm_store = f"{root}/control/watermarks"
    P.run_ticker_incremental(spark, root, "https://fake.api", make_ticker_fetcher(1))

    real_write = P.write_table

    def failing_write(df, path, *a, **k):
        if "/Gold/" in path:
            raise RuntimeError("injected gold-write failure")
        return real_write(df, path, *a, **k)

    monkeypatch.setattr(P, "write_table", failing_write)
    with pytest.raises(RuntimeError, match="injected"):
        P.run_ticker_incremental(
            spark, root, "https://fake.api", make_ticker_fetcher(2)
        )
    monkeypatch.setattr(P, "write_table", real_write)

    # the crashed batch's identity survived
    assert read_pending(spark, wm_store, "ticker") == "2024-01-02 00:00:02"

    # re-run: SAME poll-2 data, clock has moved on (later Date header)
    poll2_data, _ = make_ticker_fetcher(2)("u")

    def refetch(url, params=None, headers=None):
        return poll2_data, {"Date": "Wed, 03 Jan 2024 00:00:09 GMT"}

    P.run_ticker_incremental(spark, root, "https://fake.api", refetch)

    bronze = read_table(spark, f"{root}/Bronze/CoinLore/ticker")
    silver = read_table(spark, f"{root}/Silver/CoinLore/ticker")
    gold = read_table(spark, f"{root}/Gold/CoinLore/ticker")
    assert bronze.count() == 6, "Bronze must not double-ingest the batch"
    assert silver.count() == 6, "Silver must not double-ingest the batch"
    assert gold.count() == 6, "Gold must hold the batch exactly once"
    # batch kept its ORIGINAL stamp; nothing under the re-poll's clock
    assert silver.filter(F.col("ingested_at") == "2024-01-02 00:00:02").count() == 3
    assert silver.filter(F.col("ingested_at") > "2024-01-02 00:00:02").count() == 0
    # cumsum proves Gold saw poll 1 + poll 2 exactly once each
    g = {
        (r["id"], r["ingested_at"]): r["cumsum_volume24a"]
        for r in gold.select("id", "ingested_at", "cumsum_volume24a").collect()
    }
    assert g[("90", "2024-01-02 00:00:02")] == 150.0
    # watermark committed the original stamp and the marker is gone
    assert read_watermark(spark, wm_store, "ticker") == "2024-01-02 00:00:02"
    assert read_pending(spark, wm_store, "ticker") is None


def test_stale_pending_from_committed_batch_is_ignored(spark, tmp_path):
    """A pending marker at/below the committed watermark (crash
    between commit and clear) must NOT hijack the next batch's
    identity."""
    from etl_deltalake_spark.sources.watermark import read_pending, write_pending

    root = str(tmp_path / "lake")
    wm_store = f"{root}/control/watermarks"
    P.run_ticker_incremental(spark, root, "https://fake.api", make_ticker_fetcher(1))
    # simulate the commit-then-crash-before-clear window
    write_pending(spark, wm_store, "ticker", "2024-01-01 00:00:01")
    P.run_ticker_incremental(spark, root, "https://fake.api", make_ticker_fetcher(2))
    silver = read_table(spark, f"{root}/Silver/CoinLore/ticker")
    assert silver.count() == 6
    assert silver.filter(F.col("ingested_at") == "2024-01-02 00:00:02").count() == 3
    assert read_pending(spark, wm_store, "ticker") is None
