"""Unit tests for round-3 operators: BM25 search, rolling anomaly
stats, grouped OLS regression (oracle parity is covered by
tests/test_retired_queries.py; these pin semantics on tiny frames)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark join spark window"),
        (2, "spark merge"),
        (3, "filter scan batch"),
        (4, "window window window window merge"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_matches_only_and_ranks(docs):
    from etl_deltalake_spark.operators.search import bm25_topk

    out = bm25_topk(docs, "doc_id", "text", ("spark", "window"), k=10).collect()
    hit_ids = {r["doc_id"] for r in out}
    assert hit_ids == {1, 2, 4}  # doc 3 matches no query term
    ranks = [r["rank"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranks == [1, 2, 3]
    scores = [r["score"] for r in sorted(out, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)
    assert all(r["score"] > 0 for r in out)


def test_bm25_tf_saturation(spark):
    """BM25's k1 bounds the tf contribution: 100 repeats of a term
    must score less than (k1+1)·idf — unlike raw tf·idf."""
    from etl_deltalake_spark.operators.search import bm25_scores

    rows = [(1, " ".join(["spark"] * 100)), (2, "spark other words here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc"]: r["score"] for r in
           bm25_scores(df, "doc_id", "text", ("spark",)).collect()}
    # both docs contain the term; saturation keeps the spam doc's
    # advantage bounded (< 2.2x here, not 100x)
    assert out[1] < 2.2 * out[2]


def test_inverted_index_postings_sorted(docs):
    from etl_deltalake_spark.operators.search import build_inverted_index

    idx = {r["term"]: r for r in
           build_inverted_index(docs, "doc_id", "text").collect()}
    assert idx["spark"]["df"] == 2
    postings = [p["doc"] for p in idx["spark"]["postings"]]
    assert postings == sorted(postings)
    assert idx["window"]["df"] == 2
    tf_by_doc = {p["doc"]: p["tf"] for p in idx["window"]["postings"]}
    assert tf_by_doc == {1: 1, 4: 4}


def test_bm25_query_filter_is_pushed(docs):
    """The query-term IN filter must sit under the first aggregate
    (scan-side), so the shuffle only carries query-term postings."""
    from etl_deltalake_spark.operators.search import doc_term_freqs

    plan = doc_term_freqs(
        docs, "doc_id", "text", vocab=("spark",)
    )._jdf.queryExecution().executedPlan().toString()
    agg_pos = plan.find("HashAggregate")
    filt_pos = plan.rfind("Filter")
    assert agg_pos != -1 and filt_pos != -1 and filt_pos > agg_pos, plan


def _ts(s):
    import datetime

    return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(seconds=s)


def test_rolling_stats_window_and_anomaly(spark):
    from etl_deltalake_spark.operators.timeseries import rolling_stats

    rows = [
        (1, _ts(0), 10.0),
        (1, _ts(1800), 10.0),
        (1, _ts(3600), 10.0),
        (1, _ts(7300), 10.0),   # >1h after every prior row: frame resets
        (2, _ts(0), 1.0),
        (2, _ts(10), 1.0),
        (2, _ts(20), 100.0),    # spike
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = rolling_stats(df, "user_id", "ts", "value", window_secs=3600,
                        z_threshold=1.1)
    got = {(r["key"], r["ts"]): r for r in out.collect()}
    # first row: singleton frame -> no std, no anomaly
    r0 = got[(1, _ts(0))]
    assert r0["n_win"] == 1 and r0["std_win"] is None and not r0["is_anomaly"]
    # third row sees all three constant values -> std 0, no z
    r2 = got[(1, _ts(3600))]
    assert r2["n_win"] == 3 and r2["std_win"] == 0.0 and r2["z"] is None
    # row after a >1h gap only sees itself
    assert got[(1, _ts(7300))]["n_win"] == 1
    # spike flags as anomaly; its frame mean reflects all 3 values
    spike = got[(2, _ts(20))]
    assert spike["n_win"] == 3
    assert spike["mean_win"] == 34.0
    assert spike["is_anomaly"]


def test_grouped_linreg_recovers_line(spark):
    from etl_deltalake_spark.operators.stats import grouped_linreg

    rows = (
        [("a", float(x), 2.0 * x + 5.0) for x in range(1, 6)]
        + [("b", float(x), -1.5 * x + 3.0) for x in range(1, 6)]
        + [("c", 4.0, 7.0), ("c", 4.0, 9.0)]  # vertical: zero x-variance
    )
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["g"]: r for r in grouped_linreg(df, ["g"], "x", "y").collect()}
    assert out["a"]["slope"] == pytest.approx(2.0, abs=1e-6)
    assert out["a"]["intercept"] == pytest.approx(5.0, abs=1e-6)
    assert out["a"]["r2"] == pytest.approx(1.0, abs=1e-6)
    assert out["b"]["slope"] == pytest.approx(-1.5, abs=1e-6)
    assert out["c"]["slope"] is None and out["c"]["r2"] is None
    assert out["a"]["n"] == 5


def test_grouped_linreg_ignores_null_pairs(spark):
    from etl_deltalake_spark.operators.stats import grouped_linreg

    rows = [("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", None, 99.0),
            ("a", 3.0, None), ("a", 3.0, 6.0)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = grouped_linreg(df, ["g"], "x", "y").collect()[0]
    assert out["n"] == 3
    assert out["slope"] == pytest.approx(2.0, abs=1e-6)
    assert out["intercept"] == pytest.approx(0.0, abs=1e-6)


def test_kmeans_codebook_properties(spark):
    from etl_deltalake_spark.operators.similarity import (
        ivf_assign,
        kmeans_codebook,
    )

    # two tight clusters around orthogonal directions + their ids
    rows = (
        [(i, [1.0 + 0.01 * i, 0.0, 0.1]) for i in range(5)]
        + [(10 + i, [0.0, 1.0 + 0.01 * i, 0.1]) for i in range(5)]
    )
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cb = kmeans_codebook(df, "vec_id", "embedding", k=2, iterations=3)
    assert [cid for cid, _ in cb] == [0, 1]
    # training separates the two directions
    assigned = {
        r["vec_id"]: r["cluster_id"]
        for r in ivf_assign(df, "vec_id", "embedding", cb).collect()
    }
    g0 = {assigned[i] for i in range(5)}
    g1 = {assigned[10 + i] for i in range(5)}
    assert len(g0) == 1 and len(g1) == 1 and g0 != g1
    # deterministic: retraining yields the identical codebook
    cb2 = kmeans_codebook(df, "vec_id", "embedding", k=2, iterations=3)
    assert cb == cb2


def test_kmeans_empty_cluster_keeps_seed(spark):
    from etl_deltalake_spark.operators.similarity import kmeans_codebook

    # all vectors identical: one cluster takes everything, the other
    # keeps its (identical) seed instead of dying
    rows = [(i, [1.0, 2.0, 3.0]) for i in range(4)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cb = kmeans_codebook(df, "vec_id", "embedding", k=2, iterations=2)
    assert len(cb) == 2
    assert all(len(v) == 3 for _, v in cb)


def test_histogram_buckets_and_clamping(spark):
    from etl_deltalake_spark.operators.stats import histogram

    rows = [("a", -5.0), ("a", 0.0), ("a", 4.9), ("a", 5.0), ("a", 99.0),
            ("b", 10.0), ("a", None)]
    df = spark.createDataFrame(rows, ["g", "x"])
    out = {(r["g"], r["bucket"]): r for r in
           histogram(df, "x", lo=0.0, hi=10.0, n_buckets=2,
                     group_cols=["g"]).collect()}
    # -5 clamps into bucket 0; 99 and the right-edge 10.0 clamp into
    # the last bucket; null dropped
    assert out[("a", 0)]["n"] == 3
    assert out[("a", 1)]["n"] == 2
    assert out[("b", 1)]["n"] == 1
    assert out[("a", 0)]["bucket_lo"] == 0.0
    assert out[("a", 0)]["bucket_hi"] == 5.0
    assert sum(r["n"] for r in out.values()) == 6


def test_asof_join_forward(spark):
    from etl_deltalake_spark.operators.relational import asof_join

    trades = spark.createDataFrame(
        [(1, 10, "t1"), (1, 25, "t2"), (2, 5, "t3"), (1, 100, "t4")],
        ["key", "t", "trade"],
    )
    quotes = spark.createDataFrame(
        [(1, 10, 1.0), (1, 30, 2.0), (2, 1, 9.0), (2, 50, 8.0)],
        ["key", "qt", "px"],
    )
    fwd = {
        r["trade"]: r["px"]
        for r in asof_join(
            trades, quotes, on="key", left_time="t", right_time="qt",
            right_cols=["px"], direction="forward",
        ).collect()
    }
    # t1@10 -> quote@10 (inclusive); t2@25 -> quote@30; t3@5 -> quote@50;
    # t4@100 -> nothing after it
    assert fwd == {"t1": 1.0, "t2": 2.0, "t3": 8.0, "t4": None}
    back = {
        r["trade"]: r["px"]
        for r in asof_join(
            trades, quotes, on="key", left_time="t", right_time="qt",
            right_cols=["px"], direction="backward",
        ).collect()
    }
    assert back == {"t1": 1.0, "t2": 1.0, "t3": 9.0, "t4": 2.0}


def test_value_entropy_semantics(spark):
    import math

    from etl_deltalake_spark.operators.stats import value_entropy

    rows = (
        [("uniform", v) for v in ["a", "b", "c", "d"] * 5]
        + [("constant", "x")] * 8
        + [("withnull", "y")] * 3
        + [("withnull", None)] * 3
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r["g"]: r for r in value_entropy(df, ["g"], "v").collect()}
    assert out["uniform"]["entropy"] == pytest.approx(math.log(4), abs=1e-6)
    assert out["uniform"]["n_distinct"] == 4
    assert out["constant"]["entropy"] == 0.0
    # null is a category: 50/50 split -> ln 2
    assert out["withnull"]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
    assert out["withnull"]["n_distinct"] == 2


def test_pq_roundtrip_and_compression(spark):
    from etl_deltalake_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    # 3 well-separated 8-d clusters, ids INTERLEAVED across clusters
    # so the lowest-id seeds cover all three (seeding with one
    # cluster's points would legitimately split it instead)
    base = [[10.0, 0, 0, 0, 0, 0, 0, 0], [0, 0, 10.0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 10.0, 0, 0]]
    rows = []
    for i in range(12):
        c, off = i % 3, i // 3
        v = [x + (0.1 * off if x else 0.0) for x in base[c]]
        rows.append((i, v))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    books = pq_train(df, "vec_id", "embedding", dims=8, m=2, ksub=4,
                     iterations=2)
    assert len(books) == 2 and all(len(b) == 4 for b in books)
    codes = pq_encode(df, "vec_id", "embedding", books)
    got = {r["vec_id"]: r["codes"] for r in codes.collect()}
    assert all(len(c) == 2 for c in got.values())
    assert all(0 <= x < 4 for c in got.values() for x in c)
    # ksub=4 over 3 true clusters legitimately splits one cluster
    # across codes, so code-identity is NOT asserted; the retrieval
    # property is the contract: ADC against the cluster-0 direction
    # must fill the top-4 with exactly the cluster-0 members
    top = pq_adc_topk(codes, "vec_id", base[0], books, k=4).collect()
    assert {r["vec_id"] for r in top} == {0, 3, 6, 9}
    dists = [r["pq_dist"] for r in sorted(top, key=lambda r: r["rank"])]
    assert dists == sorted(dists)


def test_pq_rejects_indivisible_dims(spark):
    from etl_deltalake_spark.operators.similarity import pq_train

    df = spark.createDataFrame([(0, [1.0, 2.0, 3.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, "vec_id", "embedding", dims=3, m=2)


def test_quantile_bucket_depth_and_nulls(spark):
    from etl_deltalake_spark.operators.stats import quantile_bucket

    rows = [("r", float(i)) for i in range(1, 101)] + [("r", None)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = quantile_bucket(df, "v", n_buckets=4)
    counts = {
        r["qbucket"]: r["n"]
        for r in out.groupBy("qbucket").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    # equi-depth: ~25 per bucket on uniform data; null -> null bucket
    assert counts[None] == 1
    assert sum(v for k, v in counts.items() if k is not None) == 100
    assert all(20 <= v <= 30 for k, v in counts.items() if k is not None)
    assert set(k for k in counts if k is not None) == {0, 1, 2, 3}


def test_funnel_ordering_semantics(spark):
    """A purchase BEFORE the user's first click must not count as a
    conversion; one after it must."""
    from etl_deltalake_spark.operators.behavior import (
        funnel_counts,
        funnel_steps,
    )

    rows = [
        # u1: clean view -> click -> purchase
        (1, _ts(0), "view"), (1, _ts(10), "click"), (1, _ts(20), "purchase"),
        # u2: purchase precedes the click -> conversion must NOT count
        (2, _ts(0), "view"), (2, _ts(5), "purchase"), (2, _ts(10), "click"),
        # u3: view only
        (3, _ts(0), "view"),
        # u4: click with no view -> not in the funnel at all
        (4, _ts(0), "click"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    steps = ["view", "click", "purchase"]
    per_user = {
        r["user_id"]: r
        for r in funnel_steps(df, "user_id", "ts", "event_type", steps).collect()
    }
    assert set(per_user) == {1, 2, 3}
    assert per_user[1]["reached_purchase"]
    assert per_user[2]["reached_click"] and not per_user[2]["reached_purchase"]
    assert not per_user[3]["reached_click"]
    counts = {
        r["step"]: r["n_users"]
        for r in funnel_counts(df, "user_id", "ts", "event_type", steps).collect()
    }
    assert counts == {"view": 3, "click": 2, "purchase": 1}


def test_cohort_retention_offsets(spark):
    from etl_deltalake_spark.operators.behavior import cohort_retention

    import datetime

    def d(day):
        return datetime.datetime(2024, 1, day, 12, 0, 0)

    rows = [
        (1, d(1)), (1, d(8)), (1, d(22)),   # cohort wk0, active wk1, wk3
        (2, d(2)), (2, d(9)),               # same cohort week, active wk1
        (3, d(10)),                         # later cohort, only itself
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {(str(r["cohort"]), r["offset"]): r["n_active"]
           for r in cohort_retention(df, "user_id", "ts", "week").collect()}
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 1)] == 2
    assert out[("2024-01-01", 3)] == 1
    assert out[("2024-01-08", 0)] == 1
    assert len(out) == 4


def test_cooccurrence_cap_and_dedup(spark):
    from etl_deltalake_spark.operators.relational import cooccurrence_pairs

    rows = (
        [(1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "b"), (2, "c")]
        # oversized basket: must be dropped entirely by the cap
        + [(9, f"x{i}") for i in range(5)]
    )
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = {
        (r["item_a"], r["item_b"]): r["n_baskets"]
        for r in cooccurrence_pairs(
            df, "basket", "item", min_count=1, max_basket_size=3
        ).collect()
    }
    # duplicate (1,b) counted once; basket 9 excluded
    assert out[("a", "b")] == 2
    assert out[("a", "c")] == 1 and out[("b", "c")] == 1
    assert not any(k for k in out if k[0].startswith("x"))


def test_asof_join_carries_whole_row_with_null_fields(spark):
    """A right row whose payload contains NULL fields must carry AS
    THAT ROW — per-column ignorenulls carries would stitch fields
    from different right rows."""
    from etl_deltalake_spark.operators.relational import asof_join

    trades = spark.createDataFrame([(1, 30, "t1")], ["key", "t", "trade"])
    quotes = spark.createDataFrame(
        [(1, 10, 3.0, 7), (1, 20, None, 5)],
        "key long, qt long, px double, sz long",
    )
    back = asof_join(
        trades, quotes, on="key", left_time="t", right_time="qt",
        right_cols=["px", "sz"],
    ).collect()[0]
    # nearest at-or-before is the t=20 row: px NULL, sz 5 — NOT px
    # 3.0 stitched from the t=10 row
    assert back["px"] is None and back["sz"] == 5

    fwd_trades = spark.createDataFrame([(1, 5, "t1")], ["key", "t", "trade"])
    fq = spark.createDataFrame(
        [(1, 10, None, 9), (1, 20, 4.0, 2)],
        "key long, qt long, px double, sz long",
    )
    fwd = asof_join(
        fwd_trades, fq, on="key", left_time="t", right_time="qt",
        right_cols=["px", "sz"], direction="forward",
    ).collect()[0]
    assert fwd["px"] is None and fwd["sz"] == 9


def test_bucketed_interval_join_exact_and_no_bnlj(spark):
    """Bucketed interval join must equal the brute-force overlap
    predicate and must plan an equi-join (no BNLJ)."""
    from etl_deltalake_spark.operators.relational import (
        bucketed_interval_join,
    )

    left = spark.createDataFrame(
        [(1, _ts(0), _ts(100)), (2, _ts(7200), _ts(7300)),
         (3, _ts(50), _ts(60))],
        ["l_id", "ls", "le"],
    )
    right = spark.createDataFrame(
        [(10, _ts(90), _ts(200)), (11, _ts(7250), _ts(7260)),
         (12, _ts(300), _ts(400)), (13, _ts(100), _ts(110))],
        ["r_id", "rs", "re"],
    )
    out = bucketed_interval_join(
        left, right, "ls", "le", "rs", "re", bucket_secs=3600
    )
    got = {(r["l_id"], r["r_id"]) for r in out.collect()}
    # half-open: (1,[0,100)) does NOT overlap (13,[100,110))
    assert got == {(1, 10), (2, 11)}
    brute = left.crossJoin(right).filter(
        (F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le"))
    )
    want = {(r["l_id"], r["r_id"]) for r in brute.collect()}
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    # an interval spanning multiple buckets overlaps everything here
    # but each pair must appear exactly ONCE despite multi-bucket
    # candidate duplication
    wide_l = spark.createDataFrame([(1, _ts(0), _ts(4 * 3600))],
                                   ["l_id", "ls", "le"])
    wide = bucketed_interval_join(
        wide_l, right, "ls", "le", "rs", "re", bucket_secs=3600
    ).collect()
    pairs = [(r["l_id"], r["r_id"]) for r in wide]
    assert sorted(pairs) == [(1, 10), (1, 11), (1, 12), (1, 13)]
    assert len(pairs) == len(set(pairs))


def test_bucketed_interval_join_long_interval_guard(spark):
    """One pathological year-long interval must not detonate the
    explode (round-3 verdict): default errors with the offending id,
    'drop' excludes it, 'split' stays exact with bounded fan-out."""
    from etl_deltalake_spark.operators.relational import (
        bucketed_interval_join,
    )

    year = 365 * 24 * 3600
    left = spark.createDataFrame(
        [(1, _ts(0), _ts(100)), (2, _ts(0), _ts(year))],
        ["l_id", "ls", "le"],
    )
    right = spark.createDataFrame(
        [(10, _ts(50), _ts(60)), (11, _ts(year // 2), _ts(year // 2 + 10))],
        ["r_id", "rs", "re"],
    )
    kw = dict(bucket_secs=60, max_buckets=64)

    # default: the job fails loudly, naming the long row
    with pytest.raises(Exception, match="l_id=2 spans"):
        bucketed_interval_join(
            left, right, "ls", "le", "rs", "re", **kw
        ).collect()

    # drop: long interval excluded, survivors exact
    dropped = bucketed_interval_join(
        left, right, "ls", "le", "rs", "re", on_long="drop", **kw
    )
    assert {(r["l_id"], r["r_id"]) for r in dropped.collect()} == {(1, 10)}

    # split: EXACT result; coarse level bounds the long row's fan-out
    # to ~span/(60*64)+1 = ~8213 tiles instead of ~525k
    split = bucketed_interval_join(
        left, right, "ls", "le", "rs", "re", on_long="split", **kw
    )
    got = {(r["l_id"], r["r_id"]) for r in split.collect()}
    assert got == {(1, 10), (2, 10), (2, 11)}
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_tolerance(spark):
    from etl_deltalake_spark.operators.relational import asof_join

    trades = spark.createDataFrame(
        [(1, 100, "near"), (1, 500, "far")], ["key", "t", "trade"]
    )
    quotes = spark.createDataFrame([(1, 90, 1.5)], ["key", "qt", "px"])
    got = {
        r["trade"]: r["px"]
        for r in asof_join(
            trades, quotes, on="key", left_time="t", right_time="qt",
            right_cols=["px"], tolerance=50,
        ).collect()
    }
    # gap 10 <= 50 matches; gap 410 > 50 nulls out
    assert got == {"near": 1.5, "far": None}
    fwd = {
        r["trade"]: r["px"]
        for r in asof_join(
            trades, quotes, on="key", left_time="t", right_time="qt",
            right_cols=["px"], direction="forward", tolerance=50,
        ).collect()
    }
    # forward: no quote at-or-after either trade except none
    assert fwd == {"near": None, "far": None}


def test_cms_never_underestimates_and_collides(spark):
    from etl_deltalake_spark.operators.stats import cms_counts

    rows = [(f"k{i % 50}",) for i in range(500)]
    df = spark.createDataFrame(rows, ["k"])
    out = cms_counts(df, "k", depth=3, width=8).collect()
    assert len(out) == 50
    assert all(r["never_under"] for r in out)
    assert all(r["cms_est"] >= r["exact"] for r in out)
    # width 8 << 50 keys forces collisions: some estimate must exceed
    # its exact count (otherwise the sketch test proves nothing)
    assert any(r["cms_est"] > r["exact"] for r in out)
    assert all(r["exact"] == 10 for r in out)


def test_redact_pii_categories(spark):
    from etl_deltalake_spark.operators.text import pii_hits, redact_pii

    rows = [
        (1, "mail me at jane.doe+x@corp.example.org or call +1 555-123-4567"),
        (2, "server at 192.168.1.10 answered"),
        (3, "clean text with numbers 42 and 3.14"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    hits = pii_hits("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            redact_pii("text").alias("red"),
            *[c.alias(f"n_{k}") for k, c in hits.items()],
        ).collect()
    }
    assert "<EMAIL>" in out[1]["red"] and "jane" not in out[1]["red"]
    assert "<PHONE>" in out[1]["red"] and "555" not in out[1]["red"]
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[2]["red"] == "server at <IP> answered"
    assert out[2]["n_ipv4"] == 1
    # short numbers and decimals survive
    assert out[3]["red"] == rows[2][1]
    assert out[3]["n_email"] == out[3]["n_ipv4"] == out[3]["n_phone"] == 0


def test_redact_pii_precedence_and_dates(spark):
    """Digit runs inside an email are email hits only; ISO dates are
    not phones (review findings)."""
    from etl_deltalake_spark.operators.pii import pii_hits, redact_pii

    rows = [
        (1, "reach a123456789@x.com today"),
        (2, "between 2024-01-01 and 2024-02-03"),
        (3, "ip-ish login 10.0.0.1@x.com seen"),
        (4, "meeting 2024-01-15 12:30 in room 5"),
        (5, "from 2024-01-15 2024-02-03 inclusive"),
        (6, "call 555 123 4567 or +1-555-123-4567"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    hits = pii_hits("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            redact_pii("text").alias("red"),
            *[c.alias(f"n_{k}") for k, c in hits.items()],
        ).collect()
    }
    assert out[1]["red"] == "reach <EMAIL> today"
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 0
    assert out[2]["red"] == rows[1][1]  # dates untouched
    assert out[2]["n_phone"] == 0
    assert out[3]["red"] == "ip-ish login <EMAIL> seen"
    assert out[3]["n_email"] == 1 and out[3]["n_ipv4"] == 0
    # datetime prose survives: '12:30' after a date is not a phone
    # fragment, and two adjacent dates (16 digits, singly separated)
    # are not a phone either (round-3 advice)
    assert out[4]["red"] == rows[3][1] and out[4]["n_phone"] == 0
    assert out[5]["red"] == rows[4][1] and out[5]["n_phone"] == 0
    # real phone shapes still match
    assert out[6]["red"] == "call <PHONE> or <PHONE>"
    assert out[6]["n_phone"] == 2


def test_kmeans_codebook_df_bitwise_matches_collect_form(spark, sf_dir):
    """The broadcast-refresh trainer must reproduce the collect-form
    codebook BITWISE on real data, both metrics — same seeds, same
    decimal-sum means, same rounded sims (the q_kmeans_ivf oracle
    rides on this)."""
    from etl_deltalake_spark.operators.similarity import (
        kmeans_codebook,
        kmeans_codebook_df,
    )
    from etl_deltalake_spark.sources.catalog import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    for metric in ("cosine", "l2"):
        a = kmeans_codebook(
            emb, "vec_id", "embedding", k=4, iterations=2, metric=metric
        )
        b = kmeans_codebook_df(
            emb, "vec_id", "embedding", k=4, iterations=2, metric=metric
        )
        assert a == b, f"codebook diverged for metric={metric}"


def test_kmeans_codebook_df_empty_cluster_keeps_seed(spark):
    from etl_deltalake_spark.operators.similarity import kmeans_codebook_df

    rows = [(i, [1.0, 2.0, 3.0]) for i in range(4)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cb = kmeans_codebook_df(df, "vec_id", "embedding", k=2, iterations=2)
    assert len(cb) == 2
    assert all(len(v) == 3 for _, v in cb)


def test_ivf_assign_df_bitwise_matches_literal_form(spark, sf_dir):
    """The broadcast-table assignment must reproduce the literal-
    expression ivf_assign row-for-row (cluster AND sim), both
    metrics — q_ivfpq_topk's probe filter rides on this."""
    from etl_deltalake_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_df,
    )
    from etl_deltalake_spark.sources.catalog import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter("vec_id % 50 = 0").collect()
    ]
    for metric in ("cosine", "l2"):
        a = {
            r["vec_id"]: (r["cluster_id"], r["s"])
            for r in ivf_assign(
                emb, "vec_id", "embedding", cents, sim_col="s", metric=metric
            ).collect()
        }
        b = {
            r["vec_id"]: (r["cluster_id"], r["s"])
            for r in ivf_assign_df(
                emb, "vec_id", "embedding", cents, sim_col="s", metric=metric
            ).collect()
        }
        assert a == b, f"assignment diverged for metric={metric}"
