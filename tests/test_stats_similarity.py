"""Unit tests for the statistics/sampling operators, salted
aggregation, and the IVF similarity path (plan-shape assertions
included — the scale contracts, not just values)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from etl_deltalake_spark.operators.partitioning import salted_agg_sum
from etl_deltalake_spark.operators.similarity import ivf_assign, ivf_topk
from etl_deltalake_spark.operators.stats import (
    approx_distinct_check,
    hash_sample,
    percentiles,
)
from etl_deltalake_spark.sources.catalog import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    dec = F.col("l_extendedprice").cast("decimal(18,2)")
    plain = {
        r["l_returnflag"]: (r["s"], r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum(dec).alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["s"], r["n"])
        for r in salted_agg_sum(
            li, ["l_returnflag"], dec, "s", salt_n=8, salt_source=F.col("l_orderkey")
        ).collect()
    }
    assert plain == salted


def test_hash_sample_deterministic_and_scan_side(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    s1 = hash_sample(orders, F.col("o_orderkey"), 1)
    a = sorted(r["o_orderkey"] for r in s1.select("o_orderkey").collect())
    b = sorted(r["o_orderkey"] for r in s1.select("o_orderkey").collect())
    assert a == b and len(a) > 0
    # ~1/16 of rows, generous tolerance for a small fixture
    total = orders.count()
    assert 0.02 < len(a) / total < 0.12
    # no shuffle: pure scan + filter
    assert "Exchange" not in _plan(s1)


def test_percentiles_monotone(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    rows = percentiles(li, ["l_returnflag"], "l_quantity").collect()
    assert rows
    for r in rows:
        assert r["p25"] <= r["p50"] <= r["p75"]


def test_approx_distinct_within_tolerance(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    rows = approx_distinct_check(
        orders, ["o_orderpriority"], "o_custkey", rsd=0.01, tolerance=0.05
    ).collect()
    assert rows and all(r["approx_ok"] for r in rows)


def _centroids(spark, sf_dir, stride=50):
    emb = load_table(spark, "embeddings", sf_dir)
    rows = emb.filter(F.col("vec_id") % stride == 0).collect()
    return emb, [(int(r.vec_id), [float(x) for x in r.embedding]) for r in rows]


def test_ivf_assign_covers_all_vectors_scan_side(spark, sf_dir):
    emb, cents = _centroids(spark, sf_dir)
    assigned = ivf_assign(emb, "vec_id", "embedding", cents)
    cids = {c for c, _ in cents}
    rows = assigned.collect()
    assert len(rows) == emb.count()
    assert all(r["cluster_id"] in cids for r in rows)
    # a centroid's own vector must assign to itself (cos=1 is maximal)
    own = {r["vec_id"]: r["cluster_id"] for r in rows if r["vec_id"] in cids}
    assert own == {c: c for c in cids}
    # assignment is a scan-side projection: no Exchange anywhere
    assert "Exchange" not in _plan(assigned)


def test_ivf_topk_subset_of_probed_cluster(spark, sf_dir):
    emb, cents = _centroids(spark, sf_dir)
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    out = ivf_topk(emb, "vec_id", "embedding", q, cents, k=5, nprobe=1).collect()
    assert 0 < len(out) <= 5
    assert len({r["cluster_id"] for r in out}) == 1
    sims = [r["cos_sim"] for r in out]
    assert sims == sorted(sims, reverse=True)
    # vec_id=0 is its own nearest neighbor with cos 1.0
    assert out[0]["vec_id"] == 0 and abs(out[0]["cos_sim"] - 1.0) < 1e-9


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    from etl_deltalake_spark.operators.similarity import cosine_topk

    emb, cents = _centroids(spark, sf_dir)
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    brute = [
        (r["vec_id"], r["cos_sim"])
        for r in cosine_topk(emb, "vec_id", "embedding", q, k=10).collect()
    ]
    full_probe = [
        (r["vec_id"], r["cos_sim"])
        for r in ivf_topk(
            emb, "vec_id", "embedding", q, cents, k=10, nprobe=len(cents)
        ).collect()
    ]
    # probing every cluster IS exhaustive search
    assert full_probe == brute
