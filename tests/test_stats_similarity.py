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


def test_bucketed_near_dup_subset_of_exact_with_recall(spark, sf_dir):
    """LSH-bucketed near-dup pairs must be a SUBSET of the exact
    all-pairs result with identical cos_sim values (exact verify →
    precision 1.0), non-empty at fixture scale, and candidate
    generation must be an equi-join (no nested-loop product)."""
    from etl_deltalake_spark.operators.similarity import (
        bucketed_near_dup_pairs,
        cosine_near_dup_pairs,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    dims = len(emb.select("embedding").head()["embedding"])
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in cosine_near_dup_pairs(emb, "vec_id", "embedding", 0.42).collect()
    }
    bucketed_df = bucketed_near_dup_pairs(
        emb, "vec_id", "embedding", 0.42, dims=dims, planes=4, tables=3
    )
    bucketed = {
        (r["id_a"], r["id_b"]): r["cos_sim"] for r in bucketed_df.collect()
    }
    assert bucketed, "bucketed path found no pairs at fixture scale"
    assert set(bucketed) <= set(exact)
    for pair, sim in bucketed.items():
        assert sim == exact[pair]
    plan = _plan(bucketed_df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bucketed_near_dup_wrong_dims_fails_loudly(spark, sf_dir):
    """A wrong dims must raise at execution, not silently hash every
    vector into one bucket (which restores the quadratic join with
    correct-looking output)."""
    import pytest

    from etl_deltalake_spark.operators.similarity import bucketed_near_dup_pairs

    emb = load_table(spark, "embeddings", sf_dir)
    wrong = bucketed_near_dup_pairs(
        emb, "vec_id", "embedding", 0.42, dims=128, planes=2, tables=1
    )
    with pytest.raises(Exception, match="dims=128 != vector length"):
        wrong.collect()


def test_blocked_fuzzy_keeps_cross_length_pairs(spark):
    """Adjacent-band expansion: pairs whose lengths straddle a band
    boundary (7 vs 9 chars → bands 0 and 1 at band_size=8) must
    still be compared; first-char blocking is the only recall cut."""
    from etl_deltalake_spark.operators.relational import blocked_fuzzy_pairs

    import pytest

    df = spark.createDataFrame(
        [("alphabe",), ("alphabets",), ("alpha_x_y",), ("beta",)], ["name"]
    )
    got = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in blocked_fuzzy_pairs(df, "name", max_dist=5, band_size=8).collect()
    }
    # len 7 vs len 9, dist 2 — found despite different length bands
    assert got[("alphabe", "alphabets")] == 2
    # same first char, len 9 vs 9, within 5
    assert ("alpha_x_y", "alphabets") in got
    # 'beta' pairs blocked away by first char (dist to others > 5 anyway)
    assert not any("beta" in p for pair in got for p in pair)
    with pytest.raises(ValueError, match="band_size"):
        blocked_fuzzy_pairs(df, "name", max_dist=8, band_size=8)


def test_jaccard_df_cap_drops_only_candidates(spark):
    """The document-frequency cap prunes CANDIDATE generation; for
    surviving pairs the Jaccard value stays exact (full-set verify)."""
    from etl_deltalake_spark.operators.dedup import jaccard_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),
        (3, "omega psi chi phi upsilon"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.3, max_df=None).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.3, max_df=50).collect()
    }
    assert uncapped == capped  # cap is a no-op when no shingle is hot
    assert (1, 2) in capped and (1, 3) not in capped
    # max_df=1 drops every shared shingle → no candidates at all
    assert (
        jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.3, max_df=1).count() == 0
    )


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


def test_mad_outliers_robustness(spark):
    """One wild value must not move the median/MAD materially, and
    must be the single flagged outlier."""
    from etl_deltalake_spark.operators.stats import mad_outliers

    rows = [("g", float(v)) for v in [10, 11, 12, 13, 14, 15, 16]] + [
        ("g", 10000.0)
    ]
    df = spark.createDataFrame(rows, ["grp", "x"])
    out = mad_outliers(df, ["grp"], "x", threshold=3.0).collect()[0]
    assert out["n"] == 8
    assert 12.0 <= out["med"] <= 14.0
    assert out["mad"] <= 3.0
    assert out["n_outliers"] == 1


def test_semantic_dedup_drops_true_duplicates(spark):
    """SemDeDup behavior with REAL duplicates (the fixture embeddings
    are near-orthogonal, so the drop path needs synthetic dupes):
    exact-copy and tiny-perturbation vectors drop against their
    min-id representative at tau=0.95; orthogonal vectors survive;
    cross-cluster lookalikes are invisible by design."""
    from etl_deltalake_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_pairs,
    )

    d = 8
    base = [1.0, 0.5, -0.25, 2.0, 0.0, 1.5, -1.0, 0.75]
    near = [x * 1.001 + (0.0001 if i == 0 else 0.0) for i, x in enumerate(base)]
    ortho = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 3.0]
    anti = [-x for x in base]
    rows = [(10, base), (11, base), (12, near), (20, ortho), (30, anti)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # two centroids: one aligned with base, one with ortho — anti
    # lands wherever its argmax says (cosine with base-centroid = -1,
    # with ortho-centroid = 0 → joins the ortho cluster)
    cents = [(0, base), (1, ortho)]
    verdicts = {
        r["vec_id"]: r
        for r in semantic_dedup(
            df, "vec_id", "embedding", cents, tau=0.95
        ).collect()
    }
    assert verdicts[10]["keep"] is True  # min-id representative
    assert verdicts[11]["keep"] is False and verdicts[11]["dup_of"] == 10
    assert verdicts[12]["keep"] is False and verdicts[12]["dup_of"] == 10
    assert verdicts[20]["keep"] is True
    assert verdicts[30]["keep"] is True  # anti-parallel: cosine -1
    pairs = semantic_dedup_pairs(
        df, "vec_id", "embedding", cents, tau=0.95
    ).collect()
    assert {(p["doc_a"], p["doc_b"]) for p in pairs} == {
        (11, 10), (12, 10), (12, 11),
    }


def test_incremental_semantic_dedup_behavior(spark):
    """Incremental SemDeDup with REAL duplicates at production tau
    (round 10): a batch vector near a STORE vector drops against the
    store id; a batch-internal duplicate drops against the smaller
    batch id; unique vectors survive and join the returned store;
    the store itself is never re-deduped; and a second increment
    against the grown store catches a duplicate of a vector kept in
    the FIRST increment."""
    from etl_deltalake_spark.operators.similarity import (
        incremental_semantic_dedup,
        ivf_assign_df,
    )

    base = [1.0, 0.5, -0.25, 2.0, 0.0, 1.5, -1.0, 0.75]
    near = [x * 1.001 + (0.0001 if i == 0 else 0.0) for i, x in enumerate(base)]
    ortho = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 3.0]
    ortho2 = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.001, 2.9]
    cents = [(0, base), (1, ortho)]

    store = ivf_assign_df(
        spark.createDataFrame(
            [(1, base)], "vec_id long, embedding array<double>"
        ),
        "vec_id",
        "embedding",
        cents,
    ).select("vec_id", "cluster_id", "embedding")

    batch = spark.createDataFrame(
        [(10, near), (20, ortho), (21, ortho2), (30, [0.0] * 7 + [-5.0])],
        "vec_id long, embedding array<double>",
    )
    verdicts, store2 = incremental_semantic_dedup(
        batch, "vec_id", "embedding", cents, store=store, tau=0.95
    )
    v = {r["vec_id"]: r for r in verdicts.collect()}
    assert v[10]["keep"] is False and v[10]["dup_of"] == 1  # vs store
    assert v[20]["keep"] is True
    assert v[21]["keep"] is False and v[21]["dup_of"] == 20  # in-batch
    assert v[30]["keep"] is True  # anti-parallel to ortho: cosine -1
    kept_ids = {r["vec_id"] for r in store2.collect()}
    assert kept_ids == {1, 20, 30}  # store grew by exactly the kept

    # second increment: a duplicate of first-increment survivor 20
    batch2 = spark.createDataFrame(
        [(40, [x * 1.0005 for x in ortho])],
        "vec_id long, embedding array<double>",
    )
    verdicts2, store3 = incremental_semantic_dedup(
        batch2, "vec_id", "embedding", cents, store=store2, tau=0.95
    )
    v2 = {r["vec_id"]: r for r in verdicts2.collect()}
    assert v2[40]["keep"] is False and v2[40]["dup_of"] == 20
    assert {r["vec_id"] for r in store3.collect()} == {1, 20, 30}

    # cold start (no store): pure batch-internal min-id rule
    verdicts0, store0 = incremental_semantic_dedup(
        batch, "vec_id", "embedding", cents, store=None, tau=0.95
    )
    v0 = {r["vec_id"]: r for r in verdicts0.collect()}
    assert v0[10]["keep"] is True  # nothing before it now
    assert v0[21]["dup_of"] == 20
    assert {r["vec_id"] for r in store0.collect()} == {10, 20, 30}
