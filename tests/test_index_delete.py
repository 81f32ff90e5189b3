"""Deletes propagate into the ANN serving layouts (round 14, VERDICT
r13 #4): ``similarity.delete_from_ivfpq_index`` rewrites ONLY the
cluster partitions containing deleted ids — the REORG-PURGE pattern
applied to the index — so a base-table right-to-be-forgotten pass
reaches vector serving. Contracts pinned here:

- post-delete index is BIT-EQUAL to a from-scratch rebuild over the
  filtered base (same frozen centroids/codebooks);
- untouched cluster directories keep their exact file identity;
- a fully-emptied cluster's directory is removed;
- the same remove path prunes the SemDeDup kept-vector store, and
  incremental dedup against the pruned store equals dedup against a
  store built from the filtered history.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_deltalake_spark.operators.similarity import (
    append_to_ivfpq_index,
    build_ivfpq_index,
    delete_from_ivfpq_index,
    incremental_semantic_dedup,
    ivf_assign_df,
    ivfpq_pretrained_topk,
    pq_train,
)
from etl_deltalake_spark.sources.catalog import load_table


def _centroids(spark, sf_dir, step=50):
    rows = (
        load_table(spark, "embeddings", sf_dir)
        .filter(F.col("vec_id") % step == 0)
        .select("vec_id", "embedding")
        .collect()
    )
    return [(int(r.vec_id), [float(x) for x in r.embedding]) for r in rows]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _files(root):
    out = {}
    for d in os.listdir(root):
        p = os.path.join(root, d)
        if d.startswith("cluster_id=") and os.path.isdir(p):
            out[d] = sorted(
                n for n in os.listdir(p) if n.endswith(".parquet")
            )
    return out


def test_index_delete_equals_rebuild(spark, sf_dir, tmp_path):
    emb = load_table(spark, "embeddings", sf_dir)
    cents = _centroids(spark, sf_dir)
    books = pq_train(emb, "vec_id", "embedding", dims=64, m=2, ksub=4)
    path = str(tmp_path / "idx")
    build_ivfpq_index(emb, "vec_id", "embedding", cents, books, path)

    before = _files(path)
    assigned = ivf_assign_df(emb, "vec_id", "embedding", cents)
    # delete every id in ONE cluster (directory must vanish) plus a
    # few ids from another (partial rewrite); the rest stay untouched
    by_cluster = {
        r["cluster_id"]: r["n"]
        for r in assigned.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    wipe_cid = min(by_cluster)
    other_cid = max(by_cluster)
    assert wipe_cid != other_cid
    wiped_ids = [
        r[0]
        for r in assigned.filter(F.col("cluster_id") == wipe_cid)
        .select("vec_id")
        .collect()
    ]
    partial_ids = [
        r[0]
        for r in assigned.filter(F.col("cluster_id") == other_cid)
        .select("vec_id")
        .limit(2)
        .collect()
    ]
    doomed = wiped_ids + partial_ids

    n = delete_from_ivfpq_index(spark, path, "vec_id", doomed)
    assert n == len(doomed)

    # bit-equal to a from-scratch rebuild over the filtered base
    rebuilt = str(tmp_path / "rebuilt")
    build_ivfpq_index(
        emb.filter(~F.col("vec_id").isin(doomed)),
        "vec_id",
        "embedding",
        cents,
        books,
        rebuilt,
    )
    got = spark.read.parquet(path)
    want = spark.read.parquet(rebuilt)
    assert sorted(got.columns) == sorted(want.columns)
    cols = sorted(got.columns)
    assert _rows(got.select(cols)) == _rows(want.select(cols))

    after = _files(path)
    # the fully-emptied cluster's directory is GONE
    assert f"cluster_id={wipe_cid}" not in after
    # the partially-hit cluster was rewritten
    assert after[f"cluster_id={other_cid}"] != before[
        f"cluster_id={other_cid}"
    ]
    # every untouched cluster keeps its exact file identity
    for d, names in before.items():
        if d not in (f"cluster_id={wipe_cid}", f"cluster_id={other_cid}"):
            assert after[d] == names

    # serving over the pruned index == serving over the rebuild
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 1)
        .select("embedding")
        .collect()[0][0]
    ]
    s1 = ivfpq_pretrained_topk(
        spark, path, "vec_id", qv, cents, books, k=5, nprobe=2
    )
    s2 = ivfpq_pretrained_topk(
        spark, rebuilt, "vec_id", qv, cents, books, k=5, nprobe=2
    )
    assert _rows(s1) == _rows(s2)

    # deleting ids that are not present is a no-op
    assert delete_from_ivfpq_index(
        spark, path, "vec_id", [10**9, 10**9 + 1]
    ) == 0
    assert _files(path) == after


def test_index_delete_accepts_dataframe_and_composes_with_append(
    spark, sf_dir, tmp_path
):
    emb = load_table(spark, "embeddings", sf_dir)
    cents = _centroids(spark, sf_dir)
    books = pq_train(emb, "vec_id", "embedding", dims=64, m=2, ksub=4)
    path = str(tmp_path / "idx2")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    build_ivfpq_index(half, "vec_id", "embedding", cents, books, path)
    append_to_ivfpq_index(
        emb.filter(F.col("vec_id") % 2 == 1),
        "vec_id",
        "embedding",
        cents,
        books,
        path,
    )
    doomed_df = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    n_doomed = doomed_df.count()
    assert (
        delete_from_ivfpq_index(spark, path, "vec_id", doomed_df)
        == n_doomed
    )
    rebuilt = str(tmp_path / "rebuilt2")
    build_ivfpq_index(
        emb.filter(F.col("vec_id") % 7 != 3),
        "vec_id",
        "embedding",
        cents,
        books,
        rebuilt,
    )
    got = spark.read.parquet(path)
    want = spark.read.parquet(rebuilt)
    cols = sorted(got.columns)
    assert _rows(got.select(cols)) == _rows(want.select(cols))


def test_semdedup_store_delete_reaches_incremental_dedup(
    spark, sf_dir, tmp_path
):
    """The kept-vector store shares the cluster-partitioned layout —
    the SAME remove path prunes it, and the pruned store is
    indistinguishable (bit-equal verdicts) from one built over the
    filtered history."""
    emb = load_table(spark, "embeddings", sf_dir)
    cents = _centroids(spark, sf_dir)
    store_path = str(tmp_path / "store")
    hist = emb.filter(F.col("vec_id") % 2 == 0)
    ivf_assign_df(hist, "vec_id", "embedding", cents).select(
        "vec_id", "cluster_id", "embedding"
    ).write.partitionBy("cluster_id").parquet(store_path)

    doomed = [r[0] for r in hist.select("vec_id").limit(3).collect()]
    assert (
        delete_from_ivfpq_index(spark, store_path, "vec_id", doomed)
        == 3
    )
    pruned_store = spark.read.parquet(store_path).select(
        "vec_id", "cluster_id", "embedding"
    )
    fresh_store = ivf_assign_df(
        hist.filter(~F.col("vec_id").isin(doomed)),
        "vec_id",
        "embedding",
        cents,
    ).select("vec_id", "cluster_id", "embedding")
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    v1, _ = incremental_semantic_dedup(
        batch, "vec_id", "embedding", cents, store=pruned_store, tau=0.3
    )
    v2, _ = incremental_semantic_dedup(
        batch, "vec_id", "embedding", cents, store=fresh_store, tau=0.3
    )
    assert _rows(v1) == _rows(v2)
