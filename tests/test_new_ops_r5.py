"""Round-5 operator gates: persisted IVF+PQ index (partition-pruned
plan), ANN recall grading. The oracle comparisons for the new
queries ride tests/test_retired_queries.py via the SLOTLESS registry;
this file carries the plan-shape and equivalence assertions."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_deltalake_spark.operators.partitioning import files_touched
from etl_deltalake_spark.plans import queries_ext as qx


def test_ivfpq_index_partition_pruning(spark, sf_dir):
    """A pretrained-index query must touch ONLY the probed clusters'
    partition directories: files_touched(pruned) < files_touched(full
    index), and the probed cluster count matches nprobe."""
    path = qx._ivfpq_index_path(spark, sf_dir)
    full = spark.read.parquet(path)
    total_files = files_touched(full)
    n_clusters = full.select("cluster_id").distinct().count()
    assert n_clusters > 3, "fixture must have more clusters than nprobe"

    from etl_deltalake_spark.operators.similarity import _cos_py

    qv = qx._query_vec(spark, sf_dir)
    cents = qx._ivf_centroids(spark, sf_dir)
    probed = sorted(cents, key=lambda c: (-_cos_py(qv, c[1]), c[0]))[:3]
    pruned = full.filter(
        F.col("cluster_id").isin([int(c) for c, _ in probed])
    )
    pruned_files = files_touched(pruned)
    assert pruned_files < total_files, (
        f"partition pruning ineffective: {pruned_files}/{total_files} files"
    )
    # directory-level pruning shows up as PartitionFilters in the scan
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan


def test_ivfpq_pretrained_equals_from_scratch(spark, sf_dir):
    """The persisted layout only moves assignment+encode to ingest:
    query results must be bit-identical to the from-scratch
    composition at the same nprobe/k."""
    from etl_deltalake_spark.operators.similarity import ivfpq_topk

    emb = qx.load_table(spark, "embeddings", sf_dir)
    fresh = ivfpq_topk(
        emb,
        "vec_id",
        "embedding",
        qx._query_vec(spark, sf_dir),
        qx._ivf_centroids(spark, sf_dir),
        qx._pq_books(spark, sf_dir),
        k=10,
        nprobe=3,
    )
    pre = qx.q_ivfpq_pretrained(spark, sf_dir)
    f_rows = sorted(tuple(r) for r in fresh.collect())
    p_rows = sorted(tuple(r) for r in pre.collect())
    assert f_rows == p_rows


def test_incr_neardup_history_never_recomputed(spark, sf_dir):
    """The incremental probe must consume the persisted store AS-IS:
    the result's executed plan scans the store parquet but contains
    NO scan of the documents table on the history side (batch-side
    text work is pinned behind its localCheckpoint, so any documents
    scan in this plan would be a history recomputation)."""
    df = qx.q_incr_neardup(spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "spark_graft_neardup" in plan, "store scan missing from plan"
    assert "documents" not in plan, "history text rescanned in probe plan"


def test_incr_neardup_semantics(spark, sf_dir):
    """One row per batch doc; exact duplicates of history docs are
    flagged hist_dup (the fixture's duplicate pairs straddle the
    %3 split); kept implies canonical and not hist_dup."""
    rows = qx.q_incr_neardup(spark, sf_dir).collect()
    batch_n = (
        qx.load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") % 3 != 0)
        .count()
    )
    assert len(rows) == batch_n
    assert any(r["hist_dup"] for r in rows), (
        "fixture should have batch docs near-duplicating history"
    )
    for r in rows:
        if r["kept"]:
            assert not r["hist_dup"] and r["cluster"] == r["doc"]


def test_skew_aware_join_splits_hot_key(spark):
    """On a 90%-one-key fixture the dispatcher must choose the salted
    path, the executed plan must join on (key, salt) — splitting the
    hot key across salt_n reducers, asserted via actual partition
    occupancy — and the result must equal the plain join."""
    from etl_deltalake_spark.operators.partitioning import skew_aware_join

    n = 20000
    left = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(1))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.createDataFrame(
        [(1, "hot"), (11, "cold"), (25, "cold2")], "k long, tag string"
    )
    joined, strategy = skew_aware_join(left, right, "k", "k", salt_n=8)
    assert strategy == "salted"
    # the executed join keys on (k, _salt): the salt derivation is in
    # the plan
    assert "xxhash64" in joined._jdf.queryExecution().executedPlan().toString()
    # result equality with the plain join
    plain = left.join(right, "k")
    assert joined.count() == plain.count()
    # condition-form joins keep both key columns; compare on payload
    a = sorted(tuple(r) for r in joined.select("payload", "tag").collect())
    b = sorted(tuple(r) for r in plain.select("payload", "tag").collect())
    assert a == b
    # the hot key really splits across the shuffle key space: its
    # rows carry all salt_n distinct salts, so the (key, salt) hash
    # spreads them over salt_n reducers (AQE coalesces the tiny
    # fixture shuffle back to one partition, so assert the join-key
    # split itself, not post-AQE partition occupancy)
    salts = (
        left.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.struct("k", "payload")), F.lit(8)).cast(
                "int"
            ),
        )
        .filter(F.col("k") == 1)
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts == 8, f"hot key only hashed to {salts}/8 salts"

    # uniform keys → plain path, no salt machinery in the plan
    uniform = spark.range(n).select(
        F.col("id").alias("k"), F.col("id").alias("payload")
    )
    j2, s2 = skew_aware_join(uniform, right, "k", "k", salt_n=8)
    assert s2 == "plain"
    assert "xxhash64" not in j2._jdf.queryExecution().executedPlan().toString()


def test_random_projection_preserves_distances(spark, sf_dir):
    """JL property, empirically pinned: projecting 64→32 dims with
    the ±1 matrix keeps every pairwise squared distance within
    [0.3, 2.5]× of the original and the mean ratio near 1 (measured
    0.44-1.86, mean 0.985 on the fixture — bounds leave margin but
    would catch a broken weight matrix or scaling)."""
    from etl_deltalake_spark.operators.similarity import random_projection

    emb = qx.load_table(spark, "embeddings", sf_dir).filter(
        F.col("vec_id") < 40
    )
    orig = {
        r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()
    }
    proj = {
        r["vec_id"]: list(r["proj"])
        for r in random_projection(
            emb, "vec_id", "embedding", dims=64, out_dim=32
        ).collect()
    }
    ids = sorted(orig)
    ratios = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            do = sum((x - y) ** 2 for x, y in zip(orig[a], orig[b]))
            dp = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
            ratios.append(dp / do)
    assert all(0.3 < r < 2.5 for r in ratios)
    assert 0.85 < sum(ratios) / len(ratios) < 1.15


def test_ann_recall_bounds(spark, sf_dir):
    """Recall rows must be well-formed: one per method, hits ≤ k,
    recall = hits/k, and the exact method would be 1.0 by
    construction (sanity of the formula, not of the index)."""
    rows = {r["method"]: r for r in qx.q_ann_recall(spark, sf_dir).collect()}
    assert set(rows) == {"ivfpq", "lsh_bucket"}
    for r in rows.values():
        assert 0 <= r["n_hits"] <= r["k"]
        assert abs(r["recall"] - r["n_hits"] / r["k"]) < 1e-9


def test_neardup_epochs_match_sequential_replay(spark, sf_dir, tmp_path):
    """Two driven epochs of the streaming near-dup sink must equal a
    sequential batch replay: epoch 0 dedups against an empty store,
    epoch 1 against exactly epoch 0's kept docs."""
    from etl_deltalake_spark.operators.dedup import (
        incremental_neardup,
        minhash_store,
    )
    from etl_deltalake_spark.streaming.pipeline import neardup_epoch

    docs = qx.load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") < 100
    ).select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") < 50)
    b2 = docs.filter(F.col("doc_id") >= 50)
    store_dir = str(tmp_path / "store")
    out_dir = str(tmp_path / "out")
    neardup_epoch(b1, 0, "doc_id", "text", store_dir, out_dir)
    neardup_epoch(b2, 1, "doc_id", "text", store_dir, out_dir)

    out = spark.read.parquet(out_dir)
    got_e0 = {
        (r["doc"], r["hist_dup"], r["cluster"], r["kept"])
        for r in out.filter(F.col("epoch") == 0).collect()
    }
    got_e1 = {
        (r["doc"], r["hist_dup"], r["cluster"], r["kept"])
        for r in out.filter(F.col("epoch") == 1).collect()
    }

    empty = spark.createDataFrame(
        [], "doc long, sig array<string>, band_idx long, band_hash string"
    )
    ref_v1 = incremental_neardup(b1, empty, "doc_id", "text")
    want_e0 = {
        (r["doc"], r["hist_dup"], r["cluster"], r["kept"])
        for r in ref_v1.collect()
    }
    kept1 = ref_v1.filter(F.col("kept")).select("doc")
    store1 = minhash_store(b1, "doc_id", "text").join(kept1, "doc")
    want_e1 = {
        (r["doc"], r["hist_dup"], r["cluster"], r["kept"])
        for r in incremental_neardup(b2, store1, "doc_id", "text").collect()
    }
    assert got_e0 == want_e0
    assert got_e1 == want_e1
    # store holds exactly the kept docs' band rows (4 bands each)
    n_kept = len([1 for *_, k in got_e0 | got_e1 if k])
    assert spark.read.parquet(store_dir).count() == 4 * n_kept


def test_neardup_stream_end_to_end(spark, sf_dir, tmp_path):
    """The real readStream → foreachBatch path runs and emits one
    verdict per input document."""
    from etl_deltalake_spark.streaming.pipeline import (
        neardup_maintenance_stream,
    )

    docs = qx.load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") < 60
    ).select("doc_id", "text")
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )
    neardup_maintenance_stream(
        stream,
        "doc_id",
        "text",
        str(tmp_path / "store"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 60
    assert out.filter(F.col("kept")).count() >= 1


def test_bucketed_store_probe_skips_store_shuffle(spark, sf_dir, tmp_path):
    """With the store bucketed on the probe's join key
    (band_idx, band_hash), the incremental probe shuffles only the
    batch side: the executed plan scans the store with its bucket
    spec AND no Exchange sits above the store scan — asserted as a
    tree property (ancestor walk), not a substring; the round-5
    single-key bucketing passed the substring check while still
    shuffling the store."""
    from etl_deltalake_spark.operators.dedup import (
        minhash_store,
        write_minhash_store_bucketed,
    )

    docs = qx.load_table(spark, "documents", sf_dir)
    hist = docs.filter(F.col("doc_id") % 3 == 0)
    rows = minhash_store(hist, "doc_id", "text")
    tbl = "neardup_store_bucketed_t"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_minhash_store_bucketed(rows, tbl, str(tmp_path / "store_b"))
    store = spark.table(tbl)

    batch = docs.filter(F.col("doc_id") % 3 != 0)
    from etl_deltalake_spark.operators.dedup import incremental_neardup
    from etl_deltalake_spark.plans.inspect import (
        bucketed_scan_exchange_audit,
    )

    # Force sort-merge so the probe exercises the bucket spec — at
    # test scale the batch side broadcasts and bucketing is moot; at
    # 100 TB neither side broadcasts and co-location is the claim.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = incremental_neardup(batch, store, "doc_id", "text")
        n = out.count()
        assert n == batch.count()
        audit = bucketed_scan_exchange_audit(out)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert audit["bucketed_scans"] >= 1, "store not read with bucket spec"
    assert audit["shuffled_bucketed_scans"] == 0, (
        f"bucketed store scan feeds its join through an Exchange — "
        f"the bucketing buys nothing: {audit}"
    )
    # verdicts equal the plain-parquet-store run
    plain = spark.read.parquet(qx._neardup_store_path(spark, sf_dir))
    ref = incremental_neardup(batch, plain, "doc_id", "text")
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in ref.collect())
    assert a == b
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_minhash_store_rejects_indivisible_bands(spark, sf_dir):
    """num_perm % bands != 0 would silently drop trailing MinHash
    components from every band hash while the stored signature still
    carries them — the banding math assumes equal slices, so the
    constructor must refuse."""
    import pytest

    from etl_deltalake_spark.operators.dedup import minhash_store

    docs = qx.load_table(spark, "documents", sf_dir)
    with pytest.raises(ValueError, match="divisible"):
        minhash_store(docs, "doc_id", "text", num_perm=10, bands=4)
