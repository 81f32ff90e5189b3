"""Round-8 gates: bucketed near-dup store GROWTH (append a second
batch's bands, probe the grown store co-located), and the
bucketed_scan_exchange_audit in_join fix — join-less bucketed scans
under an Exchange must never be flagged, while a genuinely
mis-bucketed join must still be detected."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_deltalake_spark.operators.dedup import (
    incremental_neardup,
    minhash_store,
    write_minhash_store_bucketed,
)
from etl_deltalake_spark.plans import queries_ext as qx
from etl_deltalake_spark.plans.inspect import bucketed_scan_exchange_audit


def test_bucketed_store_growth_probe_stays_colocated(spark, sf_dir, tmp_path):
    """The amortization claim is about repeated probes against a
    GROWING store: write the initial store bucketed, APPEND a second
    batch's band rows (saveAsTable append keeps the bucket spec),
    then probe a third batch — the executed plan must still read the
    grown store with its bucket spec and zero Exchanges between the
    store scan and the probe join, and the verdicts must equal a
    plain-parquet run over the unioned store."""
    docs = qx.load_table(spark, "documents", sf_dir)
    hist = docs.filter(F.col("doc_id") % 3 == 0)
    batch1 = docs.filter(F.col("doc_id") % 3 == 1)
    batch2 = docs.filter(F.col("doc_id") % 3 == 2)

    tbl = "neardup_store_growth_t"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    path = str(tmp_path / "store_g")
    rows0 = minhash_store(hist, "doc_id", "text")
    write_minhash_store_bucketed(rows0, tbl, path)
    n0 = spark.table(tbl).count()

    # growth: append batch1's bands into the SAME bucketed table
    rows1 = minhash_store(batch1, "doc_id", "text")
    write_minhash_store_bucketed(rows1, tbl, path, mode="append")
    store = spark.table(tbl)
    assert store.count() == n0 + rows1.count(), "append lost rows"

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = incremental_neardup(batch2, store, "doc_id", "text")
        assert out.count() == batch2.count()
        audit = bucketed_scan_exchange_audit(out)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert audit["bucketed_scans"] >= 1, "grown store not read with bucket spec"
    assert audit["shuffled_bucketed_scans"] == 0, (
        f"appended store scan feeds its join through an Exchange — "
        f"growth broke co-location: {audit}"
    )

    # semantics: identical to probing the plain unioned store
    ref_store = rows0.unionByName(rows1)
    ref = incremental_neardup(batch2, ref_store, "doc_id", "text")
    assert sorted(tuple(r) for r in out.collect()) == sorted(
        tuple(r) for r in ref.collect()
    )
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_joinless_bucketed_scan_not_flagged(spark, sf_dir, tmp_path):
    """A bucketed scan with no enclosing join must never count as
    shuffled, even when an Exchange sits above it (groupBy re-keying
    on a non-bucket column) — the audit grades join co-location,
    nothing else. Before the round-8 in_join fix this false-flagged."""
    docs = qx.load_table(spark, "documents", sf_dir)
    rows = minhash_store(docs.filter(F.col("doc_id") < 120), "doc_id", "text")
    tbl = "neardup_store_joinless_t"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_minhash_store_bucketed(rows, tbl, str(tmp_path / "store_j"))

    # aggregate on doc (NOT a bucket key) → Exchange above the scan.
    # autoBucketedScan would drop the useless bucket spec from the
    # plan entirely; pin it on so the scan carries the spec and the
    # pre-fix audit would have flagged it.
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        # read BOTH bucket columns (else pruning drops the bucket
        # spec: "bucket column(s) not read") but GROUP on a
        # non-bucket key so an Exchange sits above the bucketed scan
        agg = spark.table(tbl).groupBy("doc").agg(
            F.countDistinct("band_idx", "band_hash").alias("n")
        )
        agg.count()
        audit = bucketed_scan_exchange_audit(agg)
    finally:
        spark.conf.set(key, prev)
    assert audit["bucketed_scans"] >= 1
    assert audit["shuffled_bucketed_scans"] == 0, audit
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_mis_bucketed_join_still_detected(spark, sf_dir, tmp_path):
    """The in_join fix must not blunt the audit's real purpose: a
    store bucketed on band_hash ALONE (the round-5 defect — bucket
    keys ⊂ join keys) joined on (band_idx, band_hash) is NOT
    co-partitioned and must be reported as shuffled."""
    docs = qx.load_table(spark, "documents", sf_dir)
    rows = minhash_store(docs.filter(F.col("doc_id") % 3 == 0), "doc_id", "text")
    tbl = "neardup_store_badspec_t"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        rows.write.mode("overwrite")
        .option("path", str(tmp_path / "store_bad"))
        .bucketBy(16, "band_hash")  # partial key: the round-5 defect
        .saveAsTable(tbl)
    )
    store = spark.table(tbl)
    batch = docs.filter(F.col("doc_id") % 3 != 0)

    # pin autoBucketedScan off: with a useless (partial-key) spec
    # Spark would otherwise read the table as plain files and the
    # scan would not carry the spec at all — the audit must see a
    # bucketed scan that IS shuffled into its join
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev_abs = spark.conf.get(key)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(key, "false")
    try:
        out = incremental_neardup(batch, store, "doc_id", "text")
        out.count()
        audit = bucketed_scan_exchange_audit(out)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set(key, prev_abs)
    assert audit["bucketed_scans"] >= 1
    assert audit["shuffled_bucketed_scans"] >= 1, (
        f"partial-key bucketing should shuffle but audit saw none: {audit}"
    )
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_streaming_neardup_bucketed_store_growth(spark, sf_dir, tmp_path):
    """The streaming maintenance path with store_table: two epochs
    (maxFilesPerTrigger=1 over two source files) create-then-append
    the BUCKETED store; verdicts equal the plain parquet-store run
    epoch for epoch, and a post-stream probe of the grown table still
    enters its join with zero store-side Exchanges."""
    from etl_deltalake_spark.streaming.pipeline import (
        neardup_maintenance_stream,
    )

    docs = qx.load_table(spark, "documents", sf_dir).select("doc_id", "text")
    src = str(tmp_path / "src")
    docs.filter(F.col("doc_id") % 2 == 0).limit(40).write.parquet(
        src + "/a.parquet"
    )
    docs.filter(F.col("doc_id") % 2 == 1).limit(40).write.parquet(
        src + "/b.parquet"
    )

    tbl = "neardup_stream_bucketed_t"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")

    def run(out_name, ckpt_name, store_name, store_table):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        neardup_maintenance_stream(
            stream,
            "doc_id",
            "text",
            str(tmp_path / store_name),
            str(tmp_path / out_name),
            str(tmp_path / ckpt_name),
            store_table=store_table,
        )
        return spark.read.parquet(str(tmp_path / out_name))

    out_b = run("out_b", "ck_b", "store_b", tbl)
    out_p = run("out_p", "ck_p", "store_p", None)

    # more than one epoch actually ran, and verdicts agree exactly
    assert out_b.select("epoch").distinct().count() >= 2
    key = lambda df: sorted(
        (r["doc"], r["kept"], r["hist_dup"]) for r in df.collect()
    )
    assert key(out_b) == key(out_p)

    # the grown bucketed table serves a co-located probe
    store = spark.table(tbl)
    assert store.count() > 0
    probe = qx.load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") >= 900
    ).limit(30)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = incremental_neardup(probe, store, "doc_id", "text")
        out.count()
        audit = bucketed_scan_exchange_audit(out)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert audit["bucketed_scans"] >= 1
    assert audit["shuffled_bucketed_scans"] == 0, audit
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_hamming_near_pairs_equals_brute_force(spark):
    """Banded mining must equal brute force exactly (pigeonhole is a
    theorem): random 64-bit hashes plus planted near-pairs, checked
    at several distances and band counts."""
    import random

    from etl_deltalake_spark.operators.dedup import hamming_near_pairs

    rng = random.Random(13)

    def sgn(h):
        return h - (1 << 64) if h >= 1 << 63 else h

    hashes = {i: rng.getrandbits(64) for i in range(40)}
    # plant near-pairs at known distances
    hashes[100] = hashes[0] ^ 0b1
    hashes[101] = hashes[0] ^ (0b111 << 20)
    hashes[102] = hashes[1] ^ ((1 << 63) | 1)  # touches the sign bit
    rows = [(i, sgn(h)) for i, h in hashes.items()]
    df = spark.createDataFrame(rows, "doc_id long, fp long")

    def brute(max_dist):
        out = set()
        ids = sorted(hashes)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                d = bin(hashes[a] ^ hashes[b]).count("1")
                if d <= max_dist:
                    out.add((a, b, d))
        return out

    for max_dist, bands in ((1, None), (3, None), (4, 8), (10, 16)):
        got = {
            (r["doc_a"], r["doc_b"], r["dist"])
            for r in hamming_near_pairs(
                df, "doc_id", "fp", max_dist=max_dist, bands=bands
            ).collect()
        }
        assert got == brute(max_dist), (max_dist, bands)


def test_hamming_near_pairs_validation(spark):
    import pytest

    from etl_deltalake_spark.operators.dedup import hamming_near_pairs

    df = spark.createDataFrame([(1, 0)], "doc_id long, fp long")
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_near_pairs(df, "doc_id", "fp", max_dist=4, bands=3)
    with pytest.raises(ValueError, match="max_dist"):
        hamming_near_pairs(df, "doc_id", "fp", max_dist=64)


def test_hamming_near_pairs_composes_with_image_hashes(spark):
    """The miner consumes image_ahash output directly: two images
    differing in one 8x8 cell's side of the mean are a distance-1
    pair; an unrelated image joins nothing."""
    from etl_deltalake_spark.operators.dedup import hamming_near_pairs
    from etl_deltalake_spark.operators.multimodal import image_ahash
    from etl_deltalake_spark.operators.png import encode_png

    # 8x8 gray: half dark, half bright -> crisp bits; flip ONE cell
    base = bytes([40] * 32 + [200] * 32)
    flipped = bytes([40] * 31 + [200] + [200] * 32)  # cell 31 crosses
    other = bytes((k * 37) % 256 for k in range(64))
    df = spark.createDataFrame(
        [
            (1, encode_png(base, 8, 8, 0, "cycle")),
            (2, encode_png(flipped, 8, 8, 0, "cycle")),
            (3, encode_png(other, 8, 8, 0, "cycle")),
        ],
        ["doc_id", "payload"],
    )
    hashes = image_ahash(df, "doc_id", "payload").select(
        "doc_id", "ahash"
    )
    pairs = hamming_near_pairs(hashes, "doc_id", "ahash", max_dist=2)
    got = [(r["doc_a"], r["doc_b"], r["dist"]) for r in pairs.collect()]
    assert got == [(1, 2, 1)]


# ---- scalar quantization (round 8, fourth wave) ----


def test_sq_array_layout_matches_long_layout(spark, sf_dir):
    """The compact codes-array form must agree elementwise with the
    oracle-graded long form — same rule, two layouts."""
    from etl_deltalake_spark.operators.similarity import (
        sq_calibrate,
        sq_quantize,
        sq_quantize_long,
    )

    emb = qx.load_table(spark, "embeddings", sf_dir).limit(100)
    stats = sq_calibrate(emb, "embedding")
    long_rows = {
        (r["vec_id"], r["dim"]): r["code"]
        for r in sq_quantize_long(emb, "vec_id", "embedding", stats).collect()
    }
    stats_rows = [
        (r["dim"], r["mn"], r["mx"]) for r in stats.collect()
    ]
    for r in sq_quantize(emb, "vec_id", "embedding", stats_rows).collect():
        for d, c in enumerate(r["codes"]):
            assert long_rows[(r["vec_id"], d)] == c


def test_sq_error_bound_and_degenerate_dim(spark):
    """Dequantization error is bounded by half a grid step; a
    constant dimension quantizes to code 0 with exact recon."""
    from etl_deltalake_spark.operators.similarity import (
        sq_calibrate,
        sq_quantize_long,
    )
    from pyspark.sql import Row

    rows = [
        Row(vec_id=i, embedding=[float(i) / 7.0, 42.0, -1.0 + 2.0 * i / 9.0])
        for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    stats = sq_calibrate(df, "embedding")
    out = sq_quantize_long(df, "vec_id", "embedding", stats).collect()
    vals = {
        (r["vec_id"], d): v
        for r in rows
        for d, v in enumerate(r.embedding)
    }
    spans = {r["dim"]: r["mx"] - r["mn"] for r in stats.collect()}
    for r in out:
        v = vals[(r["vec_id"], r["dim"])]
        if r["dim"] == 1:  # constant dimension
            assert r["code"] == 0 and r["recon"] == 42.0
        else:
            assert 0 <= r["code"] <= 255
            assert abs(r["recon"] - v) <= spans[r["dim"]] / 255.0 / 2.0 + 1e-9


def test_sq_long_plans_broadcast_join(spark, sf_dir):
    """The dim-stats join must broadcast (dim-count rows) — a
    shuffled sort-merge join here would shuffle the whole exploded
    corpus at 100 TB."""
    from etl_deltalake_spark.operators.similarity import (
        sq_calibrate,
        sq_quantize_long,
    )

    emb = qx.load_table(spark, "embeddings", sf_dir)
    plan = sq_quantize_long(
        emb, "vec_id", "embedding", sq_calibrate(emb, "embedding")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---- z-order data skipping, graded (round 8, fourth wave) ----


def test_zorder_prunes_nonleading_dim_linear_does_not(spark, sf_dir):
    """The graded rows must actually carry the layout story: under
    z-order a y-band predicate touches a strict subset of nonempty
    buckets (pruning on the NON-leading dimension); under linear
    leading-column clustering it touches all of them. On the leading
    dimension linear is at least as tight as z-order — the classic
    trade both layouts' zone maps must exhibit."""
    from etl_deltalake_spark.plans.queries_ext import q_zorder

    rows = q_zorder(spark, sf_dir).collect()
    by = {"zorder": [], "linear": []}
    for r in rows:
        by[r["layout"]].append(r)
    for layout, rs in by.items():
        assert len(rs) > 1, f"{layout}: need multiple nonempty buckets"
    z_touch_y = sum(r["touch_y"] for r in by["zorder"])
    lin_touch_y = sum(r["touch_y"] for r in by["linear"])
    assert lin_touch_y == len(by["linear"])  # linear can't prune on y
    assert z_touch_y < lin_touch_y  # z-order can
    z_touch_x = sum(r["touch_x"] for r in by["zorder"])
    lin_touch_x = sum(r["touch_x"] for r in by["linear"])
    assert lin_touch_x <= z_touch_x  # linear is tightest on leading col
    assert z_touch_x < len(by["zorder"])  # but z-order still prunes x


# ---- incremental IVF+PQ index append (round 8, fourth wave) ----


def _append_fixture(spark, sf_dir, tmp_path_factory=None):
    """Build an index from the vec_id%3!=0 split, then append the
    %3==0 batch with frozen centroids/codebooks. Returns (path,
    centroids, codebooks, files_before_append)."""
    import glob
    import shutil

    from etl_deltalake_spark.operators.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
    )
    from pyspark.sql import functions as F

    cents = qx._ivf_centroids(spark, sf_dir)
    books = qx._pq_books(spark, sf_dir)
    emb = qx.load_table(spark, "embeddings", sf_dir)
    path = "/tmp/spark_graft_ann_append_test/ivfpq"
    shutil.rmtree("/tmp/spark_graft_ann_append_test", ignore_errors=True)
    build_ivfpq_index(
        emb.filter(F.col("vec_id") % 3 != 0), "vec_id", "embedding",
        cents, books, path,
    )
    before = set(glob.glob(f"{path}/cluster_id=*/*.parquet"))
    append_to_ivfpq_index(
        emb.filter(F.col("vec_id") % 3 == 0), "vec_id", "embedding",
        cents, books, path,
    )
    return path, cents, books, before


def test_ivfpq_append_grows_without_rewriting(spark, sf_dir):
    """Append must be strictly additive: every pre-append data file
    survives byte-identical in place (no index rewrite — cost linear
    in the batch), and the grown index holds exactly corpus-many
    rows with no id overlap between builds."""
    import glob

    path, _, _, before = _append_fixture(spark, sf_dir)
    after = set(glob.glob(f"{path}/cluster_id=*/*.parquet"))
    assert before < after, "append added no files or rewrote the layout"
    idx = spark.read.parquet(path)
    total = qx.load_table(spark, "embeddings", sf_dir).count()
    assert idx.count() == total
    assert idx.select("vec_id").distinct().count() == total


def test_ivfpq_append_serving_equals_full_rebuild(spark, sf_dir):
    """Queries over the appended index must be bit-identical to a
    from-scratch ivfpq_topk over the full corpus with the same frozen
    codebooks — the whole point of freezing them."""
    from etl_deltalake_spark.operators.similarity import (
        ivfpq_pretrained_topk,
        ivfpq_topk,
    )

    path, cents, books, _ = _append_fixture(spark, sf_dir)
    qv = qx._query_vec(spark, sf_dir)
    grown = ivfpq_pretrained_topk(
        spark, path, "vec_id", qv, cents, books, k=10, nprobe=3
    )
    emb = qx.load_table(spark, "embeddings", sf_dir)
    fresh = ivfpq_topk(
        emb, "vec_id", "embedding", qv, cents, books, k=10, nprobe=3
    )
    assert sorted(tuple(r) for r in grown.collect()) == sorted(
        tuple(r) for r in fresh.collect()
    )


def test_ivfpq_append_preserves_partition_pruning(spark, sf_dir):
    """Directory-level pruning must survive the append: the pruned
    serving scan touches fewer files than the full index and carries
    cluster_id PartitionFilters."""
    from etl_deltalake_spark.operators.partitioning import files_touched
    from etl_deltalake_spark.operators.similarity import _cos_py
    from pyspark.sql import functions as F

    path, cents, _, _ = _append_fixture(spark, sf_dir)
    full = spark.read.parquet(path)
    qv = qx._query_vec(spark, sf_dir)
    probed = sorted(cents, key=lambda c: (-_cos_py(qv, c[1]), c[0]))[:3]
    pruned = full.filter(F.col("cluster_id").isin([int(c) for c, _ in probed]))
    assert files_touched(pruned) < files_touched(full)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan


# ---- VARIANT semi-structured path (round 8, fourth wave) ----


def test_variant_is_binary_variant_not_string(spark):
    """q_variant's claim is the parse-once BINARY variant path: the
    intermediate must be VariantType (not a string re-parse), and
    try_parse_json must absorb malformed input as NULL."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import VariantType

    df = spark.range(1).select(
        F.parse_json(F.lit('{"a":1}')).alias("v"),
        F.try_parse_json(F.lit('{"a":')).alias("bad"),
    )
    assert isinstance(df.schema["v"].dataType, VariantType)
    row = df.collect()[0]
    assert row["bad"] is None


# ---- KMV mergeable distinct sketch (round 8, fourth wave) ----


def test_kmv_exact_branch_and_union_theorem(spark):
    """Groups with fewer than k distinct items take the exact branch
    (h_k null, est == distinct count); the union row — computed from
    sketch contents only — must equal the sketch computed over the
    pooled data directly, because the k smallest of the per-group
    k-smallest ARE the global k smallest (the KMV merge theorem)."""
    from etl_deltalake_spark.operators.stats import kmv_sketch_est
    from pyspark.sql import functions as F, Row

    rows = [
        Row(g="small", item=i) for i in range(3)
    ] + [
        Row(g="big_a", item=100 + i) for i in range(20)
    ] + [
        Row(g="big_b", item=200 + i) for i in range(20)
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["grp"]: r
        for r in kmv_sketch_est(df, F.col("g"), F.col("item"), k=8).collect()
    }
    small = out["small"]
    assert small["h_k"] is None and small["est"] == 3.0
    for g in ("big_a", "big_b"):
        assert out[g]["h_k"] is not None and out[g]["n_sketch"] == 8
        # 60-bit-uniform estimator: sanity band around truth (20)
        assert 5 < out[g]["est"] < 80
    pooled = kmv_sketch_est(
        df, F.lit("__union__"), F.col("item"), k=8
    ).collect()
    direct = next(r for r in pooled if r["grp"] == "__union__")
    assert out["__union__"]["h_k"] == direct["h_k"]
    assert out["__union__"]["est"] == direct["est"]


# ---- until-fixpoint connected components (round 8, fourth wave) ----


def test_label_propagation_fixpoint_on_deep_chain(spark):
    """A 40-edge path graph has diameter 40 — beyond the K=4 default
    bound. iterations=None must converge to ONE component; the
    bounded default must demonstrably under-converge on it (that is
    what the bound means), pinning that the unbounded mode is the one
    to use when cluster diameter is unknown."""
    from etl_deltalake_spark.operators.dedup import (
        label_propagation_clusters,
    )
    from pyspark.sql import Row

    chain = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1) for i in range(40)]
    )
    full = label_propagation_clusters(chain, iterations=None).collect()
    assert {r["cluster"] for r in full} == {0}
    assert len(full) == 41
    bounded = label_propagation_clusters(chain, iterations=4).collect()
    assert len({r["cluster"] for r in bounded}) > 1


# ---- entity resolution end-to-end (round 8, fourth wave) ----


def test_entity_match_semantics(spark, sf_dir):
    """The composition's load-bearing behaviors: (a) the %5 'Anon#'
    impostor shares a block but must NOT merge — both records stay
    singletons; (b) a variant's null phone must not erase the
    original's known phone (survivorship, not keep-latest); (c)
    merged clusters carry n_recs=2 and the variant's non-null fields
    win by recency."""
    from etl_deltalake_spark.plans.queries_ext import q_entity_match

    rows = {r["cluster"]: r for r in q_entity_match(spark, sf_dir).collect()}
    n_cust = qx.load_table(spark, "customer", sf_dir).count()
    singles = [r for r in rows.values() if r["n_recs"] == 1]
    merged = [r for r in rows.values() if r["n_recs"] == 2]
    n_impostor_keys = sum(
        1 for k in range(n_cust) if k % 5 == 0
    )
    assert len(singles) == 2 * n_impostor_keys
    assert len(merged) == n_cust - n_impostor_keys
    for r in merged:
        k = r["cluster"] // 2
        assert r["cluster"] == 2 * k  # min label = original's rec_id
        assert r["name"].endswith(".")  # latest non-null name (variant)
        assert r["last_seen"] == 2
        # survivorship: phone survives from A when B nulled it
        assert r["phone"] == f"555-{k % 10000:04d}"
        assert r["bal"] is not None  # B's null bal must not erase A's


# ---- confusables folding / adversarial dedup (round 8) ----


def test_confusables_strings_pinned_to_oracle(spark):
    """The fold table must be identical in both engines — the oracle
    carries its own literal copy; pin them char-for-char."""
    from etl_deltalake_spark.operators.text import (
        CONFUSABLES_FROM,
        CONFUSABLES_TO,
    )
    from etl_deltalake_spark.plans.oracles import _CONF_FROM, _CONF_TO

    assert CONFUSABLES_FROM == _CONF_FROM
    assert CONFUSABLES_TO == _CONF_TO
    assert len(CONFUSABLES_FROM) == len(CONFUSABLES_TO)
    assert len(set(CONFUSABLES_FROM)) == len(CONFUSABLES_FROM)


def test_homoglyph_shadows_merge_only_after_folding(spark, sf_dir):
    """Every shadow must share a folded fingerprint with its original
    (n_folded >= 2) while pure-ASCII originals' naive and folded
    group sizes agree (folding is identity on unevasive text)."""
    from etl_deltalake_spark.plans.queries_ext import q_homoglyph_dedup

    rows = q_homoglyph_dedup(spark, sf_dir).collect()
    shadows = [r for r in rows if r["is_shadow"] == 1]
    assert shadows, "fixture must produce shadows"
    for r in shadows:
        assert r["n_folded"] >= 2  # merges with its original
    originals = {r["doc_id"]: r for r in rows if r["is_shadow"] == 0}
    for r in shadows:
        orig = originals[r["doc_id"] - 1000000]
        assert orig["n_folded"] >= 2
        # the evasion works against the naive fingerprint: the shadow
        # never lands in its original's naive group
        assert orig["n_naive"] < orig["n_folded"] or (
            # unless the original's text contains no a/e/o at all —
            # then shadow == original byte-for-byte
            r["n_naive"] == orig["n_naive"]
        )


# ---- KMV pairwise Jaccard (round 8, fourth wave) ----


def test_kmv_jaccard_exact_when_sketches_complete(spark):
    """When every group's distinct-item count is <= k the sketches
    hold the full sets, the pooled top-k is the full union, and the
    estimate IS the exact Jaccard — pin that degenerate-exact case,
    plus the estimator band on sets larger than k."""
    from etl_deltalake_spark.operators.stats import kmv_jaccard
    from pyspark.sql import functions as F, Row

    # |A|=20, |B|=20, |A∩B|=10 → J = 10/30
    rows = [Row(g="A", item=i) for i in range(20)] + [
        Row(g="B", item=i) for i in range(10, 30)
    ]
    small = spark.createDataFrame(rows)
    out = kmv_jaccard(small, F.col("g"), F.col("item"), k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["grp_a"], r["grp_b"]) == ("A", "B")
    assert r["k_used"] == 30 and r["n_both"] == 10
    assert r["jacc"] == round(10 / 30, 6)

    # |A|=400, |B|=400, overlap 200 → J = 1/3; k=64 sketches estimate
    big_rows = [Row(g="A", item=i) for i in range(400)] + [
        Row(g="B", item=i) for i in range(200, 600)
    ]
    big = spark.createDataFrame(big_rows)
    est = kmv_jaccard(big, F.col("g"), F.col("item"), k=64).collect()[0]
    assert est["k_used"] == 64
    assert abs(est["jacc"] - 1 / 3) < 0.18  # bottom-64 sampling band


# ---- first/last-touch attribution (round 8, fourth wave) ----


def test_attribution_window_and_unattributed(spark):
    """Pin the window semantics on a constructed timeline: touches
    outside the lookback or after the conversion never attribute; a
    conversion with no in-window touch survives with nulls; first and
    last endpoints respect the (ts, id) tiebreak."""
    import datetime as dt

    from etl_deltalake_spark.operators.behavior import attribution
    from pyspark.sql import Row

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)

    def ev(eid, days_off, typ, user=1):
        return Row(
            user_id=user,
            ts=t0 + dt.timedelta(days=days_off),
            event_id=eid,
            event_type=typ,
        )

    rows = [
        ev(1, -5.0, "click"),      # outside 3-day lookback
        ev(2, -2.0, "view"),       # first in-window touch
        ev(3, -1.0, "click"),      # middle
        ev(4, 0.0, "click"),       # same instant as conversion: included
        ev(5, 0.0, "purchase"),    # conversion (ts tie with 4)
        ev(6, 1.0, "view"),        # after conversion: excluded
        ev(7, 0.0, "purchase", user=2),  # user 2: no touches at all
    ]
    out = {
        r["conv_id"]: r
        for r in attribution(
            spark.createDataFrame(rows),
            "user_id", "ts", "event_id", "event_type",
            conversion_type="purchase",
            touch_types=["click", "view"],
            lookback_days=3,
        ).collect()
    }
    assert out[5]["first_touch"] == "view"   # event 2, not the stale 1
    assert out[5]["last_touch"] == "click"   # event 4 (ts tie, higher id)
    assert out[7]["first_touch"] is None and out[7]["last_touch"] is None


# ---- blocklist safety filter (round 8, fourth wave) ----


def test_blocklist_counts_occurrences_and_broadcasts(spark):
    """Occurrences (not distinct terms) drive the verdict; zero-hit
    docs survive; and the term join must BROADCAST — a shuffled join
    against a thousand-row blocklist would shuffle the whole token
    stream at 100 TB."""
    from etl_deltalake_spark.operators.curation import blocklist_report
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="bad bad bad good"),
            Row(doc_id=2, text="all clean words here"),
            Row(doc_id=3, text="bad evil"),
        ]
    )
    terms = spark.createDataFrame([("bad",), ("evil",)], "term string")
    out = blocklist_report(docs, "doc_id", "text", terms, max_hits=2)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_hits"] == 3 and rows[1]["n_terms"] == 1
    assert not rows[1]["kept"]  # 3 occurrences > 2, one distinct term
    assert rows[2]["n_hits"] == 0 and rows[2]["kept"]
    assert rows[3]["n_hits"] == 2 and rows[3]["n_terms"] == 2
    assert rows[3]["kept"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---- point-in-time feature matrix (round 8, fourth wave) ----


def test_feature_matrix_no_leakage(spark, sf_dir):
    """The anti-leakage contract: a user's FIRST event must have
    n_prior_3d = 0 and null gap (nothing before it), and no event's
    own value may enter its features — verified by recomputing one
    user's features driver-side from raw events."""
    from etl_deltalake_spark.plans.queries_ext import q_feature_matrix

    ev = qx.load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("epoch"), "value"
    )
    uid = ev.first()["user_id"]
    raw = sorted(
        (r["epoch"], r["event_id"], r["value"])
        for r in ev.filter(F.col("user_id") == uid).collect()
    )
    got = {
        r["event_id"]: r for r in q_feature_matrix(spark, sf_dir).collect()
    }
    first_eid = raw[0][1]
    assert got[first_eid]["n_prior_3d"] == 0
    assert got[first_eid]["gap_s"] is None
    # recompute for every event of this user: strictly-prior window
    # (integer cents via floor(v*100+0.5) — round-10 hardening)
    import math

    for ep, eid, _ in raw:
        prior = [
            (e, v) for (e, i, v) in raw if ep - 259200 <= e <= ep - 1
        ]
        r = got[eid]
        assert r["n_prior_3d"] == len(prior)
        expect = sum(int(math.floor(v * 100 + 0.5)) for _, v in prior)
        assert r["sum_prior_3d_cents"] == expect, (
            eid, r["sum_prior_3d_cents"], expect,
        )


def test_labels_strictly_future_no_overlap_with_features(spark, sf_dir):
    """A user's LAST event must have label_7d = 0 and null gap; and
    for every event the label frame starts strictly after the row —
    an event never labels itself (the self-return bug)."""
    from etl_deltalake_spark.plans.queries_ext import q_labels

    ev = qx.load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("epoch")
    )
    uid = ev.first()["user_id"]
    raw = sorted(
        (r["epoch"], r["event_id"])
        for r in ev.filter(F.col("user_id") == uid).collect()
    )
    got = {r["event_id"]: r for r in q_labels(spark, sf_dir).collect()}
    last_eid = raw[-1][1]
    assert got[last_eid]["label_7d"] == 0
    assert got[last_eid]["next_gap_s"] is None
    for ep, eid in raw:
        future = [e for (e, i) in raw if ep + 1 <= e <= ep + 604800]
        assert got[eid]["label_7d"] == (1 if future else 0), eid


def test_null_anti_three_valued_logic(spark, sf_dir):
    """NOT IN against a null-bearing set is empty; the null-filtered
    variant returns the true complement — and Spark must plan the
    single-column null-aware anti join, not a nested loop."""
    from etl_deltalake_spark.plans.queries_ext import q_null_anti

    df = q_null_anti(spark, sf_dir)
    rows = {r["variant"]: r["n"] for r in df.collect()}
    assert rows["not_in_with_null"] == 0
    assert rows["not_in_null_filtered"] > 0


def test_collation_merges_case_variants_in_one_groupby(spark, sf_dir):
    """Every folded segment must have absorbed all three case
    variants (upper/lower/initcap) — proof the UTF8_LCASE groupBy
    merged them without a lower() rewrite."""
    from etl_deltalake_spark.plans.queries_ext import q_collation

    rows = q_collation(spark, sf_dir).collect()
    assert rows, "need segments"
    for r in rows:
        assert r["seg"] == r["seg"].lower()
        assert r["n_variants"] == 3, r


def test_recursive_cte_depth_is_digit_count(spark, sf_dir):
    """In the parent = key div 10 tree, a node's depth equals its
    decimal digit count (1 -> 1, 57 -> 2, 149 -> 3) — a closed form
    the engine's recursion must reproduce for every node, with every
    customer reached exactly once."""
    from etl_deltalake_spark.plans.queries_ext import q_recursive

    rows = q_recursive(spark, sf_dir).collect()
    n_cust = qx.load_table(spark, "customer", sf_dir).count()
    assert len(rows) == n_cust  # every node reached exactly once
    for r in rows:
        want = 0 if r["node"] == 0 else len(str(r["node"]))
        assert r["depth"] == want, (r["node"], r["depth"])


# ---- runtime metrics harvest (round 8) ----


def test_executed_metrics_measures_pruning_and_shuffle(spark, sf_dir):
    """The harvest must report real numbers: a filtered+aggregated
    scan shows the scan row count, a shuffle with records written,
    and zero spill at this scale; and a projection-only query scans
    rows but shuffles nothing."""
    from etl_deltalake_spark.plans.inspect import executed_metrics

    ev = qx.load_table(spark, "events", sf_dir)
    agg = ev.groupBy("event_type").count()
    agg.collect()
    m = executed_metrics(agg)
    assert m["scan_rows"] == ev.count()
    assert m["shuffle_records_written"] > 0
    assert m["spill_bytes"] == 0
    assert m["scan_files"] >= 1

    proj = ev.select("event_id")
    proj.collect()
    m2 = executed_metrics(proj)
    assert m2["scan_rows"] > 0
    assert m2["shuffle_records_written"] == 0  # no exchange at all


def test_variant_roundtrips_through_parquet(spark, tmp_path):
    """The parse-once claim's other half: VARIANT survives a parquet
    write/read as the variant logical type (not a string), and typed
    path probes work on the read-back column — store the binary
    variant at ingest, probe it forever after."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import VariantType

    df = spark.range(5).select(
        "id",
        F.parse_json(
            F.concat(
                F.lit('{"v":'), F.col("id").cast("string"),
                F.lit(',"tag":"t'), (F.col("id") % 2).cast("string"),
                F.lit('"}'),
            )
        ).alias("var"),
    )
    p = str(tmp_path / "vparq")
    df.write.parquet(p)
    back = spark.read.parquet(p)
    assert isinstance(back.schema["var"].dataType, VariantType)
    rows = {
        r["id"]: (r["v"], r["tag"])
        for r in back.select(
            "id",
            F.variant_get("var", "$.v", "bigint").alias("v"),
            F.variant_get("var", "$.tag", "string").alias("tag"),
        ).collect()
    }
    assert rows == {i: (i, f"t{i % 2}") for i in range(5)}


def test_round8_edge_gates(spark):
    """Small sharp edges of the round-8 wave pinned in one sweep:
    (a) kmv_jaccard on hash-disjoint groups yields NO pair rows
    (absent pair == J~0, the documented contract); (b) sq_quantize
    refuses a calibration table with gappy dims; (c) an empty
    blocklist keeps every document with zero hits."""
    import pytest as _pytest

    from etl_deltalake_spark.operators.curation import blocklist_report
    from etl_deltalake_spark.operators.similarity import sq_quantize
    from etl_deltalake_spark.operators.stats import kmv_jaccard
    from pyspark.sql import Row

    disjoint = spark.createDataFrame(
        [Row(g="A", item=i) for i in range(10)]
        + [Row(g="B", item=1000 + i) for i in range(10)]
    )
    assert (
        kmv_jaccard(disjoint, F.col("g"), F.col("item"), k=8).count() == 0
    )

    emb = spark.createDataFrame([Row(vec_id=1, embedding=[1.0, 2.0])])
    with _pytest.raises(ValueError, match="dims 0..D-1"):
        sq_quantize(emb, "vec_id", "embedding", [(0, 0.0, 1.0), (2, 0.0, 1.0)])

    docs = spark.createDataFrame([Row(doc_id=1, text="anything at all")])
    empty_terms = spark.createDataFrame([], "term string")
    rows = blocklist_report(docs, "doc_id", "text", empty_terms).collect()
    assert rows[0]["n_hits"] == 0 and rows[0]["kept"]
