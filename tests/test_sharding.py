"""Training-shard export gates (round 8,
operators/curation.shard_assign / shard_manifest / write_shards):
the manifest must be a deterministic, balanced, engine-reproducible
permutation, and the exported parquet layout must replay it exactly.
Cross-engine value grading rides the registry gate (q_train_shards);
these tests pin the operator contracts the oracle can't see —
stability under physical layout, seed independence, and the
write→read round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_deltalake_spark.operators.curation import (
    shard_assign,
    shard_manifest,
    write_shards,
)
from etl_deltalake_spark.plans import queries_ext as qx


def _manifest_rows(df, n_shards, seed):
    return sorted(
        shard_manifest(df, "doc_id", n_shards, seed)
        .select("doc_id", "shard", "pos")
        .collect()
    )


def test_manifest_stable_under_physical_layout(spark, sf_dir):
    """The shard/pos assignment is a pure function of (seed, id) —
    re-partitioning the input must not move a single row."""
    docs = qx.load_table(spark, "documents", sf_dir).select("doc_id")
    base = _manifest_rows(docs, 8, 7)
    shuffled = _manifest_rows(docs.repartition(13, "doc_id"), 8, 7)
    assert base == shuffled


def test_seed_is_a_new_permutation(spark, sf_dir):
    """A different seed reshuffles: same ids, same shard-size
    concentration, but a (virtually) disjoint ordering."""
    docs = qx.load_table(spark, "documents", sf_dir).select("doc_id")
    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in _manifest_rows(docs, 8, 7)}
    b = {r["doc_id"]: (r["shard"], r["pos"]) for r in _manifest_rows(docs, 8, 8)}
    assert set(a) == set(b)
    moved = sum(1 for d in a if a[d] != b[d])
    assert moved > len(a) * 0.9  # md5 reseed moves essentially everything


def test_shard_balance(spark, sf_dir):
    """md5 uniformity ⇒ shard sizes concentrate around n/k; gate a
    loose 3·sqrt band so a modulus/prefix defect (e.g. all rows in
    one shard) fails loudly without flaking on real variance."""
    docs = qx.load_table(spark, "documents", sf_dir).select("doc_id")
    sizes = (
        shard_assign(docs, "doc_id", 8, seed=7)
        .groupBy("shard")
        .count()
        .collect()
    )
    n = sum(r["count"] for r in sizes)
    mean = n / 8
    assert len(sizes) == 8
    for r in sizes:
        assert abs(r["count"] - mean) <= 3 * mean**0.5 + 1, sizes


def test_write_shards_replays_manifest_order(spark, sf_dir, tmp_path):
    """Reading one exported shard directory top-to-bottom yields
    exactly the manifest's pos order for that shard — the dataloader
    contract."""
    docs = qx.load_table(spark, "documents", sf_dir).select("doc_id")
    path = str(tmp_path / "shards")
    write_shards(docs, path, "doc_id", n_shards=4, seed=3)
    manifest = shard_manifest(docs, "doc_id", 4, seed=3)
    for shard in (0, 3):
        got = [
            r["doc_id"]
            for r in spark.read.parquet(f"{path}/shard={shard}")
            .select("doc_id")
            .collect()
        ]
        want = [
            r["doc_id"]
            for r in manifest.filter(F.col("shard") == shard)
            .orderBy("pos")
            .select("doc_id")
            .collect()
        ]
        assert got == want and len(got) > 0


def test_null_id_and_bad_n_shards_raise(spark):
    docs = spark.createDataFrame([(1,), (None,)], "doc_id long")
    with pytest.raises(Exception, match="NULL doc_id"):
        shard_assign(docs, "doc_id", 4).collect()
    with pytest.raises(ValueError, match="n_shards"):
        shard_assign(docs, "doc_id", 0)


def test_single_shard_degenerates_to_global_order(spark, sf_dir):
    docs = qx.load_table(spark, "documents", sf_dir).select("doc_id").limit(50)
    rows = shard_manifest(docs, "doc_id", 1, seed=0).collect()
    assert {r["shard"] for r in rows} == {0}
    assert sorted(r["pos"] for r in rows) == list(range(1, len(rows) + 1))
