"""Clustered-table metadata (round 14 — the spec's liquid-clustering
surface: ``delta.clustering`` domainMetadata + the writer-only
``clustering``/``domainMetadata`` feature pair): ``set_clustering``
records CLUSTER BY as metadata only, the next commit mirrors it,
``compact()`` with no ``zorder_by`` applies the STORED spec (OPTIMIZE
on a clustered table), re-cluster and CLUSTER BY NONE round-trip, and
the domain survives checkpoints + ``cleanup_log``. The props-store
doc refactor is pinned too: every mutator preserves the keys it does
not own."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_deltalake_spark.sources import delta_log as DL
from etl_deltalake_spark.sources.versioned import versioned_table


def _dm(spark, path):
    snap = DL.delta_snapshot(spark, path)
    return json.loads(snap["domain_metadata"]["delta.clustering"])


def test_cluster_by_mirrors_and_optimize_applies_it(spark, tmp_path):
    t = versioned_table(spark, str(tmp_path / "c"), use_delta=False)
    t.set_clustering(["x", "y"])
    t.write(
        spark.createDataFrame(
            [(i % 50, (i * 7) % 50, i) for i in range(5000)],
            "x long, y long, id long",
        ).repartition(8),
        timestamp="2026-01-01T00:00:00",
    )
    snap = DL.delta_snapshot(spark, t.path)
    assert _dm(spark, t.path) == {
        "clusteringColumns": [["x"], ["y"]]
    }
    assert "clustering" in snap["protocol"]["writerFeatures"]
    assert "domainMetadata" in snap["protocol"]["writerFeatures"]
    # OPTIMIZE with no zorder_by clusters by the STORED spec:
    # a selective filter on a clustering column then skips files
    t.compact(target_file_bytes=8 * 1024, timestamp="2026-01-02T00:00:00")
    full = t.read()
    pruned = t.read(ranges={"x": (0, 5)})
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    cond = F.col("x") <= 5
    assert sorted(map(tuple, pruned.filter(cond).collect())) == sorted(
        map(tuple, full.filter(cond).collect())
    )
    # unknown clustering columns refuse
    with pytest.raises(ValueError, match="do not exist"):
        t.set_clustering(["nope"])


def test_recluster_and_cluster_by_none(spark, tmp_path):
    t = versioned_table(spark, str(tmp_path / "r"), use_delta=False)
    t.set_clustering(["x"])
    ddl = "x long, id long"
    t.write(
        spark.createDataFrame([(1, 1)], ddl),
        timestamp="2026-01-01T00:00:00",
    )
    assert _dm(spark, t.path) == {"clusteringColumns": [["x"]]}
    t.set_clustering(["id"])
    t.write(
        spark.createDataFrame([(2, 2)], ddl), mode="append",
        timestamp="2026-01-02T00:00:00",
    )
    assert _dm(spark, t.path) == {"clusteringColumns": [["id"]]}
    # CLUSTER BY NONE: the domain re-states with no columns (the
    # delta-spark shape) and compact() stops z-ordering
    t.set_clustering([])
    t.write(
        spark.createDataFrame([(3, 3)], ddl), mode="append",
        timestamp="2026-01-03T00:00:00",
    )
    assert _dm(spark, t.path) == {"clusteringColumns": []}
    assert t.clustering_columns() == []


def test_clustering_domain_survives_checkpoint_cleanup(spark, tmp_path):
    t = versioned_table(spark, str(tmp_path / "k"), use_delta=False)
    t.set_clustering(["id"])
    for i in range(12):
        t.write(
            spark.createDataFrame([(i,)], "id long"),
            mode="overwrite" if i == 0 else "append",
            timestamp=f"2026-01-{i + 1:02d}T00:00:00",
        )
    assert DL.cleanup_log(spark, t.path) > 0
    assert _dm(spark, t.path) == {"clusteringColumns": [["id"]]}


def test_props_store_mutators_preserve_each_other(spark, tmp_path):
    """The round-14 doc refactor contract: constraints, generated,
    identity, and clustering share one CAS'd store and no mutator
    drops another's keys."""
    t = versioned_table(spark, str(tmp_path / "p"), use_delta=False)
    t.set_clustering(["id"])
    t.set_identity_column("uid", start=1, step=1)
    t.set_generated_column("twice", "id * 2")
    t.write(
        spark.createDataFrame([(1,), (2,)], "id long"),
        timestamp="2026-01-01T00:00:00",
    )
    t.add_constraint("pos", "id >= 0")
    assert t.clustering_columns() == ["id"]
    assert set(t.identity_columns()) == {"uid"}
    assert t.generated_columns() == {"twice": "id * 2"}
    assert t.constraints() == {"pos": "id >= 0"}
    t.drop_constraint("pos")
    assert t.constraints() == {}
    assert t.clustering_columns() == ["id"]
    assert set(t.identity_columns()) == {"uid"}
    # all four features mirror together
    snap = DL.delta_snapshot(spark, t.path)
    wf = snap["protocol"]["writerFeatures"]
    assert {"clustering", "domainMetadata", "generatedColumns",
            "identityColumns"} <= set(wf)
    rows = sorted(map(tuple, DL.read_delta(spark, t.path).collect()))
    assert rows == [(1, 2, 1), (2, 4, 2)]
