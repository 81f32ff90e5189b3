"""Round-15 optimization changes: pinned semantics.

Covers the ADVICE r14 robustness fixes (kernel null/ragged guards,
_LPath locality, timestamp partition consts, centroid_col join form,
committer scoping) and the VERDICT r14 #6 bench-memoization reset.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- kernels


def test_centroid_kernel_null_and_ragged_rows_yield_null(spark):
    """A null or length-mismatched vector must produce NULL sims (and
    hence NULL cluster_id), exactly like the zip_with/aggregate SQL
    forms the kernel replaced — not an executor crash."""
    from etl_deltalake_spark.operators.similarity import ivf_assign_df

    rows = [
        (0, [1.0, 0.0]),
        (1, None),
        (2, [1.0, 0.0, 5.0]),  # ragged: d=3 vs codebook d=2
        (3, [0.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    out = {
        r["id"]: (r["cluster_id"], r["s"])
        for r in ivf_assign_df(df, "id", "v", cents, sim_col="s").collect()
    }
    assert out[0] == (0, 1.0)
    assert out[3] == (1, 1.0)
    # The sim is NULL, so any >= tau gate drops the row — identical to
    # the old zip_with/aggregate SQL form. (cluster_id itself lands on
    # the last cid: both forms produce a NULL argmax index and this
    # Spark build's element_at resolves a runtime-NULL ordinal that
    # way; the kernel changes nothing downstream.)
    assert out[1][1] is None and out[2][1] is None
    assert out[1][0] == out[2][0]


def test_pair_dot_and_norm_kernels_null_ragged(spark):
    from etl_deltalake_spark.operators.similarity import (
        _pair_dot_kernel,
        _vec_norm_kernel,
    )

    rows = [
        (0, [1.0, 2.0], [3.0, 4.0]),
        (1, None, [1.0, 2.0]),
        (2, [1.0, 2.0, 3.0], [1.0, 2.0]),  # mismatched lengths
        (3, [2.0, 2.0], [0.5, 0.5]),
        (4, [1.0] * 3, [2.0] * 3),  # different width than row 0/3
    ]
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    dot = _pair_dot_kernel()
    nrm = _vec_norm_kernel()
    got = {
        r["id"]: (r["d"], r["na"])
        for r in df.select(
            "id", dot("a", "b").alias("d"), nrm("a").alias("na")
        ).collect()
    }
    assert got[0] == (11.0, pytest.approx(5.0**0.5))
    assert got[1] == (None, None)
    assert got[2][0] is None  # ragged pair -> null dot
    assert got[2][1] == pytest.approx(14.0**0.5)  # norm of a still fine
    assert got[3] == (2.0, pytest.approx(8.0**0.5))
    assert got[4] == (6.0, pytest.approx(3.0**0.5))


def test_centroid_col_join_form_matches_literal_form(spark, monkeypatch):
    """Past _CENT_LITERAL_MAX the winner vector comes from a broadcast
    equi-join instead of plan literals — rows and values must match
    the literal form exactly."""
    from etl_deltalake_spark.operators import similarity as S

    rows = [(i, [float(i % 3), float((i * 7) % 5)]) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])]
    lit = S.ivf_assign_df(
        df, "id", "v", cents, sim_col="s", centroid_col="cv"
    ).orderBy("id").collect()
    monkeypatch.setattr(S, "_CENT_LITERAL_MAX", 1)
    join = S.ivf_assign_df(
        df, "id", "v", cents, sim_col="s", centroid_col="cv"
    ).orderBy("id").collect()
    assert [tuple(r) for r in lit] == [tuple(r) for r in join]
    assert lit[0].__fields__ == join[0].__fields__


# ------------------------------------------------------------- versioned


def test_lpath_stays_local_under_remote_defaultfs(spark):
    """Paths minted by the local shim must resolve locally even when
    fs.defaultFS claims a remote filesystem (ADVICE r15: nested reads
    on listing-derived bare paths)."""
    from etl_deltalake_spark.sources.versioned import _LPath, _local_path

    class FakeRemote:
        pass

    fake = FakeRemote()  # no _sgraft_default_fs_local attr, no _jsc
    lp = _LPath("file:///tmp/sgraft_x/agora")
    assert _local_path(fake, lp) == "/tmp/sgraft_x/agora"
    # bare string under an (unknowable -> non-local) defaultFS stays
    # on the Hadoop branch
    assert _local_path(fake, "/tmp/sgraft_x/agora") is None


def test_default_fs_cache_is_per_session_object(spark):
    from etl_deltalake_spark.sources.versioned import _default_fs_is_local

    assert _default_fs_is_local(spark) is True
    assert spark._sgraft_default_fs_local is True

    class Dead:
        """No _jsc: the probe fails closed (non-local) and must not
        inherit another object's cached verdict."""

    d = Dead()
    assert _default_fs_is_local(d) is False


# ---------------------------------------------------------------- stream


def test_arrow_batch_falls_back_for_timestamp_partition_const():
    """Naive timestamp strings are session-time in Spark but would be
    parsed as UTC by pa.array — the const spec must force the row
    path (ADVICE r15)."""
    from etl_deltalake_spark.sources.delta_stream import _try_arrow_batch

    specs = [("ts", "timestamp", "const", "2024-03-01 00:00:00")]
    assert _try_arrow_batch(specs, 3, None) is None
    # non-timestamp consts keep the fast path
    specs2 = [("v", "bigint", "const", 7)]
    batch = _try_arrow_batch(specs2, 3, None)
    assert batch is not None and batch.num_rows == 3


# ----------------------------------------------------------------- bench


def test_reset_similarity_session_caches_clears_codebook_memos():
    from etl_deltalake_spark.plans import queries_ext as qx

    qx._VEC_CACHE["x"] = [1.0]
    qx._CENTROID_CACHE["x"] = [(0, [1.0])]
    qx._PQ_CACHE["x"] = [[(0, [1.0])]]
    qx._KMEANS_CACHE["x"] = [(0, [1.0])]
    qx._NEARDUP_STORE_CACHE["keep"] = "/tmp/somewhere"
    qx.reset_similarity_session_caches()
    assert not qx._VEC_CACHE
    assert not qx._CENTROID_CACHE
    assert not qx._PQ_CACHE
    assert not qx._KMEANS_CACHE
    # persisted-store INPUT paths are deliberately retained
    assert qx._NEARDUP_STORE_CACHE.pop("keep") == "/tmp/somewhere"


def test_committer_v2_scoped_to_local_master(spark):
    """Local sessions take the v2 committer; the builder only applies
    it when the master is local[*] (ADVICE r15 zombie-attempt
    concern on real clusters)."""
    import inspect

    from etl_deltalake_spark import session as sess

    assert (
        spark.conf.get(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version"
        )
        == "2"
    )
    src = inspect.getsource(sess.get_spark)
    assert 'master.startswith("local")' in src
