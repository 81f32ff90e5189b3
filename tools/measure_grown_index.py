"""ANN serving honesty at scale (round 9, VERDICT r8 Next #7):
measure probe latency on a persisted IVF+PQ index FRESH-BUILT vs
after N incremental appends (append_to_ivfpq_index — no rebuild, no
rewrite of existing files), so the incremental-index claim carries a
number. Results go into SCALE.md.

Usage: python tools/measure_grown_index.py [sf_dir] [n_appends]
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_appends = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from etl_deltalake_spark.operators.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        ivfpq_pretrained_topk,
    )
    from etl_deltalake_spark.plans.queries_ext import (
        _ivf_centroids,
        _pq_books,
        _query_vec,
    )
    from etl_deltalake_spark.session import get_spark
    from etl_deltalake_spark.sources.catalog import load_table

    spark = get_spark("grown-index-measure")
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    base_n = emb.count()
    cents = _ivf_centroids(spark, sf_dir)
    books = _pq_books(spark, sf_dir)
    qv = _query_vec(spark, sf_dir)

    def probe_time(path: str, reps: int = 5) -> float:
        # warm once (JVM/codegen), then min-of-reps
        ivfpq_pretrained_topk(
            spark, path, "vec_id", qv, cents, books, k=10, nprobe=3
        ).collect()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            ivfpq_pretrained_topk(
                spark, path, "vec_id", qv, cents, books, k=10, nprobe=3
            ).collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    tmp = tempfile.mkdtemp(prefix="sgraft_grown_")
    fresh = f"{tmp}/fresh"
    grown = f"{tmp}/grown"
    build_ivfpq_index(emb, "vec_id", "embedding", cents, books, fresh)
    shutil.copytree(fresh, grown)
    t_fresh = probe_time(fresh)

    offset = 1_000_000
    for i in range(n_appends):
        batch = emb.select(
            (F.col("vec_id") + (i + 1) * offset).alias("vec_id"),
            "embedding",
        )
        append_to_ivfpq_index(batch, "vec_id", "embedding", cents, books, grown)
    t_grown = probe_time(grown)

    # a fresh rebuild at the grown size, for the honesty comparison
    big = emb
    for i in range(n_appends):
        big = big.unionByName(
            emb.select(
                (F.col("vec_id") + (i + 1) * offset).alias("vec_id"),
                "embedding",
            )
        )
    rebuilt = f"{tmp}/rebuilt"
    build_ivfpq_index(big, "vec_id", "embedding", cents, books, rebuilt)
    t_rebuilt = probe_time(rebuilt)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "base_rows": base_n,
                "grown_rows": base_n * (1 + n_appends),
                "n_appends": n_appends,
                "probe_fresh_s": t_fresh,
                "probe_grown_s": t_grown,
                "probe_rebuilt_s": t_rebuilt,
            },
            sort_keys=True,
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
