"""Similarity search over embedding columns (SURVEY §2.9).

``embeddings.embedding`` is ``array<float>``; all math casts to
double element-wise (exact) and reduces sequentially with
``F.aggregate`` — JVM-side, no UDFs.

Scale design:
 - ``cosine_topk`` (brute force) is the correctness baseline: one
   scan, per-row O(d) work, top-k via a single ordered window —
   linear in N, embarrassingly parallel.
 - ``hyperplane_bucket`` is the ANN scale path: 8 deterministic
   random-hyperplane sign bits bucket the vectors (scan-side);
   search then touches only the query's bucket (~N/256 of the
   data). Hyperplane weights derive from md5(plane, dim) → ±1, so
   the oracle reproduces the partition exactly.
 - ``ivf_assign``/``ivf_topk`` is the IVF scale path: nearest-
   centroid coarse quantization, then the probe touches only
   nprobe/nlist of the data. With a deterministic codebook the
   assignment is oracle-reproducible; production swaps in k-means
   centroids (pyspark.ml KMeans, seeded).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two numeric arrays (double)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, scale: int = 6) -> Column:
    """Cosine similarity rounded to ``scale`` (absorbs sub-1e-12
    cross-engine summation-order noise)."""
    return F.round(dot(a, b) / (norm(a) * norm(b)), scale)


def l2_sq(a: Column, b: Column, scale: int = 6) -> Column:
    """Squared euclidean distance, rounded to ``scale``. The fold is
    sequential (((0+t1)+t2)+...) with t_i = (a_i−b_i)² ≥ +0.0, and
    0.0+t1 == t1 exactly, so a SQL mirror written as the same
    left-associated term chain reproduces it bitwise."""
    return F.round(
        F.aggregate(
            F.zip_with(_to_double(a), _to_double(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        scale,
    )


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: Sequence[float],
    k: int = 10,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    Ties broken by id — deterministic. Top-k via row_number window
    over a single partition is fine for k·partitions ≪ N; Spark's
    TakeOrdered handles the global limit without a full sort.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim")
    )
    return (
        scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "cos_sim")
    )


def hyperplane_bits(vec_col: Column, dims: int, planes: int = 8) -> Column:
    """Deterministic random-hyperplane sign bits as a bitstring.

    Plane p weight for dim d = +1 if md5('p,d') starts with 0-7
    else -1 (an unbiased ±1 draw, identical in any engine with md5).
    """
    def plane_dot(p: int) -> Column:
        weights = F.array(
            *[
                F.lit(1.0 if int(_md5_first_hex(p, d), 16) < 8 else -1.0)
                for d in range(dims)
            ]
        )
        return dot(vec_col, weights)

    bits = [F.when(plane_dot(p) >= 0, F.lit("1")).otherwise(F.lit("0")) for p in range(planes)]
    return F.concat(*bits)


def _md5_first_hex(p: int, d: int) -> str:
    import hashlib

    return hashlib.md5(f"{p},{d}".encode()).hexdigest()[0]


def random_projection(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dims: int,
    out_dim: int,
    scale: int = 6,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with the
    deterministic ±1 sign matrix (Achlioptas 2001, "Database-friendly
    random projections": ±1 entries preserve pairwise distances with
    the same guarantee as Gaussians):

        y_j = round( (Σ_d w(j,d)·x_d) / √out_dim , scale )

    with w(j,d) the md5-derived ±1 draw ``hyperplane_bits`` uses, so
    any engine with md5 re-derives the identical matrix — the oracle
    mirrors the whole expression term-for-term (q_random_proj).

    The production use: shrink 1k-4k-dim embeddings to 32-128 dims
    BEFORE the expensive ANN/clustering stages — distance
    computations drop proportionally while JL keeps relative
    distances within (1±ε) for ε ≈ √(8·ln n / out_dim). Execution is
    pure scan-side column math (weights are plan literals): no
    shuffle, no UDF; at 100 TB this runs at parquet-read speed.
    Output: (id, proj array<double> of out_dim rounded components).
    """
    import math

    inv = 1.0 / math.sqrt(out_dim)
    vec = _to_double(F.col(vec_col))

    def comp(j: int) -> Column:
        weights = F.array(
            *[
                F.lit(1.0 if int(_md5_first_hex(j, d), 16) < 8 else -1.0)
                for d in range(dims)
            ]
        )
        return F.round(dot(vec, weights) * F.lit(inv), scale)

    return df.select(
        F.col(id_col),
        F.array(*[comp(j) for j in range(out_dim)]).alias("proj"),
    )


def bucketed_ann_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: Sequence[float],
    k: int = 5,
    planes: int = 8,
) -> DataFrame:
    """ANN top-k: restrict the scan to the query's hyperplane bucket.

    Recall is approximate (vectors near the boundary land in other
    buckets); the trade is touching ~1/2^planes of the data. The
    bucket expression is a literal-weight dot product — Catalyst
    folds the weights, the scan stays vectorized.
    """
    import hashlib

    dims = len(query_vec)
    qbits = "".join(
        "1"
        if sum(
            (1.0 if int(hashlib.md5(f"{p},{d}".encode()).hexdigest()[0], 16) < 8 else -1.0)
            * query_vec[d]
            for d in range(dims)
        )
        >= 0
        else "0"
        for p in range(planes)
    )
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bits(F.col(vec_col), dims, planes).alias("bucket"),
    ).filter(F.col("bucket") == qbits)
    scored = bucketed.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim"))
    return (
        scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "cos_sim")
    )


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: Sequence[tuple[int, Sequence[float]]],
    scale: int = 6,
    sim_col: str | None = None,
    metric: str = "cosine",
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine or min
    squared-L2 per ``metric``; ties to the lowest centroid id) — the
    IVF/PQ coarse-quantization step. ``sim_col`` additionally outputs
    the winning similarity/distance.

    The codebook is driver-resident by construction (IVF codebooks
    are nlist×d floats — KBs to a few MBs), so assignment folds into
    the scan as literal-weight expressions: zero shuffles, whole
    rows never leave their partition. For nlist in the thousands,
    swap the when-chain for a broadcast join + per-id window argmax
    (same result, one small broadcast).

    Each centroid's cosine fold is materialized ONCE in its own
    projection and the argmax references the bound columns — the
    fold is an interpreted higher-order expression, and inlining it
    into both the ``greatest`` chain and every when-condition (the
    previous shape) re-evaluated it up to 2·nlist times per row
    (the same planner trap dedup.shingle_rows documents).
    """
    if metric not in ("cosine", "l2"):
        raise ValueError(f"metric must be cosine|l2, got {metric!r}")
    measure = cosine if metric == "cosine" else l2_sq
    pick = F.greatest if metric == "cosine" else F.least
    simmed = df.select(
        F.col(id_col),
        F.col(vec_col),
        *[
            measure(
                F.col(vec_col), F.array(*[F.lit(float(x)) for x in cv]), scale
            ).alias(f"_s{cid}")
            for cid, cv in centroids
        ],
    )
    cids = sorted(cid for cid, _ in centroids)
    best = None
    for cid in cids:
        c = F.col(f"_s{cid}")
        best = c if best is None else pick(best, c)
    # ascending ids, first maximal match wins — matches an argmax
    # with (score DESC, cid ASC) tie-breaking in any engine
    assign = None
    for cid in cids:
        cond = F.col(f"_s{cid}") == F.col("_best")
        assign = (
            F.when(cond, F.lit(cid)) if assign is None else assign.when(cond, F.lit(cid))
        )
    out = simmed.withColumn("_best", best).select(
        F.col(id_col),
        F.col(vec_col),
        assign.cast("long").alias("cluster_id"),
        *([F.col("_best").alias(sim_col)] if sim_col else []),
    )
    return out


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: Sequence[float],
    centroids: Sequence[tuple[int, Sequence[float]]],
    k: int = 5,
    nprobe: int = 1,
    scale: int = 6,
) -> DataFrame:
    """IVF-style ANN top-k: probe only the ``nprobe`` clusters whose
    centroids are nearest the query.

    The scan touches ~nprobe/nlist of the rows (the cluster filter
    sits on the scan; with the assignment persisted as a partition
    column it becomes partition PRUNING — zero I/O outside the
    probed clusters). Recall loss is vectors whose nearest centroid
    differs from the query's — raise nprobe to trade I/O for recall.
    Centroids here are caller-supplied; production builds them with
    k-means (pyspark.ml.clustering.KMeans) — deterministic seeds
    keep re-runs stable.
    """
    import math

    def cos_py(a: Sequence[float], b: Sequence[float]) -> float:
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(num / (na * nb), scale)

    probed = sorted(
        centroids, key=lambda c: (-cos_py(query_vec, c[1]), c[0])
    )[:nprobe]
    probe_ids = [cid for cid, _ in probed]

    assigned = ivf_assign(df, id_col, vec_col, centroids, scale)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = assigned.filter(F.col("cluster_id").isin(probe_ids)).select(
        F.col(id_col),
        F.col("cluster_id"),
        cosine(F.col(vec_col), q, scale).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def dot_raw(a: Column, b: Column) -> Column:
    """Dot product without the defensive double-cast — for columns
    already normalized to array<double> (saves one array
    materialization per evaluation in pair-side hot paths)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def unit_vec(vec_col: Column) -> Column:
    """Row-side unit normalization: v / |v| as array<double>.

    The norm sub-expression is re-evaluated per element by the
    interpreted HOF path (O(d²) per ROW) — cheap row-side, which is
    exactly why pair-side code must consume pre-normalized vectors
    instead of computing ``cosine()`` per pair (O(3d) per PAIR plus
    two redundant norms).
    """
    v = _to_double(vec_col)
    return F.transform(v, lambda x: x / norm(vec_col))


def unit_vec_table(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, uv) table of unit-normalized vectors, materialized once.

    The norm lives in its own projection and is referenced twice
    (inside the normalize lambda and as a carried column), so
    CollapseProject keeps it a per-ROW scalar instead of re-inlining
    the O(d) reduction per element (the interpreted-HOF trap
    ``unit_vec`` documents). The localCheckpoint pins the normalized
    arrays so both sides of a pair join and the verify stage reuse
    them without re-derivation.
    """
    v = df.select(F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v"))
    w = v.select("id", "v", F.sqrt(dot_raw(F.col("v"), F.col("v"))).alias("_n"))
    return (
        w.select(
            "id",
            "v",
            F.transform("v", lambda x: x / F.col("_n")).alias("uv"),
            "_n",
        )
        .localCheckpoint(eager=True)
        .select("id", "v", "uv")
    )


def _seeded_pm1(table: int, plane: int, dim: int) -> float:
    """Deterministic ±1 hyperplane weight: md5('t,p,d') first hex
    digit < 8 → +1 (unbiased, reproducible in any engine with md5)."""
    import hashlib

    h = hashlib.md5(f"{table},{plane},{dim}".encode()).hexdigest()[0]
    return 1.0 if int(h, 16) < 8 else -1.0


def bucketed_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    dims: int,
    planes: int = 4,
    tables: int = 3,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via hyperplane-LSH buckets —
    the sub-quadratic default (replaces the exact all-pairs
    ``cosine_near_dup_pairs`` as the wired plan).

    Candidates are pairs sharing a bucket in ANY of ``tables``
    independent hyperplane tables (standard OR-amplification: per-
    table P(candidate) = p^planes with p = 1 - θ/π, overall
    1-(1-p^planes)^tables); generation is an EQUI-join on
    (table, bucket) — never all-pairs, no BroadcastNestedLoopJoin.
    Verification computes exact cosine on the candidates only, so
    precision is exact and only recall is approximate. At the fixture
    (d=64, threshold 0.42): 22.5k candidate pairs vs 124,750
    all-pairs, ~5.5× cut that grows with corpus size (bucket
    occupancy ~N/2^planes per table).

    The bucket bits are literal-weight dot-product signs computed on
    the RAW double vector (sign is norm-invariant; raw values are
    bitwise identical across engines, so the DuckDB oracle re-derives
    the exact partition with an explicit left-to-right sum chain —
    the same validated pattern as q_ann_bucket's oracle).
    """
    base = unit_vec_table(df, id_col, vec_col)
    # A wrong caller-supplied dims would null every plane's dot product
    # (zip_with pads with nulls), putting ALL rows in one bucket — the
    # exact quadratic join this function exists to avoid, with correct
    # output masking the blowup. Fail loudly row-side instead.
    base = base.withColumn(
        "v",
        F.when(F.size("v") == dims, F.col("v")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"bucketed_near_dup_pairs: dims={dims} != vector "
                        "length "
                    ),
                    F.size("v").cast("string"),
                )
            )
        ),
    )

    def bucket_col(t: int) -> Column:
        bits = []
        for p in range(planes):
            weights = F.array(
                *[F.lit(_seeded_pm1(t, p, d)) for d in range(dims)]
            )
            bits.append(
                F.when(dot_raw(F.col("v"), weights) >= 0, F.lit("1")).otherwise(
                    F.lit("0")
                )
            )
        return F.concat(*bits)

    banded = base.select(
        "id",
        F.posexplode(F.array(*[bucket_col(t) for t in range(tables)])).alias(
            "tbl", "bucket"
        ),
    )
    a = banded.select(F.col("id").alias("id_a"), "tbl", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "tbl", "bucket")
    candidates = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ua = base.select(F.col("id").alias("id_a"), F.col("uv").alias("ua"))
    ub = base.select(F.col("id").alias("id_b"), F.col("uv").alias("ub"))
    return (
        candidates.join(ua, "id_a")
        .join(ub, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(dot_raw(F.col("ua"), F.col("ub")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — exact all-pairs
    baseline (the dedup-family completion of SURVEY §2.9).

    Vectors are unit-normalized ONCE per row below the join, so each
    pair costs a single fused multiply-fold (measured 3× faster than
    per-pair cosine at sf0.1: 101 s → 33 s). Quadratic by nature: fine for
    the correctness gate; at 100 TB route through
    ``hyperplane_bits`` buckets first (equi-join on bucket →
    candidates only, same trade as dedup.minhash_near_dup_pairs) or
    an IVF index.
    """
    a = df.select(F.col(id_col).alias("id_a"), unit_vec(F.col(vec_col)).alias("ua"))
    b = df.select(F.col(id_col).alias("id_b"), unit_vec(F.col(vec_col)).alias("ub"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot_raw(F.col("ua"), F.col("ub")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def pairwise_knn(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 1,
    max_ids: int | None = None,
) -> DataFrame:
    """Exact k-NN per vector (self-join). Quadratic — the correctness
    baseline; cap the probe side with ``max_ids`` or use the LSH
    bucket variant at scale."""
    left = df.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    if max_ids is not None:
        left = left.filter(F.col("qid") < max_ids)
    right = df.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    pairs = left.join(right, F.col("qid") != F.col("nid"))
    scored = pairs.select(
        "qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("cos_sim")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "nid", "cos_sim", F.col("rn").cast("bigint").alias("rn"))
    )


def kmeans_codebook(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iterations: int = 3,
    scale: int = 6,
    metric: str = "cosine",
) -> list[tuple[int, list[float]]]:
    """Train an IVF codebook with Lloyd's algorithm expressed as
    DataFrame aggregations — the production upgrade over the
    caller-supplied centroids in ``ivf_topk``.

    Assignment = max rounded cosine (ties to the lowest centroid id,
    exactly ``ivf_assign``); update = per-dimension mean of the
    assigned RAW vectors (cosine to a centroid is scale-invariant,
    so skipping re-normalization changes nothing downstream). Means
    accumulate DECIMAL(18,9)-quantized elements, making every
    iteration a pure function of the data — deterministic across
    partitionings AND reproducible by the SQL oracle (the usual
    double groupBy-sum folds in partition order; this one can't).

    Init: the ``k`` lowest-id vectors (deterministic; production
    would seed with k-means|| — pyspark.ml — where determinism isn't
    a contract). Empty clusters keep their previous centroid.

    Scale: per iteration one scan + one (cluster, dim)-keyed shuffle
    whose map-side partials cap shuffle rows at k·d·partitions;
    driver traffic is the k·d codebook itself — the same
    codebook-only-collect contract as ``ivf_topk``. Iterations are
    O(1) jobs, not lineage growth (each starts from the cached
    vector table).
    """
    vecs = df.select(
        F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v")
    ).localCheckpoint(eager=True)
    seeds = vecs.orderBy("id").limit(k).collect()
    centroids: list[tuple[int, list[float]]] = [
        (i, [float(x) for x in r["v"]]) for i, r in enumerate(seeds)
    ]
    for _ in range(iterations):
        assigned = ivf_assign(vecs, "id", "v", centroids, scale, metric=metric)
        stats = (
            assigned.select(
                "cluster_id", F.posexplode("v").alias("pos", "val")
            )
            .groupBy("cluster_id", "pos")
            .agg(
                F.sum(F.col("val").cast("decimal(18,9)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new: dict[int, dict[int, float]] = {}
        for r in stats:
            # float(Decimal)/int mirrors the engines' CAST(s AS
            # DOUBLE)/n exactly (both correctly-rounded)
            new.setdefault(r["cluster_id"], {})[r["pos"]] = (
                float(r["s"]) / r["n"]
            )
        centroids = [
            (
                cid,
                [new[cid][p] for p in sorted(new[cid])]
                if cid in new
                else old,
            )
            for cid, old in centroids
        ]
    return centroids


# Upper bound on nlist·d for embedding the codebook as plan literals
# in ivf_assign_df's centroid_col branch; larger codebooks switch to a
# broadcast equi-join on the winning cluster_id (ADVICE r15: literal
# plans grow O(nlist·d) and a 4096×768 book would be ~3M literals).
_CENT_LITERAL_MAX = 16384


def ivf_assign_df(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: Sequence[tuple[int, Sequence[float]]],
    scale: int = 6,
    sim_col: str | None = None,
    metric: str = "cosine",
    centroid_col: str | None = None,
) -> DataFrame:
    """``ivf_assign`` via a broadcast centroid TABLE instead of
    literal-unrolled expressions — the large-nlist form.

    The literal form builds nlist separate fold columns plus
    greatest/when chains, an O(nlist·d) expression tree whose
    analysis+codegen cost grows with the codebook (measured 6.4 s vs
    2.4 s at nlist=40, d=64, sf0.1). Here the codebook ships as a
    k-row DataFrame folded into ONE array-of-structs row that
    broadcast-joins on a constant key (BroadcastHashJoin — no
    nested-loop product), and assignment is a scan-side argmax over
    the array: plan size O(1) in nlist, per-row work the same
    O(nlist·d) math. Same argmax semantics (rounded measure, ties to
    lowest centroid id via array_position's first match over the
    cid-sorted array) — bitwise-identical output, pinned by test.
    """
    if metric not in ("cosine", "l2"):
        raise ValueError(f"metric must be cosine|l2, got {metric!r}")
    pick = F.array_max if metric == "cosine" else F.array_min
    # centroid-id order — the same total order array_sort gave the
    # old broadcast struct array, so argmax tie-breaks (first match
    # = lowest cid) are unchanged
    cents = sorted(
        ((int(cid), [float(x) for x in cv]) for cid, cv in centroids)
    )
    kernel = _centroid_sims_kernel(
        [cv for _, cv in cents],
        [_seq_norm_py(cv) for _, cv in cents],
        metric,
    )
    # RAW measures come from the Arrow kernel (bit-identical fold
    # order — see _centroid_sims_kernel); ROUNDING, argmax and the
    # tie-break stay JVM-side expressions exactly as before
    simmed = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.transform(
            kernel(F.col(vec_col)), lambda s: F.round(s, scale)
        ).alias("_sims"),
    )
    idx = F.array_position(F.col("_sims"), pick(F.col("_sims"))).cast("int")
    cid_arr = F.array(*[F.lit(cid) for cid, _ in cents])
    out_cols = [
        F.col(id_col),
        F.col(vec_col),
        F.element_at(cid_arr, idx).alias("cluster_id"),
        *([pick(F.col("_sims")).alias(sim_col)] if sim_col else []),
    ]
    if centroid_col:
        # winner VECTOR requested (IVF+PQ residual encoding). Small
        # codebooks ride as one literal array-of-arrays; past
        # _CENT_LITERAL_MAX total elements (ADVICE r15: 4096×768
        # would be ~3M literals — analysis-time blowup / driver OOM)
        # the winner vector comes from a broadcast equi-join on the
        # winning cluster_id instead — same rows, same values, plan
        # size O(1) in nlist.
        if len(cents) * len(cents[0][1]) <= _CENT_LITERAL_MAX:
            cv_arr = F.array(
                *[
                    F.array(*[F.lit(x) for x in cv])
                    for _, cv in cents
                ]
            )
            out_cols.append(F.element_at(cv_arr, idx).alias(centroid_col))
            return simmed.select(*out_cols)
        spark = df.sparkSession
        from pyspark.sql.types import (
            ArrayType,
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        book = spark.createDataFrame(
            [(cid, list(cv)) for cid, cv in cents],
            StructType(
                [
                    StructField("cluster_id", LongType(), False),
                    StructField(centroid_col, ArrayType(DoubleType()), False),
                ]
            ),
        )
        assigned = simmed.select(*out_cols)
        return assigned.join(F.broadcast(book), "cluster_id").select(
            F.col(id_col),
            F.col(vec_col),
            F.col("cluster_id"),
            *([F.col(sim_col)] if sim_col else []),
            F.col(centroid_col),
        )
    return simmed.select(*out_cols)


def _seq_norm_py(cv: Sequence[float]) -> float:
    """Driver-side vector norm with the engines' sequential fold
    order — bit-identical to SQL ``norm()`` (left fold of squares,
    then sqrt)."""
    import math

    acc = 0.0
    for x in cv:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def _centroid_sims_kernel(
    cent_mat, cent_norms, metric: str
):
    """Vectorized Arrow kernel for the IVF assignment measure (round
    14, guide §4): per input vector, the RAW (unrounded) cosine or
    squared-L2 against every centroid, returned as one
    ``array<double>`` in centroid-id order.

    Bit-exactness contract: the SQL form folds dimension-by-dimension
    (((0+t1)+t2)+...); the kernel accumulates a (rows x centroids)
    matrix with one elementwise ``+=`` per DIMENSION, so every
    (row, centroid) accumulator sees the identical add sequence —
    same bits, ~20x less per-element overhead than Catalyst's
    interpreted higher-order-function evaluation (zip_with/aggregate
    lambdas are CodegenFallback). float32 inputs widen to float64
    first, exactly like ``_to_double``. Rounding and argmax stay in
    the JVM so tie-breaks and HALF_UP semantics are untouched."""
    import numpy as np
    import pandas as pd

    C = np.ascontiguousarray(cent_mat, dtype=np.float64)  # (k, d)
    cn = np.asarray(cent_norms, dtype=np.float64)  # (k,)
    k, d = C.shape

    def fn(it):
        for s in it:
            if s.empty:
                yield pd.Series([], dtype=object)
                continue
            raw = s.to_numpy()
            # Null/ragged guard (round 15, ADVICE r14): the SQL forms
            # this kernel replaces (zip_with/aggregate cosine, l2_sq)
            # yield NULL for a null vector or a length mismatch —
            # zip_with pads the shorter side with nulls and the sum
            # fold propagates them. Mask those rows and emit None so
            # the kernel degrades identically instead of raising in
            # np.stack.
            valid = np.array(
                [v is not None and len(v) == d for v in raw], dtype=bool
            )
            if not valid.all():
                out = np.empty(len(raw), dtype=object)
                out[:] = None
                if valid.any():
                    sub = fn(iter([s[valid]]))
                    out[valid] = next(sub).to_numpy()
                yield pd.Series(out)
                continue
            V = np.stack(raw).astype(np.float64)  # (n, d)
            n = V.shape[0]
            acc = np.zeros((n, k))
            if metric == "cosine":
                nv = np.zeros(n)
                for j in range(d):
                    col = V[:, j]
                    acc += col[:, None] * C[None, :, j]
                    nv += col * col
                sims = acc / (np.sqrt(nv)[:, None] * cn[None, :])
            else:
                for j in range(d):
                    t = V[:, j][:, None] - C[None, :, j]
                    acc += t * t
                sims = acc
            yield pd.Series(list(sims))

    # real class objects, not strings — a pandas_udf defined in a
    # closure cannot resolve string annotations (round-12 gotcha)
    from typing import Iterator as _It

    fn.__annotations__ = {
        "it": _It[pd.Series],
        "return": _It[pd.Series],
    }
    return F.pandas_udf(fn, "array<double>")


def _pair_dot_kernel():
    """Arrow kernel: RAW dot product of two array columns, dim-
    sequential accumulation (bit-identical to the SQL ``dot()`` fold
    — same contract as ``_centroid_sims_kernel``)."""
    import numpy as np
    import pandas as pd

    def fn(it):
        for a, b in it:
            if a.empty:
                yield pd.Series([], dtype="float64")
                continue
            ra, rb = a.to_numpy(), b.to_numpy()
            # Null/ragged guard (round 15, ADVICE r14): SQL dot()
            # returns NULL for a null side or a length mismatch
            # (zip_with pads with nulls, the sum fold propagates).
            # Rows are grouped by their common length so mixed-width
            # batches still vectorize.
            n = len(ra)
            out = np.full(n, np.nan)
            lens = np.array(
                [
                    len(x) if x is not None and y is not None
                    and len(x) == len(y) else -1
                    for x, y in zip(ra, rb)
                ]
            )
            for L in np.unique(lens):
                if L < 0:
                    continue
                m = lens == L
                A = np.stack(ra[m]).astype(np.float64)
                B = np.stack(rb[m]).astype(np.float64)
                acc = np.zeros(A.shape[0])
                for j in range(int(L)):
                    acc += A[:, j] * B[:, j]
                out[m] = acc
            # invalid rows stay NaN; Spark's Arrow writer converts
            # float NaN to SQL NULL (from_pandas semantics), matching
            # the old null-propagating dot() exactly
            yield pd.Series(out)

    from typing import Iterator as _It
    from typing import Tuple as _Tup

    fn.__annotations__ = {
        "it": _It[_Tup[pd.Series, pd.Series]],
        "return": _It[pd.Series],
    }
    return F.pandas_udf(fn, "double")


def _vec_norm_kernel():
    """Arrow kernel: vector norm, sequential squares fold + sqrt —
    bit-identical to SQL ``norm()``."""
    import numpy as np
    import pandas as pd

    def fn(it):
        for s in it:
            if s.empty:
                yield pd.Series([], dtype="float64")
                continue
            raw = s.to_numpy()
            # Null/ragged guard (round 15, ADVICE r14): SQL norm()
            # yields NULL for a null vector; rows group by length so
            # mixed-width batches still vectorize. NaN → SQL NULL via
            # the Arrow writer, same as _pair_dot_kernel.
            n = len(raw)
            out = np.full(n, np.nan)
            lens = np.array(
                [len(x) if x is not None else -1 for x in raw]
            )
            for L in np.unique(lens):
                if L < 0:
                    continue
                m = lens == L
                V = np.stack(raw[m]).astype(np.float64)
                acc = np.zeros(V.shape[0])
                for j in range(int(L)):
                    col = V[:, j]
                    acc += col * col
                out[m] = np.sqrt(acc)
            yield pd.Series(out)

    from typing import Iterator as _It

    fn.__annotations__ = {
        "it": _It[pd.Series],
        "return": _It[pd.Series],
    }
    return F.pandas_udf(fn, "double")


def _cos_py(a: Sequence[float], b: Sequence[float], scale: int = 6) -> float:
    """Driver-side cosine with the engines' sequential fold order and
    rounding — for codebook-sized probe selection only."""
    import math

    num = sum(float(x) * float(y) for x, y in zip(a, b))
    na = math.sqrt(sum(float(x) * float(x) for x in a))
    nb = math.sqrt(sum(float(y) * float(y) for y in b))
    return round(num / (na * nb), scale)


def ivfpq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: Sequence[float],
    centroids: Sequence[tuple[int, Sequence[float]]],
    codebooks: Sequence[Sequence[tuple[int, Sequence[float]]]],
    k: int = 10,
    nprobe: int = 1,
    scale: int = 6,
) -> DataFrame:
    """IVF + PQ composed — the production ANN shape at 100 TB:
    coarse-quantize to prune the corpus to ``nprobe``/nlist of its
    rows (``ivf_assign``), then score ONLY the survivors' compressed
    PQ codes with the query's asymmetric distance table
    (``pq_encode`` → ``pq_adc_topk``). I/O touches the probed
    clusters; scoring touches m-byte codes, never raw vectors — the
    memory/recall trade both halves document individually, composed.

    With assignments persisted as a partition column and codes
    precomputed at ingest (the production layout), the whole query is
    partition pruning + a literal-table lookup scan. Recall loss
    compounds from both stages (probe misses + quantization error);
    raise nprobe / ksub to trade cost for recall.

    This is the classic non-residual variant (codes encode raw
    vectors, one distance table per query). Residual IVFPQ (encode
    v − centroid, one table per probed cluster) is the documented
    refinement — same plan shape, per-cluster literal tables.
    Deterministic end-to-end: probe selection, assignment, training,
    encode, and ADC all reuse the oracle-reproducible primitives.
    """
    probed = sorted(
        centroids, key=lambda c: (-_cos_py(query_vec, c[1], scale), c[0])
    )[:nprobe]
    probe_ids = [cid for cid, _ in probed]
    # broadcast-table assignment: nlist can be thousands without the
    # literal form's O(nlist·d) plan blow-up (see ivf_assign_df)
    assigned = ivf_assign_df(df, id_col, vec_col, centroids, scale)
    survivors = assigned.filter(F.col("cluster_id").isin(probe_ids)).select(
        F.col(id_col), F.col(vec_col)
    )
    codes = pq_encode(survivors, id_col, vec_col, codebooks, scale)
    return pq_adc_topk(codes, id_col, query_vec, codebooks, k, scale)


def ivfpq_residual_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: Sequence[float],
    centroids: Sequence[tuple[int, Sequence[float]]],
    m: int = 4,
    ksub: int = 8,
    iterations: int = 2,
    k: int = 10,
    nprobe: int = 1,
    scale: int = 6,
) -> DataFrame:
    """RESIDUAL IVF+PQ — the classical refinement over
    ``ivfpq_topk``: PQ codes quantize v − centroid(v) instead of v,
    so each subspace codebook only has to cover the (much tighter)
    within-cluster displacement distribution — materially lower
    quantization error at the same code budget (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search", §IV.A).

    Cost of the refinement: the query needs one asymmetric distance
    table PER PROBED CLUSTER (the query residual differs per
    centroid), so scoring unions nprobe branches, each a literal
    m×ksub table over that cluster's codes, then re-ranks the union —
    global top-k equals top-k over all survivors because every global
    winner is its own branch's winner.

    Plumbing: assignment via the broadcast-table form (which also
    emits the winning centroid), residuals as one exact zip_with
    subtraction, residual table localCheckpointed once (it feeds
    training AND every probe branch — without the pin each branch
    would re-derive the assignment). Training runs on the full
    residual corpus here; at 100 TB train on a hash_sample — the
    codebook needs distributional coverage only. Deterministic
    end-to-end, oracle-verified bitwise (q_ivfpq_residual).
    """
    dims = len(query_vec)
    assigned = ivf_assign_df(
        df, id_col, vec_col, centroids, scale, centroid_col="_cv"
    )
    res = assigned.select(
        F.col(id_col),
        F.col("cluster_id"),
        F.zip_with(
            _to_double(F.col(vec_col)), F.col("_cv"), lambda a, b: a - b
        ).alias("_rv"),
    ).localCheckpoint(eager=True)
    books = pq_train(
        res, id_col, "_rv", dims=dims, m=m, ksub=ksub, iterations=iterations
    )
    probed = sorted(
        centroids, key=lambda c: (-_cos_py(query_vec, c[1], scale), c[0])
    )[:nprobe]
    branches = []
    for cid, cv in probed:
        qres = [float(q) - float(x) for q, x in zip(query_vec, cv)]
        surv = res.filter(F.col("cluster_id") == cid).select(
            F.col(id_col), F.col("_rv")
        )
        codes = pq_encode(surv, id_col, "_rv", books, scale)
        branches.append(
            pq_adc_topk(codes, id_col, qres, books, k, scale).drop("rank")
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    # Distributed top-k first (TakeOrderedAndProject), then rank the
    # ≤k survivors — the partition-less Window input is bounded by k
    # (round 9; candidates were already nprobe-bucket-bounded).
    order = (F.col("pq_dist").asc(), F.col(id_col).asc())
    top = out.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select(id_col, "pq_dist", "rank")
    )


def kmeans_codebook_df(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iterations: int = 3,
    scale: int = 6,
    metric: str = "cosine",
) -> list[tuple[int, list[float]]]:
    """``kmeans_codebook`` with broadcast-refresh iterations: the
    codebook lives in a k-row DataFrame for the whole training loop
    and the driver never deserializes per-cluster statistics — its
    only data traffic is the final k×d codebook collect.

    Per iteration: the centroid table is folded into a single
    array-of-structs row and broadcast-joined onto the vectors on a
    constant key (BroadcastHashJoin, not a nested-loop product);
    assignment is a scan-side argmax over that array (sims
    materialized once in their own projection — the ivf_assign
    CollapseProject rule — with array_position's first-match giving
    the lowest-cid tie-break, cents sorted by cid); the update is the
    same (cluster, dim) decimal-sum shuffle, reassembled into arrays
    and left-joined onto the previous codebook so empty clusters keep
    their centroid. Each iteration's k-row result is eagerly
    localCheckpointed — truncating what would otherwise be a
    doubling-per-iteration lineage (the codebook feeds both the
    assignment and the empty-cluster fallback).

    Bitwise-identical to ``kmeans_codebook`` by construction: seeds
    are the same k lowest-id vectors; means are CAST(decimal-sum AS
    DOUBLE)/n in both forms; sims use the same rounded fold over the
    same IEEE centroid values (tests/test_stats_similarity.py pins
    list-equality across metrics). Preferable at nlist in the
    thousands, where the collect-form's per-iteration stats
    round-trip and its k·d literal when-chain dominate.
    """
    if metric not in ("cosine", "l2"):
        raise ValueError(f"metric must be cosine|l2, got {metric!r}")
    measure = cosine if metric == "cosine" else l2_sq
    vecs = df.select(
        F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v")
    ).localCheckpoint(eager=True)
    w = Window.orderBy("id")
    cent = (
        vecs.orderBy("id")
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).cast("long").alias("cid"),
            F.col("v").alias("cv"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        cent_row = cent.groupBy().agg(
            F.array_sort(F.collect_list(F.struct("cid", "cv"))).alias("_cents")
        ).withColumn("_k", F.lit(1))
        joined = vecs.withColumn("_k", F.lit(1)).join(
            F.broadcast(cent_row), "_k"
        )
        simmed = joined.select(
            "v",
            F.transform(
                F.col("_cents"), lambda c: measure(F.col("v"), c["cv"], scale)
            ).alias("_sims"),
            F.col("_cents"),
        )
        pick = F.array_max if metric == "cosine" else F.array_min
        assigned = simmed.select(
            "v",
            F.element_at(
                "_cents",
                F.array_position(F.col("_sims"), pick(F.col("_sims"))).cast(
                    "int"
                ),
            )["cid"].alias("cid"),
        )
        stats = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                F.sum(F.col("val").cast("decimal(18,9)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        newc = (
            stats.select(
                "cid",
                "pos",
                (F.col("s").cast("double") / F.col("n")).alias("m"),
            )
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("ncv")
            )
        )
        cent = (
            cent.join(newc, "cid", "left")
            .select("cid", F.coalesce("ncv", "cv").alias("cv"))
            .localCheckpoint(eager=True)
        )
    rows = cent.orderBy("cid").collect()
    return [(int(r["cid"]), [float(x) for x in r["cv"]]) for r in rows]


def pq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dims: int,
    m: int = 4,
    ksub: int = 8,
    iterations: int = 2,
) -> list[list[tuple[int, list[float]]]]:
    """Train a product-quantization codebook: split each vector into
    ``m`` contiguous subspaces of dims/m and run L2 Lloyd k-means
    (``kmeans_codebook``) independently per subspace.

    PQ is the 100 TB memory story for embeddings: a d=64 float vector
    (256 B) compresses to m log2(ksub)-bit codes (here 4×3 bits),
    and ADC scoring never touches the original vectors. Training
    cost: m small k-means runs — at scale, run them on a hash-sample
    (stats.hash_sample) since codebooks need only distributional
    coverage. Deterministic seeds + decimal means keep the whole
    train→encode→score pipeline oracle-reproducible.

    The m subspace trainings are independent, so their Spark jobs are
    submitted CONCURRENTLY from a thread pool (the standard
    multi-job-scheduler pattern): wall-clock is the slowest subspace,
    not the sum (measured 12.9 s → 5.4 s at sf0.1). Results are
    order-stable (ex.map) and bitwise-identical to the serial loop.
    """
    if dims % m != 0:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    from concurrent.futures import ThreadPoolExecutor

    dsub = dims // m

    def train(j: int) -> list[tuple[int, list[float]]]:
        sub = df.select(
            F.col(id_col).alias("id"),
            F.slice(_to_double(F.col(vec_col)), j * dsub + 1, dsub).alias("v"),
        )
        return kmeans_codebook(
            sub, "id", "v", k=ksub, iterations=iterations, metric="l2"
        )

    with ThreadPoolExecutor(max_workers=m) as ex:
        return list(ex.map(train, range(m)))


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: Sequence[Sequence[tuple[int, Sequence[float]]]],
    scale: int = 6,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Encode vectors to PQ codes: per subspace, the id of the
    nearest (min rounded squared-L2, ties low) centroid.

    Pure scan-side column expressions: subvectors materialize once
    in their own projection, each (subspace, centroid) distance fold
    evaluates once, per-subspace argmins select the codes. Zero
    shuffles; output is (id, *keep_cols, codes array<long>) — the
    compressed representation downstream ADC scoring consumes.
    ``keep_cols`` passes extra columns through untouched (e.g. the
    IVF ``cluster_id`` when building the persisted index layout).
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0][1])
    keep = [F.col(c) for c in keep_cols]
    subbed = df.select(
        F.col(id_col),
        *keep,
        *[
            F.slice(_to_double(F.col(vec_col)), j * dsub + 1, dsub).alias(f"_sub{j}")
            for j in range(m)
        ],
    )
    dist_cols = []
    for j, cb in enumerate(codebooks):
        for cid, cv in cb:
            dist_cols.append(
                l2_sq(
                    F.col(f"_sub{j}"),
                    F.array(*[F.lit(float(x)) for x in cv]),
                    scale,
                ).alias(f"_d{j}_{cid}")
            )
    disted = subbed.select(F.col(id_col), *keep, *dist_cols)
    codes = []
    for j, cb in enumerate(codebooks):
        cids = sorted(cid for cid, _ in cb)
        best = None
        for cid in cids:
            c = F.col(f"_d{j}_{cid}")
            best = c if best is None else F.least(best, c)
        code = None
        for cid in cids:
            cond = F.col(f"_d{j}_{cid}") == best
            code = (
                F.when(cond, F.lit(cid))
                if code is None
                else code.when(cond, F.lit(cid))
            )
        codes.append(code.cast("long").alias(f"_c{j}"))
    return disted.select(F.col(id_col), *keep, *codes).select(
        F.col(id_col),
        *keep,
        F.array(*[F.col(f"_c{j}") for j in range(m)]).alias("codes"),
    )


def build_ivfpq_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: Sequence[tuple[int, Sequence[float]]],
    codebooks: Sequence[Sequence[tuple[int, Sequence[float]]]],
    path: str,
    scale: int = 6,
) -> None:
    """Materialize the PRODUCTION ANN layout (VERDICT r4 Next #4):
    one pass assigns every vector to its IVF cluster and PQ-encodes
    it, then writes (id, codes) as parquet PARTITIONED BY cluster_id.

    This separates train/ingest cost from query cost: ``ivfpq_topk``
    re-derives assignment + encode per query (fine for one-off runs,
    wrong for a serving index), while a query over this layout is
    partition pruning (only the ``nprobe`` probed cluster directories
    are even listed) + an ADC literal-table scan over m-byte codes —
    no vector math, no full scan. At 100 TB the index is ~m bytes a
    vector and each query touches nprobe/nlist of it; rebuilds are
    incremental by cluster partition.

    Assignment and encoding reuse the deterministic oracle-mirrored
    primitives, so a query over the index is bit-identical to the
    from-scratch ``ivfpq_topk`` with the same codebooks (pinned by
    tests/test_new_ops_r5.py and the q_ivfpq_pretrained oracle).
    """
    assigned = ivf_assign_df(df, id_col, vec_col, centroids, scale)
    codes = pq_encode(
        assigned, id_col, vec_col, codebooks, scale, keep_cols=("cluster_id",)
    )
    codes.write.mode("overwrite").partitionBy("cluster_id").parquet(path)


def append_to_ivfpq_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: Sequence[tuple[int, Sequence[float]]],
    codebooks: Sequence[Sequence[tuple[int, Sequence[float]]]],
    path: str,
    scale: int = 6,
) -> None:
    """Incremental maintenance of a ``build_ivfpq_index`` layout:
    assign + PQ-encode ONLY the new batch against the FROZEN
    centroids/codebooks and append its rows under the existing
    ``cluster_id=`` partition directories. The existing index is
    never read or rewritten — cost is linear in the batch, not the
    corpus — and ``ivfpq_pretrained_topk`` serving is unchanged
    because partition pruning is directory-level and new files land
    inside the pruned-or-probed directories. This is how a 100 TB
    serving index absorbs a daily ingest without a rebuild; codebook
    refresh (when drift accumulates) stays a separate, rarer
    operation. Equivalence to a from-scratch build over the grown
    corpus is pinned by tests (same frozen codebooks ⇒ bit-identical
    codes for old AND new rows).

    No counterpart in the reference (main.py:1-638); incremental-ANN
    extension per SURVEY §2.9.
    """
    assigned = ivf_assign_df(df, id_col, vec_col, centroids, scale)
    codes = pq_encode(
        assigned, id_col, vec_col, codebooks, scale, keep_cols=("cluster_id",)
    )
    codes.write.mode("append").partitionBy("cluster_id").parquet(path)


def delete_from_ivfpq_index(
    spark: SparkSession,
    path: str,
    id_col: str,
    deleted,
    partition_col: str = "cluster_id",
) -> int:
    """Propagate DELETES into a cluster-partitioned serving layout
    (round 14, VERDICT r13 #4): the remove path ``build_ivfpq_index``
    / ``append_to_ivfpq_index`` lacked, so a right-to-be-forgotten
    purge that rewrote the base table left vector serving stale.
    Works on ANY ``partition_col=``-partitioned parquet layout with
    an id column — the IVF+PQ code index and the SemDeDup kept-vector
    store share the shape.

    The REORG-PURGE pattern applied to the index: only the cluster
    partitions that actually CONTAIN deleted ids are rewritten
    (their survivors re-land under the same directory via dynamic
    partition overwrite); untouched cluster directories keep their
    file identity, so the cost is O(affected partitions), never
    O(index). A partition whose every row is deleted has no
    survivors for dynamic overwrite to replace — its directory is
    removed explicitly. ``deleted`` is a DataFrame carrying
    ``id_col`` (scale path: broadcast against the index) or an
    iterable of ids. Returns the number of index rows removed."""
    if not isinstance(deleted, DataFrame):
        deleted = spark.createDataFrame(
            [(i,) for i in deleted], [id_col]
        )
    dele = F.broadcast(deleted.select(id_col).distinct())
    idx = spark.read.parquet(path)
    per = (
        idx.join(dele, id_col, "left_semi")
        .groupBy(partition_col)
        .count()
        .collect()
    )  # bounded: one row per AFFECTED cluster (≤ nlist)
    if not per:
        return 0
    affected = [r[0] for r in per]
    n_removed = int(sum(r["count"] for r in per))
    survivors = (
        idx.filter(F.col(partition_col).isin(affected))
        .join(dele, id_col, "left_anti")
        # materialize before the self-overwrite (Spark refuses a
        # write over a path its plan still reads); sized by the
        # affected partitions only — the O(masked) purge bound
        .localCheckpoint(eager=True)
    )
    alive = {
        r[0] for r in survivors.select(partition_col).distinct().collect()
    }
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        if alive:
            survivors.write.mode("overwrite").partitionBy(
                partition_col
            ).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for cid in affected:
        if cid not in alive:
            p = jvm.org.apache.hadoop.fs.Path(
                f"{path}/{partition_col}={cid}"
            )
            fs = p.getFileSystem(hconf)
            if fs.exists(p):
                fs.delete(p, True)
    return n_removed


def ivfpq_pretrained_topk(
    spark: SparkSession,
    index_path: str,
    id_col: str,
    query_vec: Sequence[float],
    centroids: Sequence[tuple[int, Sequence[float]]],
    codebooks: Sequence[Sequence[tuple[int, Sequence[float]]]],
    k: int = 10,
    nprobe: int = 1,
    scale: int = 6,
) -> DataFrame:
    """ANN top-k over a persisted ``build_ivfpq_index`` layout: pick
    the ``nprobe`` best clusters driver-side (codebook-sized math),
    scan ONLY those partitions (``cluster_id IN ...`` on the
    partition column → directory-level pruning, asserted via
    files_touched in tests), ADC-score the codes. The only data read
    is the probed clusters' (id, codes) columns."""
    probed = sorted(
        centroids, key=lambda c: (-_cos_py(query_vec, c[1], scale), c[0])
    )[:nprobe]
    probe_ids = [int(cid) for cid, _ in probed]
    idx = spark.read.parquet(index_path).filter(
        F.col("cluster_id").isin(probe_ids)
    )
    return pq_adc_topk(idx, id_col, query_vec, codebooks, k, scale)


def _round_half_up(x: float, scale: int = 6) -> float:
    """Driver-side mirror of the engines' ROUND (exact-decimal
    HALF_UP, not Python's banker's rounding)."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-scale)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def pq_adc_topk(
    codes_df: DataFrame,
    id_col: str,
    query_vec: Sequence[float],
    codebooks: Sequence[Sequence[tuple[int, Sequence[float]]]],
    k: int = 10,
    scale: int = 6,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query's distance
    table (m × ksub rounded partial squared distances, computed
    driver-side with the engines' exact summation order and HALF_UP
    rounding) folds into the plan as literal array lookups — scoring
    touches ONLY the compressed codes, never the original vectors.
    Output distance is √(Σ partials), rounded; ties break by id.
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0][1])

    def part(j: int, cv: Sequence[float]) -> float:
        qs = query_vec[j * dsub : (j + 1) * dsub]
        acc = 0.0
        for a, b in zip(qs, cv):
            acc += (float(a) - float(b)) * (float(a) - float(b))
        return _round_half_up(acc, scale)

    total = None
    for j, cb in enumerate(codebooks):
        table = F.array(
            *[F.lit(part(j, cv)) for _, cv in sorted(cb, key=lambda c: c[0])]
        )
        term = F.element_at(table, (F.element_at("codes", j + 1) + 1).cast("int"))
        total = term if total is None else total + term
    scored = codes_df.select(
        F.col(id_col), F.round(F.sqrt(total), scale).alias("pq_dist")
    )
    # Distributed top-k first, then rank the ≤k survivors (round 9 —
    # see ivfpq_topk's note; same bounded-Window contract).
    order = (F.col("pq_dist").asc(), F.col(id_col).asc())
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select(id_col, "pq_dist", "rank")
    )


def sq_calibrate(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-dimension [min, max] calibration for scalar (int8-style)
    embedding quantization: one posexplode + partial-aggregated
    groupBy over the corpus (or a hash-sample of it upstream —
    calibration only needs representative extrema). Output
    ``(dim, mn, mx)`` with 0-based dims — dim-count rows, metadata-
    sized at any corpus scale.

    No counterpart in the reference (JSON text only, main.py:1-638);
    north-star ANN extension per SURVEY §2.9.
    """
    return (
        df.select(
            F.posexplode(_to_double(F.col(vec_col))).alias("dim", "val")
        )
        .groupBy("dim")
        .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
    )


def _sq_code(val: Column, mn: Column, mx: Column) -> Column:
    """The quantization rule, shared by both layouts: affine map of
    [mn, mx] onto the 256-code grid, round-half-up via floor(x+0.5).
    (val-mn)/(mx-mn) is exactly <= 1.0 in IEEE for val in [mn, mx],
    so codes never overflow 255 — the clamp guards degenerate
    rounding only and is mirrored verbatim in the DuckDB oracle."""
    raw = F.floor((val - mn) / (mx - mn) * F.lit(255.0) + F.lit(0.5))
    clamped = F.least(F.lit(255), F.greatest(F.lit(0), raw.cast("int")))
    return F.when(mx == mn, F.lit(0)).otherwise(clamped)


def sq_quantize_long(
    df: DataFrame, id_col: str, vec_col: str, stats: DataFrame, scale: int = 9
) -> DataFrame:
    """Scalar-quantize vectors against a calibration table, long
    layout: one row per (id, dim) with the int8-style ``code`` in
    [0, 255] and the dequantized ``recon`` (rounded to ``scale``).
    posexplode + BROADCAST join on dim (the stats table is dim-count
    rows) — scan-side at any corpus size, zero wide shuffles. The
    cross-engine-graded form (q_scalar_quant)."""
    ex = df.select(
        F.col(id_col),
        F.posexplode(_to_double(F.col(vec_col))).alias("dim", "val"),
    )
    j = ex.join(F.broadcast(stats), "dim")
    mn, mx = F.col("mn"), F.col("mx")
    code = _sq_code(F.col("val"), mn, mx)
    recon = mn + code.cast("double") / F.lit(255.0) * (mx - mn)
    return j.select(
        F.col(id_col),
        F.col("dim"),
        code.alias("code"),
        F.round(recon, scale).alias("recon"),
    )


def sq_quantize(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    stats_rows: Sequence[tuple[int, float, float]],
) -> DataFrame:
    """Scalar-quantize to the compact serving layout: ``codes``
    array<int> per vector (4x smaller than float32 at int8, 16-32x
    smaller than the double working form), via pure transform
    expressions over the calibration extrema baked in as literals
    (dim-count scalars — the PQ-codebook literal precedent). Codes
    agree elementwise with ``sq_quantize_long`` (unit-gated)."""
    ordered = sorted(stats_rows)
    if [d for d, _, _ in ordered] != list(range(len(ordered))):
        raise ValueError("stats_rows must cover dims 0..D-1 exactly")
    mins = F.array(*[F.lit(float(mn)) for _, mn, _ in ordered])
    maxs = F.array(*[F.lit(float(mx)) for _, _, mx in ordered])
    vec = _to_double(F.col(vec_col))
    codes = F.zip_with(
        vec,
        F.zip_with(mins, maxs, lambda a, b: F.struct(a.alias("mn"), b.alias("mx"))),
        lambda x, s: _sq_code(x, s["mn"], s["mx"]),
    )
    return df.select(F.col(id_col), codes.alias("codes"))


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: Sequence[tuple[int, Sequence[float]]],
    tau: float = 0.9,
    scale: int = 6,
    _preassigned: bool = False,
) -> DataFrame:
    """Cluster-bounded semantic near-duplicate mining — the SemDeDup
    pattern (Abbas et al. 2023, arXiv:2303.09540, public): assign
    every embedding to its nearest frozen centroid, then compare
    pairs only WITHIN a cluster. The cluster bound is what makes
    embedding-level dedup tractable at corpus scale: the quadratic
    term shrinks from N² to Σ|cluster|², and nlist is the knob that
    caps it (SemDeDup's own design argument — clusters of ~√N make
    the total work ~N^1.5; at 100 TB you raise nlist, never the
    pattern). Candidate generation is an equi-join on cluster_id
    (never a cartesian product); cosine is the engine-deterministic
    rounded form shared with every ANN oracle.

    Returns one row per within-cluster pair with similarity ≥ tau:
    (doc_a, doc_b, cluster_id, cos_sim), doc_b < doc_a. Cross-cluster
    near-duplicates are invisible by design — the recall/efficiency
    trade the paper makes; MinHash/LSH rows cover the text-level
    complement.
    """
    # Assign ONCE and materialize: the self-join consumes the
    # assignment on both sides, and without the checkpoint the
    # codebook-broadcast argmax subtree would execute per branch
    # (SemDeDup itself clusters first, then processes — same shape).
    # ``_preassigned`` lets semantic_dedup reuse ITS checkpointed
    # assignment instead of assigning a second time.
    assigned = (
        df
        if _preassigned
        else ivf_assign_df(
            df, id_col, vec_col, centroids, scale
        ).localCheckpoint(eager=True)
    )
    # Norms once per VECTOR (scan side), dots once per PAIR through
    # the Arrow kernel (round 14, guide §4): the old per-pair
    # cosine() re-derived both norms through interpreted zip_with/
    # aggregate lambdas — 3x the inner work at ~20x the per-element
    # cost. round(dot/(na*nb), scale) is bit-identical: same fold
    # order (kernel contract), same product/division sequence, same
    # JVM HALF_UP rounding.
    nrm = _vec_norm_kernel()
    a = assigned.select(
        F.col(id_col).alias("doc_a"),
        F.col(vec_col).alias("_va"),
        nrm(F.col(vec_col)).alias("_na"),
        "cluster_id",
    )
    b = assigned.select(
        F.col(id_col).alias("doc_b"),
        F.col(vec_col).alias("_vb"),
        nrm(F.col(vec_col)).alias("_nb"),
        "cluster_id",
    )
    return (
        a.join(b, "cluster_id")
        .filter(F.col("doc_b") < F.col("doc_a"))
        .withColumn(
            "cos_sim",
            F.round(
                _pair_dot_kernel()(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                scale,
            ),
        )
        .filter(F.col("cos_sim") >= tau)
        .select("doc_a", "doc_b", "cluster_id", "cos_sim")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: Sequence[tuple[int, Sequence[float]]],
    tau: float = 0.9,
    scale: int = 6,
) -> DataFrame:
    """Keep/drop verdicts from ``semantic_dedup_pairs``: a document
    drops iff some SMALLER-id document in its cluster sits within
    the tau-ball (min-id representative survives each duplicate
    neighborhood — deterministic, no iteration). Returns (id,
    cluster_id, dup_of nullable, keep boolean)."""
    assigned = ivf_assign_df(
        df, id_col, vec_col, centroids, scale
    ).localCheckpoint(eager=True)
    pairs = semantic_dedup_pairs(
        assigned.select(id_col, vec_col, "cluster_id"),
        id_col,
        vec_col,
        centroids,
        tau,
        scale,
        _preassigned=True,
    )
    dup_of = pairs.groupBy("doc_a").agg(F.min("doc_b").alias("dup_of"))
    return (
        assigned.select(F.col(id_col), "cluster_id")
        .join(dup_of, F.col(id_col) == F.col("doc_a"), "left")
        .select(
            F.col(id_col),
            "cluster_id",
            "dup_of",
            F.col("dup_of").isNull().alias("keep"),
        )
    )


def incremental_semantic_dedup(
    new_df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: Sequence[tuple[int, Sequence[float]]],
    store: DataFrame | None = None,
    tau: float = 0.9,
    scale: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """Incremental SemDeDup (round 10) — the embedding-tier mirror of
    ``dedup.incremental_dedup`` / the MinHash band store: dedup a NEW
    batch of embeddings against a persisted store of previously-KEPT
    vectors without ever re-scoring history against itself.

    ``store`` holds (id, cluster_id, vec) rows — kept vectors with
    their FROZEN cluster assignment (assignment happened when they
    entered the store; history never re-assigns, so codebook use is
    append-consistent). The new batch assigns ONCE (checkpointed),
    then a row drops iff it sits within the tau-ball of (a) any
    store vector in its cluster, or (b) a smaller-id batch vector in
    its cluster (the min-id-representative rule of
    ``semantic_dedup``, applied batch-internally). ``dup_of`` is the
    minimum matching id across both sources.

    Returns (verdicts, new_store): verdicts = (id, cluster_id,
    dup_of nullable, keep boolean); new_store = store ∪ kept batch
    rows, ready for the next increment.

    Scale shape: both candidate joins are cluster-id equi-joins —
    per-batch cost is |batch|·avg_cluster_load cosines, never
    |history|² and never |batch|·|history|; at 100 TB the store is
    written cluster-partitioned (the ivfpq index layout) so the
    history side prunes to the batch's touched clusters only.
    """
    assigned = ivf_assign_df(
        new_df, id_col, vec_col, centroids, scale
    ).localCheckpoint(eager=True)
    # norms per vector on the scan side, dots per pair through the
    # Arrow kernel — same bit-exact rewrite as semantic_dedup_pairs
    nrm = _vec_norm_kernel()
    dotk = _pair_dot_kernel()
    n = assigned.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        nrm(F.col(vec_col)).alias("_nn"),
        "cluster_id",
    )
    matches = []
    if store is not None:
        h = store.select(
            F.col(id_col).alias("_hid"),
            F.col(vec_col).alias("_hv"),
            nrm(F.col(vec_col)).alias("_hn"),
            "cluster_id",
        )
        matches.append(
            n.join(h, "cluster_id")
            .withColumn(
                "_cs",
                F.round(
                    dotk(F.col("_v"), F.col("_hv"))
                    / (F.col("_nn") * F.col("_hn")),
                    scale,
                ),
            )
            .filter(F.col("_cs") >= tau)
            .select("_id", F.col("_hid").alias("_dup"))
        )
    nb = n.select(
        F.col("_id").alias("_bid"),
        F.col("_v").alias("_bv"),
        F.col("_nn").alias("_bn"),
        "cluster_id",
    )
    matches.append(
        n.join(nb, "cluster_id")
        .filter(F.col("_bid") < F.col("_id"))
        .withColumn(
            "_cs",
            F.round(
                dotk(F.col("_v"), F.col("_bv"))
                / (F.col("_nn") * F.col("_bn")),
                scale,
            ),
        )
        .filter(F.col("_cs") >= tau)
        .select("_id", F.col("_bid").alias("_dup"))
    )
    allm = matches[0]
    for m in matches[1:]:
        allm = allm.unionByName(m)
    dup_of = allm.groupBy("_id").agg(F.min("_dup").alias("dup_of"))
    verdicts = (
        assigned.select(F.col(id_col), "cluster_id", F.col(vec_col))
        .join(dup_of, F.col(id_col) == F.col("_id"), "left")
        .drop("_id")
    )
    kept = verdicts.filter(F.col("dup_of").isNull()).select(
        F.col(id_col), "cluster_id", F.col(vec_col)
    )
    new_store = (
        kept
        if store is None
        else store.select(
            F.col(id_col), "cluster_id", F.col(vec_col)
        ).unionByName(kept)
    )
    return (
        verdicts.select(
            F.col(id_col),
            "cluster_id",
            "dup_of",
            F.col("dup_of").isNull().alias("keep"),
        ),
        new_store,
    )
