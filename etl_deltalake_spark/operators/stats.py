"""Statistical aggregates, exact percentiles, deterministic
sampling, and cardinality estimation (SURVEY §2.8: reduction
aggregations absent in the reference — this module is the
beyond-sum/count half of that surface).

Scale design:
 - Moments (stddev/var/corr/covar) are single-pass partial
   aggregates: map-side partials merge associatively, the shuffle
   carries O(#groups) state. Nothing here materializes rows.
 - ``percentiles`` uses Spark's exact ``percentile`` — a sort-based
   aggregate whose state is the group's values; fine for bounded
   groups. At 100 TB on high-cardinality groups switch to
   ``approx_percentile`` (t-digest, bounded state) — same call
   shape, documented trade.
 - ``hash_sample`` replaces ``df.sample()`` for pipelines that need
   REPRODUCIBLE samples: the predicate is a pure function of the
   key, so it pushes into the scan, survives retries/re-runs, and
   every engine (and the DuckDB oracle) selects the identical rows.
   ``TABLESAMPLE``/``rand()`` give none of those guarantees.
 - ``approx_distinct_check`` pairs HyperLogLog++ with the exact
   count so accuracy is *measured*, not assumed: at 100 TB the
   exact pass is the one you drop, and the recorded error bound is
   what justifies it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_stats(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    scale: int = 6,
) -> DataFrame:
    """Second-moment aggregates per group: stddev/variance of ``x``,
    correlation and sample covariance of ``(x, y)``.

    All four are numerically-stable streaming aggregates in both
    Spark and DuckDB; outputs are rounded to ``scale`` to absorb
    sub-1e-12 merge-order noise (keep x/y O(1)-O(100) magnitude for
    that to hold — see plans/queries.py parity rules).
    """
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.stddev_samp(x_col), scale).alias("x_stddev"),
        F.round(F.var_samp(x_col), scale).alias("x_var"),
        F.round(F.corr(x_col, y_col), scale).alias("xy_corr"),
        F.round(F.covar_samp(x_col, y_col), scale).alias("xy_covar"),
    )


def percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    scale: int = 6,
) -> DataFrame:
    """Exact interpolated percentiles per group (one output column
    per requested probability: ``p25``, ``p50``, ...).

    Exact percentile state is the sorted group — bounded groups
    only; the approx_percentile swap is noted in the module
    docstring.
    """
    aggs = [
        F.round(F.percentile(value_col, F.lit(float(p))), scale).alias(
            f"p{int(round(p * 100)):02d}"
        )
        for p in probs
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    threshold: float = 3.0,
    scale: int = 6,
) -> DataFrame:
    """Robust per-group outlier stats via the Median Absolute
    Deviation: median, MAD = median(|x − median|), and the count of
    rows whose |x − median| exceeds ``threshold`` · MAD — the robust
    alternative to z-scores (a single wild value shifts a mean/std
    arbitrarily but moves a median/MAD by at most one rank).

    Shape: one grouped median pass, a broadcast-backed join of the
    O(#groups) median table onto the rows, then a per-group window
    computing MAD whose partitioning the final groupBy reuses —
    shuffles carry (group, value) pairs. Exact medians sort the
    group — bounded groups only, same contract as ``percentiles``;
    swap approx_percentile at unbounded group size.

    Output: group_cols, n, med, mad, n_outliers.
    """
    gcols = list(group_cols)
    med = df.groupBy(*gcols).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med"),
    )
    dev = df.join(F.broadcast(med), gcols).withColumn(
        "_adev", F.abs(F.col(value_col) - F.col("_med"))
    )
    w = Window.partitionBy(*gcols)
    dev = dev.withColumn("_mad", F.percentile("_adev", F.lit(0.5)).over(w))
    return (
        dev.groupBy(*gcols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("_med"), scale).alias("med"),
            F.round(F.first("_mad"), scale).alias("mad"),
            F.sum(
                F.when(
                    F.col("_adev") > F.lit(threshold) * F.col("_mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


def hash_sample(df: DataFrame, key: Column, rate_16ths: int = 1) -> DataFrame:
    """Deterministic ~``rate_16ths``/16 Bernoulli sample.

    Keeps rows whose md5(key) first hex digit < rate_16ths. The
    filter is a scan-side predicate on a content hash: reproducible
    across runs, engines, and task retries, and it composes with
    partition pruning (unlike rand()-based sampling).
    """
    if not 1 <= rate_16ths <= 15:
        raise ValueError("rate_16ths must be in [1, 15]")
    digits = "0123456789abcdef"[:rate_16ths]
    first = F.substring(F.md5(key.cast("string")), 1, 1)
    return df.filter(first.isin(*digits))


def approx_distinct_check(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    rsd: float = 0.01,
    tolerance: float = 0.05,
) -> DataFrame:
    """Exact vs HyperLogLog++ distinct count per group, with the
    relative error and a within-``tolerance`` flag.

    The exact count is the oracle-checked output; the HLL column is
    graded against it inside the query itself (the sketch is
    engine-specific, so no cross-engine hash can pin its value —
    pinning the ERROR BOUND is the honest contract).
    """
    out = df.groupBy(*group_cols).agg(
        F.countDistinct(value_col).alias("exact_distinct"),
        F.approx_count_distinct(value_col, rsd).alias("_approx"),
    )
    rel_err = F.abs(F.col("_approx") - F.col("exact_distinct")) / F.col(
        "exact_distinct"
    )
    # An all-null group has exact_distinct = 0; rel_err would be NULL
    # there, so the verdict degenerates to "sketch also says 0".
    ok = F.when(
        F.col("exact_distinct") == 0, F.col("_approx") == 0
    ).otherwise(rel_err <= tolerance)
    return out.select(
        *group_cols,
        "exact_distinct",
        ok.alias("approx_ok"),
    )


def exact_mean_var(n, s1, s2, d2: int = 4):
    """Mean and sample variance from exact decimal sufficient
    statistics (count, Σx, Σx² — already cast to bounded decimals by
    the caller): mean = Σx/n, var = (n·Σx² − (Σx)²)/(n·(n−1)).

    The shared arithmetic behind ``rolling_stats``, ``standardize``
    (and the same ladder ``grouped_linreg`` extends to covariances):
    products re-cast to DECIMAL(30,d2) so both engines' 38-digit cap
    is respected, then one exact subtraction before the double
    division. Callers mirror this shape verbatim in their oracles.
    """
    mean = s1.cast("double") / n
    var = (
        (n.cast("decimal(12,0)") * s2).cast(f"decimal(30,{d2})")
        - (s1 * s1).cast(f"decimal(30,{d2})")
    ).cast("double") / (n * (n - F.lit(1)))
    return mean, var


def grouped_linreg(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    decimals: int = 2,
) -> DataFrame:
    """Per-group ordinary-least-squares fit y = slope·x + intercept,
    with the squared correlation (r²) — the regr_slope/regr_intercept
    /regr_r2 aggregate family, built from exact sufficient statistics.

    Inputs quantize to DECIMAL at ``decimals``; the five sums
    (Σx, Σy, Σx², Σy², Σxy) then accumulate exactly, so they are
    order-insensitive single-pass partial aggregates (map-side
    combine, O(#groups) shuffle state — the same scale shape as any
    groupBy sum at 100 TB) AND the float math downstream is a pure
    function of exact integers, reproducible bitwise by the SQL
    oracle. Built-in ``regr_slope`` folds doubles in partition order,
    which no cross-engine oracle can pin.

    Groups with zero x-variance get NULL slope/intercept/r2 (vertical
    line); output is rounded at 6.
    """
    x = F.col(x_col).cast(f"decimal(18,{decimals})")
    y = F.col(y_col).cast(f"decimal(18,{decimals})")
    agg = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
        F.sum(x * y).alias("_sxy"),
    )
    n = F.col("n")
    # Bounded re-casts keep every decimal product inside BOTH engines'
    # 38-digit cap (Spark silently rounds via precision-loss past it,
    # DuckDB errors). Sizes assume quantized business measures: first
    # moments fit (18,2), second moments (24,4), group counts (12,0).
    d1, d2 = decimals, 2 * decimals
    n_d = n.cast("decimal(12,0)")
    sx = F.col("_sx").cast(f"decimal(18,{d1})")
    sy = F.col("_sy").cast(f"decimal(18,{d1})")
    sxx = F.col("_sxx").cast(f"decimal(24,{d2})")
    syy = F.col("_syy").cast(f"decimal(24,{d2})")
    sxy = F.col("_sxy").cast(f"decimal(24,{d2})")

    def _diff(prod_a, prod_b):
        return (
            prod_a.cast(f"decimal(30,{d2})") - prod_b.cast(f"decimal(30,{d2})")
        ).cast("double")

    num = _diff(n_d * sxy, sx * sy)
    den_x = _diff(n_d * sxx, sx * sx)
    den_y = _diff(n_d * syy, sy * sy)
    slope = F.when(den_x != 0, num / den_x)
    intercept = (sy.cast("double") - slope * sx.cast("double")) / n
    r2 = F.when((den_x != 0) & (den_y != 0), (num * num) / (den_x * den_y))
    return agg.select(
        *group_cols,
        n.alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Fixed-range equi-width histogram (optionally per group):
    bucket i covers [lo + i·w, lo + (i+1)·w) with w = (hi−lo)/n,
    except the last bucket which is closed at ``hi``; values outside
    [lo, hi] are clamped into the edge buckets (standard profiling
    semantics — out-of-range mass stays visible at the edges instead
    of vanishing).

    One aggregation on (group, bucket) — map-side combine caps
    shuffle rows at n_buckets per group per partition, the same
    shape as any groupBy count at 100 TB. Empty buckets are absent
    from the output (dense output would need a grid join; callers
    charting the result left-join a sequence).

    Bucket edges come from the caller (fixed range), not a data
    scan, so the plan is single-pass and the bucket function is a
    pure per-row expression both engines reproduce bitwise.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / n_buckets
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(lo)) / F.lit(width)).cast("bigint")
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1))
    gcols = list(group_cols or [])
    return (
        df.filter(v.isNotNull())
        .select(*gcols, bucket.alias("bucket"))
        .groupBy(*gcols, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *gcols,
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 6).alias(
                "bucket_lo"
            ),
            F.round(
                F.lit(lo) + (F.col("bucket") + 1) * F.lit(width), 6
            ).alias("bucket_hi"),
            "n",
        )
    )


def approx_percentile_check(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    prob: float = 0.5,
    accuracy: int = 10000,
    rel_tolerance: float = 0.05,
    scale: int = 6,
) -> DataFrame:
    """Exact vs approximate (Greenwald-Khanna / t-digest-style)
    percentile per group, with a within-tolerance verdict — the
    quantile twin of ``approx_distinct_check``.

    The exact interpolated percentile is the oracle-checked output;
    the sketch value is graded INSIDE the query (sketch internals
    are engine-specific — pinning the error bound is the honest
    cross-engine contract). At 100 TB the exact sort-based aggregate
    is the one you drop; the recorded bound justifies it.

    Groups whose exact percentile is 0 fall back to an absolute
    check (approx == 0) to avoid a divide-by-zero NULL verdict.
    """
    out = df.groupBy(*group_cols).agg(
        F.round(F.percentile(value_col, F.lit(float(prob))), scale).alias(
            "exact_pct"
        ),
        F.approx_percentile(
            value_col, F.lit(float(prob)), F.lit(accuracy)
        ).alias("_approx"),
    )
    rel_err = F.abs(F.col("_approx") - F.col("exact_pct")) / F.abs(
        F.col("exact_pct")
    )
    ok = F.when(
        F.col("exact_pct") == 0, F.col("_approx") == 0
    ).otherwise(rel_err <= rel_tolerance)
    return out.select(*group_cols, "exact_pct", ok.alias("approx_ok"))


def value_entropy(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Shannon entropy (nats) of ``value_col``'s value distribution
    per group — the profiling signal for key skew / dedup potential
    (H = 0 means one value dominates totally; H = ln(distinct) means
    uniform).

    Two chained aggregations: value counts (map-side combine), then
    the entropy reduction per group. The per-value terms −p·ln p are
    quantized to DECIMAL(18,12) before the final sum, so the
    reduction is order-insensitive and the SQL oracle reproduces it
    bitwise; p itself is a ratio of exact longs. NULLs count as a
    regular category (profiling wants to see them).
    """
    gcols = list(group_cols)
    counts = (
        df.select(*gcols, F.col(value_col).alias("_v"))
        .groupBy(*gcols, "_v")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # total per group via a second aggregation (not a window over the
    # counts: keeps the plan map-combinable at any group cardinality)
    totals = counts.groupBy(*gcols).agg(F.sum("_c").alias("_n"))
    if gcols:
        # null-SAFE key equality: a NULL group key is a real group in
        # a profiling tool; plain equality would silently drop it
        t = totals.select(
            *[F.col(g).alias(f"_g_{g}") for g in gcols], "_n"
        )
        cond = None
        for g in gcols:
            c = F.col(g).eqNullSafe(F.col(f"_g_{g}"))
            cond = c if cond is None else cond & c
        joined = counts.join(t, cond).drop(*[f"_g_{g}" for g in gcols])
    else:
        joined = counts.crossJoin(totals)
    p = F.col("_c").cast("double") / F.col("_n").cast("double")
    term = (-p * F.log(p)).cast("decimal(18,12)")
    return (
        joined.select(*gcols, term.alias("_t"), F.col("_n"))
        .groupBy(*gcols)
        .agg(
            F.round(F.sum("_t").cast("double"), 6).alias("entropy"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
    )


def standardize(
    df: DataFrame,
    cols: Sequence[str],
    decimals: int = 2,
    scale: int = 6,
) -> DataFrame:
    """Feature scaling: per input column, append the z-score
    (``{c}_z``) and min-max ([0,1], ``{c}_mm``) normalized values —
    the standard model-input prep transform.

    One aggregation computes every column's sufficient statistics
    (exact decimal sums → deterministic mean/std, same bounded-cast
    discipline as ``grouped_linreg``); the 1-row stats frame
    broadcast-cross-joins back so scaling is a scan-side expression.
    Constant columns (std 0 / zero range) yield NULL scaled values
    rather than ±inf.
    """
    d1, d2 = decimals, 2 * decimals
    aggs = []
    for c in cols:
        v = F.col(c).cast(f"decimal(18,{d1})")
        aggs += [
            F.count(F.col(c)).alias(f"_n_{c}"),
            F.sum(v).cast(f"decimal(18,{d1})").alias(f"_s1_{c}"),
            F.sum(v * v).cast(f"decimal(24,{d2})").alias(f"_s2_{c}"),
            F.min(v).alias(f"_mn_{c}"),
            F.max(v).alias(f"_mx_{c}"),
        ]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    keep = list(df.columns)
    scaled = []
    for c in cols:
        n = F.col(f"_n_{c}")
        s1, s2 = F.col(f"_s1_{c}"), F.col(f"_s2_{c}")
        mn, mx = F.col(f"_mn_{c}"), F.col(f"_mx_{c}")
        mean, var = exact_mean_var(n, s1, s2, d2)
        std = F.when(n > 1, F.sqrt(F.greatest(var, F.lit(0.0))))
        x = F.col(c).cast("double")
        z = F.when(std > 0, (x - mean) / std)
        rng = (mx - mn).cast("double")
        mm = F.when(rng > 0, (x - mn.cast("double")) / rng)
        scaled += [
            F.round(z, scale).alias(f"{c}_z"),
            F.round(mm, scale).alias(f"{c}_mm"),
        ]
    return out.select(*keep, *scaled)


def quantile_bucket(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 4,
    out_col: str = "qbucket",
    scale: int = 6,
) -> DataFrame:
    """Equi-depth bucketing (quantile discretizer): bucket i holds
    values in [q_{i/n}, q_{(i+1)/n}) by exact interpolated
    percentile cutpoints, the last bucket closed above.

    The n−1 cutpoints are a single exact-percentile aggregate — a
    driver-resident list of n−1 doubles (the same codebook-only
    collect contract as the ANN operators) that folds back into the
    scan as a literal comparison chain: rows never shuffle. Rounded
    cutpoints (``scale``) keep the boundary comparisons
    engine-reproducible. NULL values get a NULL bucket.

    At 100 TB swap the exact percentile for approx_percentile (same
    call shape, bounded state) — the bucket boundaries move within
    the sketch's rank-error bound, the plan doesn't change.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        *[
            F.round(
                F.percentile(value_col, F.lit(float(p))), scale
            ).alias(f"_q{i}")
            for i, p in enumerate(probs)
        ]
    ).collect()[0]
    cuts = [row[f"_q{i}"] for i in range(len(probs))]
    v = F.col(value_col).cast("double")
    bucket = F.lit(0)
    for c in cuts:
        if c is not None:
            bucket = bucket + F.when(v >= F.lit(float(c)), 1).otherwise(0)
    return df.withColumn(
        out_col, F.when(v.isNotNull(), bucket.cast("bigint"))
    )


def winsorize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    scale: int = 6,
) -> DataFrame:
    """Per-group winsorization: clamp ``value_col`` into the group's
    [p_lo, p_hi] exact interpolated percentile band (rounded to
    ``scale`` so the bounds — and therefore every clamped value —
    are cross-engine exact). Appends ``{value_col}_wins`` plus the
    bounds; rows and other columns pass through.

    The robust outlier-capping step of feature cleaning: unlike a
    filter it keeps row counts stable (no survivorship bias), unlike
    z-score clipping it is distribution-free.

    Scale shape: ONE groupBy computes the per-group bounds
    (#groups-sized → broadcast), the clamp is a map-side
    least/greatest after a BroadcastHashJoin — the raw rows never
    shuffle. Exact percentile state is the sorted group (bounded
    groups; swap approx_percentile at unbounded cardinality, module
    docstring).
    """
    bounds = df.groupBy(*group_cols).agg(
        F.round(F.percentile(value_col, F.lit(float(lo))), scale).alias("_lo"),
        F.round(F.percentile(value_col, F.lit(float(hi))), scale).alias("_hi"),
    )
    clipped = F.least(
        F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi")
    )
    return (
        df.join(F.broadcast(bounds), list(group_cols))
        .withColumn(f"{value_col}_wins", clipped)
        .withColumnRenamed("_lo", f"{value_col}_lo")
        .withColumnRenamed("_hi", f"{value_col}_hi")
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    num: int,
    denom: int,
    counters: int | None = None,
) -> DataFrame:
    """EXACT frequent-item mining at unbounded key cardinality:
    two-phase Misra-Gries. Returns every value whose count is
    >= (num/denom) of the non-null total, with its exact count —
    no approximation in the result, bounded memory in the plan.

    Why not a plain groupBy+HAVING? At 100 TB the value column (e.g.
    every word of a web corpus) has billions of distinct keys; a full
    groupBy shuffles and materializes all of them to keep the handful
    above threshold. Here:

      phase 1  per-partition weighted Misra-Gries with k counters
               (Arrow-batched mapInPandas, O(k) memory per task).
               MG guarantees any item with partition count
               > n_p/(k+1) survives in the counters; an item with
               global share >= num/denom must have local share
               >= num/denom on at least one partition (averaging),
               so with k >= denom/num the union of per-partition
               survivors is a SUPERSET of the true heavy hitters.
               We use k = 2*ceil(denom/num) for slack.
      phase 2  exact recount restricted to the candidate set
               (broadcast semi-join — candidates are <= k per
               partition, tiny) and an integer-exact threshold test
               cnt*denom >= num*N. False candidates are filtered by
               their exact counts, so the output is EXACT and
               independent of partitioning.

    The threshold is a rational (num, denom), never a float — the
    comparison is integer arithmetic, bit-identical in any engine.
    Shuffle traffic: candidate keys only. The total-count scalar is a
    single-row broadcast cross join (the q_bm25 pattern).
    """
    import pandas as pd

    if num <= 0 or denom <= 0:
        raise ValueError("threshold num/denom must be positive")
    k = counters if counters is not None else 2 * ((denom + num - 1) // num)
    if k < (denom + num - 1) // num:
        raise ValueError(
            f"counters={k} breaks the superset guarantee: need >= denom/num "
            f"= {(denom + num - 1) // num}"
        )

    vals = df.select(F.col(col).cast("string").alias("_v")).filter(
        F.col("_v").isNotNull()
    )

    def mg(batches):
        cnt: dict[str, int] = {}
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            # weighted MG: fold each Arrow batch's value_counts in,
            # decrementing all k counters when a new key arrives at
            # capacity (error <= n_p/(k+1), the classic bound)
            for v, c in pdf["_v"].value_counts().items():
                c = int(c)
                if v in cnt:
                    cnt[v] += c
                elif len(cnt) < k:
                    cnt[v] = c
                else:
                    d = min(c, min(cnt.values()))
                    cnt = {x: n - d for x, n in cnt.items() if n > d}
                    if c > d:
                        cnt[v] = c - d
        # candidates plus ONE per-partition row-count row (_v NULL):
        # the total N rides out of the same pass, so the input is
        # scanned exactly twice overall (MG + exact recount) — the
        # two-phase minimum — instead of a third total-count scan
        yield pd.DataFrame(
            {
                "_v": list(cnt.keys()) + [None],
                "_n": [0] * len(cnt) + [n_part],
            }
        )

    pass1 = vals.mapInPandas(mg, "_v string, _n long").localCheckpoint(
        eager=True
    )
    cands = pass1.filter(F.col("_v").isNotNull()).select("_v").distinct()
    total = pass1.agg(F.sum("_n").alias("_N"))
    exact = (
        vals.join(F.broadcast(cands), "_v", "left_semi")
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * denom >= num * F.col("_N"))
        .select(F.col("_v").alias(col), "cnt")
    )


def cms_counts(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-min sketch frequency estimates, verified in-query
    against exact counts — the point-frequency member of the sketch
    family (HLL distinct counts, GK quantiles, and now CMS), with
    the same honest-accuracy contract as ``approx_distinct_check``.

    ``depth`` md5-derived hash rows of ``width`` buckets each; a
    key's estimate is the MIN of its buckets' counts. CMS never
    underestimates (every occurrence of the key lands in all of its
    buckets), so ``never_under`` must be uniformly true — that
    invariant plus the measured overestimate IS the output. The
    sketch is deterministic (md5 buckets), so the DuckDB oracle
    rebuilds the identical sketch and the whole estimate is
    cross-engine exact.

    Scale: the sketch is depth × width counters built by ``depth``
    map-combinable aggregations — at 100 TB it replaces an exact
    per-key count whose key cardinality no longer fits; here both
    are computed to grade the sketch.
    """

    def bucket(i: int) -> Column:
        h = F.substring(
            F.md5(F.concat(F.lit(f"{i}:"), F.col("k").cast("string"))), 1, 8
        )
        return F.pmod(F.conv(h, 16, 10).cast("long"), F.lit(width))

    hashed = df.select(F.col(key_col).alias("k")).select(
        "k", *[bucket(i).alias(f"_b{i}") for i in range(depth)]
    )
    per_key = hashed.groupBy("k", *[f"_b{i}" for i in range(depth)]).agg(
        F.count(F.lit(1)).alias("exact")
    )
    # each sketch row reduces from the per-key table (bucket counts =
    # Σ exact over keys in the bucket) — ONE scan of the raw data
    # instead of depth+1
    per_key = per_key.localCheckpoint(eager=False)
    est = None
    out = per_key
    for i in range(depth):
        sketch_i = (
            per_key.groupBy(F.col(f"_b{i}").alias("_sb"))
            .agg(F.sum("exact").alias(f"_c{i}"))
        )
        out = out.join(
            F.broadcast(sketch_i), out[f"_b{i}"] == sketch_i["_sb"]
        ).drop("_sb")
        c = F.col(f"_c{i}")
        est = c if est is None else F.least(est, c)
    return out.select(
        F.col("k").alias(key_col),
        "exact",
        est.alias("cms_est"),
        (est >= F.col("exact")).alias("never_under"),
    )


def ab_welch(
    df: DataFrame,
    group_cols: Sequence[str],
    variant_col: str,
    value_col: str,
    a: str,
    b: str,
    d1: int = 6,
    d2: int = 6,
    scale: int = 6,
) -> DataFrame:
    """Two-sample Welch t statistic per group for an A/B experiment:
    means, sample variances, and t = (mean_a − mean_b) /
    sqrt(var_a/n_a + var_b/n_b) — unequal variances, no pooling.

    Exactness contract (the grouped_linreg ladder): per-variant
    sufficient statistics (n, Σx, Σx²) accumulate as bounded
    DECIMALs in ONE conditional aggregation pass — order-independent
    and bitwise cross-engine — then the handful of double
    divisions/sqrt mirror the oracle's expression tree exactly and
    round to ``scale``. Groups with a singleton variant emit NULL t
    (variance undefined), never a divide-by-zero.

    Scale: one groupBy shuffle carrying O(#groups) decimal state;
    the t arithmetic is driver-free column math on the aggregate.
    """
    v = F.col(value_col).cast(f"decimal(18,{d1})")
    v2 = (v * v).cast(f"decimal(30,{d2})")

    def side(tag: str, variant: str) -> list:
        cond = F.col(variant_col) == variant
        return [
            # count of the VALUE expression, so NULL metrics are
            # excluded from n exactly as they are from the sums
            F.count(F.when(cond, v)).alias(f"n_{tag}"),
            F.sum(F.when(cond, v)).alias(f"_s1_{tag}"),
            F.sum(F.when(cond, v2)).alias(f"_s2_{tag}"),
        ]

    agg = df.groupBy(*group_cols).agg(*side("a", a), *side("b", b))

    def mean_var(tag: str):
        n = F.col(f"n_{tag}")
        m, var = exact_mean_var(
            n, F.col(f"_s1_{tag}"), F.col(f"_s2_{tag}"), d2=d2
        )
        return m, F.when(n > 1, var)

    m_a, v_a = mean_var("a")
    m_b, v_b = mean_var("b")
    t = (m_a - m_b) / F.sqrt(
        v_a / F.col("n_a") + v_b / F.col("n_b")
    )
    return agg.select(
        *group_cols,
        "n_a",
        "n_b",
        F.round(m_a, scale).alias("mean_a"),
        F.round(m_b, scale).alias("mean_b"),
        F.round(t, scale).alias("t_stat"),
    )


def deterministic_mode(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Most-frequent value per group with a TOTAL tie-break
    (count DESC, then lowest value) — native ``mode()`` in both
    Spark and DuckDB leaves ties implementation-defined, which makes
    it unusable wherever reproducibility is a contract (and
    impossible to oracle-pair). Output: group_cols, mode_val,
    mode_cnt; NULL values are excluded (a group of only NULLs drops,
    matching SQL mode semantics).

    Two keyed aggregations: (group, value) counts, then one
    row_number window on the group — both shuffles carry
    (group, value, count) triples.
    """
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).alias("mode_cnt"))
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("mode_cnt"), F.col(value_col).asc()
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *group_cols,
            F.col(value_col).alias("mode_val"),
            "mode_cnt",
        )
    )


def grouped_isotonic(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group isotonic regression via pool-adjacent-violators
    (PAVA): the least-squares non-decreasing fit of y as a function
    of x — the standard probability-calibration step (isotonic
    calibration of model scores) and a genuinely non-SQL-expressible
    algorithm, which makes it the engine's grouped ``applyInPandas``
    exemplar (the batch grouped-map member of the Python-surface
    triad: scalar pandas_udf, mapInPandas, UDTF, grouped map,
    applyInPandasWithState).

    Each group is fit independently: rows sort by (x, y, id) — a
    total order, so tied x values process deterministically — then
    one O(n) PAVA pass merges adjacent violating blocks into their
    mean. Output: group_cols, id, x, y, y_iso (block means, rounded
    to 9 so results are partitioning-independent).

    Scale: one groupBy shuffle; each group must fit one executor's
    memory (the grouped-map contract — same bound as exact
    percentiles). Fit is vectorized numpy inside Arrow batches.
    Verified against an independent reference PAVA plus the isotonic
    optimality conditions in tests/test_new_ops_r4.py.
    """
    import numpy as np
    import pandas as pd

    gcols = list(group_cols)
    out_fields = gcols + [id_col, x_col, y_col, "y_iso"]

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([x_col, y_col, id_col], kind="mergesort")
        y = pdf[y_col].to_numpy(dtype="float64")
        # PAVA with a block stack: (sum, count) per block
        sums: list[float] = []
        cnts: list[int] = []
        for v in y:
            sums.append(float(v))
            cnts.append(1)
            while (
                len(sums) > 1
                and sums[-2] * cnts[-1] > sums[-1] * cnts[-2]
            ):
                s, c = sums.pop(), cnts.pop()
                sums[-1] += s
                cnts[-1] += c
        fit_vals = np.concatenate(
            [np.full(c, s / c) for s, c in zip(sums, cnts)]
        )
        pdf = pdf.copy()
        pdf["y_iso"] = np.round(fit_vals, 9)
        return pdf[out_fields]

    sample = df.select(*gcols, id_col, x_col, y_col).schema
    types = {f.name: f.dataType.simpleString() for f in sample.fields}
    schema = ", ".join(
        [f"{c} {types[c]}" for c in gcols]
        + [
            f"{id_col} {types[id_col]}",
            f"{x_col} {types[x_col]}",
            f"{y_col} {types[y_col]}",
            "y_iso double",
        ]
    )
    return (
        df.select(*gcols, id_col, x_col, y_col)
        .groupBy(*gcols)
        .applyInPandas(fit, schema)
    )


def benford_profile(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    scale: int = 6,
) -> DataFrame:
    """First-significant-digit distribution per group vs Benford's
    law — the classic fabricated-data / unit-mix smell test for
    financial columns. Output per (group, digit 1-9): observed
    count, observed fraction, and the Benford expectation
    log10(1 + 1/d), both rounded to ``scale``.

    Digit extraction avoids float log/pow boundary hazards entirely:
    the value renders through an exact DECIMAL(18,2) cast to a plain
    string (identical rendering in any engine — no scientific
    notation) and the first [1-9] match is the digit. Zero values
    drop (they have no leading significant digit).

    One groupBy on (group, digit); totals ride a per-group window
    over the 9-row-per-group aggregate — nothing data-sized
    shuffles twice.
    """
    import math

    s = F.abs(F.col(value_col)).cast("decimal(18,2)").cast("string")
    digit = F.regexp_extract(s, "[1-9]", 0)
    base = (
        df.filter(F.abs(F.col(value_col)) > 0)
        .select(*group_cols, digit.alias("digit"))
        .filter(F.col("digit") != "")
    )
    counts = base.groupBy(*group_cols, "digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    w = Window.partitionBy(*group_cols)
    benford = None
    for d in range(1, 10):
        frac = F.lit(round(math.log10(1 + 1 / d), scale))
        benford = (
            F.when(F.col("digit") == str(d), frac)
            if benford is None
            else benford.when(F.col("digit") == str(d), frac)
        )
    return counts.select(
        *group_cols,
        "digit",
        "n_obs",
        F.round(F.col("n_obs") / F.sum("n_obs").over(w), scale).alias(
            "obs_frac"
        ),
        benford.alias("benford_frac"),
    )


def tukey_outliers(
    df: DataFrame, group_cols: list[str], value_col: str, whisker: float = 1.5
) -> DataFrame:
    """Per-group Tukey-fence outlier summary (round 5): fences at
    Q1 − w·IQR and Q3 + w·IQR from the exact interpolated quartiles,
    counting rows beyond each fence — the box-plot outlier rule, the
    robust complement of the z-score (q_rolling_anomaly) and MAD
    (q_mad) detectors already graded.

    Two aggregations: per-group quartiles (exact percentile — at
    100 TB swap for approx_percentile, same shape), then a broadcast
    join of the fence row back onto the group for the counts.
    Output: group cols, q1, q3, iqr, lo_fence, hi_fence, n_low,
    n_high, n_rows.
    """
    q = df.groupBy(*group_cols).agg(
        F.percentile(value_col, F.lit(0.25)).alias("q1"),
        F.percentile(value_col, F.lit(0.75)).alias("q3"),
    )
    q = q.withColumn("iqr", F.col("q3") - F.col("q1")).withColumn(
        "lo_fence", F.col("q1") - F.lit(whisker) * F.col("iqr")
    ).withColumn("hi_fence", F.col("q3") + F.lit(whisker) * F.col("iqr"))
    joined = df.join(F.broadcast(q), group_cols)
    return (
        joined.groupBy(*group_cols)
        .agg(
            F.round(F.first("q1"), 6).alias("q1"),
            F.round(F.first("q3"), 6).alias("q3"),
            F.round(F.first("iqr"), 6).alias("iqr"),
            F.round(F.first("lo_fence"), 6).alias("lo_fence"),
            F.round(F.first("hi_fence"), 6).alias("hi_fence"),
            F.sum(
                F.when(F.col(value_col) < F.col("lo_fence"), 1).otherwise(0)
            ).alias("n_low"),
            F.sum(
                F.when(F.col(value_col) > F.col("hi_fence"), 1).otherwise(0)
            ).alias("n_high"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_KMV_DOMAIN = float(1 << 60)


def _kmv_hash(item: Column) -> Column:
    """60-bit uniform hash shared with the DuckDB oracle: first 15
    hex digits of md5 (same function, same UTF-8 bytes in both
    engines — the repo's standard cross-engine hash trick)."""
    return F.conv(
        F.substring(F.md5(item.cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_sketch_est(
    df: DataFrame,
    group_col: Column,
    item: Column,
    k: int = 64,
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per group, plus a
    merged all-groups union row — the MERGEABLE tier above
    ``approx_distinct_check``'s HLL: a KMV sketch is just the k
    smallest distinct hash values, so sketches union by "merge the
    arrays, keep the k smallest" with no sketch-format machinery, and
    the union estimate is computed from sketch CONTENTS alone (never
    re-touching the data — how 100 TB per-partition sketches roll up
    to a global count). Estimator: exact when a group holds fewer
    than k distinct hashes (the sketch IS the set), else
    ``(k-1) * 2^60 / h_k`` with ``h_k`` the k-th smallest.

    Everything is deterministic (md5 hashing, no sampling), so the
    DuckDB oracle re-derives sketch and estimate exactly — unlike
    HLL, whose register layout is engine-private. Output:
    ``(grp, n_sketch, h_k, est)`` per group and one ``__union__``
    row; ``h_k`` is null on the exact branch.

    Shuffle posture: one distinct (partial-aggregated) + a per-group
    top-k window over hashes (k rows of state per group); the union
    row re-ranks the ≤ groups*k retained hashes — sketch-sized, not
    data-sized.

    No counterpart in the reference (main.py:1-638); SURVEY §2.8
    reduction-family extension.
    """
    pairs = (
        df.select(group_col.alias("grp"), _kmv_hash(item).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    ranked = pairs.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )

    def estimate(sketch: DataFrame) -> DataFrame:
        # n_sketch == sketch size; h_k only exists when the sketch is
        # full (rank k present) — which is exactly the estimator branch
        agg = sketch.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n_sketch"),
            F.max(F.when(F.col("rk") == k, F.col("h"))).alias("h_k"),
        )
        return agg.select(
            "grp",
            "n_sketch",
            "h_k",
            F.round(
                F.when(
                    F.col("h_k").isNull(), F.col("n_sketch").cast("double")
                ).otherwise(
                    F.lit(float(k - 1))
                    * F.lit(_KMV_DOMAIN)
                    / F.col("h_k").cast("double")
                ),
                6,
            ).alias("est"),
        )

    per_group = estimate(ranked)
    merged = (
        ranked.select("h")
        .distinct()
        .withColumn("grp", F.lit("__union__"))
        .withColumn(
            "rk", F.row_number().over(Window.partitionBy("grp").orderBy("h"))
        )
        .filter(F.col("rk") <= k)
    )
    union_row = estimate(merged)
    return per_group.unionByName(union_row)


def kmv_jaccard(
    df: DataFrame,
    group_col: Column,
    item: Column,
    k: int = 64,
) -> DataFrame:
    """Pairwise Jaccard similarity between groups estimated from KMV
    sketch CONTENTS alone — the set-algebra half of the sketch tier
    (``kmv_sketch_est`` covers cardinality + union): for each
    candidate pair, pool the two k-minima sketches, keep the k
    smallest of the pool, and estimate J = |both| / |pool top-k|
    (the classic bottom-k estimator: the merged minima are a uniform
    sample of the union, so the fraction present in both sides is an
    unbiased Jaccard estimate).

    Candidate pairs are derived by EQUI-JOINING sketches on the hash
    value — only pairs sharing at least one sketch minimum surface.
    That is the 100 TB shape: with millions of groups, enumerating
    all group pairs is quadratic death; evidence-driven candidates
    (the LSH move) surface exactly the pairs with non-trivial
    overlap, and an absent pair reads as J ~ 0. Everything after the
    per-group sketch is sketch-sized: joins on h and on group id,
    one per-pair top-k window.

    Output: ``(grp_a, grp_b, k_used, n_both, jacc)`` for grp_a <
    grp_b. Deterministic (md5 hashing), so the DuckDB oracle replays
    candidates, pooling, and the estimator exactly.
    """
    pairs = (
        df.select(group_col.alias("grp"), _kmv_hash(item).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    sk = (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("grp", "h")
    )
    cand = (
        sk.select(F.col("grp").alias("ga"), "h")
        .join(sk.select(F.col("grp").alias("gb"), "h"), "h")
        .filter(F.col("ga") < F.col("gb"))
        .select("ga", "gb")
        .distinct()
    )
    side_a = cand.join(sk.withColumnRenamed("grp", "ga"), "ga").select(
        "ga", "gb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    side_b = cand.join(sk.withColumnRenamed("grp", "gb"), "gb").select(
        "ga", "gb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    pooled = (
        side_a.unionByName(side_b)
        .groupBy("ga", "gb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("ga", "gb").orderBy("h")
    merged = pooled.withColumn("rk", F.row_number().over(wp)).filter(
        F.col("rk") <= k
    )
    both = F.sum(
        F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
    )
    return merged.groupBy(
        F.col("ga").alias("grp_a"), F.col("gb").alias("grp_b")
    ).agg(
        F.count(F.lit(1)).alias("k_used"),
        both.alias("n_both"),
        F.round(
            both.cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("jacc"),
    )
