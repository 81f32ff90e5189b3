"""Named query plans: one entry per operator in SURVEY.md §2.

Every function takes ``(spark, sf_dir)`` and returns a lazy
DataFrame. The matching DuckDB oracle SQL lives in
``plans/oracles.py`` — column aliases MUST match pairwise.

Oracle-parity rules used throughout (see SURVEY §7 hard parts):
 - sums of doubles are computed over ``CAST(x AS DECIMAL(18,2))`` so
   both engines produce the exact same decimal regardless of
   partial-aggregation order, then cast back to DOUBLE for a stable
   output schema;
 - ratios/averages: exact decimal sum → one double division → round;
 - window running sums use a TOTAL ordering so the sequential FP
   additions happen in the same order in both engines (bitwise
   equal);
 - no DECIMAL in output schemas (precision rules differ across
   engines) — final columns are STRING/BIGINT/DOUBLE/TIMESTAMP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_deltalake_spark.operators.window_agg import gold_aggregation, topk_per_group
from etl_deltalake_spark.sources.catalog import load_table

# Per-session cache of side tables materialized by queries that
# demonstrate write-side machinery (bucketing, MERGE): query name →
# sf_dir (or (sf_dir, path)) of the already-written copy.
_MATERIALIZED: dict = {}


def _dec(c, scale: int = 2):
    """Exact-sum helper: double → decimal for order-insensitive sums."""
    return F.col(c).cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------- flagship

def q_gold_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A4 (reference main.py:345-388) over lineitem.

    Grouped diff of extendedprice+quantity and running sum of
    quantity per order, ordered by the total key (l_shipdate,
    l_linenumber).
    """
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity", "l_extendedprice"
    )
    # Ordering must be total over the SELECTED columns: the fixture
    # has duplicate (l_orderkey, l_shipdate, l_linenumber) tuples at
    # sf>=0.01, so the value columns join the ordering — remaining
    # ties are then full-duplicate rows and the output multiset is
    # order-invariant (oracle-stable).
    out = gold_aggregation(
        li,
        group_col="l_orderkey",
        diff_cols=["l_extendedprice", "l_quantity"],
        cumsum_cols=["l_quantity"],
        order_cols=["l_shipdate", "l_linenumber", "l_quantity", "l_extendedprice"],
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        "l_quantity",
        "l_extendedprice",
        F.col("diff_l_extendedprice").alias("diff_extendedprice"),
        F.col("diff_l_quantity").alias("diff_quantity"),
        F.col("cumsum_l_quantity").alias("cumsum_quantity"),
    )


# ------------------------------------------------------- group aggregation

def q_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style reduction (SURVEY §2.8: absent in reference).

    Map-side partial aggregation + one shuffle on the (tiny) group
    key; decimal sums for oracle exactness.
    """
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(
                F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: revenue per nation (joins absent in reference, §2.8).

    customer←orders is a shuffle join on custkey; nation/region are
    broadcast (small dims) — Catalyst chooses this under the 64 MB
    threshold, F.broadcast pins it.
    """
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("r_name", "n_name")
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority (top-k absent in ref, §2.8)."""
    orders = load_table(spark, "orders", sf_dir)
    out = topk_per_group(
        orders,
        group_cols=["o_orderpriority"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    return out.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.col("rn").cast("bigint").alias("rn"),
    ).orderBy("o_orderpriority", "rn")


# ----------------------------------------------------- cleaning (C1-C10)

def q_clean_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1+C3+C4+C5+C6+C9 over events (SURVEY §2.4).

    Extracts a numeric field from the JSON props string, coerces it
    (unparseable → null → 0), rounds, sentinel-fills strings, and
    formats a fixed-3-decimal string — the reference's Silver
    cleaning chain (main.py:298-342) on real fixture data.
    """
    ev = load_table(spark, "events", sf_dir)
    k_raw = F.regexp_extract("props", r'"k": (\d+)', 1)
    return ev.select(
        "event_id",
        F.round(F.coalesce(k_raw.try_cast("double"), F.lit(0.0)), 3).alias("k_value"),
        F.coalesce(
            F.when(F.col("event_type") == "", None).otherwise(F.col("event_type")),
            F.lit("Sin Dato"),
        ).alias("event_type_clean"),
        F.format_string("%.3f", F.col("value")).alias("value_str"),
    )


def q_remap_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: dictionary value remap (reference main.py:265, dict 572-590)."""
    from etl_deltalake_spark.operators.cleaning import remap_values

    nation = load_table(spark, "nation", sf_dir)
    mapping = {"NATION_0": "NATION_ZERO", "NATION_1": "NATION_ONE", "NATION_7": "NATION_SEVEN"}
    return remap_values(nation, "n_name", mapping).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


# ------------------------------------------------------- reshape (R1-R6)

def q_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: wide → long unpivot (reference main.py:216)."""
    from etl_deltalake_spark.operators.reshape import melt

    li = load_table(spark, "lineitem", sf_dir)
    return melt(
        li,
        id_vars=["l_orderkey", "l_linenumber"],
        value_vars=["l_quantity", "l_discount", "l_tax"],
        var_name="variable",
        value_name="value",
    )


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: long → wide pivot (reference main.py:222).

    ``first`` in the reference is nondeterministic; the engine query
    uses an exact decimal sum per cell for oracle stability. Pivot
    values passed explicitly — no distinct-discovery job.
    """
    ev = load_table(spark, "events", sf_dir)
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.sum(_dec("value")).cast("double"))
    )
    return out.orderBy("user_id")


def q_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5+R6: split a delimited string and explode (main.py:253-257)."""
    from etl_deltalake_spark.operators.reshape import split_explode

    part = load_table(spark, "part", sf_dir)
    tokens = split_explode(part.select("p_partkey", "p_name"), "p_name", split_pattern=" ")
    return (
        tokens.groupBy(F.col("p_name").alias("token"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("token")
    )


def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: regex key split (reference main.py:219) over part brands."""
    part = load_table(spark, "part", sf_dir)
    return part.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.regexp_extract("p_name", r"(\w+) (\w+)", 2).alias("noun"),
    )


# ------------------------------------------------------------ PII (U1-U2)

def q_mask_email(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+U2: deterministic synthetic email + masking (main.py:481-551)."""
    from etl_deltalake_spark.operators.pii import add_masked_email, add_synth_email

    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    with_email = add_synth_email(cust, "c_name")
    confidential = with_email  # pre-mask branch (reference main.py:615)
    masked = add_masked_email(with_email, "email")
    return confidential.select("c_custkey", "email").join(
        masked.select("c_custkey", "email_masked"), "c_custkey"
    )


# ------------------------------------------- relational completeness (§2.8)

def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (absent in reference, SURVEY §2.8)."""
    cust = load_table(spark, "customer", sf_dir)
    return cust.select("c_mktsegment", "c_nationkey").distinct().orderBy(
        "c_mktsegment", "c_nationkey"
    )


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (SURVEY §2.8 reduction row).

    count(DISTINCT x) expands to a two-stage aggregate in Spark
    (partial distinct per partition, then final) — one logical line,
    two physical hash aggregations. The approximate variant
    (approx_count_distinct / HLL) is exercised in unit tests — its
    sketch results are engine-specific so it cannot be oracle-gated.
    """
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (absent in reference, SURVEY §2.8)."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (absent in reference, SURVEY §2.8)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("l_quantity")).cast("double").alias("qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the engine's SQL surface
    (SURVEY §2.8; rollup/cube are the DataFrame-side shorthands).
    One Expand node feeds a single aggregation — each input row is
    replicated once per grouping set, no multi-pass scan."""
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT, tagged counts (§2.8).

    Parts-never-sold (EXCEPT) vs parts-sold (INTERSECT) vs the key
    universe (UNION) — each branch a distinct set op so all three
    code paths execute and every branch is non-empty."""
    parts = load_table(spark, "part", sf_dir).select(F.col("p_partkey").alias("k"))
    sold = load_table(spark, "lineitem", sf_dir).select(F.col("l_partkey").alias("k"))
    tag = lambda df, t: df.agg(  # noqa: E731
        F.count(F.lit(1)).alias("n")
    ).select(F.lit(t).alias("op"), "n")
    return (
        tag(parts.exceptAll(sold.distinct()), "never_sold")
        .unionByName(tag(parts.intersect(sold), "sold"))
        .unionByName(tag(parts.union(sold).distinct(), "key_universe"))
        .orderBy("op")
    )


def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join, tagged and unioned (absent in ref, §2.8)."""
    from etl_deltalake_spark.operators.relational import anti_join, semi_join

    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).select("o_custkey")
    with_orders = semi_join(cust, orders, cust.c_custkey == orders.o_custkey)
    without = anti_join(cust, orders, cust.c_custkey == orders.o_custkey)
    tag = lambda df, t: df.groupBy("c_mktsegment").agg(  # noqa: E731
        F.count(F.lit(1)).alias("n")
    ).withColumn("tag", F.lit(t))
    return tag(with_orders, "has_orders").unionByName(tag(without, "no_orders")).orderBy(
        "c_mktsegment", "tag"
    )


def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit with total tiebreak (absent in ref, §2.8)."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking/analytic window breadth (SURVEY §2.8): rank,
    dense_rank, ntile, percent_rank, cume_dist, lag/lead, first/last
    over one total-ordered window — all share a single shuffle+sort
    (one Window physical node)."""
    from pyspark.sql import Window

    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.lag("o_orderkey", 1).over(w).alias("prev_key"),
            F.lead("o_orderkey", 1).over(w).alias("next_key"),
            F.first("o_orderkey").over(wf).alias("top_key"),
            F.last("o_orderkey").over(wf).alias("bottom_key"),
        )
        .filter(F.col("rnk") <= 50)
        .orderBy("o_orderpriority", "rnk")
    )


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup (SURVEY §2.9 spirit):
    the same event stream pre-aggregated at hour/day/month grains,
    tagged and unioned — the continuous-aggregate pattern for
    time-series serving. Each grain is one groupBy; the coarser
    grains could equally derive from the finer (re-aggregation) —
    at 100 TB that cascade is the cheaper path."""
    ev = load_table(spark, "events", sf_dir)

    def grain(unit: str) -> DataFrame:
        return (
            ev.groupBy(
                F.date_trunc(unit, F.col("ts")).alias("bucket"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(_dec("value")).cast("double").alias("total_value"),
            )
            .select(F.lit(unit).alias("grain"), "bucket", "event_type", "n", "total_value")
        )

    return (
        grain("hour")
        .unionByName(grain("day"))
        .unionByName(grain("month"))
        .orderBy("grain", "bucket", "event_type")
    )


def q_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching via edit distance (dedup-adjacent §2.9):
    nation-name pairs within Levenshtein ≤ 5 through the BLOCKED
    plan — an equi-join on (first char, length band) generates
    candidates (hash join, no cartesian product), Levenshtein filters
    within blocks (operators/relational.blocked_fuzzy_pairs). On the
    nation fixture the blocking loses nothing (all names share a
    prefix and a length band), so the exhaustive oracle matches."""
    from etl_deltalake_spark.operators.relational import blocked_fuzzy_pairs

    nation = load_table(spark, "nation", sf_dir)
    return blocked_fuzzy_pairs(nation, "n_name", max_dist=5, band_size=8).orderBy(
        "name_a", "name_b"
    )


def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function library — string/array/math surface (SURVEY
    §2.8 'scalar function library' row: the reference uses a handful
    of pandas string ops; the engine exposes the full
    pyspark.sql.functions surface). All expressions stay in
    whole-stage codegen; zero shuffles beyond the final sort."""
    part = load_table(spark, "part", sf_dir)
    words = F.split("p_type", " ")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.length("p_name").cast("bigint").alias("len_name"),
        F.substring("p_name", 1, 8).alias("pre8"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.translate("p_brand", "#", "-").alias("brand_tr"),
        F.instr("p_name", "a").cast("bigint").alias("pos_a"),
        F.reverse("p_brand").alias("rev_brand"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.size(words).cast("bigint").alias("n_words"),
        F.array_join(F.sort_array(words), "_").alias("sorted_words"),
        F.pow("p_size", 2).alias("size_sq"),
        (F.col("p_size") % 7).cast("bigint").alias("mod7"),
        F.round(F.sqrt("p_retailprice"), 6).alias("root_price"),
        F.greatest(F.col("p_size"), F.lit(25)).cast("bigint").alias("size_floor25"),
    ).orderBy("p_partkey")


def q_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function library — date/time/JSON surface (SURVEY §2.8;
    reference touches dates only via strptime/strftime of an HTTP
    header, main.py:49-53)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.year("ts").cast("bigint").alias("yr"),
        F.month("ts").cast("bigint").alias("mo"),
        F.dayofmonth("ts").cast("bigint").alias("dom"),
        F.hour("ts").cast("bigint").alias("hr"),
        F.date_trunc("month", F.col("ts")).alias("month_start"),
        F.last_day("ts").cast("string").alias("month_end"),
        F.datediff(F.lit("2025-06-01").cast("date"), F.to_date("ts"))
        .cast("bigint")
        .alias("days_to_jun"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("ts_fmt"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.ceil("value").cast("bigint").alias("val_ceil"),
        F.floor("value").cast("bigint").alias("val_floor"),
        F.round(F.abs(F.col("value") - 50.0), 6).alias("val_dev"),
    ).orderBy("event_id")


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2.8 joins row): latest order at or before
    each event's timestamp, per user. Union-window algorithm — one
    shuffle, no inequality join."""
    from etl_deltalake_spark.operators.relational import asof_join, keep_first_by

    events = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    # Deterministic right side: one order per (custkey, orderdate) —
    # keep the max orderkey (ties would make the as-of pick arbitrary).
    orders_u = keep_first_by(
        orders, ["o_custkey", "o_orderdate"], [F.col("o_orderkey").desc()]
    )
    out = asof_join(
        events,
        orders_u,
        on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    )
    return out.select("event_id", "user_id", "ts", "o_orderkey", "o_totalprice")


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: lineitems shipped within 7 days of their order's
    date (equi-key keeps it a hash join; SURVEY §2.8)."""
    from etl_deltalake_spark.operators.relational import range_join

    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    joined = range_join(
        li,
        orders,
        on=li.l_orderkey == orders.o_orderkey,
        range_cond=(li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate <= orders.o_orderdate + F.expr("INTERVAL 7 DAYS")),
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_fast_ship"))
        .orderBy("o_orderpriority")
    )


# ------------------------------------------- statistics / sampling / skew

def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates (stddev/var/corr/covar) per group —
    the beyond-sum half of SURVEY §2.8's reduction row. Single-pass
    partial aggregates; shuffle carries O(#groups) state."""
    from etl_deltalake_spark.operators.stats import group_stats

    li = load_table(spark, "lineitem", sf_dir)
    return group_stats(li, ["l_returnflag"], "l_quantity", "l_discount").orderBy(
        "l_returnflag"
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles per group (SURVEY §2.8). At
    100 TB swap percentile → approx_percentile (t-digest, bounded
    state) for unbounded groups — same call shape."""
    from etl_deltalake_spark.operators.stats import percentiles

    li = load_table(spark, "lineitem", sf_dir)
    return percentiles(li, ["l_returnflag"], "l_quantity").orderBy("l_returnflag")


def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1/16 hash-sample of orders, then aggregate.

    The content-hash predicate is scan-side and reproducible across
    engines/retries — the sampling pattern a training-data pipeline
    needs (rand()/TABLESAMPLE are neither stable nor
    oracle-checkable)."""
    from etl_deltalake_spark.operators.stats import hash_sample

    orders = load_table(spark, "orders", sf_dir)
    sampled = hash_sample(orders, F.col("o_orderkey"), rate_16ths=1)
    return (
        sampled.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs HyperLogLog++ distinct counts, error-bound checked
    INSIDE the query (the sketch value is engine-specific; its
    accuracy contract is what the oracle pins — SURVEY §2.8
    reduction row, scale path for q_count_distinct)."""
    from etl_deltalake_spark.operators.stats import approx_distinct_check

    orders = load_table(spark, "orders", sf_dir)
    return approx_distinct_check(
        orders, ["o_orderpriority"], "o_custkey", rsd=0.01, tolerance=0.05
    ).orderBy("o_orderpriority")


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over a 3-hot-key distribution
    (l_returnflag at 60k rows — real skew). Exact decimal sums make
    the rewrite bit-identical to the one-stage plan the oracle runs
    (operators/partitioning.py)."""
    from etl_deltalake_spark.operators.partitioning import salted_agg_sum

    li = load_table(spark, "lineitem", sf_dir)
    out = salted_agg_sum(
        li,
        ["l_returnflag"],
        _dec("l_extendedprice"),
        "sum_price",
        salt_n=8,
        salt_source=F.col("l_orderkey"),
    )
    return out.select(
        "l_returnflag", F.col("sum_price").cast("double").alias("sum_price"), "n"
    ).orderBy("l_returnflag")


def q_bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free star-join aggregation over BUCKETED tables — the
    100 TB amortization story as a registered, oracle-gated query.

    orders and customer are written bucketed (8 buckets) on the
    custkey join key (operators/partitioning.write_bucketed); the
    join then reads co-located buckets (SortMergeJoin, no Exchange)
    and the revenue-per-customer aggregation reuses the join's
    hash-partitioning — the WHOLE plan runs without a single
    shuffle (asserted in tests/test_plan_shapes.py). This is how a
    fact table's one-time write-side shuffle is amortized across
    every downstream custkey join/agg.
    """
    import tempfile

    from etl_deltalake_spark.operators.partitioning import (
        read_bucketed,
        write_bucketed,
    )

    # Materialize the bucketed side tables ONCE per sf_dir (bench and
    # the plan-shape sweep call every query repeatedly; a fresh
    # mkdtemp per call leaks a full orders+customer copy each time and
    # times the writes as query latency). The catalog check guards
    # against a session restart within the process: the cache is
    # module-global but saveAsTable entries die with the session.
    if _MATERIALIZED.get("bucketed") != sf_dir or not spark.catalog.tableExists(
        "sg_bkt_orders"
    ):
        base = tempfile.mkdtemp(prefix="sgraft_buckets_")
        orders = load_table(spark, "orders", sf_dir).select(
            "o_custkey", "o_totalprice"
        )
        customer = load_table(spark, "customer", sf_dir).select("c_custkey")
        write_bucketed(
            orders, "sg_bkt_orders", f"{base}/orders", ["o_custkey"], 8,
            sort_cols=["o_custkey"],
        )
        write_bucketed(
            customer, "sg_bkt_customer", f"{base}/customer", ["c_custkey"], 8,
            sort_cols=["c_custkey"],
        )
        _MATERIALIZED["bucketed"] = sf_dir
    bo = read_bucketed(spark, "sg_bkt_orders")
    bc = read_bucketed(spark, "sg_bkt_customer")
    # merge hint pins SortMergeJoin (a broadcast would hide the
    # bucketed-scan co-location this query demonstrates).
    return (
        bc.join(bo.hint("merge"), bc.c_custkey == bo.o_custkey)
        .groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
    )


def q_merge_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 MERGE insert-if-absent under the oracle gate (reference
    main.py:429-475: ``when_not_matched_insert_all``).

    Seeds a target table with the event_id%3==0 slice of events,
    merges the event_id%2==0 slice (overlap at %6∈{0}∪{3 via %3}),
    returns the final table: rows already present are untouched, new
    keys are inserted — exactly the anti-join-union the DuckDB oracle
    states declaratively. Runs the REAL storage code path: Delta ACID
    MERGE when delta-spark is available, the parquet left-anti
    fallback otherwise (sources/table_format.py).
    """
    import tempfile

    from etl_deltalake_spark.sources.table_format import (
        merge_insert_if_absent,
        read_table,
        write_table,
    )

    cached = _MATERIALIZED.get("merge_dedup")
    if cached is not None and cached[0] == sf_dir:
        return read_table(spark, cached[1])
    path = tempfile.mkdtemp(prefix="sgraft_merge_") + "/t"
    ev = load_table(spark, "events", sf_dir).select("event_id", "event_type", "value")
    write_table(ev.filter(F.col("event_id") % 3 == 0), path, mode="overwrite")
    merge_insert_if_absent(
        spark, path, ev.filter(F.col("event_id") % 2 == 0), ["event_id"]
    )
    _MATERIALIZED["merge_dedup"] = (sf_dir, path)
    return read_table(spark, path)


def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON build + path extraction + typed parse (SURVEY §2.8
    scalar-function row: the semi-structured slice). get_json_object
    is a per-path probe; from_json yields a typed struct — both
    scan-side, codegen'd."""
    orders = load_table(spark, "orders", sf_dir)
    js = F.concat(
        F.lit('{"status":"'),
        F.col("o_orderstatus"),
        F.lit('","priority":"'),
        F.col("o_orderpriority"),
        F.lit('"}'),
    )
    parsed = F.from_json(js, "status string, priority string")
    return orders.select(
        "o_orderkey",
        F.get_json_object(js, "$.status").alias("status_j"),
        parsed.getField("priority").alias("priority_j"),
    )
