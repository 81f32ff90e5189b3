"""Relational operators absent from the reference (SURVEY §2.8).

The reference has no joins, reductions, distinct, set ops, or sorts
— its only "join" is the MERGE predicate (main.py:603) and the dict
remap (main.py:265). These are table stakes for an engine; most are
thin, documented wrappers over stock DataFrame ops, plus two custom
compositions Spark lacks natively: as-of join and range join.

Scale notes per operator are in each docstring; the common theme:
one hash shuffle on the join/group key, broadcast for bounded dims,
AQE for skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: Sequence[str],
    how: str = "left",
    right_on: str | None = None,
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_time <= left_time`` per key (``direction="backward"``,
    the default) or the earliest right row with ``right_time >=
    left_time`` (``direction="forward"`` — the lead/next-quote
    variant; same one-shuffle union-window plan, with the carry
    running over the FOLLOWING frame instead of the preceding one).

    ``tolerance`` bounds the match distance (pandas ``merge_asof``
    semantics): a number for numeric time columns, an interval
    string (e.g. ``"30 minutes"``) for timestamps; matches farther
    than the tolerance become NULLs. Applied as a post-carry filter
    — the plan shape doesn't change.

    Implemented with the union-window algorithm, NOT an inequality
    join: tag both sides, union, and carry the last non-null right
    payload forward within a (key, time)-ordered window. This is ONE
    hash shuffle on the key + a per-partition sort — an inequality
    join would be a broadcast-nested-loop (quadratic) or an exploding
    equi+filter join. At 100 TB both inputs shuffle once on ``on``;
    skewed keys split via AQE.

    Ties: if several right rows share (key, right_time), the carried
    row among them is unspecified — pre-dedup the right side for
    determinism (the oracle queries do).
    """
    if how != "left":
        raise ValueError("only how='left' is implemented")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_on = right_on or on
    lcols = left.columns
    # The whole right payload is carried as ONE struct, not
    # per-column: a right row whose px is NULL but sz isn't must
    # carry as that single row — independent per-column
    # last/first(ignorenulls) would stitch fields from DIFFERENT
    # right rows. The struct itself is non-null for every right
    # marker row (even when all its fields are null), so
    # ignorenulls skips exactly the left rows.
    from pyspark.sql.types import StructField, StructType

    payload_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_cols]
        + [StructField("_rt", right.schema[right_time].dataType)]
    )
    # marker (backward): right=0 sorts before left=1 at equal times →
    # inclusive <=; forward flips the marker so right sorts AFTER
    # left at equal times and the following-frame first() is inclusive >=
    r = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_m"),
        F.struct(
            *[F.col(c) for c in right_cols],
            F.col(right_time).alias("_rt"),
        ).alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(  # noqa: E741
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_m"),
        F.lit(None).cast(payload_type).alias("_payload"),
        *[F.col(c) for c in lcols],
    )
    unioned = r.unionByName(l)
    if direction == "backward":
        w = (
            Window.partitionBy("_k")
            .orderBy("_t", "_m")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last("_payload", ignorenulls=True).over(w).alias("_f")
    else:
        # left (_m=1) sorts before right (_m=0 → recoded 2) at equal
        # times, and the first right payload at-or-after fills in
        unioned = unioned.withColumn(
            "_m", F.when(F.col("_m") == 0, F.lit(2)).otherwise(F.lit(1))
        )
        w = (
            Window.partitionBy("_k")
            .orderBy("_t", "_m")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first("_payload", ignorenulls=True).over(w).alias("_f")
    filled = unioned.select("*", carry)
    out_payload = F.col("_f")
    if tolerance is not None:
        bound = (
            F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.lit(tolerance)
        )
        gap = (
            F.col("_t") - F.col("_f._rt")
            if direction == "backward"
            else F.col("_f._rt") - F.col("_t")
        )
        out_payload = F.when(gap <= bound, F.col("_f"))
    return filled.filter(F.col("_m") == 1).select(
        *[F.col(c) for c in lcols],
        *[out_payload.getField(c).alias(c) for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on,
    range_cond,
) -> DataFrame:
    """Range join: equi-key plus an interval predicate.

    Keeping at least one equality conjunct makes Catalyst pick a
    hash join with the range predicate as a post-filter; a pure
    inequality condition degrades to broadcast-nested-loop. For
    huge time ranges, bucket the time dimension into the key
    (coarse-bucket equi-join then exact filter).
    """
    return left.join(right, on & range_cond if range_cond is not None else on)


def semi_join(left: DataFrame, right: DataFrame, *cond) -> DataFrame:
    """left rows with ≥1 match (EXISTS). No right columns, no dup rows."""
    return left.join(right, list(cond) if cond else None, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, *cond) -> DataFrame:
    """left rows with NO match (NOT EXISTS)."""
    return left.join(right, list(cond) if cond else None, "left_anti")


def blocked_fuzzy_pairs(
    df: DataFrame,
    name_col: str,
    max_dist: int = 5,
    band_size: int = 8,
) -> DataFrame:
    """Fuzzy string pairs (Levenshtein ≤ ``max_dist``) with blocking —
    the record-linkage pattern that scales: an EQUI-join on
    (first char, length band) generates candidates, the edit-distance
    filter runs within blocks only. No cartesian product.

    Recall contract: ``levenshtein(a, b) >= |len(a) - len(b)|``, so
    with ``band_size > max_dist`` any qualifying pair's length bands
    differ by at most 1 — the right side explodes each name into its
    own and both adjacent bands, guaranteeing zero length-based
    recall loss. First-char blocking is the standard (lossy-by-
    design) linkage cut: pairs whose first characters differ are not
    compared; callers needing first-char tolerance can union a
    second pass blocked on, e.g., soundex.

    Output: (name_a, name_b, dist), name_a < name_b.
    """
    if band_size <= max_dist:
        raise ValueError(
            f"band_size ({band_size}) must exceed max_dist ({max_dist}) "
            "for the adjacent-band expansion to guarantee length recall"
        )
    band = F.floor(F.length(name_col) / band_size)
    a = df.select(
        F.col(name_col).alias("name_a"),
        F.substring(name_col, 1, 1).alias("bk_char"),
        band.alias("bk_band"),
    )
    b = df.select(
        F.col(name_col).alias("name_b"),
        F.substring(name_col, 1, 1).alias("bk_char"),
        F.explode(F.array(band - 1, band, band + 1)).alias("bk_band"),
    )
    return (
        a.join(b, ["bk_char", "bk_band"])
        .filter(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("bigint").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


def symmetric_difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """(a ∪ b) − (a ∩ b), distinct — exercises all three set ops."""
    return a.union(b).distinct().subtract(a.intersect(b))


def dedup_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact dedup (SURVEY §2.9). For deterministic survivor choice
    under a subset, prefer ``keep_first_by``."""
    return df.dropDuplicates(list(subset)) if subset else df.distinct()


def keep_first_by(
    df: DataFrame, keys: Sequence[str], order_by: Sequence
) -> DataFrame:
    """Deterministic dedup: keep the first row per key under a total
    ordering (row_number = 1). One shuffle on keys."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 1,
    max_basket_size: int | None = 100,
) -> DataFrame:
    """Frequent co-occurrence mining: (item_a < item_b) pairs counted
    across baskets — the market-basket / related-items primitive.

    The self-join is an EQUI-join on the basket key, so the only
    quadratic factor is per-basket fan-out (size²). That is exactly
    the skew that kills this query at scale — one degenerate basket
    with 100k items yields 10¹⁰ pairs — so baskets larger than
    ``max_basket_size`` are dropped BEFORE the join (standard
    practice: oversized baskets are bots/ETL artifacts and poison
    the signal anyway; the cap changes which baskets participate,
    never the pair counts of surviving baskets). Distinct items per
    basket first, so re-ordered duplicates don't inflate counts.
    """
    items = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct().localCheckpoint(eager=False)
    if max_basket_size is not None:
        ok = (
            items.groupBy("b")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_basket_size)
            .select("b")
        )
        items = items.join(ok, "b")
    a = items.select("b", F.col("i").alias("item_a"))
    bb = items.select("b", F.col("i").alias("item_b"))
    return (
        a.join(bb, "b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_count)
    )


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_secs: int,
    l_id: str = "l_id",
    r_id: str = "r_id",
    max_buckets: int = 4096,
    on_long: str = "error",
) -> DataFrame:
    """Interval-overlap join WITHOUT an equi key, made scale-safe by
    time bucketing: each interval explodes to the epoch buckets it
    covers, candidates equi-join on the bucket, and the exact
    half-open overlap predicate (``l_start < r_end AND r_start <
    l_end``) filters candidates. Duplicate candidates (a pair
    overlapping several buckets) collapse by the two row-id columns
    (``l_id``/``r_id`` — validated present), so payload columns of
    any type ride along and the dedup compares ids, not whole rows.

    This is the pre-bucketing pattern SCALE.md prescribes for pure
    range joins: a raw inequality join plans a
    BroadcastNestedLoopJoin (O(n·m)); bucketing bounds candidates to
    pairs sharing a ``bucket_secs`` window — pick the bucket near
    the TYPICAL interval length. Exactness is unconditional: any
    overlapping pair shares at least the bucket containing the
    later start.

    Long-interval explode guard (the 100 TB footgun): an interval
    spanning S seconds explodes to ~S/bucket_secs candidate rows, so
    ONE year-long interval at bucket_secs=60 would emit ~525k rows.
    ``max_buckets`` bounds per-row fan-out; intervals that would
    exceed it are handled per ``on_long``:

    - ``"error"`` (default): fail the job with a per-row
      ``raise_error`` naming the offending id — pure codegen, no
      validation job, nothing silently dropped. Pick a bigger
      bucket_secs, raise max_buckets, or choose another mode.
    - ``"drop"``: exclude long intervals from BOTH sides before the
      explode (the ``cooccurrence_pairs.max_basket_size`` posture:
      degenerate rows are usually ETL artifacts; dropping them is
      explicit, bounded, and never corrupts surviving pairs).
    - ``"split"``: stay EXACT by routing long intervals through a
      second, coarser bucket level (``bucket_secs * max_buckets``):
      short×short pairs join at the fine level, long×any and
      short×long at the coarse level, results unioned and
      id-deduped. Fan-out per short row ≤ max_buckets fine tiles +2
      coarse probes; per long row span/(bucket_secs·max_buckets)+1 —
      the year-long interval at bucket_secs=60 emits ~138 coarse
      tiles instead of 525k. Costs two extra equi-joins (still no
      nested-loop anywhere), so reserve it for inputs that really
      mix scales.
    """
    if bucket_secs <= 0:
        raise ValueError(f"bucket_secs must be positive, got {bucket_secs}")
    if max_buckets < 2:
        raise ValueError(f"max_buckets must be >= 2, got {max_buckets}")
    if on_long not in ("error", "drop", "split"):
        raise ValueError(
            f"on_long must be 'error', 'drop' or 'split', got {on_long!r}"
        )
    for c, side in ((l_id, left), (r_id, right)):
        if c not in side.columns:
            raise ValueError(f"row-id column {c!r} missing from input")

    def span_buckets(start: str, end: str, secs: int):
        lo = F.floor(F.unix_timestamp(F.col(start)) / secs)
        hi = F.floor(F.unix_timestamp(F.col(end)) / secs)
        return lo, F.greatest(hi, lo)

    def buckets(start: str, end: str, secs: int, guard_id: str | None):
        lo, hi = span_buckets(start, end, secs)
        # the end bucket is included even when the interval ends
        # exactly on a boundary: unix_timestamp TRUNCATES sub-second
        # precision, so excluding it (end-1) could miss a true
        # overlap whose counterpart starts inside the truncated
        # boundary second — the inclusive form only ever costs a few
        # extra candidates, which the exact filter discards
        seq = F.sequence(lo, hi)
        if guard_id is not None:
            seq = F.when(
                hi - lo < F.lit(max_buckets),
                seq,
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"bucketed_interval_join: interval {guard_id}="
                        ),
                        F.col(guard_id).cast("string"),
                        F.lit(" spans "),
                        (hi - lo + 1).cast("string"),
                        F.lit(
                            f" buckets > max_buckets={max_buckets} at "
                            f"bucket_secs={bucket_secs}; raise bucket_secs/"
                            "max_buckets or use on_long='drop'/'split'"
                        ),
                    )
                )
            )
        return F.explode(seq).alias("_bk")

    def is_short(start: str, end: str):
        lo, hi = span_buckets(start, end, bucket_secs)
        return hi - lo < F.lit(max_buckets)

    def overlap_pairs(lb: DataFrame, rb: DataFrame) -> DataFrame:
        return (
            lb.join(rb, "_bk")
            .filter(
                (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
            )
            .drop("_bk")
        )

    if on_long == "split":
        coarse = bucket_secs * max_buckets
        l_short = left.filter(is_short(l_start, l_end))
        l_long = left.filter(~is_short(l_start, l_end))
        r_short = right.filter(is_short(r_start, r_end))
        r_long = right.filter(~is_short(r_start, r_end))
        fine = overlap_pairs(
            l_short.select("*", buckets(l_start, l_end, bucket_secs, None)),
            r_short.select("*", buckets(r_start, r_end, bucket_secs, None)),
        )
        # long-left meets EVERY right row at the coarse level;
        # short-left × long-right covers the remaining pair class
        long_any = overlap_pairs(
            l_long.select("*", buckets(l_start, l_end, coarse, None)),
            right.select("*", buckets(r_start, r_end, coarse, None)),
        )
        short_long = overlap_pairs(
            l_short.select("*", buckets(l_start, l_end, coarse, None)),
            r_long.select("*", buckets(r_start, r_end, coarse, None)),
        )
        return (
            fine.unionByName(long_any)
            .unionByName(short_long)
            .dropDuplicates([l_id, r_id])
        )

    if on_long == "drop":
        left = left.filter(is_short(l_start, l_end))
        right = right.filter(is_short(r_start, r_end))
        l_guard = r_guard = None
    else:  # "error": in-plan runtime guard, no extra jobs
        l_guard, r_guard = l_id, r_id

    lb = left.select("*", buckets(l_start, l_end, bucket_secs, l_guard))
    rb = right.select("*", buckets(r_start, r_end, bucket_secs, r_guard))
    return overlap_pairs(lb, rb).dropDuplicates([l_id, r_id])
