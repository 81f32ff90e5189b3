"""DuckDB oracle SQL — one ANSI-SQL string per query in queries.py.

Tables ``region nation customer supplier part orders lineitem events
documents embeddings`` are pre-registered views on the same parquet.
Column aliases match the Spark plans exactly (driver hashes values
after sorting columns by name).
"""

ORACLES: dict[str, str] = {}


def oracle(name: str):
    def register(sql: str) -> str:
        ORACLES[name] = sql
        return sql

    return register


oracle("q_gold_window")(
    """
    SELECT
      l_orderkey, l_linenumber, l_shipdate, l_quantity, l_extendedprice,
      COALESCE(
        l_extendedprice - lag(l_extendedprice) OVER w, l_extendedprice
      ) AS diff_extendedprice,
      COALESCE(l_quantity - lag(l_quantity) OVER w, l_quantity) AS diff_quantity,
      SUM(l_quantity) OVER (
        PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber, l_quantity, l_extendedprice
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS cumsum_quantity
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber, l_quantity, l_extendedprice)
    """
)

oracle("q_group_agg")(
    """
    SELECT
      l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
      COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """
)

oracle("q_join_agg")(
    """
    SELECT
      r_name, n_name,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """
)

oracle("q_topk_per_group")(
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_orderpriority, rn
    """
)

oracle("q_clean_coerce")(
    """
    SELECT
      event_id,
      ROUND(COALESCE(TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS DOUBLE), 0.0), 3)
        AS k_value,
      COALESCE(NULLIF(event_type, ''), 'Sin Dato') AS event_type_clean,
      printf('%.3f', value) AS value_str
    FROM events
    """
)

oracle("q_remap_values")(
    """
    SELECT
      n_nationkey,
      CASE n_name
        WHEN 'NATION_0' THEN 'NATION_ZERO'
        WHEN 'NATION_1' THEN 'NATION_ONE'
        WHEN 'NATION_7' THEN 'NATION_SEVEN'
        ELSE n_name
      END AS n_name,
      n_regionkey
    FROM nation
    """
)

oracle("q_melt")(
    """
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """
)

oracle("q_pivot")(
    """
    SELECT
      user_id,
      CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
      CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
      CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
      CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """
)

oracle("q_split_explode")(
    """
    SELECT token, COUNT(*) AS n
    FROM (
      SELECT unnest(string_split_regex(p_name, ' ')) AS token
      FROM part
    )
    GROUP BY token
    ORDER BY token
    """
)

oracle("q_regex_extract")(
    """
    SELECT
      p_partkey,
      regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
      regexp_extract(p_name, '(\\w+) (\\w+)', 2) AS noun
    FROM part
    """
)

oracle("q_mask_email")(
    """
    SELECT
      c_custkey,
      substr(md5(c_name), 1, 8) || '@' || lower(regexp_replace(c_name, '\\s+', '', 'g')) || '.org'
        AS email,
      '*****@' || lower(regexp_replace(c_name, '\\s+', '', 'g')) || '.org' AS email_masked
    FROM customer
    """
)

oracle("q_distinct")(
    """
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    ORDER BY c_mktsegment, c_nationkey
    """
)

oracle("q_rollup")(
    """
    SELECT
      o_orderstatus, o_orderpriority,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """
)

oracle("q_cube")(
    """
    SELECT
      l_returnflag, l_linestatus,
      COUNT(*) AS n,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """
)

oracle("q_set_ops")(
    """
    SELECT 'never_sold' AS op, COUNT(*) AS n FROM (
      SELECT p_partkey FROM part EXCEPT SELECT l_partkey FROM lineitem)
    UNION ALL
    SELECT 'sold', COUNT(*) FROM (
      SELECT p_partkey FROM part INTERSECT SELECT l_partkey FROM lineitem)
    UNION ALL
    SELECT 'key_universe', COUNT(*) FROM (
      SELECT p_partkey FROM part UNION SELECT l_partkey FROM lineitem)
    ORDER BY op
    """
)

oracle("q_semi_anti")(
    """
    SELECT c_mktsegment, COUNT(*) AS n, 'has_orders' AS tag
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    UNION ALL
    SELECT c_mktsegment, COUNT(*) AS n, 'no_orders' AS tag
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment, tag
    """
)

oracle("q_sort_limit")(
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20
    """
)

oracle("q_asof_join")(
    """
    WITH orders_u AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC
        ) AS rn
        FROM orders
      ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
           o.o_orderkey, o.o_totalprice
    FROM events e
    ASOF LEFT JOIN orders_u o
      ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    """
)

oracle("q_range_join")(
    """
    SELECT o_orderpriority, COUNT(*) AS n_fast_ship
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
      AND l_shipdate >= o_orderdate
      AND l_shipdate <= o_orderdate + INTERVAL 7 DAY
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """
)

oracle("q_window_funcs")(
    """
    SELECT * FROM (
      SELECT
        o_orderpriority,
        o_orderkey,
        CAST(rank() OVER w AS BIGINT) AS rnk,
        CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        ROUND(percent_rank() OVER w, 6) AS pct_rank,
        ROUND(cume_dist() OVER w, 6) AS cume,
        lag(o_orderkey, 1) OVER w AS prev_key,
        lead(o_orderkey, 1) OVER w AS next_key,
        first_value(o_orderkey) OVER wf AS top_key,
        last_value(o_orderkey) OVER wf AS bottom_key
      FROM orders
      WINDOW
        w AS (PARTITION BY o_orderpriority
              ORDER BY o_totalprice DESC, o_orderkey ASC),
        wf AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    WHERE rnk <= 50
    ORDER BY o_orderpriority, rnk
    """
)

oracle("q_time_rollup")(
    """
    WITH g AS (
      SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 2, 3
      UNION ALL
      SELECT 'day', date_trunc('day', ts), event_type, COUNT(*),
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      FROM events GROUP BY 2, 3
      UNION ALL
      SELECT 'month', date_trunc('month', ts), event_type, COUNT(*),
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      FROM events GROUP BY 2, 3
    )
    SELECT grain, CAST(bucket AS TIMESTAMP) AS bucket, event_type, n, total_value
    FROM g
    ORDER BY grain, bucket, event_type
    """
)

oracle("q_fuzzy_pairs")(
    """
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
    FROM nation a JOIN nation b ON a.n_name < b.n_name
    WHERE levenshtein(a.n_name, b.n_name) <= 5
    ORDER BY name_a, name_b
    """
)

oracle("q_count_distinct")(
    """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """
)

oracle("q_scalar_funcs")(
    """
    SELECT
      p_partkey,
      upper(p_name) AS up_name,
      CAST(length(p_name) AS BIGINT) AS len_name,
      substr(p_name, 1, 8) AS pre8,
      lpad(p_brand, 12, '*') AS brand_pad,
      translate(p_brand, '#', '-') AS brand_tr,
      CAST(strpos(p_name, 'a') AS BIGINT) AS pos_a,
      reverse(p_brand) AS rev_brand,
      concat_ws('|', p_brand, p_type) AS brand_type,
      CAST(len(string_split(p_type, ' ')) AS BIGINT) AS n_words,
      array_to_string(list_sort(string_split(p_type, ' ')), '_') AS sorted_words,
      pow(p_size, 2) AS size_sq,
      CAST(p_size % 7 AS BIGINT) AS mod7,
      ROUND(sqrt(p_retailprice), 6) AS root_price,
      CAST(GREATEST(p_size, 25) AS BIGINT) AS size_floor25
    FROM part
    ORDER BY p_partkey
    """
)

oracle("q_datetime_funcs")(
    """
    SELECT
      event_id,
      CAST(year(ts) AS BIGINT) AS yr,
      CAST(month(ts) AS BIGINT) AS mo,
      CAST(day(ts) AS BIGINT) AS dom,
      CAST(hour(ts) AS BIGINT) AS hr,
      CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
      CAST(last_day(CAST(ts AS DATE)) AS VARCHAR) AS month_end,
      CAST(date_diff('day', CAST(ts AS DATE), DATE '2025-06-01') AS BIGINT)
        AS days_to_jun,
      strftime(ts, '%Y-%m-%d %H:%M') AS ts_fmt,
      json_extract_string(props, '$.k') AS k_str,
      CAST(ceil("value") AS BIGINT) AS val_ceil,
      CAST(floor("value") AS BIGINT) AS val_floor,
      ROUND(abs("value" - 50.0), 6) AS val_dev
    FROM events
    ORDER BY event_id
    """
)

# ---------------------------------------------------------------- extensions

# Unicode classes mirror operators/text.py exactly (Java regex and
# DuckDB RE2 agree on \p{L}\p{M}\p{N}; verified on zh/ru/ar/el/hi/vi/ko).
# replace(İ→i) mirrors normalize_text's casefold pre-pass: U+0130 is
# the one char whose lowercase mapping is multi-char and the engines'
# lower() diverges on it (JVM full-fold vs DuckDB simple-fold).
_NORM = (
    "trim(regexp_replace(regexp_replace(lower(replace(text, 'İ', 'i')),"
    " '[^\\p{L}\\p{M}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
)
_TOKEN_PAT = "'[\\p{L}\\p{M}\\p{N}_]+|[^\\p{L}\\p{M}\\p{N}_\\s]'"
# Non-punctuation keep-class applied to raw text (punct_ratio mirror);
# plain constant so f-string oracles don't need brace escaping.
_PUNCT_STRIP = "regexp_replace(text, '[^\\p{L}\\p{M}\\p{N}_\\s]', '', 'g')"
_STOPS = "('the', 'a', 'of', 'and', 'in', 'to', 'is')"

oracle("q_text_stats")(
    f"""
    SELECT
      doc_id,
      n_tokens, n_words, stop_ratio, punct_ratio,
      ROUND(0.4 * LEAST(len_chars / 500.0, 1.0)
            + 0.4 * (1.0 - LEAST(stop_ratio * 2.0, 1.0))
            + 0.2 * (1.0 - punct_ratio), 6) AS quality
    FROM (
      SELECT
        doc_id,
        CAST(len(regexp_extract_all(lower(replace(text, 'İ', 'i')), {_TOKEN_PAT})) AS BIGINT) AS n_tokens,
        CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words,
        ROUND(len(list_filter(string_split_regex(lower(replace(trim(text), 'İ', 'i')), '\\s+'),
                              w -> w IN {_STOPS}))
              / len(string_split_regex(lower(replace(trim(text), 'İ', 'i')), '\\s+')), 6) AS stop_ratio,
        ROUND((length(text) - length({_PUNCT_STRIP}))
              / length(text), 6) AS punct_ratio,
        CAST(length(text) AS DOUBLE) AS len_chars
      FROM documents
    )
    """
)

_LANG_COUNT = {
    "de": "('der', 'und', 'das')",
    "en": "('the', 'and', 'of')",
    "es": "('el', 'los', 'que')",
    "fr": "('le', 'les', 'est')",
    "zh": "('de', 'shi', 'bu')",
}
_lang_cols = ",\n        ".join(
    f"CAST(len(list_filter(string_split_regex(lower(replace(trim(text), 'İ', 'i')), '\\s+'), "
    f"w -> w IN {m})) AS BIGINT) AS c_{lang}"
    for lang, m in _LANG_COUNT.items()
)

oracle("q_lang_id")(
    f"""
    SELECT doc_id, lang,
      CASE
        WHEN c_de = best THEN 'de'
        WHEN c_en = best THEN 'en'
        WHEN c_es = best THEN 'es'
        WHEN c_fr = best THEN 'fr'
        ELSE 'zh'
      END AS lang_pred
    FROM (
      SELECT doc_id, lang,
        c_de, c_en, c_es, c_fr, c_zh,
        GREATEST(c_de, c_en, c_es, c_fr, c_zh) AS best
      FROM (
        SELECT doc_id, lang,
        {_lang_cols}
        FROM documents
      )
    )
    """
)

oracle("q_tfidf")(
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(replace(text, 'İ', 'i')), {_TOKEN_PAT})) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    nn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * (ln((1.0 + nn.n) / (1.0 + dfq.df)) + 1), 6) AS tfidf
      FROM tf JOIN dfq USING (term) CROSS JOIN nn
    ),
    ranked AS (
      SELECT doc_id, term, tfidf,
             CAST(row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
             ) AS BIGINT) AS rn
      FROM scored
    )
    SELECT doc_id, term, tfidf, rn FROM ranked WHERE rn <= 3
    ORDER BY doc_id, rn
    """
)

oracle("q_fingerprint")(
    f"""
    SELECT doc_id,
      md5(norm) AS fp,
      list_min(list_transform(
        range(1, GREATEST(len(words) - 5, 0) + 2),
        i -> md5(array_to_string(words[i:i+4], ' '))
      )) AS shingle_fp
    FROM (
      SELECT doc_id, {_NORM} AS norm, string_split({_NORM}, ' ') AS words
      FROM documents
    )
    """
)

oracle("q_dedup_exact")(
    f"""
    SELECT md5({_NORM}) AS fp,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """
)

def _shingles_sql(src: str = "documents") -> str:
    """Distinct word-3-gram shingle sets of the normalized text —
    parameterized on the source relation so composed pipelines
    (q_corpus_prep) can shingle a filtered CTE."""
    return f"""
  SELECT doc_id, list_distinct(list_transform(
    range(1, GREATEST(len(string_split({_NORM}, ' ')) - 3, 0) + 2),
    i -> array_to_string((string_split({_NORM}, ' '))[i:i+2], ' ')
  )) AS sh
  FROM {src}
"""


_SHINGLES = _shingles_sql()

# Candidate pairs from the DF-capped shingle join + exact Jaccard
# verification on the FULL shingle sets (mirrors dedup.jaccard_pairs
# with max_df=50 — a no-op cap at fixture scale, max shingle DF is 9).
_JACCARD_BODY = """
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    rare AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= 50),
    capped AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
    ),
    jp AS (
      SELECT c.doc_a, c.doc_b,
        ROUND(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
              / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 6)
          AS jaccard
      FROM cand c JOIN sh x ON c.doc_a = x.doc_id JOIN sh y ON c.doc_b = y.doc_id
    )
"""

oracle("q_jaccard_pairs")(
    f"""
    WITH sh AS ({_SHINGLES}),
    {_JACCARD_BODY}
    SELECT doc_a, doc_b, jaccard FROM jp
    WHERE jaccard >= 0.5
    ORDER BY doc_a, doc_b
    """
)

# SQL-scripting truth (q_sql_scripting, round 9): the WHILE loop
# unrolled as three chained CTEs — each threshold is 2x the
# decimal-exact mean of the rows under the previous one (identical
# exact-sum → double-division arithmetic, so every iterate is
# bitwise shared).
oracle("q_sql_scripting")(
    """
    WITH t1 AS (
      SELECT 2.0 * (CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                         AS DOUBLE) / COUNT(*)) AS thr
      FROM lineitem
    ),
    t2 AS (
      SELECT 2.0 * (CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                         AS DOUBLE) / COUNT(*)) AS thr
      FROM lineitem, t1 WHERE l_extendedprice <= t1.thr
    ),
    t3 AS (
      SELECT 2.0 * (CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                         AS DOUBLE) / COUNT(*)) AS thr
      FROM lineitem, t2 WHERE l_extendedprice <= t2.thr
    )
    SELECT ROUND(t3.thr, 6) AS trimmed_threshold,
           (SELECT COUNT(*) FROM lineitem, t3
            WHERE l_extendedprice <= t3.thr) AS n_kept
    FROM t3
    """
)

# Cluster-bounded semantic near-dup pairs (the SemDeDup pattern,
# similarity.semantic_dedup_pairs, q_semantic_dedup, round 9):
# argmax IVF assignment over the every-50th-vector codebook, pair
# join WITHIN clusters only, rounded cosine ≥ tau.
oracle("q_semantic_dedup")(
    """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    c AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 50 = 0
    ),
    a AS (
      SELECT e.vec_id, e.v, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                        c.cid ASC
             ) AS rn
      FROM e CROSS JOIN c
    ),
    asg AS (SELECT vec_id, v, cid FROM a WHERE rn = 1)
    SELECT x.vec_id AS doc_a, y.vec_id AS doc_b,
           x.cid AS cluster_id,
           ROUND(list_cosine_similarity(x.v, y.v), 6) AS cos_sim
    FROM asg x JOIN asg y ON x.cid = y.cid AND y.vec_id < x.vec_id
    WHERE ROUND(list_cosine_similarity(x.v, y.v), 6) >= 0.3
    ORDER BY doc_a, doc_b
    """
)

# Prefix-filtered exact Jaccard (dedup.jaccard_prefix_pairs,
# q_jaccard_prefix, round 9): the oracle is the EXHAUSTIVE all-pairs
# candidate join — no DF cap, no prefix, no pruning — with the same
# decimal cross-multiplied threshold test, so the Spark side's
# prefix-filter completeness theorem is checked against ground truth
# every run.
oracle("q_jaccard_prefix")(
    f"""
    WITH sh AS ({_SHINGLES}),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    ),
    jp AS (
      SELECT c.doc_a, c.doc_b,
        len(list_intersect(x.sh, y.sh)) AS c_int,
        len(x.sh) AS na, len(y.sh) AS nb
      FROM cand c
      JOIN sh x ON c.doc_a = x.doc_id
      JOIN sh y ON c.doc_b = y.doc_id
    )
    SELECT doc_a, doc_b,
      ROUND(CAST(c_int AS DOUBLE) / (na + nb - c_int), 6) AS jaccard
    FROM jp
    WHERE CAST(c_int AS DECIMAL(20,6)) * 1.5
          >= CAST(0.5 AS DECIMAL(9,6)) * (na + nb)
    ORDER BY doc_a, doc_b
    """
)

_lp_rounds = "".join(
    f""",
    l{i} AS (
      SELECT l.doc, LEAST(l.label, COALESCE(MIN(d.label), l.label)) AS label
      FROM l{i - 1} l
      LEFT JOIN edges e ON e.src = l.doc
      LEFT JOIN l{i - 1} d ON d.doc = e.dst
      GROUP BY l.doc, l.label
    )"""
    for i in range(1, 5)
)

# MinHash signatures → LSH band candidates → exact Jaccard verify —
# shared by q_minhash_lsh (pair output) and q_dedup_clusters (pair
# input to label propagation), mirroring dedup.minhash_near_dup_pairs.
_MINHASH_BODY = """
    sig AS (
      SELECT doc_id, sh,
        list_transform(range(0, 16), j ->
          list_min(list_transform(sh, s -> md5(CAST(j AS VARCHAR) || ':' || s)))
        ) AS sig
      FROM sh
    ),
    banded AS (
      SELECT doc_id, sh,
        unnest(list_transform(range(0, 4), b ->
          md5(array_to_string(sig[b*4+1:b*4+4], '|')))) AS band_hash,
        unnest(range(0, 4)) AS band_idx
      FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    mh_pairs AS (
      SELECT c.doc_a, c.doc_b,
        ROUND(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
              / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 6)
          AS jaccard
      FROM cand c JOIN sh x ON c.doc_a = x.doc_id JOIN sh y ON c.doc_b = y.doc_id
      WHERE ROUND(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
              / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 6)
            >= 0.5
    )
"""

oracle("q_dedup_clusters")(
    f"""
    WITH sh AS ({_SHINGLES}),
    {_MINHASH_BODY},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
      UNION ALL
      SELECT doc_b, doc_a FROM mh_pairs
    ),
    l0 AS (SELECT DISTINCT src AS doc, src AS label FROM edges){_lp_rounds}
    SELECT doc, label AS cluster FROM l4 ORDER BY doc
    """
)

# Gap-filled LOCF resample (operators/timeseries.resample_locf):
# last-per-bucket under a total (ts, event_id) order, per-key grid,
# IGNORE NULLS carry-forward.
oracle("q_resample_locf")(
    """
    WITH b AS (
      SELECT user_id, date_trunc('day', ts) AS bucket, ts, event_id, value
      FROM events
    ),
    obs AS (
      SELECT user_id, bucket, value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id, bucket ORDER BY ts DESC, event_id DESC
        ) AS rn FROM b
      ) WHERE rn = 1
    ),
    span AS (
      SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi FROM b GROUP BY 1
    ),
    grid AS (
      SELECT user_id,
        unnest(generate_series(lo, hi, INTERVAL '1 day')) AS bucket
      FROM span
    ),
    j AS (
      SELECT g.user_id, g.bucket, o.value
      FROM grid g LEFT JOIN obs o USING (user_id, bucket)
    )
    SELECT user_id, bucket,
      last_value(value IGNORE NULLS) OVER (
        PARTITION BY user_id ORDER BY bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS value_locf,
      (value IS NULL) AS is_gap
    FROM j
    ORDER BY user_id, bucket
    """
)

# Corpus bigram LM scoring (operators/text.bigram_lm_scores):
# add-one smoothed bigram MLE over the whole corpus, per-doc mean
# log-prob via an exact DECIMAL sum (order-independent across
# engines).
oracle("q_lm_score")(
    f"""
    WITH tok AS (
      SELECT doc_id,
        unnest(regexp_extract_all(lower(replace(text, 'İ', 'i')), {_TOKEN_PAT})) AS term,
        generate_subscripts(regexp_extract_all(lower(replace(text, 'İ', 'i')), {_TOKEN_PAT}), 1)
          AS pos
      FROM documents
    ),
    big AS (
      SELECT a.doc_id, a.term AS w1, b.term AS w2
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    cu AS (SELECT term, COUNT(*) AS c_uni FROM tok GROUP BY 1),
    cb AS (SELECT w1, w2, COUNT(*) AS c_big FROM big GROUP BY 1, 2),
    v AS (SELECT COUNT(DISTINCT term) AS v FROM tok)
    SELECT b.doc_id,
      COUNT(*) AS n_bigrams,
      ROUND(
        CAST(SUM(CAST(ln((cb.c_big + 1.0) / (cu.c_uni + v.v))
                      AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6)
        AS lm_score
    FROM big b
    JOIN cb USING (w1, w2)
    JOIN cu ON cu.term = b.w1
    CROSS JOIN v
    GROUP BY b.doc_id
    ORDER BY doc_id
    """
)

# Concatenate-and-chunk packing (operators/packing.pack_sequences):
# per-shard running token offsets → bin span per doc → exploded
# (doc, bin) rows with the contributed token count.
oracle("q_pack_sequences")(
    f"""
    WITH base AS (
      SELECT doc_id AS doc, doc_id % 4 AS shard,
        CAST(len(regexp_extract_all(lower(replace(text, 'İ', 'i')), {_TOKEN_PAT})) AS BIGINT)
          AS n_tokens
      FROM documents
    ),
    offs AS (
      SELECT doc, shard, n_tokens,
        COALESCE(SUM(n_tokens) OVER (
          PARTITION BY shard ORDER BY doc
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
      FROM base
    ),
    ex AS (
      SELECT doc, shard, n_tokens, start_off,
        start_off + n_tokens AS end_off,
        unnest(range(
          CAST(floor(start_off / 512) AS BIGINT),
          CAST(floor((start_off + n_tokens - 1) / 512) AS BIGINT) + 1
        )) AS bin
      FROM offs WHERE n_tokens > 0
    )
    SELECT doc, shard, bin,
      LEAST(end_off, (bin + 1) * 512) - GREATEST(start_off, bin * 512)
        AS tokens_in_bin,
      n_tokens, start_off
    FROM ex
    ORDER BY doc, bin
    """
)

# Mixture reweighting report (operators/packing.mix_report): the
# modulus selection rule re-derived relationally.
oracle("q_weighted_mix")(
    """
    WITH w(source, keep_below) AS (
      VALUES ('src0', 1000), ('src1', 600), ('src2', 300), ('src3', 0)
    ),
    pre AS (SELECT source, COUNT(*) AS n_before FROM documents GROUP BY 1),
    post AS (
      SELECT d.source, COUNT(*) AS n_after
      FROM documents d JOIN w USING (source)
      WHERE d.doc_id % 1000 < w.keep_below
      GROUP BY 1
    )
    SELECT pre.source, pre.n_before,
      COALESCE(post.n_after, 0) AS n_after,
      ROUND(COALESCE(post.n_after, 0) / pre.n_before, 6) AS rate
    FROM pre LEFT JOIN post USING (source)
    ORDER BY pre.source
    """
)

# The full corpus-preparation funnel (operators/corpus.prepare_corpus):
# quality floor → lang allowlist → exact dedup keep-min → LSH near-dup
# keep-one. Every stage re-derived in SQL; stage formulas are byte-
# identical to the q_text_stats / q_lang_id / q_dedup_exact /
# q_dedup_clusters oracles they compose.
oracle("q_corpus_prep")(
    f"""
    WITH scored AS (
      SELECT doc_id, lang, text,
        ROUND(0.4 * LEAST(length(text) / 500.0, 1.0)
              + 0.4 * (1.0 - LEAST(stop_ratio * 2.0, 1.0))
              + 0.2 * (1.0 - punct_ratio), 6) AS quality,
        CASE
          WHEN c_de = best THEN 'de'
          WHEN c_en = best THEN 'en'
          WHEN c_es = best THEN 'es'
          WHEN c_fr = best THEN 'fr'
          ELSE 'zh'
        END AS lang_pred
      FROM (
        SELECT doc_id, lang, text,
          ROUND(len(list_filter(string_split_regex(lower(replace(trim(text), 'İ', 'i')), '\\s+'),
                                w -> w IN {_STOPS}))
                / len(string_split_regex(lower(replace(trim(text), 'İ', 'i')), '\\s+')), 6)
            AS stop_ratio,
          ROUND((length(text)
                 - length({_PUNCT_STRIP}))
                / length(text), 6) AS punct_ratio,
          c_de, c_en, c_es, c_fr, c_zh,
          GREATEST(c_de, c_en, c_es, c_fr, c_zh) AS best
        FROM (
          SELECT doc_id, lang, text,
          {_lang_cols}
          FROM documents
        )
      )
    ),
    kept AS (
      SELECT doc_id, lang, text, quality FROM scored
      WHERE quality >= 0.3 AND lang_pred IN ('en', 'es')
    ),
    exact AS (
      SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5({_NORM})
    ),
    docs2 AS (SELECT k.* FROM kept k JOIN exact USING (doc_id)),
    sh AS ({_shingles_sql("docs2")}),
    {_MINHASH_BODY},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
      UNION ALL
      SELECT doc_b, doc_a FROM mh_pairs
    ),
    l0 AS (SELECT DISTINCT src AS doc, src AS label FROM edges){_lp_rounds},
    losers AS (SELECT doc FROM l4 WHERE doc != label)
    SELECT d.doc_id, d.lang, d.quality
    FROM docs2 d LEFT JOIN losers ON d.doc_id = losers.doc
    WHERE losers.doc IS NULL
    ORDER BY doc_id
    """
)

oracle("q_minhash_lsh")(
    f"""
    WITH sh AS ({_SHINGLES}),
    {_MINHASH_BODY}
    SELECT doc_a, doc_b, jaccard FROM mh_pairs
    ORDER BY doc_a, doc_b
    """
)

_simhash_bits = " + ".join(
    f"(CASE WHEN SUM(CASE WHEN (h & {1 << i}) != 0 THEN 1 ELSE -1 END) >= 0"
    f" THEN {1 << i} ELSE 0 END)"
    for i in range(16)
)

oracle("q_simhash")(
    f"""
    SELECT doc_id, CAST({_simhash_bits} AS BIGINT) AS simhash
    FROM (
      SELECT doc_id,
             CAST('0x' || substr(md5(t), 1, 4) AS INT) AS h
      FROM (
        SELECT doc_id,
               unnest(list_distinct(regexp_extract_all(lower(replace(text, 'İ', 'i')), {_TOKEN_PAT}))) AS t
        FROM documents
      )
    )
    GROUP BY doc_id
    """
)

oracle("q_cosine_topk")(
    """
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    )
    SELECT vec_id,
           ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6) AS cos_sim
    FROM embeddings, q
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT 10
    """
)


def _ann_bucket_sql(planes: int = 8, dims: int = 64, k: int = 5) -> str:
    """Hyperplane-LSH oracle with the ±1 weight matrix baked in as
    literals (same md5-derived weights as operators/similarity.py)."""
    import hashlib

    def w(p: int, d: int) -> float:
        return 1.0 if int(hashlib.md5(f"{p},{d}".encode()).hexdigest()[0], 16) < 8 else -1.0

    def dot_expr(vec: str, p: int) -> str:
        return " + ".join(f"({w(p, d):+.1f} * {vec}[{d + 1}])" for d in range(dims))

    def bucket_expr(vec: str) -> str:
        cases = ", ".join(
            f"CASE WHEN ({dot_expr(vec, p)}) >= 0 THEN '1' ELSE '0' END"
            for p in range(planes)
        )
        return f"concat({cases})"

    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT v AS qv, {bucket_expr('v')} AS qb FROM e WHERE vec_id = 0),
    b AS (SELECT vec_id, v, {bucket_expr('v')} AS bucket FROM e)
    SELECT b.vec_id,
           ROUND(list_cosine_similarity(b.v, q.qv), 6) AS cos_sim
    FROM b, q
    WHERE b.bucket = q.qb
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT {k}
    """


oracle("q_ann_bucket")(_ann_bucket_sql())

oracle("q_binary_meta")(
    """
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """
)

oracle("q_media_features")(
    """
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           CAST(CEIL(octet_length(CAST(text AS BLOB)) / 64.0) AS INT) AS n_frames
    FROM documents
    """
)

oracle("q_rollup_state")(
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           COUNT(l_quantity) AS n_vals,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total,
           CASE WHEN COUNT(l_quantity) > 0 THEN
             ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(l_quantity), 6) END AS avg_val,
           CAST(MIN(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS min_val,
           CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_val
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """
)

# Five synthesis modes by doc_id % 5 (mirrors q_media_decode):
# 0 gray8, 1 RGB8, 2 two-bit palette (entry channel-sums 60/300/383/
# 765) written Adam7-interlaced, 3 gray16 (decoded pixels are the
# big-endian byte pairs, so the mean is over high+low bytes), 4
# two-bit palette + tRNS (0,255,128; entry 3 defaults opaque) →
# RGBA, per-pixel contribution = entry channel-sum + its alpha.
# q_media_decode: modes 0-4 are the PNG closed forms (dims from
# d//8, independent of the mode residue); mode 5 (round 9) is the
# baseline-JPEG DC-exactness contract — 8x8 block b of a
# (1+d%3)x(1+d%2) grid holds the constant (d*31+b)%256, so the pixel
# SUM is 64x the block-value sum over exactly n_blocks terms (the
# unnest range collapses to one k per block, value pre-scaled by 64,
# and the divisor stays width*height so the double division sees the
# same two integers Spark divides). Mode 6 is the color-4:2:0
# contract: 16x16 tile k holds constant YCbCr, the decoder recovers
# it exactly, and only the shared closed-form RGB rounding remains —
# replayed here with the identical double arithmetic (chroma is a
# multiple of 4, never an exact .5 boundary; per-tile value
# pre-scaled by the 256 pixels of the tile). Mode 7 (round 10) is
# the PROGRESSIVE grayscale JPEG: the same block-constant closed
# form as mode 5 — a full spectral-selection + successive-
# approximation script reconstructs the sequential coefficients
# exactly, so only the Spark-side decoder changes, not the truth.
# Mode 8 (round 10) is the INTERLACED GIF over the shared 4-entry
# palette: LZW decode + deinterlace are lossless on indices, so the
# pixel sum is the same palette channel-sum closed form as mode 2.
oracle("q_media_decode")(
    """
    WITH dims AS (
      SELECT doc_id,
             CASE WHEN doc_id % 9 IN (5, 7) THEN 8 * (1 + doc_id % 3)
                  WHEN doc_id % 9 = 6 THEN 16 * (1 + doc_id % 2)
                  ELSE 3 + (doc_id // 9) % 7 END AS width,
             CASE WHEN doc_id % 9 IN (5, 7) THEN 8 * (1 + doc_id % 2)
                  WHEN doc_id % 9 = 6 THEN 16 * (1 + (doc_id % 4) // 2)
                  ELSE 2 + (doc_id // 9) % 4 END AS height,
             doc_id % 9 AS mode
      FROM documents
    ),
    px AS (
      SELECT doc_id, width, height, mode,
             unnest(range(0, CAST(
               CASE WHEN mode IN (5, 7) THEN (width // 8) * (height // 8)
                    WHEN mode = 6 THEN (width // 16) * (height // 16)
                    WHEN mode = 1 THEN width * height * 3
                    ELSE width * height END AS BIGINT))) AS k
      FROM dims
    ),
    tile AS (
      SELECT doc_id, width, height, mode, k,
             CAST((doc_id * 31 + 5 * k) % 256 AS DOUBLE) AS ty,
             CAST(4 * ((doc_id * 17 + 7 * k) % 60) + 4 AS DOUBLE) AS tcb,
             CAST(4 * ((doc_id * 13 + 11 * k) % 60) + 4 AS DOUBLE) AS tcr
      FROM px
    )
    SELECT doc_id,
           CAST(width AS INT) AS width,
           CAST(height AS INT) AS height,
           CAST(CASE WHEN mode IN (1, 2, 6, 8) THEN 3
                     WHEN mode = 4 THEN 4 ELSE 1 END AS INT)
             AS channels,
           ROUND(CAST(SUM(CASE
               WHEN mode IN (0, 1) THEN (doc_id * 31 + k) % 256
               WHEN mode IN (2, 8) THEN list_value(60, 300, 383, 765)[
                 1 + CAST((doc_id * 31 + k) % 4 AS INT)]
               WHEN mode = 4 THEN list_value(60, 300, 383, 765)[
                 1 + CAST((doc_id * 31 + k) % 4 AS INT)]
                 + list_value(0, 255, 128, 255)[
                 1 + CAST((doc_id * 31 + k) % 4 AS INT)]
               WHEN mode IN (5, 7) THEN 64 * ((doc_id * 31 + k) % 256)
               WHEN mode = 6 THEN CAST(256 * (
                   LEAST(GREATEST(ROUND(ty + 1.402 * (tcr - 128)), 0), 255)
                 + LEAST(GREATEST(ROUND(ty - 0.344136 * (tcb - 128)
                                           - 0.714136 * (tcr - 128)), 0), 255)
                 + LEAST(GREATEST(ROUND(ty + 1.772 * (tcb - 128)), 0), 255)
               ) AS BIGINT)
               ELSE ((doc_id * 31 + k) % 65536) // 256
                    + ((doc_id * 31 + k) % 65536) % 256
             END) AS DOUBLE)
             / (width * height * CASE WHEN mode IN (1, 2, 6, 8) THEN 3
                                      WHEN mode = 3 THEN 2
                                      WHEN mode = 4 THEN 4
                                      ELSE 1 END), 6) AS mean_pixel
    FROM tile
    GROUP BY doc_id, width, height, mode
    ORDER BY doc_id
    """
)

oracle("q_frame_sample")(
    """
    WITH f AS (
      SELECT doc_id,
             CAST(unnest(range(0, 4)) AS INT) AS frame_idx,
             text,
             GREATEST(length(text) - 64, 0) AS usable
      FROM documents
    )
    SELECT doc_id, frame_idx,
           CAST(TRUNC(usable * frame_idx / 3.0) AS BIGINT) AS frame_offset,
           md5(substr(text, CAST(TRUNC(usable * frame_idx / 3.0) AS BIGINT) + 1, 64))
             AS frame_md5
    FROM f
    ORDER BY doc_id, frame_idx
    """
)

oracle("q_grouping_sets")(
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """
)

oracle("q_stream_tumbling")(
    """
    SELECT
      time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
      event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """
)

oracle("q_tumbling_window")(
    """
    SELECT
      time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
      event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """
)

def _embed_near_dup_sql(
    threshold: float = 0.42, dims: int = 64, planes: int = 4, tables: int = 3
) -> str:
    """Mirror of similarity.bucketed_near_dup_pairs: per-table
    hyperplane buckets (explicit left-to-right sum chains over the
    raw vector — same evaluation order as Spark's aggregate fold),
    equi-join candidates, exact cosine verify on unit vectors."""
    import hashlib

    def w(t: int, p: int, d: int) -> float:
        h = hashlib.md5(f"{t},{p},{d}".encode()).hexdigest()[0]
        return 1.0 if int(h, 16) < 8 else -1.0

    def bucket_expr(t: int) -> str:
        cases = ", ".join(
            "CASE WHEN ("
            + " + ".join(f"({w(t, p, d):+.1f} * v[{d + 1}])" for d in range(dims))
            + ") >= 0 THEN '1' ELSE '0' END"
            for p in range(planes)
        )
        return f"concat({cases})"

    tbl_sql = "\n      UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {bucket_expr(t)} AS bucket FROM e"
        for t in range(tables)
    )
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    u AS (
      SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS uv
      FROM e
    ),
    banded AS ({tbl_sql}),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM banded a JOIN banded b
        ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b,
           ROUND(list_dot_product(x.uv, y.uv), 6) AS cos_sim
    FROM cand c JOIN u x ON c.id_a = x.vec_id JOIN u y ON c.id_b = y.vec_id
    WHERE ROUND(list_dot_product(x.uv, y.uv), 6) >= {threshold}
    ORDER BY id_a, id_b
    """


oracle("q_embed_near_dup")(_embed_near_dup_sql())

oracle("q_sliding_window")(
    """
    WITH x AS (
      SELECT event_type,
        unnest([
          time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
          time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
            - INTERVAL '30 minutes'
        ]) AS window_start
      FROM events
    )
    SELECT window_start, event_type, COUNT(*) AS n
    FROM x
    GROUP BY 1, 2
    ORDER BY 1, 2
    """
)

oracle("q_session_window")(
    """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    x AS (
      SELECT user_id, ts,
        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                  >= INTERVAL 10 MINUTE
             THEN 1 ELSE 0 END AS ns
      FROM e
    ),
    y AS (
      SELECT user_id, ts,
        SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM x
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 10 MINUTE AS session_end,
           COUNT(*) AS n
    FROM y
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """
)

oracle("q_stats_agg")(
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(stddev_samp(l_quantity), 6) AS x_stddev,
           ROUND(var_samp(l_quantity), 6) AS x_var,
           ROUND(corr(l_quantity, l_discount), 6) AS xy_corr,
           ROUND(covar_samp(l_quantity, l_discount), 6) AS xy_covar
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """
)

oracle("q_percentiles")(
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_quantity, 0.50), 6) AS p50,
           ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """
)

oracle("q_sample_hash")(
    """
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """
)

oracle("q_approx_distinct")(
    """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS exact_distinct,
           TRUE AS approx_ok
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """
)

oracle("q_salted_agg")(
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """
)

oracle("q_bucketed_join_agg")(
    """
    SELECT c_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """
)

oracle("q_merge_dedup")(
    """
    SELECT event_id, event_type, value
    FROM events
    WHERE event_id % 3 = 0 OR event_id % 2 = 0
    """
)

oracle("q_json_funcs")(
    """
    WITH j AS (
      SELECT o_orderkey,
             '{"status":"' || o_orderstatus || '","priority":"'
               || o_orderpriority || '"}' AS js
      FROM orders
    )
    SELECT o_orderkey,
           json_extract_string(js, '$.status') AS status_j,
           json_extract_string(js, '$.priority') AS priority_j
    FROM j
    """
)

oracle("q_ivf_topk")(
    """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    c AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 50 = 0
    ),
    a AS (
      SELECT e.vec_id, e.v, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC, c.cid ASC
             ) AS rn
      FROM e CROSS JOIN c
    ),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    qc AS (
      SELECT c.cid FROM c, q
      ORDER BY ROUND(list_cosine_similarity(q.qv, c.cv), 6) DESC, c.cid ASC
      LIMIT 1
    )
    SELECT a.vec_id, a.cid AS cluster_id,
           ROUND(list_cosine_similarity(a.v, qv), 6) AS cos_sim
    FROM a, q, qc
    WHERE a.rn = 1 AND a.cid = qc.cid
    ORDER BY cos_sim DESC, a.vec_id ASC
    LIMIT 5
    """
)

oracle("q_udf_tokens")(
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
             AS n_spaces
    FROM documents
    """
)


# Gopher-style repetition signals (operators/curation.repetition_stats):
# the dup fractions are pure list expressions; top_word_frac needs
# word frequencies. Slice/range bounds mirror the Spark k-gram
# pattern exactly (one truncated gram for single-word docs).
oracle("q_repetition_stats")(
    f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents
    ),
    g AS (
      SELECT doc_id, words,
        list_transform(
          range(1, GREATEST(len(words) - 2, 0) + 2),
          i -> array_to_string(words[i:i+1], ' ')
        ) AS g2
      FROM w
    ),
    scan AS (
      SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words,
        ROUND(1 - CAST(len(list_distinct(words)) AS DOUBLE) / len(words), 6)
          AS dup_word_frac,
        ROUND(1 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6)
          AS dup_2gram_frac
      FROM g
    ),
    freq AS (
      SELECT doc_id, MAX(cnt) AS top FROM (
        SELECT doc_id, word, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(words) AS word FROM w)
        GROUP BY doc_id, word
      ) GROUP BY doc_id
    )
    SELECT s.doc_id AS doc, n_words, dup_word_frac, dup_2gram_frac,
      ROUND(CAST(top AS DOUBLE) / n_words, 6) AS top_word_frac
    FROM scan s JOIN freq USING (doc_id)
    ORDER BY doc
    """
)

# Eval-set decontamination (operators/curation.contamination_report):
# bench slice doc_id % 97 = 0, 3-gram shingles, doc-side containment
# >= 5%.
oracle("q_decontaminate")(
    f"""
    WITH sh AS ({_SHINGLES}),
    bg AS (
      SELECT DISTINCT unnest(sh) AS gram FROM sh WHERE doc_id % 97 = 0
    ),
    ex AS (
      SELECT doc_id, unnest(sh) AS gram FROM sh WHERE doc_id % 97 != 0
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM ex GROUP BY doc_id),
    hits AS (
      SELECT doc_id, COUNT(*) AS n_hit FROM ex JOIN bg USING (gram)
      GROUP BY doc_id
    )
    SELECT t.doc_id AS doc, n_shingles,
      COALESCE(n_hit, 0) AS n_hit,
      ROUND(CAST(COALESCE(n_hit, 0) AS DOUBLE) / n_shingles, 6)
        AS overlap_frac
    FROM tot t LEFT JOIN hits USING (doc_id)
    WHERE ROUND(CAST(COALESCE(n_hit, 0) AS DOUBLE) / n_shingles, 6) >= 0.05
    ORDER BY doc
    """
)

# Deterministic per-source quota sample (operators/curation.
# quota_sample): md5(id) order, ties by id — identical row choice in
# both engines.
oracle("q_quota_sample")(
    """
    SELECT doc_id, source FROM (
      SELECT doc_id, source, row_number() OVER (
        PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      ) AS rn FROM documents
    ) WHERE rn <= 40
    ORDER BY doc_id
    """
)


# Declarative expectations report (operators/expectations.check):
# every count_if rule is one conditional count in a single scan; the
# uniqueness rule is its own grouped count.
oracle("q_expectations")(
    """
    WITH agg AS (
      SELECT
        CAST(COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT)
          AS nn,
        CAST(COUNT(CASE WHEN NOT COALESCE(o_orderstatus IN ('O','F','P'),
                                          FALSE) THEN 1 END) AS BIGINT)
          AS av,
        CAST(COUNT(CASE WHEN NOT COALESCE(
              o_totalprice >= 0.0 AND o_totalprice <= 100000.0,
              FALSE) THEN 1 END) AS BIGINT) AS ir,
        CAST(GREATEST(1 - COUNT(*), COUNT(*) - 1000, 0) AS BIGINT) AS rc
      FROM orders
    ),
    uq AS (
      SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS u FROM (
        SELECT COUNT(*) AS n FROM orders
        GROUP BY o_orderkey HAVING COUNT(*) > 1
      )
    )
    SELECT rule, failing_rows = 0 AS passed, failing_rows FROM (
      SELECT 'not_null_o_orderkey' AS rule, nn AS failing_rows FROM agg
      UNION ALL
      SELECT 'unique_o_orderkey', u FROM uq
      UNION ALL
      SELECT 'accepted_values_o_orderstatus', av FROM agg
      UNION ALL
      SELECT 'in_range_o_totalprice', ir FROM agg
      UNION ALL
      SELECT 'row_count_between_1_1000', rc FROM agg
    )
    ORDER BY rule
    """
)

# SCD Type-2 merge (operators/scd.scd2_merge): batch1 (keys % 11 !=
# 0) at 2024-01-01, batch2 (all keys, segment swapped for % 7 == 0)
# at 2024-02-01 — closed+reopened for changed keys, kept for
# unchanged, opened for new.
oracle("q_scd2")(
    """
    WITH b1 AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 11 != 0
    ),
    b2 AS (
      SELECT c_custkey,
        CASE WHEN c_custkey % 7 = 0 THEN 'CHANGED' ELSE c_mktsegment END
          AS c_mktsegment
      FROM customer
    )
    SELECT c_custkey, c_mktsegment, valid_from, valid_to, is_current FROM (
      SELECT b1.c_custkey, b1.c_mktsegment,
        DATE '2024-01-01' AS valid_from, DATE '2024-02-01' AS valid_to,
        FALSE AS is_current
      FROM b1 JOIN b2 ON b1.c_custkey = b2.c_custkey
      WHERE b1.c_mktsegment IS DISTINCT FROM b2.c_mktsegment
      UNION ALL
      SELECT b1.c_custkey, b1.c_mktsegment,
        DATE '2024-01-01', DATE '9999-12-31', TRUE
      FROM b1 JOIN b2 ON b1.c_custkey = b2.c_custkey
      WHERE b1.c_mktsegment IS NOT DISTINCT FROM b2.c_mktsegment
      UNION ALL
      SELECT b2.c_custkey, b2.c_mktsegment,
        DATE '2024-02-01', DATE '9999-12-31', TRUE
      FROM b2 LEFT JOIN b1 ON b1.c_custkey = b2.c_custkey
      WHERE b1.c_custkey IS NULL
         OR b1.c_mktsegment IS DISTINCT FROM b2.c_mktsegment
    )
    ORDER BY c_custkey, valid_from
    """
)


# Overlapping token-window chunking (operators/packing.
# chunk_documents, 32/8): stride 24; slice bounds are the same
# elements in both engines (Spark slice(arr, s+1, 32) == DuckDB
# arr[s+1 : s+32] inclusive).
oracle("q_chunk_docs")(
    f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents
    ),
    n AS (
      SELECT doc_id, words,
        CAST(ceil(GREATEST(len(words) - 8, 1) / 24.0) AS INT) AS n_chunks
      FROM w
    ),
    e AS (
      SELECT doc_id, words, unnest(range(0, n_chunks)) AS chunk_idx FROM n
    )
    SELECT doc_id AS doc,
      CAST(chunk_idx AS BIGINT) AS chunk_idx,
      CAST(chunk_idx * 24 AS BIGINT) AS chunk_start,
      CAST(len(words[chunk_idx*24+1 : chunk_idx*24+32]) AS BIGINT)
        AS n_tokens,
      array_to_string(words[chunk_idx*24+1 : chunk_idx*24+32], ' ')
        AS chunk_text
    FROM e
    ORDER BY doc, chunk_idx
    """
)


# Keyed snapshot diff (operators/reconcile.table_diff): one
# full-outer join, null-safe compare.
oracle("q_table_diff")(
    """
    WITH l AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 13 != 0
    ),
    r AS (
      SELECT c_custkey,
        CASE WHEN c_custkey % 7 = 0 THEN 'CHANGED' ELSE c_mktsegment END
          AS c_mktsegment
      FROM customer WHERE c_custkey % 17 != 0
    )
    SELECT COALESCE(l.c_custkey, r.c_custkey) AS c_custkey,
      CASE WHEN l.c_custkey IS NULL THEN 'added'
           WHEN r.c_custkey IS NULL THEN 'removed'
           WHEN l.c_mktsegment IS NOT DISTINCT FROM r.c_mktsegment
             THEN 'unchanged'
           ELSE 'changed' END AS diff
    FROM l FULL JOIN r ON l.c_custkey = r.c_custkey
    ORDER BY c_custkey
    """
)

# One-pass column profiler (operators/reconcile.profile_columns):
# per-column null/distinct/min/max as strings (no double columns in
# the query — cross-engine float FORMATTING is not pinned, values
# are).
oracle("q_profile")(
    """
    SELECT * FROM (
      SELECT 'o_orderkey' AS col_name,
        CAST(COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT)
          AS n_null,
        CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
        CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
      FROM orders
      UNION ALL
      SELECT 'o_custkey',
        CAST(COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT),
        CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
        CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus',
        CAST(COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS BIGINT),
        CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
        CAST(MIN(o_orderstatus) AS VARCHAR),
        CAST(MAX(o_orderstatus) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority',
        CAST(COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS BIGINT),
        CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
        CAST(MIN(o_orderpriority) AS VARCHAR),
        CAST(MAX(o_orderpriority) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderdate',
        CAST(COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END) AS BIGINT),
        CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
        CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR)
      FROM orders
    )
    ORDER BY col_name
    """
)


# Deterministic hash split (operators/curation.hash_split, 80/10/10):
# cumulative md5-hex cutoffs, plain string comparison in both engines.
oracle("q_hash_split")(
    """
    SELECT doc_id,
      CASE
        WHEN md5(CAST(doc_id AS VARCHAR))
             < 'cccccccccccc00000000000000000000' THEN 'train'
        WHEN md5(CAST(doc_id AS VARCHAR))
             < 'e6666666666600000000000000000000' THEN 'val'
        ELSE 'test'
      END AS split
    FROM documents
    ORDER BY doc_id
    """
)


# ---------------------------------------------------------- round 3

oracle("q_bm25")(
    f"""
    WITH lens AS (
      SELECT doc_id AS doc,
             CAST(len(regexp_extract_all(lower(replace(text, 'İ', 'i')), {_TOKEN_PAT})) AS BIGINT) AS dl
      FROM documents
    ),
    consts AS (
      SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM lens
    ),
    qtf AS (
      SELECT doc, term, COUNT(*) AS tf
      FROM (
        SELECT doc_id AS doc,
               unnest(regexp_extract_all(lower(replace(text, 'İ', 'i')), {_TOKEN_PAT})) AS term
        FROM documents
      )
      WHERE term IN ('spark', 'window', 'merge')
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM qtf GROUP BY 1),
    scored AS (
      SELECT qtf.doc,
             CAST(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * ((tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl)))
               AS DECIMAL(18,6)
             ) AS s
      FROM qtf
      JOIN dfreq USING (term)
      JOIN lens USING (doc)
      CROSS JOIN consts
    ),
    agg AS (SELECT doc, CAST(SUM(s) AS DOUBLE) AS score FROM scored GROUP BY doc),
    ranked AS (
      SELECT doc AS doc_id, score,
             CAST(row_number() OVER (ORDER BY score DESC, doc ASC) AS BIGINT) AS rank
      FROM agg
    )
    SELECT doc_id, score, rank FROM ranked WHERE rank <= 20 ORDER BY rank
    """
)

oracle("q_rolling_anomaly")(
    """
    WITH base AS (
      SELECT user_id AS key, ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    ),
    win AS (
      SELECT key, ts, v,
        COUNT(*) OVER w AS n,
        CAST(SUM(v) OVER w AS DECIMAL(18,2)) AS s1,
        CAST(SUM(v * v) OVER w AS DECIMAL(18,4)) AS s2
      FROM base
      WINDOW w AS (
        PARTITION BY key ORDER BY sec
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
      )
    ),
    stats AS (
      SELECT key, ts, v, n,
        CAST(s1 AS DOUBLE) / n AS mean,
        CASE WHEN n > 1 THEN sqrt(greatest(
          CAST(CAST(CAST(n AS DECIMAL(12,0)) * CAST(s2 AS DECIMAL(19,4)) AS DECIMAL(30,4))
               - CAST(CAST(s1 AS DECIMAL(19,2)) * s1 AS DECIMAL(30,4)) AS DOUBLE)
          / (n * (n - 1)), 0.0)) END AS std
      FROM win
    ),
    z AS (
      SELECT key, ts, v, n, mean, std,
        CASE WHEN n > 1 AND std > 0
             THEN (CAST(v AS DOUBLE) - mean) / std END AS zval
      FROM stats
    )
    SELECT
      key AS user_id, ts,
      CAST(v AS DOUBLE) AS value,
      CAST(n AS BIGINT) AS n_win,
      ROUND(mean, 6) AS mean_win,
      ROUND(std, 6) AS std_win,
      ROUND(zval, 6) AS z,
      COALESCE(abs(zval) > 2.0, FALSE) AS is_anomaly
    FROM z
    ORDER BY user_id, ts, value
    """
)

oracle("q_linreg")(
    """
    WITH agg AS (
      SELECT l_suppkey,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sy,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(24,4)) AS sxx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(24,4)) AS syy,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(24,4)) AS sxy
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      GROUP BY 1
    ),
    fit AS (
      SELECT l_suppkey, n, sx, sy,
        CAST(CAST(CAST(n AS DECIMAL(12,0)) * sxy AS DECIMAL(30,4))
             - CAST(CAST(sx AS DECIMAL(19,2)) * sy AS DECIMAL(30,4)) AS DOUBLE) AS num,
        CAST(CAST(CAST(n AS DECIMAL(12,0)) * sxx AS DECIMAL(30,4))
             - CAST(CAST(sx AS DECIMAL(19,2)) * sx AS DECIMAL(30,4)) AS DOUBLE) AS den_x,
        CAST(CAST(CAST(n AS DECIMAL(12,0)) * syy AS DECIMAL(30,4))
             - CAST(CAST(sy AS DECIMAL(19,2)) * sy AS DECIMAL(30,4)) AS DOUBLE) AS den_y
      FROM agg
    )
    SELECT l_suppkey, n,
      ROUND(CASE WHEN den_x <> 0 THEN num / den_x END, 6) AS slope,
      ROUND((CAST(sy AS DOUBLE)
             - (CASE WHEN den_x <> 0 THEN num / den_x END)
               * CAST(sx AS DOUBLE)) / n, 6) AS intercept,
      ROUND(CASE WHEN den_x <> 0 AND den_y <> 0
                 THEN (num * num) / (den_x * den_y) END, 6) AS r2
    FROM fit
    ORDER BY l_suppkey
    """
)


def _kmeans_ivf_sql(k: int = 4, iterations: int = 2) -> str:
    """Lloyd's algorithm unrolled as chained CTEs: seeds = the k
    lowest-id vectors; each iteration = rounded-cosine argmax
    assignment (ties to the lowest centroid id) + per-dimension
    DECIMAL(18,9)-exact mean, mirroring
    operators/similarity.kmeans_codebook step for step. Empty
    clusters fall back to the previous centroid via LEFT JOIN +
    COALESCE, as in the operator."""
    ctes = [
        """vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )""",
        f"""c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
               AS cluster_id,
             v AS cv
      FROM (SELECT vec_id, v FROM vecs ORDER BY vec_id LIMIT {k})
    )""",
    ]
    prev = "c0"
    for i in range(1, iterations + 1):
        ctes.append(f"""a{i} AS (
      SELECT vec_id, cluster_id, v FROM (
        SELECT vecs.vec_id, {prev}.cluster_id, vecs.v,
               row_number() OVER (
                 PARTITION BY vecs.vec_id
                 ORDER BY ROUND(list_cosine_similarity(vecs.v, {prev}.cv), 6)
                            DESC,
                          {prev}.cluster_id ASC
               ) AS rn
        FROM vecs CROSS JOIN {prev}
      ) WHERE rn = 1
    )""")
        ctes.append(f"""m{i} AS (
      SELECT cluster_id, pos,
             CAST(SUM(CAST(val AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS m
      FROM (
        SELECT cluster_id, unnest(v) AS val, generate_subscripts(v, 1) AS pos
        FROM a{i}
      )
      GROUP BY 1, 2
    )""")
        ctes.append(
            f"n{i} AS (SELECT cluster_id, list(m ORDER BY pos) AS cv "
            f"FROM m{i} GROUP BY 1)"
        )
        ctes.append(f"""c{i} AS (
      SELECT {prev}.cluster_id, COALESCE(n{i}.cv, {prev}.cv) AS cv
      FROM {prev} LEFT JOIN n{i} USING (cluster_id)
    )""")
        prev = f"c{i}"
    final = f"""
    SELECT vec_id, cluster_id, cs AS cos_sim FROM (
      SELECT vecs.vec_id, {prev}.cluster_id,
             ROUND(list_cosine_similarity(vecs.v, {prev}.cv), 6) AS cs,
             row_number() OVER (
               PARTITION BY vecs.vec_id
               ORDER BY ROUND(list_cosine_similarity(vecs.v, {prev}.cv), 6)
                          DESC,
                        {prev}.cluster_id ASC
             ) AS rn
      FROM vecs CROSS JOIN {prev}
    ) WHERE rn = 1
    ORDER BY vec_id
    """
    return "WITH " + ",\n    ".join(ctes) + final


oracle("q_kmeans_ivf")(_kmeans_ivf_sql())


oracle("q_histogram")(
    """
    SELECT l_returnflag, bucket,
           ROUND(0.0 + bucket * 5.0, 6) AS bucket_lo,
           ROUND(0.0 + (bucket + 1) * 5.0, 6) AS bucket_hi,
           COUNT(*) AS n
    FROM (
      SELECT l_returnflag,
             LEAST(GREATEST(
               CAST(FLOOR((CAST(l_quantity AS DOUBLE) - 0.0) / 5.0) AS BIGINT),
               0), 9) AS bucket
      FROM lineitem
      WHERE l_quantity IS NOT NULL
    )
    GROUP BY 1, 2
    ORDER BY l_returnflag, bucket
    """
)


oracle("q_approx_pct")(
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS exact_pct,
           TRUE AS approx_ok
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """
)

oracle("q_entropy")(
    """
    WITH counts AS (
      SELECT source, lang AS v, COUNT(*) AS c FROM documents GROUP BY 1, 2
    ),
    totals AS (SELECT source, SUM(c) AS n FROM counts GROUP BY 1)
    SELECT counts.source,
           ROUND(CAST(SUM(CAST(
             (-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))
             * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
             AS DECIMAL(18,12))) AS DOUBLE), 6) AS entropy,
           COUNT(*) AS n_distinct
    FROM counts JOIN totals
      ON counts.source IS NOT DISTINCT FROM totals.source
    GROUP BY counts.source
    ORDER BY counts.source
    """
)


oracle("q_outer_join")(
    """
    WITH per_cust AS (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1
    ),
    cust AS (
      SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000
    )
    SELECT COALESCE(o_custkey, c_custkey) AS custkey,
           c_name,
           COALESCE(n_orders, 0) AS n_orders,
           o_custkey IS NOT NULL AS has_orders,
           c_custkey IS NOT NULL AS high_balance
    FROM per_cust FULL OUTER JOIN cust ON o_custkey = c_custkey
    ORDER BY custkey
    """
)


def _pq_chain(
    m: int = 4, ksub: int = 8, iterations: int = 2, dims: int = 64,
) -> tuple[list, str, str]:
    """The nprobe-INDEPENDENT core of the PQ oracle: per-subspace
    Lloyd k-means training, encode, and the query's per-(subspace,
    centroid) distance tables. Returns (ctes, joins, total_expr) so
    _pq_topk_sql and _recall_curve_sql share ONE generator — the
    recall curve runs this heavy chain once for all nprobe branches
    (three inline copies OOMed DuckDB under full-suite memory
    pressure)."""
    dsub = dims // m

    def dist(a: str, b: str) -> str:
        terms = [
            f"({a}[{i}]-{b}[{i}])*({a}[{i}]-{b}[{i}])"
            for i in range(1, dsub + 1)
        ]
        return "ROUND(" + " + ".join(terms) + ", 6)"

    ctes = [
        "vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings)"
    ]
    for j in range(m):
        lo, hi = j * dsub + 1, (j + 1) * dsub
        ctes.append(
            f"vs{j} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM vecs)"
        )
        ctes.append(
            f"""s{j}c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
               AS cluster_id, v AS cv
      FROM (SELECT vec_id, v FROM vs{j} ORDER BY vec_id LIMIT {ksub})
    )"""
        )
        prev = f"s{j}c0"
        for i in range(1, iterations + 1):
            ctes.append(
                f"""s{j}a{i} AS (
      SELECT vec_id, cluster_id, v FROM (
        SELECT vs{j}.vec_id, {prev}.cluster_id, vs{j}.v,
               row_number() OVER (
                 PARTITION BY vs{j}.vec_id
                 ORDER BY {dist(f"vs{j}.v", f"{prev}.cv")} ASC,
                          {prev}.cluster_id ASC
               ) AS rn
        FROM vs{j} CROSS JOIN {prev}
      ) WHERE rn = 1
    )"""
            )
            ctes.append(
                f"""s{j}m{i} AS (
      SELECT cluster_id, pos,
             CAST(SUM(CAST(val AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS mv
      FROM (
        SELECT cluster_id, unnest(v) AS val,
               generate_subscripts(v, 1) AS pos
        FROM s{j}a{i}
      )
      GROUP BY 1, 2
    )"""
            )
            ctes.append(
                f"s{j}n{i} AS (SELECT cluster_id, list(mv ORDER BY pos) AS cv "
                f"FROM s{j}m{i} GROUP BY 1)"
            )
            ctes.append(
                f"""s{j}c{i} AS (
      SELECT {prev}.cluster_id, COALESCE(s{j}n{i}.cv, {prev}.cv) AS cv
      FROM {prev} LEFT JOIN s{j}n{i} USING (cluster_id)
    )"""
            )
            prev = f"s{j}c{i}"
        ctes.append(
            f"""enc{j} AS (
      SELECT vec_id, cluster_id FROM (
        SELECT vs{j}.vec_id, {prev}.cluster_id,
               row_number() OVER (
                 PARTITION BY vs{j}.vec_id
                 ORDER BY {dist(f"vs{j}.v", f"{prev}.cv")} ASC,
                          {prev}.cluster_id ASC
               ) AS rn
        FROM vs{j} CROSS JOIN {prev}
      ) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"qs{j} AS (SELECT v AS qv FROM vs{j} WHERE vec_id = 0)"
        )
        ctes.append(
            f"""dt{j} AS (
      SELECT cluster_id, {dist("cv", "qv")} AS pd
      FROM {prev} CROSS JOIN qs{j}
    )"""
        )
    joins = "enc0 e0 JOIN dt0 d0 ON e0.cluster_id = d0.cluster_id"
    for j in range(1, m):
        joins += (
            f" JOIN enc{j} e{j} ON e{j}.vec_id = e0.vec_id"
            f" JOIN dt{j} d{j} ON e{j}.cluster_id = d{j}.cluster_id"
        )
    total = " + ".join(f"d{j}.pd" for j in range(m))
    return ctes, joins, total


def _pq_topk_sql(
    m: int = 4, ksub: int = 8, iterations: int = 2, dims: int = 64,
    k: int = 10, nprobe: int | None = None, centroid_mod: int = 50,
) -> str:
    """Product-quantization oracle: per-subspace L2 Lloyd k-means
    (same chained-CTE pattern as _kmeans_ivf_sql, with the argmin on
    ROUND(squared L2, 6) ties-low), final-codebook encode, and ADC
    scoring from the query's per-(subspace, centroid) distance
    table. Every squared distance is the explicit left-associated
    term chain, matching Spark's sequential fold bitwise.

    With ``nprobe`` set, the scored set is first pruned to vectors
    whose nearest subsampled-centroid assignment (rounded cosine,
    ties-low — the q_ivf_topk mirror) lands in the query's nprobe
    best clusters: the IVF+PQ composition (similarity.ivfpq_topk)."""
    ctes, joins, total = _pq_chain(m, ksub, iterations, dims)
    ctes = list(ctes)
    if nprobe is not None:
        ctes.append(
            f"ivfc AS (SELECT vec_id AS cid, v AS cv FROM vecs "
            f"WHERE vec_id % {centroid_mod} = 0)"
        )
        ctes.append("qfull AS (SELECT v AS qv FROM vecs WHERE vec_id = 0)")
        ctes.append(
            f"""qc AS (
      SELECT cid FROM ivfc, qfull
      ORDER BY ROUND(list_cosine_similarity(qv, cv), 6) DESC, cid ASC
      LIMIT {nprobe}
    )"""
        )
        ctes.append(
            """iassign AS (
      SELECT vec_id FROM (
        SELECT vecs.vec_id, ivfc.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY vecs.vec_id
                 ORDER BY ROUND(list_cosine_similarity(vecs.v, ivfc.cv), 6)
                            DESC,
                          ivfc.cid ASC
               ) AS rn
        FROM vecs CROSS JOIN ivfc
      ) WHERE rn = 1 AND cid IN (SELECT cid FROM qc)
    )"""
        )
        joins += " JOIN iassign ia ON ia.vec_id = e0.vec_id"
    final = f"""
    SELECT vec_id, pq_dist, rank FROM (
      SELECT e0.vec_id,
             ROUND(sqrt({total}), 6) AS pq_dist,
             CAST(row_number() OVER (
               ORDER BY ROUND(sqrt({total}), 6) ASC, e0.vec_id ASC
             ) AS BIGINT) AS rank
      FROM {joins}
    ) WHERE rank <= {k}
    ORDER BY rank
    """
    return "WITH " + ",\n    ".join(ctes) + final


oracle("q_pq_topk")(_pq_topk_sql())


oracle("q_standardize")(
    """
    WITH stats AS (
      SELECT
        COUNT(l_quantity) AS n_q,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS s1_q,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(24,4)) AS s2_q,
        MIN(CAST(l_quantity AS DECIMAL(18,2))) AS mn_q,
        MAX(CAST(l_quantity AS DECIMAL(18,2))) AS mx_q,
        COUNT(l_extendedprice) AS n_p,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS s1_p,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(24,4)) AS s2_p,
        MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS mn_p,
        MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS mx_p
      FROM lineitem
    ),
    derived AS (
      SELECT *,
        CAST(s1_q AS DOUBLE) / n_q AS mean_q,
        CASE WHEN n_q > 1 THEN sqrt(greatest(
          CAST(CAST(CAST(n_q AS DECIMAL(12,0)) * CAST(s2_q AS DECIMAL(19,4))
                    AS DECIMAL(30,4))
               - CAST(CAST(s1_q AS DECIMAL(19,2)) * s1_q AS DECIMAL(30,4))
               AS DOUBLE) / (n_q * (n_q - 1)), 0.0)) END AS std_q,
        CAST(s1_p AS DOUBLE) / n_p AS mean_p,
        CASE WHEN n_p > 1 THEN sqrt(greatest(
          CAST(CAST(CAST(n_p AS DECIMAL(12,0)) * CAST(s2_p AS DECIMAL(19,4))
                    AS DECIMAL(30,4))
               - CAST(CAST(s1_p AS DECIMAL(19,2)) * s1_p AS DECIMAL(30,4))
               AS DOUBLE) / (n_p * (n_p - 1)), 0.0)) END AS std_p
      FROM stats
    )
    SELECT
      l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      ROUND(CASE WHEN std_q > 0
        THEN (CAST(l_quantity AS DOUBLE) - mean_q) / std_q END, 6)
        AS l_quantity_z,
      ROUND(CASE WHEN CAST(mx_q - mn_q AS DOUBLE) > 0
        THEN (CAST(l_quantity AS DOUBLE) - CAST(mn_q AS DOUBLE))
             / CAST(mx_q - mn_q AS DOUBLE) END, 6) AS l_quantity_mm,
      ROUND(CASE WHEN std_p > 0
        THEN (CAST(l_extendedprice AS DOUBLE) - mean_p) / std_p END, 6)
        AS l_extendedprice_z,
      ROUND(CASE WHEN CAST(mx_p - mn_p AS DOUBLE) > 0
        THEN (CAST(l_extendedprice AS DOUBLE) - CAST(mn_p AS DOUBLE))
             / CAST(mx_p - mn_p AS DOUBLE) END, 6) AS l_extendedprice_mm
    FROM lineitem CROSS JOIN derived
    ORDER BY l_orderkey, l_linenumber
    """
)


oracle("q_quantile_bucket")(
    """
    WITH cuts AS (
      SELECT
        ROUND(quantile_cont(o_totalprice, 0.25), 6) AS c0,
        ROUND(quantile_cont(o_totalprice, 0.50), 6) AS c1,
        ROUND(quantile_cont(o_totalprice, 0.75), 6) AS c2
      FROM orders
    ),
    bucketed AS (
      SELECT
        CASE WHEN o_totalprice IS NULL THEN NULL ELSE
          CAST((CASE WHEN CAST(o_totalprice AS DOUBLE) >= c0 THEN 1 ELSE 0 END)
             + (CASE WHEN CAST(o_totalprice AS DOUBLE) >= c1 THEN 1 ELSE 0 END)
             + (CASE WHEN CAST(o_totalprice AS DOUBLE) >= c2 THEN 1 ELSE 0 END)
             AS BIGINT) END AS qbucket,
        o_totalprice
      FROM orders CROSS JOIN cuts
    )
    SELECT qbucket, COUNT(*) AS n,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi
    FROM bucketed
    GROUP BY qbucket
    ORDER BY qbucket
    """
)


oracle("q_funnel")(
    """
    WITH s1 AS (
      SELECT user_id AS u, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id AS u, MIN(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.u
      WHERE e.event_type = 'click' AND e.ts >= s1.t
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id AS u, MIN(e.ts) AS t
      FROM events e JOIN s2 ON e.user_id = s2.u
      WHERE e.event_type = 'purchase' AND e.ts >= s2.t
      GROUP BY 1
    )
    SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
           (SELECT COUNT(*) FROM s1) AS n_users
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'click', (SELECT COUNT(*) FROM s2)
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'purchase', (SELECT COUNT(*) FROM s3)
    ORDER BY step_idx
    """
)

oracle("q_cohort")(
    """
    WITH base AS (
      SELECT user_id AS u, CAST(date_trunc('week', ts) AS DATE) AS p
      FROM events
    ),
    firsts AS (SELECT u, MIN(p) AS cohort FROM base GROUP BY 1),
    activity AS (
      SELECT DISTINCT base.u, cohort,
             CAST(date_diff('day', CAST(cohort AS DATE), CAST(p AS DATE)) / 7
                  AS BIGINT) AS "offset"
      FROM base JOIN firsts ON base.u = firsts.u
    )
    SELECT cohort, "offset", COUNT(DISTINCT u) AS n_active
    FROM activity
    GROUP BY 1, 2
    ORDER BY cohort, "offset"
    """
)


oracle("q_copair")(
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
    ),
    ok AS (
      SELECT b FROM items GROUP BY b HAVING COUNT(*) <= 100
    ),
    kept AS (SELECT items.b, i FROM items JOIN ok USING (b)),
    pairs AS (
      SELECT a.i AS item_a, c.i AS item_b, COUNT(*) AS n_baskets
      FROM kept a JOIN kept c ON a.b = c.b AND a.i < c.i
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    )
    SELECT item_a, item_b, n_baskets,
           CAST(row_number() OVER (
             ORDER BY n_baskets DESC, item_a ASC, item_b ASC
           ) AS BIGINT) AS rank
    FROM pairs
    QUALIFY rank <= 50
    ORDER BY rank
    """
)


oracle("q_interval_join")(
    """
    WITH orders_w AS (
      SELECT o_orderkey,
             CAST(o_orderdate AS TIMESTAMP) AS w_start,
             CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS w_end
      FROM orders
    ),
    campaigns(r_id, c_start, c_end) AS (
      VALUES
        (1, TIMESTAMP '1994-01-01', TIMESTAMP '1994-04-01'),
        (2, TIMESTAMP '1994-07-01', TIMESTAMP '1994-10-01'),
        (3, TIMESTAMP '1995-01-01', TIMESTAMP '1995-04-01')
    )
    SELECT r_id, COUNT(*) AS n_orders
    FROM orders_w JOIN campaigns
      ON w_start < c_end AND c_start < w_end
    GROUP BY r_id
    ORDER BY r_id
    """
)


oracle("q_cms")(
    """
    WITH hashed AS (
      SELECT o_custkey AS k,
             CAST('0x' || substr(md5('0:' || CAST(o_custkey AS VARCHAR)), 1, 8) AS BIGINT) % 64 AS b0,
             CAST('0x' || substr(md5('1:' || CAST(o_custkey AS VARCHAR)), 1, 8) AS BIGINT) % 64 AS b1,
             CAST('0x' || substr(md5('2:' || CAST(o_custkey AS VARCHAR)), 1, 8) AS BIGINT) % 64 AS b2,
             CAST('0x' || substr(md5('3:' || CAST(o_custkey AS VARCHAR)), 1, 8) AS BIGINT) % 64 AS b3
      FROM orders
    ),
    per_key AS (
      SELECT k, b0, b1, b2, b3, COUNT(*) AS exact FROM hashed GROUP BY 1,2,3,4,5
    ),
    s0 AS (SELECT b0 AS sb, COUNT(*) AS c0 FROM hashed GROUP BY 1),
    s1 AS (SELECT b1 AS sb, COUNT(*) AS c1 FROM hashed GROUP BY 1),
    s2 AS (SELECT b2 AS sb, COUNT(*) AS c2 FROM hashed GROUP BY 1),
    s3 AS (SELECT b3 AS sb, COUNT(*) AS c3 FROM hashed GROUP BY 1)
    SELECT k AS o_custkey, exact,
           LEAST(c0, c1, c2, c3) AS cms_est,
           LEAST(c0, c1, c2, c3) >= exact AS never_under
    FROM per_key JOIN s0 ON per_key.b0 = s0.sb JOIN s1 ON per_key.b1 = s1.sb JOIN s2 ON per_key.b2 = s2.sb JOIN s3 ON per_key.b3 = s3.sb
    ORDER BY o_custkey
    """
)


oracle("q_redact")(
    """
    WITH s1 AS (
      SELECT doc_id, text AS t0,
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
      FROM documents
    ),
    s2 AS (
      SELECT *, regexp_replace(t1, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS t2 FROM s1
    )
    SELECT doc_id,
           md5(regexp_replace(t2, '\\+?\\b(?:\\d{1,3}(?:[- ]\\d{3,4}){2,4}|\\d{10,15})\\b', '<PHONE>', 'g'))
             AS redacted_md5,
           CAST(len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t1, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(t2, '\\+?\\b(?:\\d{1,3}(?:[- ]\\d{3,4}){2,4}|\\d{10,15})\\b')) AS BIGINT) AS n_phone
    FROM s2
    ORDER BY doc_id
    """
)


# Substring-level duplication (operators/dedup.substring_dup_stats):
# positioned 5-gram md5s, cross-doc duplicated grams via a linear
# doc-frequency count, exact interval-union coverage with one lead
# window — mirrors the Spark plan shape join-for-join.
oracle("q_substring_dup")(
    f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents
    ),
    pos AS (
      SELECT doc_id, words,
             unnest(range(1, GREATEST(len(words) - 5, 0) + 2)) AS i
      FROM w
    ),
    pg AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(words[i:i+4], ' ')) AS gh,
             CAST(len(words) AS BIGINT) AS n_words
      FROM pos
    ),
    dupg AS (
      SELECT gh FROM (SELECT DISTINCT doc_id, gh FROM pg)
      GROUP BY gh HAVING COUNT(*) >= 2
    ),
    starts AS (SELECT doc_id, pos, n_words FROM pg JOIN dupg USING (gh)),
    cov AS (
      SELECT doc_id,
             SUM(LEAST(5, COALESCE(nxt, n_words) - pos, n_words - pos))
               AS covered,
             COUNT(*) AS n_spans
      FROM (
        SELECT doc_id, pos, n_words,
               lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM starts
      ) GROUP BY doc_id
    )
    SELECT t.doc_id AS doc,
           t.n_words,
           CAST(COALESCE(n_spans, 0) AS BIGINT) AS n_dup_spans,
           ROUND(CAST(COALESCE(covered, 0) AS DOUBLE) / t.n_words, 6)
             AS dup_span_frac
    FROM (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words FROM w) t
    LEFT JOIN cov USING (doc_id)
    ORDER BY doc
    """
)


# Streaming dedup-within-watermark (streaming/pipeline.dedup_stream,
# q_stream_dedup): the stream sees every event twice (redelivery);
# exact-copy rows collapse to one row per event_id, so doubling +
# DISTINCT mirrors the watermark dedup at a fixture-spanning horizon.
oracle("q_stream_dedup")(
    """
    SELECT event_type, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (
      SELECT DISTINCT event_id, event_type, value FROM (
        SELECT event_id, event_type, value FROM events
        UNION ALL
        SELECT event_id, event_type, value FROM events
      )
    )
    GROUP BY event_type
    ORDER BY event_type
    """
)


# PCM WAV decode (operators/wav.py via multimodal.decode_audio,
# q_audio_decode): closed-form recompute of the synthesized clips'
# amplitude statistics — sample k of doc d is
# s = ((d*37 + k*101) % 65536) - 32768 over n_frames*channels
# samples; doc_id % 3 = 2 clips are float32 with sample s/32768
# (dyadic → SUM is exact in double regardless of add order); doc_id
# % 7 = 3 clips (round 8) are IMA/DVI ADPCM at 9 samples/block, and
# the oracle re-runs the ENTIRE lossy quantize→reconstruct state
# machine as a recursive CTE: per (doc, channel), frame 0 and every
# 9th frame carry the raw sample verbatim (block headers; the step
# index carries across blocks), every other frame advances
# (pred, idx) through the canonical public IMA step/index tables —
# successive-approximation magnitude bits b4/b2/b1, reconstruction
# diff step>>3 + b4*step + b2*(step>>1) + b1*(step>>2), sign from
# s<pred, int16 clamp, index clamp [0,88]. Padded tail frames
# (encoder repeats the channel's last real sample) advance the
# state but are excluded by f < n_frames — exactly the decoder's
# fact-chunk truncation. The decoded bit_depth is 16 (linear
# domain), so stats are over reconstructed int16 values.
#
# doc_id % 11 = 5 clips (round 8, priority over the IMA selector)
# are MICROSOFT ADPCM (format 2) at 12 samples/block: a second
# recursive CTE runs the two-tap predictor state machine with the
# invariant (p1, p2) = (out(f), out(f-1)) — frames ≡ 0,1 (mod 12)
# are the block header's iSamp2/iSamp1 verbatim, iDelta resets to
# clamp16..32767 |iSamp1 - iSamp2| at each frame ≡ 1, coded frames
# quantize q = trunc((s - pred)/delta) clamped [-8, 7] (DuckDB //
# truncates toward zero, = the C encoder), reconstruct
# clamp(pred + q*delta), and adapt delta via the 16-entry table
# (>> 8 is arithmetic = floor, matching the codec's Python >>).
# The per-block coefficient pair follows the closed-form schedule
# (doc + block + channel) % 7, so all seven canonical predictors
# are graded.
oracle("q_audio_decode")(
    """
    WITH RECURSIVE dims AS (
      SELECT doc_id,
             1 + doc_id % 2 AS channels,
             40 + doc_id % 50 AS n_frames,
             doc_id % 11 = 5 AS is_ms,
             doc_id % 11 != 5 AND doc_id % 7 = 3 AS is_ima,
             doc_id % 3 = 2 AS is_float
      FROM documents
    ),
    samp AS (
      SELECT doc_id, channels, n_frames, is_float,
             CAST(((doc_id * 37 + unnest(range(0, CAST(n_frames * channels AS BIGINT))) * 101) % 65536) - 32768
               AS DOUBLE)
             / (CASE WHEN is_float THEN 32768 ELSE 1 END) AS s
      FROM dims WHERE NOT is_ima AND NOT is_ms
    ),
    plain AS (
      SELECT doc_id,
             CAST(channels AS INT) AS channels,
             CAST(8000 AS INT) AS sample_rate,
             CAST(n_frames AS BIGINT) AS n_frames,
             CAST(n_frames * 1000 // 8000 AS BIGINT) AS duration_ms,
             CAST(SUM(s) AS DOUBLE) AS samp_sum,
             CAST(MAX(ABS(s)) AS DOUBLE) AS peak_abs,
             ROUND(CAST(SUM(s) AS DOUBLE) / (n_frames * channels), 6)
               AS mean_sample
      FROM samp
      GROUP BY doc_id, channels, n_frames, is_float
    ),
    ima_ch AS (
      SELECT doc_id,
             CAST(channels AS BIGINT) AS channels,
             CAST(n_frames AS BIGINT) AS n_frames,
             CAST(((n_frames + 8) // 9) * 9 AS BIGINT) AS padded,
             unnest(range(0, CAST(channels AS BIGINT))) AS ch
      FROM dims WHERE is_ima
    ),
    walk(doc_id, channels, n_frames, padded, ch, f, pred, idx) AS (
      SELECT doc_id, channels, n_frames, padded, ch, CAST(0 AS BIGINT),
             ((doc_id * 37 + ch * 101) % 65536) - 32768,
             CAST(0 AS BIGINT)
      FROM ima_ch
      UNION ALL
      SELECT w.doc_id, w.channels, w.n_frames, w.padded, w.ch, w.f + 1,
             CASE WHEN (w.f + 1) % 9 = 0 THEN q.s
                  ELSE GREATEST(-32768, LEAST(32767,
                         w.pred + CASE WHEN q.s < w.pred
                                       THEN -q.diff ELSE q.diff END))
             END,
             CASE WHEN (w.f + 1) % 9 = 0 THEN w.idx
                  ELSE GREATEST(0, LEAST(88,
                         w.idx + [-1,-1,-1,-1,2,4,6,8][q.mag + 1]))
             END
      FROM walk w, LATERAL (
        SELECT t3.s,
               (t3.st >> 3)
                 + CASE WHEN t3.b4 THEN t3.st ELSE 0 END
                 + CASE WHEN t3.b2 THEN t3.st >> 1 ELSE 0 END
                 + CASE WHEN t3.b1 THEN t3.st >> 2 ELSE 0 END AS diff,
               4 * CAST(t3.b4 AS INT) + 2 * CAST(t3.b2 AS INT)
                 + CAST(t3.b1 AS INT) AS mag
        FROM (
          SELECT t2.*,
                 (t2.ad - CASE WHEN t2.b4 THEN t2.st ELSE 0 END
                        - CASE WHEN t2.b2 THEN t2.st >> 1 ELSE 0 END)
                   >= (t2.st >> 2) AS b1
          FROM (
            SELECT t1.*,
                   (t1.ad - CASE WHEN t1.b4 THEN t1.st ELSE 0 END)
                     >= (t1.st >> 1) AS b2
            FROM (
              SELECT t0.*, t0.ad >= t0.st AS b4
              FROM (
                SELECT
                  ((w.doc_id * 37
                    + (LEAST(w.f + 1, w.n_frames - 1) * w.channels + w.ch)
                      * 101) % 65536) - 32768 AS s,
                  [7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,
                   34,37,41,45,50,55,60,66,73,80,88,97,107,118,130,
                   143,157,173,190,209,230,253,279,307,337,371,408,449,
                   494,544,598,658,724,796,876,963,1060,1166,1282,1411,
                   1552,1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,
                   4428,4871,5358,5894,6484,7132,7845,8630,9493,10442,
                   11487,12635,13899,15289,16818,18500,20350,22385,24623,
                   27086,29794,32767][w.idx + 1] AS st,
                  ABS((((w.doc_id * 37
                    + (LEAST(w.f + 1, w.n_frames - 1) * w.channels + w.ch)
                      * 101) % 65536) - 32768) - w.pred) AS ad
              ) t0
            ) t1
          ) t2
        ) t3
      ) q
      WHERE w.f + 1 < w.padded
    ),
    ima AS (
      SELECT doc_id,
             CAST(channels AS INT) AS channels,
             CAST(8000 AS INT) AS sample_rate,
             CAST(n_frames AS BIGINT) AS n_frames,
             CAST(n_frames * 1000 // 8000 AS BIGINT) AS duration_ms,
             CAST(SUM(pred) AS DOUBLE) AS samp_sum,
             CAST(MAX(ABS(pred)) AS DOUBLE) AS peak_abs,
             ROUND(CAST(SUM(pred) AS DOUBLE) / (n_frames * channels), 6)
               AS mean_sample
      FROM walk
      WHERE f < n_frames
      GROUP BY doc_id, channels, n_frames
    ),
    ms_ch AS (
      SELECT doc_id,
             CAST(channels AS BIGINT) AS channels,
             CAST(n_frames AS BIGINT) AS n_frames,
             CAST(((n_frames + 11) // 12) * 12 AS BIGINT) AS padded,
             unnest(range(0, CAST(channels AS BIGINT))) AS ch
      FROM dims WHERE is_ms
    ),
    mswalk(doc_id, channels, n_frames, padded, ch, f, p1, p2, delta) AS (
      SELECT doc_id, channels, n_frames, padded, ch, CAST(0 AS BIGINT),
             ((doc_id * 37 + ch * 101) % 65536) - 32768,
             CAST(0 AS BIGINT),
             CAST(16 AS BIGINT)
      FROM ms_ch
      UNION ALL
      SELECT w.doc_id, w.channels, w.n_frames, w.padded, w.ch, w.f + 1,
             q.out_v, w.p1, q.new_delta
      FROM mswalk w, LATERAL (
        SELECT
          CASE
            WHEN (w.f + 1) % 12 IN (0, 1) THEN t1.s
            ELSE GREATEST(-32768, LEAST(32767, t1.pred + t1.q * w.delta))
          END AS out_v,
          CASE
            WHEN (w.f + 1) % 12 = 0 THEN CAST(16 AS BIGINT)
            WHEN (w.f + 1) % 12 = 1
              THEN LEAST(32767, GREATEST(16, ABS(t1.s - w.p1)))
            ELSE GREATEST(16,
                   ([230,230,230,230,307,409,512,614,
                     768,614,512,409,307,230,230,230]
                    [CAST((t1.q % 16 + 16) % 16 AS INT) + 1]
                    * w.delta) >> 8)
          END AS new_delta
        FROM (
          SELECT t0.s, t0.pred,
                 GREATEST(-8, LEAST(7, (t0.s - t0.pred) // w.delta)) AS q
          FROM (
            SELECT
              ((w.doc_id * 37
                + (LEAST(w.f + 1, w.n_frames - 1) * w.channels + w.ch)
                  * 101) % 65536) - 32768 AS s,
              (w.p1 * [256,512,0,192,240,460,392]
                 [CAST((w.doc_id + (w.f + 1) // 12 + w.ch) % 7 AS INT) + 1]
               + w.p2 * [0,-256,0,64,0,-208,-232]
                 [CAST((w.doc_id + (w.f + 1) // 12 + w.ch) % 7 AS INT) + 1]
              ) >> 8 AS pred
          ) t0
        ) t1
      ) q
      WHERE w.f + 1 < w.padded
    ),
    ms AS (
      SELECT doc_id,
             CAST(channels AS INT) AS channels,
             CAST(8000 AS INT) AS sample_rate,
             CAST(n_frames AS BIGINT) AS n_frames,
             CAST(n_frames * 1000 // 8000 AS BIGINT) AS duration_ms,
             CAST(SUM(p1) AS DOUBLE) AS samp_sum,
             CAST(MAX(ABS(p1)) AS DOUBLE) AS peak_abs,
             ROUND(CAST(SUM(p1) AS DOUBLE) / (n_frames * channels), 6)
               AS mean_sample
      FROM mswalk
      WHERE f < n_frames
      GROUP BY doc_id, channels, n_frames
    )
    SELECT * FROM plain
    UNION ALL
    SELECT * FROM ima
    UNION ALL
    SELECT * FROM ms
    ORDER BY doc_id
    """
)


# IVF + PQ composed ANN (operators/similarity.ivfpq_topk,
# q_ivfpq_topk): the PQ train→encode→ADC chain restricted to the
# query's 2 probed clusters — prune and compression verified stacked.
oracle("q_ivfpq_topk")(_pq_topk_sql(nprobe=2))


# Duplicated-span removal (operators/dedup.strip_duplicate_spans,
# q_strip_spans): same positioned-gram and duplicated-gram CTEs as
# q_substring_dup, plus canonical-holder choice, k-per-start dropped
# positions, anti-join survivors, and ordered reassembly.
oracle("q_strip_spans")(
    f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents
    ),
    pos AS (
      SELECT doc_id, words,
             unnest(range(1, GREATEST(len(words) - 5, 0) + 2)) AS i
      FROM w
    ),
    pg AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(words[i:i+4], ' ')) AS gh,
             CAST(len(words) AS BIGINT) AS n_words
      FROM pos
    ),
    dupg AS (
      SELECT gh, MIN(doc_id) AS canonical_doc
      FROM (SELECT DISTINCT doc_id, gh FROM pg)
      GROUP BY gh HAVING COUNT(*) >= 2
    ),
    drops AS (
      SELECT doc_id, pos, n_words FROM pg JOIN dupg USING (gh)
      WHERE doc_id != canonical_doc
    ),
    dp AS (
      SELECT DISTINCT doc_id,
             unnest(range(pos, LEAST(pos + 5, n_words))) AS wp
      FROM drops
    ),
    wr AS (
      SELECT doc_id, generate_subscripts(words, 1) - 1 AS wp,
             unnest(words) AS word
      FROM w
    ),
    kept AS (
      SELECT wr.doc_id, wr.wp, wr.word
      FROM wr LEFT JOIN dp ON wr.doc_id = dp.doc_id AND wr.wp = dp.wp
      WHERE dp.doc_id IS NULL
    ),
    reb AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(word, ' ' ORDER BY wp) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id AS doc, t.n_words,
           CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
           md5(COALESCE(clean_text, '')) AS clean_md5
    FROM (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words FROM w) t
    LEFT JOIN reb USING (doc_id)
    ORDER BY doc
    """
)


# Real-stream twins of the batch sliding/session queries: stream and
# batch must agree exactly, so they share the batch oracles verbatim.
oracle("q_stream_sliding")(ORACLES["q_sliding_window"])
oracle("q_stream_session")(ORACLES["q_session_window"])


# Two-phase quota sampling shares the single-phase oracle: identical
# selection is the operator's contract (curation.quota_sample_two_phase).
oracle("q_quota_two_phase")(ORACLES["q_quota_sample"])

# Stream-stream join (streaming/pipeline.click_purchase_join,
# q_stream_join): the batch self-join answer the streaming join must
# reproduce exactly.
oracle("q_stream_join")(
    """
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts
    FROM events c
    JOIN events p
      ON c.event_type = 'click'
     AND p.event_type = 'purchase'
     AND p.user_id = c.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    ORDER BY click_id, purchase_id
    """
)


def _ivfpq_residual_sql(
    m: int = 4, ksub: int = 8, iterations: int = 2, dims: int = 64,
    k: int = 10, nprobe: int = 2, centroid_mod: int = 50,
) -> str:
    """Residual IVF+PQ oracle (similarity.ivfpq_residual_topk): the
    _pq_topk_sql training/encode/ADC chain with (a) residual vectors
    v − centroid(v) as the training input, (b) survivors restricted
    to the query's nprobe clusters, and (c) one ADC table per probed
    cluster keyed by the vector's own assignment — the SQL scores ALL
    survivors in one ranking, which equals the operator's
    union-of-branch-top-ks because every global winner wins its
    branch."""
    dsub = dims // m

    def dist(a: str, b: str) -> str:
        terms = [
            f"({a}[{i}]-{b}[{i}])*({a}[{i}]-{b}[{i}])"
            for i in range(1, dsub + 1)
        ]
        return "ROUND(" + " + ".join(terms) + ", 6)"

    ctes = [
        "vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings)",
        f"ivfc AS (SELECT vec_id AS cid, v AS cv FROM vecs "
        f"WHERE vec_id % {centroid_mod} = 0)",
        "qfull AS (SELECT v AS qv FROM vecs WHERE vec_id = 0)",
        """asg AS (
      SELECT vec_id, cid, cv, v FROM (
        SELECT vecs.vec_id, ivfc.cid, ivfc.cv, vecs.v,
               ROW_NUMBER() OVER (
                 PARTITION BY vecs.vec_id
                 ORDER BY ROUND(list_cosine_similarity(vecs.v, ivfc.cv), 6)
                            DESC,
                          ivfc.cid ASC
               ) AS rn
        FROM vecs CROSS JOIN ivfc
      ) WHERE rn = 1
    )""",
        f"""res AS (
      SELECT vec_id, cid,
             list_transform(range(1, {dims + 1}), i -> v[i] - cv[i]) AS v
      FROM asg
    )""",
        f"""qc AS (
      SELECT cid FROM ivfc, qfull
      ORDER BY ROUND(list_cosine_similarity(qv, cv), 6) DESC, cid ASC
      LIMIT {nprobe}
    )""",
        f"""qres AS (
      SELECT ivfc.cid,
             list_transform(range(1, {dims + 1}), i -> qv[i] - cv[i]) AS qrv
      FROM ivfc, qfull WHERE ivfc.cid IN (SELECT cid FROM qc)
    )""",
        "surv AS (SELECT vec_id, cid FROM res "
        "WHERE cid IN (SELECT cid FROM qc))",
    ]
    for j in range(m):
        lo, hi = j * dsub + 1, (j + 1) * dsub
        ctes.append(
            f"vs{j} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM res)"
        )
        ctes.append(
            f"""s{j}c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
               AS cluster_id, v AS cv
      FROM (SELECT vec_id, v FROM vs{j} ORDER BY vec_id LIMIT {ksub})
    )"""
        )
        prev = f"s{j}c0"
        for i in range(1, iterations + 1):
            ctes.append(
                f"""s{j}a{i} AS (
      SELECT vec_id, cluster_id, v FROM (
        SELECT vs{j}.vec_id, {prev}.cluster_id, vs{j}.v,
               row_number() OVER (
                 PARTITION BY vs{j}.vec_id
                 ORDER BY {dist(f"vs{j}.v", f"{prev}.cv")} ASC,
                          {prev}.cluster_id ASC
               ) AS rn
        FROM vs{j} CROSS JOIN {prev}
      ) WHERE rn = 1
    )"""
            )
            ctes.append(
                f"""s{j}m{i} AS (
      SELECT cluster_id, pos,
             CAST(SUM(CAST(val AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS mv
      FROM (
        SELECT cluster_id, unnest(v) AS val,
               generate_subscripts(v, 1) AS pos
        FROM s{j}a{i}
      )
      GROUP BY 1, 2
    )"""
            )
            ctes.append(
                f"s{j}n{i} AS (SELECT cluster_id, list(mv ORDER BY pos) AS cv "
                f"FROM s{j}m{i} GROUP BY 1)"
            )
            ctes.append(
                f"""s{j}c{i} AS (
      SELECT {prev}.cluster_id, COALESCE(s{j}n{i}.cv, {prev}.cv) AS cv
      FROM {prev} LEFT JOIN s{j}n{i} USING (cluster_id)
    )"""
            )
            prev = f"s{j}c{i}"
        ctes.append(
            f"""enc{j} AS (
      SELECT vec_id, cluster_id FROM (
        SELECT sv.vec_id, {prev}.cluster_id,
               row_number() OVER (
                 PARTITION BY sv.vec_id
                 ORDER BY {dist("sv.v", f"{prev}.cv")} ASC,
                          {prev}.cluster_id ASC
               ) AS rn
        FROM (SELECT vs{j}.vec_id, vs{j}.v FROM vs{j}
              JOIN surv ON vs{j}.vec_id = surv.vec_id) sv
        CROSS JOIN {prev}
      ) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"qrs{j} AS (SELECT cid, qrv[{lo}:{hi}] AS qv FROM qres)"
        )
        ctes.append(
            f"""dt{j} AS (
      SELECT qrs{j}.cid AS pcid, {prev}.cluster_id,
             {dist(f"{prev}.cv", f"qrs{j}.qv")} AS pd
      FROM {prev} CROSS JOIN qrs{j}
    )"""
        )
    joins = "surv s"
    for j in range(m):
        joins += (
            f" JOIN enc{j} e{j} ON e{j}.vec_id = s.vec_id"
            f" JOIN dt{j} d{j} ON d{j}.cluster_id = e{j}.cluster_id"
            f" AND d{j}.pcid = s.cid"
        )
    total = " + ".join(f"d{j}.pd" for j in range(m))
    final = f"""
    SELECT vec_id, pq_dist, rank FROM (
      SELECT s.vec_id,
             ROUND(sqrt({total}), 6) AS pq_dist,
             CAST(row_number() OVER (
               ORDER BY ROUND(sqrt({total}), 6) ASC, s.vec_id ASC
             ) AS BIGINT) AS rank
      FROM {joins}
    ) WHERE rank <= {k}
    ORDER BY rank
    """
    return "WITH " + ",\n    ".join(ctes) + final


oracle("q_ivfpq_residual")(_ivfpq_residual_sql())


_TPCH_REV = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) "
    "AS DOUBLE)"
)

oracle("q_tpch_q3")(
    f"""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           {_TPCH_REV} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """
)

oracle("q_tpch_q5")(
    f"""
    SELECT n_name, {_TPCH_REV} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """
)

oracle("q_tpch_q10")(
    f"""
    SELECT c_custkey, c_name, c_acctbal, n_name, {_TPCH_REV} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """
)


# Streaming incremental rollup (streaming/pipeline.
# rollup_maintenance_stream, q_stream_rollup): three epochs of merged
# partial state must equal the one-shot aggregate bitwise.
oracle("q_stream_rollup")(
    """
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(value) AS n_vals,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
           CASE WHEN COUNT(value) > 0 THEN
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(value), 6) END AS avg_val,
           CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_val,
           CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_val
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """
)


# PageRank over the near-dup graph (operators/graph.pagerank,
# q_pagerank): 5 unrolled damped power-iteration rounds over the
# shared MinHash pair SQL; per-edge contributions quantize to
# DECIMAL(28,12) before each per-target sum so the only
# order-sensitive reduction is exact — bitwise cross-engine.
oracle("q_pagerank")(
    f"""
    WITH sh AS ({_SHINGLES}),
    {_MINHASH_BODY},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
      UNION ALL
      SELECT doc_b, doc_a FROM mh_pairs
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nd AS (SELECT DISTINCT src AS doc FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nd),
    r0 AS (SELECT doc, CAST(1 AS DOUBLE) / nn.n AS rank FROM nd CROSS JOIN nn),
    r1 AS (
      SELECT nd.doc,
             (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
               + CAST(0.85 AS DOUBLE)
                 * CAST(COALESCE(s.s, CAST(0 AS DECIMAL(28,12))) AS DOUBLE)
               AS rank
      FROM nd CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS doc, SUM(CAST(r.rank / d.deg AS DECIMAL(28,12))) AS s
        FROM edges e
        JOIN r0 r ON e.src = r.doc
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
      ) s USING (doc)
    ),
    r2 AS (
      SELECT nd.doc,
             (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
               + CAST(0.85 AS DOUBLE)
                 * CAST(COALESCE(s.s, CAST(0 AS DECIMAL(28,12))) AS DOUBLE)
               AS rank
      FROM nd CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS doc, SUM(CAST(r.rank / d.deg AS DECIMAL(28,12))) AS s
        FROM edges e
        JOIN r1 r ON e.src = r.doc
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
      ) s USING (doc)
    ),
    r3 AS (
      SELECT nd.doc,
             (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
               + CAST(0.85 AS DOUBLE)
                 * CAST(COALESCE(s.s, CAST(0 AS DECIMAL(28,12))) AS DOUBLE)
               AS rank
      FROM nd CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS doc, SUM(CAST(r.rank / d.deg AS DECIMAL(28,12))) AS s
        FROM edges e
        JOIN r2 r ON e.src = r.doc
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
      ) s USING (doc)
    ),
    r4 AS (
      SELECT nd.doc,
             (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
               + CAST(0.85 AS DOUBLE)
                 * CAST(COALESCE(s.s, CAST(0 AS DECIMAL(28,12))) AS DOUBLE)
               AS rank
      FROM nd CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS doc, SUM(CAST(r.rank / d.deg AS DECIMAL(28,12))) AS s
        FROM edges e
        JOIN r3 r ON e.src = r.doc
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
      ) s USING (doc)
    ),
    r5 AS (
      SELECT nd.doc,
             (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
               + CAST(0.85 AS DOUBLE)
                 * CAST(COALESCE(s.s, CAST(0 AS DECIMAL(28,12))) AS DOUBLE)
               AS rank
      FROM nd CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS doc, SUM(CAST(r.rank / d.deg AS DECIMAL(28,12))) AS s
        FROM edges e
        JOIN r4 r ON e.src = r.doc
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst
      ) s USING (doc)
    )
    SELECT doc, rank FROM r5 ORDER BY doc
    """
)


# Deterministic negative sampling (operators/curation.
# negative_samples, q_neg_samples): hash-modulo draws over the dense
# id space, anchor-collision shifted by one.
oracle("q_neg_samples")(
    """
    WITH n AS (SELECT COUNT(*) AS n FROM documents),
    s AS (
      SELECT doc_id, unnest(range(0, 4)) AS j FROM documents
    ),
    r AS (
      SELECT doc_id, j,
             CAST('0x' || substr(
               md5('neg:' || CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)),
               1, 12) AS BIGINT) % n.n AS raw,
             n.n AS n
      FROM s, n
    )
    SELECT doc_id, CAST(j AS BIGINT) AS j,
           CASE WHEN raw = doc_id THEN (raw + 1) % n ELSE raw END AS neg_id
    FROM r
    ORDER BY doc_id, j
    """
)


# MAD outlier stats (operators/stats.mad_outliers, q_mad): exact
# interpolated medians, deviation median via the same grouped
# recompute, unrounded values in the outlier comparison.
oracle("q_mad")(
    """
    WITH src AS (
      SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS price
      FROM lineitem
    ),
    med AS (
      SELECT l_returnflag, quantile_cont(price, 0.5) AS med
      FROM src GROUP BY l_returnflag
    ),
    dev AS (
      SELECT s.l_returnflag, ABS(s.price - m.med) AS adev, m.med
      FROM src s JOIN med m USING (l_returnflag)
    ),
    mad AS (
      SELECT l_returnflag, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY l_returnflag
    )
    SELECT d.l_returnflag,
           COUNT(*) AS n,
           ROUND(ANY_VALUE(d.med), 6) AS med,
           ROUND(ANY_VALUE(m.mad), 6) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3.0 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (l_returnflag)
    GROUP BY d.l_returnflag
    ORDER BY d.l_returnflag
    """
)

oracle("q_sessionize")(
    """
    WITH o AS (
      SELECT user_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
               OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
             THEN 1 ELSE 0 END AS new_sess,
        event_id
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
        SUM(new_sess) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        )::BIGINT AS session_n
      FROM o
    )
    SELECT user_id, session_n,
      COUNT(*)::BIGINT AS n_events,
      MIN(ts) AS session_start,
      MAX(ts) AS session_end,
      (floor(epoch(MAX(ts)))::BIGINT - floor(epoch(MIN(ts)))::BIGINT) AS dur_secs
    FROM s
    GROUP BY user_id, session_n
    ORDER BY user_id, session_n
    """
)

oracle("q_time_travel")(
    """
    -- snapshot 2024-01-15: batch-1 rows only; %7 keys already carry
    -- their 2024-02-01 close stamp in the final table
    SELECT c_custkey, c_mktsegment,
           DATE '2024-01-01' AS valid_from,
           CASE WHEN c_custkey % 7 = 0 THEN DATE '2024-02-01'
                ELSE DATE '9999-12-31' END AS valid_to,
           '2024-01-15' AS snap
    FROM customer WHERE c_custkey % 11 <> 0
    UNION ALL
    -- snapshot 2024-02-15: every key is open; changed (%7) and new
    -- (%11) keys opened at the 2024-02-01 merge
    SELECT c_custkey,
           CASE WHEN c_custkey % 7 = 0 THEN 'CHANGED'
                ELSE c_mktsegment END AS c_mktsegment,
           CASE WHEN c_custkey % 11 = 0 OR c_custkey % 7 = 0
                THEN DATE '2024-02-01' ELSE DATE '2024-01-01'
           END AS valid_from,
           DATE '9999-12-31' AS valid_to,
           '2024-02-15' AS snap
    FROM customer
    ORDER BY snap, c_custkey
    """
)

oracle("q_heavy_hitters")(
    r"""
    WITH w AS (
      SELECT unnest(string_split_regex(lower(replace(text, 'İ', 'i')), '\s+')) AS word
      FROM documents
    ),
    f AS (SELECT word FROM w WHERE word <> ''),
    t AS (SELECT COUNT(*) AS n FROM f)
    SELECT word, COUNT(*)::BIGINT AS cnt
    FROM f, t
    GROUP BY word, t.n
    HAVING COUNT(*) * 100 >= 1 * t.n
    ORDER BY word
    """
)

oracle("q_checksum")(
    """
    SELECT COUNT(*)::BIGINT AS n_rows,
      SUM((('0x' || substr(md5(concat_ws(chr(31),
            coalesce(c_custkey::VARCHAR, '<null>'),
            coalesce(c_name, '<null>'),
            coalesce(c_nationkey::VARCHAR, '<null>'),
            coalesce(c_mktsegment, '<null>'))), 1, 12))::UBIGINT
          )::DECIMAL(38,0)) AS checksum
    FROM customer
    """
)

oracle("q_tpch_q6")(
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """
)

oracle("q_tpch_q13")(
    """
    SELECT c_count, COUNT(*)::BIGINT AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey)::BIGINT AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """
)

oracle("q_tpch_q14")(
    """
    SELECT ROUND(
      100.0
      * CAST(SUM(CASE WHEN p_type = 'PROMO'
                      THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                      ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE)
      / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
      6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """
)

oracle("q_tpch_q15")(
    f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, {_TPCH_REV} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """
)

oracle("q_tpch_q18")(
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """
)

oracle("q_tpch_q1")(
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                         AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                         AS DECIMAL(18,4)) *
                    (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
             AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
             AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
             AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
             AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """
)

oracle("q_tpch_q4")(
    """
    SELECT o_orderpriority, COUNT(*)::BIGINT AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """
)

oracle("q_tpch_q12")(
    """
    SELECT l_returnflag,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END)::BIGINT AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1999-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """
)

oracle("q_tpch_q19")(
    f"""
    SELECT {_TPCH_REV} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 20 AND 30)
    """
)

# The oracle deliberately keeps the CANONICAL multi-correlated
# EXISTS / NOT-EXISTS formulation so the Spark plan's per-order
# aggregate decorrelation is cross-checked against an independent
# evaluation strategy, not replayed.
oracle("q_tpch_q21")(
    """
    SELECT s_name, COUNT(*)::BIGINT AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND r_name = 'EUROPE'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """
)

oracle("q_winsorize")(
    """
    WITH b AS (
      SELECT l_returnflag,
             ROUND(quantile_cont(l_extendedprice, 0.05), 6) AS price_lo,
             ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS price_hi
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_orderkey, l_linenumber, l.l_returnflag,
           l_extendedprice AS price, price_lo, price_hi,
           LEAST(GREATEST(l_extendedprice, price_lo), price_hi) AS price_wins
    FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
    ORDER BY l_orderkey, l_linenumber
    """
)

oracle("q_bloom_join")(
    """
    WITH dim AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9900),
    hs AS (SELECT unnest(range(4)) AS h),
    pos AS (
      SELECT (('0x' || substr(md5(h::VARCHAR || ':' || c_custkey::VARCHAR),
               1, 8))::UBIGINT % 8192)::BIGINT AS p
      FROM dim, hs
    ),
    wm AS (
      SELECT (p // 32) AS w,
             bit_or(1::BIGINT << (p % 32)::INT) AS mask
      FROM pos GROUP BY 1
    ),
    op AS (
      SELECT o_orderkey, o_orderstatus,
             (('0x' || substr(md5(h::VARCHAR || ':' || o_custkey::VARCHAR),
               1, 8))::UBIGINT % 8192)::BIGINT AS p
      FROM orders, hs
    ),
    probe AS (
      SELECT o_orderkey, o_orderstatus,
             bool_and((COALESCE(wm.mask, 0)
                       & (1::BIGINT << (op.p % 32)::INT)) <> 0) AS hit
      FROM op LEFT JOIN wm ON wm.w = (op.p // 32)
      GROUP BY o_orderkey, o_orderstatus
    ),
    a AS (
      SELECT o_orderstatus, SUM(hit::INT)::BIGINT AS n_bloom,
             COUNT(*)::BIGINT AS n_orders
      FROM probe GROUP BY 1
    ),
    b AS (
      SELECT o_orderstatus, COUNT(*)::BIGINT AS n_exact
      FROM orders WHERE o_custkey IN (SELECT c_custkey FROM dim)
      GROUP BY 1
    )
    SELECT a.o_orderstatus, a.n_bloom, a.n_orders,
           COALESCE(b.n_exact, 0) AS n_exact
    FROM a LEFT JOIN b USING (o_orderstatus)
    ORDER BY a.o_orderstatus
    """
)

oracle("q_stratified_split")(
    """
    SELECT doc_id, lang,
      CASE WHEN rn * 10 <= n_stratum * 8 THEN 'train'
           WHEN rn * 10 <= n_stratum * 9 THEN 'val'
           ELSE 'test' END AS split
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n_stratum
      FROM documents
    )
    ORDER BY doc_id
    """
)

oracle("q_ab_test")(
    """
    WITH v AS (
      SELECT event_type,
             CASE WHEN user_id % 2 = 0 THEN 'ctrl' ELSE 'treat' END AS variant,
             CAST(value AS DECIMAL(18,6)) AS x,
             CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
                  AS DECIMAL(30,6)) AS x2
      FROM events
    ),
    agg AS (
      SELECT event_type,
        COUNT(CASE WHEN variant = 'ctrl' THEN x END)::BIGINT AS n_a,
        SUM(CASE WHEN variant = 'ctrl' THEN x END) AS s1_a,
        SUM(CASE WHEN variant = 'ctrl' THEN x2 END) AS s2_a,
        COUNT(CASE WHEN variant = 'treat' THEN x END)::BIGINT AS n_b,
        SUM(CASE WHEN variant = 'treat' THEN x END) AS s1_b,
        SUM(CASE WHEN variant = 'treat' THEN x2 END) AS s2_b
      FROM v GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n_a, n_b,
        CAST(s1_a AS DOUBLE) / n_a AS mean_a,
        CAST(s1_b AS DOUBLE) / n_b AS mean_b,
        CASE WHEN n_a > 1 THEN
          CAST(CAST(CAST(n_a AS DECIMAL(12,0)) * s2_a AS DECIMAL(30,6))
               - CAST(s1_a * s1_a AS DECIMAL(30,6)) AS DOUBLE)
          / (n_a * (n_a - 1)) END AS var_a,
        CASE WHEN n_b > 1 THEN
          CAST(CAST(CAST(n_b AS DECIMAL(12,0)) * s2_b AS DECIMAL(30,6))
               - CAST(s1_b * s1_b AS DECIMAL(30,6)) AS DOUBLE)
          / (n_b * (n_b - 1)) END AS var_b
      FROM agg
    )
    SELECT event_type, n_a, n_b,
           ROUND(mean_a, 6) AS mean_a,
           ROUND(mean_b, 6) AS mean_b,
           ROUND((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 6)
             AS t_stat
    FROM m
    ORDER BY event_type
    """
)

oracle("q_skew_report")(
    """
    WITH c AS (
      SELECT o_custkey, COUNT(*)::BIGINT AS cnt FROM orders GROUP BY 1
    )
    SELECT COUNT(*)::BIGINT AS n_keys,
           SUM(cnt)::BIGINT AS n_rows,
           MAX(cnt) AS max_cnt,
           ROUND(quantile_cont(cnt, 0.5), 6) AS p50_cnt,
           ROUND(quantile_cont(cnt, 0.99), 6) AS p99_cnt,
           ROUND(CAST(MAX(cnt) AS DOUBLE)
                 / (CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)),
                 6) AS skew_ratio
    FROM c
    """
)

oracle("q_resample_interp")(
    """
    WITH b AS (
      SELECT user_id, date_trunc('day', ts) AS bucket, ts, event_id, value
      FROM events
    ),
    obs AS (
      SELECT user_id, bucket, value FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id, bucket ORDER BY ts DESC, event_id DESC
        ) AS rn FROM b
      ) WHERE rn = 1
    ),
    span AS (
      SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi FROM b GROUP BY 1
    ),
    grid AS (
      SELECT user_id,
        unnest(generate_series(lo, hi, INTERVAL '1 day')) AS bucket
      FROM span
    ),
    j AS (
      SELECT g.user_id, g.bucket, o.value,
             floor(epoch(g.bucket))::DOUBLE AS sec
      FROM grid g LEFT JOIN obs o USING (user_id, bucket)
    ),
    w AS (
      SELECT user_id, bucket, value, sec,
        last_value(CASE WHEN value IS NOT NULL THEN sec END IGNORE NULLS)
          OVER back AS ps,
        last_value(CASE WHEN value IS NOT NULL THEN value END IGNORE NULLS)
          OVER back AS pv,
        first_value(CASE WHEN value IS NOT NULL THEN sec END IGNORE NULLS)
          OVER fwd AS ns,
        first_value(CASE WHEN value IS NOT NULL THEN value END IGNORE NULLS)
          OVER fwd AS nv
      FROM j
      WINDOW back AS (
        PARTITION BY user_id ORDER BY bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ),
      fwd AS (
        PARTITION BY user_id ORDER BY bucket
        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
      )
    )
    SELECT user_id, bucket,
      CASE WHEN value IS NOT NULL THEN value
           ELSE ROUND(pv + (nv - pv) * ((sec - ps) / (ns - ps)), 6)
      END AS value_interp,
      (value IS NULL) AS is_gap
    FROM w
    ORDER BY user_id, bucket
    """
)

oracle("q_triangles")(
    f"""
    WITH sh AS ({_SHINGLES}),
    {_MINHASH_BODY},
    canon AS (
      SELECT DISTINCT LEAST(doc_a, doc_b) AS a, GREATEST(doc_a, doc_b) AS b
      FROM mh_pairs WHERE doc_a <> doc_b
    ),
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM canon e1
      JOIN canon e2 ON e1.a = e2.a AND e1.b < e2.b
      JOIN canon e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    nodes AS (
      SELECT a AS node FROM canon UNION SELECT b FROM canon
    ),
    pn AS (
      SELECT node, COUNT(*)::BIGINT AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT node, COALESCE(pn.n_triangles, 0)::BIGINT AS n_triangles
    FROM nodes LEFT JOIN pn USING (node)
    ORDER BY node
    """
)

oracle("q_golden_record")(
    """
    WITH src AS (
      SELECT o_custkey, o_orderkey,
        CASE WHEN o_orderkey % 3 <> 0 THEN o_orderstatus END AS status,
        CASE WHEN o_orderkey % 5 <> 0 THEN o_orderpriority END AS priority
      FROM orders
    )
    SELECT o_custkey,
      arg_max(status, CASE WHEN status IS NOT NULL THEN o_orderkey END)
        AS status,
      arg_max(priority, CASE WHEN priority IS NOT NULL THEN o_orderkey END)
        AS priority,
      MAX(o_orderkey) AS last_seen
    FROM src GROUP BY o_custkey
    ORDER BY o_custkey
    """
)

oracle("q_corpus_kl")(
    r"""
    WITH w AS (
      SELECT (substr(source, 4)::INT % 2 = 0) AS a,
             unnest(string_split_regex(lower(replace(text, 'İ', 'i')), '\s+')) AS word
      FROM documents
    ),
    f AS (SELECT a, word FROM w WHERE word <> ''),
    counts AS (
      SELECT word,
        COUNT(CASE WHEN a THEN 1 END)::BIGINT AS c_a,
        COUNT(CASE WHEN NOT a THEN 1 END)::BIGINT AS c_b
      FROM f GROUP BY word
    ),
    t AS (
      SELECT SUM(c_a)::BIGINT AS na, SUM(c_b)::BIGINT AS nb,
             COUNT(*)::BIGINT AS v
      FROM counts
    )
    SELECT word, c_a, c_b,
      ROUND(((c_a + 1)::DOUBLE / (na + v))
            * ln(((c_a + 1)::DOUBLE / (na + v))
                 / ((c_b + 1)::DOUBLE / (nb + v))), 6) AS kl_contrib
    FROM counts, t
    ORDER BY kl_contrib DESC, word
    LIMIT 15
    """
)

oracle("q_incr_dedup")(
    f"""
    WITH f AS (
      SELECT doc_id, n_chars, md5({_NORM}) AS fp
      FROM documents
    ),
    hist AS (SELECT DISTINCT fp FROM f WHERE doc_id % 2 = 0),
    batch AS (SELECT * FROM f WHERE doc_id % 2 = 1),
    firsts AS (
      SELECT doc_id, fp, n_chars FROM (
        SELECT *, row_number() OVER (
          PARTITION BY fp ORDER BY doc_id
        ) AS rn FROM batch
      ) WHERE rn = 1
    )
    SELECT doc_id, fp, n_chars
    FROM firsts WHERE fp NOT IN (SELECT fp FROM hist)
    ORDER BY doc_id
    """
)

oracle("q_hierarchy")(
    """
    WITH RECURSIVE e AS (
      SELECT c_custkey AS child, (c_custkey // 10)::BIGINT AS parent
      FROM customer WHERE c_custkey >= 10
    ),
    anc AS (
      SELECT child AS node, parent AS ancestor, 1::BIGINT AS depth FROM e
      UNION ALL
      SELECT a.node, e.parent, a.depth + 1
      FROM anc a JOIN e ON a.ancestor = e.child
    )
    SELECT node, ancestor, depth FROM anc
    ORDER BY node, depth
    """
)

oracle("q_stream_topk")(
    """
    SELECT user_id,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events
    GROUP BY user_id
    ORDER BY n_rows DESC, user_id
    LIMIT 10
    """
)

oracle("q_mode")(
    """
    SELECT o_orderstatus, mode_val, mode_cnt FROM (
      SELECT o_orderstatus, o_orderpriority AS mode_val,
             COUNT(*)::BIGINT AS mode_cnt,
             row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY COUNT(*) DESC, o_orderpriority
             ) AS rn
      FROM orders WHERE o_orderpriority IS NOT NULL
      GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
    ORDER BY o_orderstatus
    """
)

oracle("q_cdc_apply")(
    """
    -- net snapshot after replaying the synthesized change log over
    -- the even-key base: %12 keys re-inserted as 'R' (seq-2 wins),
    -- other %4 keys deleted, %6-not-%4 keys updated to 'X', odd
    -- keys inserted, the rest untouched
    SELECT o_orderkey, o_custkey,
           CASE
             WHEN o_orderkey % 12 = 0 THEN 'R'
             WHEN o_orderkey % 2 = 0 AND o_orderkey % 6 = 0
                  AND o_orderkey % 4 <> 0 THEN 'X'
             ELSE o_orderstatus
           END AS o_orderstatus
    FROM orders
    WHERE o_orderkey % 2 = 1
       OR o_orderkey % 12 = 0
       OR (o_orderkey % 2 = 0 AND o_orderkey % 4 <> 0)
    ORDER BY o_orderkey
    """
)

oracle("q_benford")(
    """
    WITH d AS (
      SELECT l_returnflag,
             regexp_extract(ABS(l_extendedprice)::DECIMAL(18,2)::VARCHAR,
                            '[1-9]') AS digit
      FROM lineitem WHERE ABS(l_extendedprice) > 0
    ),
    c AS (
      SELECT l_returnflag, digit, COUNT(*)::BIGINT AS n_obs
      FROM d WHERE digit <> '' GROUP BY 1, 2
    )
    SELECT l_returnflag, digit, n_obs,
      ROUND(n_obs / SUM(n_obs) OVER (PARTITION BY l_returnflag), 6)
        AS obs_frac,
      ROUND(log10(1 + 1.0 / digit::INT), 6) AS benford_frac
    FROM c
    ORDER BY l_returnflag, digit
    """
)

oracle("q_array_funcs")(
    """
    WITH g AS (
      SELECT l_orderkey,
             list_sort(list(DISTINCT l_partkey)) AS parts,
             list_sort(list(DISTINCT l_suppkey)) AS supps
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
      len(list_intersect(parts, supps))::BIGINT AS n_common,
      len(list_distinct(list_concat(parts, supps)))::BIGINT AS n_all,
      len(list_filter(parts, x -> NOT list_contains(supps, x)))::BIGINT
        AS n_only_parts,
      parts[1] AS min_part,
      len(list_filter(parts, x -> x % 2 = 0))::BIGINT AS n_even_parts,
      list_aggregate(parts, 'sum')::BIGINT AS sum_parts,
      len(list_filter(supps, x -> x < 100)) > 0 AS any_small_supp
    FROM g
    ORDER BY l_orderkey
    """
)


# ---------------------------------------------------------------- round 5

# Persisted-index ANN: the layout only moves assignment+encode to
# ingest time, so the result equals the from-scratch IVF+PQ chain at
# the query's nprobe — one generator, no second derivation to drift.
oracle("q_ivfpq_pretrained")(_pq_topk_sql(nprobe=3, k=10))


def _cosine_topk_sql(k: int) -> str:
    return f"""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    )
    SELECT vec_id
    FROM embeddings, q
    ORDER BY ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6)
               DESC,
             vec_id ASC
    LIMIT {k}
    """


oracle("q_ann_recall")(
    f"""
    WITH exact10 AS ({_cosine_topk_sql(10)}),
    exact5 AS ({_cosine_topk_sql(5)}),
    ivf AS (SELECT vec_id FROM ({_pq_topk_sql(nprobe=2, k=10)})),
    lsh AS (SELECT vec_id FROM ({_ann_bucket_sql(k=5)}))
    SELECT 'ivfpq' AS method, CAST(10 AS BIGINT) AS k,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM ivf JOIN exact10 USING (vec_id)) AS n_hits,
           ROUND((SELECT COUNT(*)
                  FROM ivf JOIN exact10 USING (vec_id)) / 10.0, 6) AS recall
    UNION ALL
    SELECT 'lsh_bucket', CAST(5 AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM lsh JOIN exact5 USING (vec_id)),
           ROUND((SELECT COUNT(*)
                  FROM lsh JOIN exact5 USING (vec_id)) / 5.0, 6)
    """
)


def _sig_sql(src_sh: str) -> str:
    return (
        f"SELECT doc_id, list_transform(range(0, 16), j -> "
        f"list_min(list_transform(sh, s -> md5(CAST(j AS VARCHAR) || ':' || s)))"
        f") AS sig FROM {src_sh}"
    )


def _band_sql(src_sig: str) -> str:
    return (
        f"SELECT doc_id, sig, "
        f"unnest(list_transform(range(0, 4), b -> "
        f"md5(array_to_string(sig[b*4+1:b*4+4], '|')))) AS band_hash, "
        f"unnest(range(0, 4)) AS band_idx FROM {src_sig}"
    )


_EST_J = "ROUND(len(list_filter(range(1, 17), i -> {a}.sig[i] = {b}.sig[i])) / 16.0, 6)"

oracle("q_incr_neardup")(
    f"""
    WITH hist AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
    bat AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
    shh AS ({_shingles_sql("hist")}),
    shb AS ({_shingles_sql("bat")}),
    sigh AS ({_sig_sql("shh")}),
    sigb AS ({_sig_sql("shb")}),
    bandh AS ({_band_sql("sigh")}),
    bandb AS ({_band_sql("sigb")}),
    hist_hits AS (
      SELECT DISTINCT n.doc_id FROM bandb n JOIN bandh h
        ON n.band_idx = h.band_idx AND n.band_hash = h.band_hash
      WHERE {_EST_J.format(a="n", b="h")} >= 0.5
    ),
    prs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bandb a JOIN bandb b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
      WHERE {_EST_J.format(a="a", b="b")} >= 0.5
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM prs
      UNION ALL
      SELECT doc_b, doc_a FROM prs
    ),
    l0 AS (SELECT DISTINCT src AS doc, src AS label FROM edges){_lp_rounds}
    SELECT b.doc_id AS doc,
           (b.doc_id IN (SELECT doc_id FROM hist_hits)) AS hist_dup,
           COALESCE(l4.label, b.doc_id) AS cluster,
           ((b.doc_id NOT IN (SELECT doc_id FROM hist_hits))
            AND COALESCE(l4.label, b.doc_id) = b.doc_id) AS kept
    FROM bat b LEFT JOIN l4 ON l4.doc = b.doc_id
    ORDER BY doc
    """
)


_SCRIPTS = (
    "Arabic", "Cyrillic", "Devanagari", "Greek", "Han", "Hangul",
    "Hiragana", "Katakana", "Latin",
)


def _script_n(sc: str) -> str:
    return (
        f"CAST(length(regexp_replace(text, '[^\\p{{{sc}}}]', '', 'g'))"
        f" AS BIGINT)"
    )


def _script_id_sql() -> str:
    best = "GREATEST(" + ", ".join(f"n_{s.lower()}" for s in _SCRIPTS) + ")"
    cases = " ".join(
        f"WHEN n_{s.lower()} = {best} AND {best} > 0 THEN '{s}'"
        for s in _SCRIPTS
    )
    return f"CASE {cases} ELSE 'unknown' END"


oracle("q_script_profile")(
    f"""
    SELECT doc_id, n_latin, n_han, n_cyrillic,
           {_script_id_sql()} AS script
    FROM (
      SELECT doc_id,
        {", ".join(f"{_script_n(s)} AS n_{s.lower()}" for s in _SCRIPTS)}
      FROM documents
    )
    ORDER BY doc_id
    """
)


# JL ±1 projection (q_random_proj): the weight matrix is baked in
# as literals from the same md5 derivation the Spark operator uses.


oracle("q_random_proj")(
    """
    SELECT vec_id,
      ROUND(((-1.0 * v[1]) + (-1.0 * v[2]) + (-1.0 * v[3]) + (-1.0 * v[4]) + (-1.0 * v[5]) + (-1.0 * v[6]) + (-1.0 * v[7]) + (+1.0 * v[8]) + (-1.0 * v[9]) + (-1.0 * v[10]) + (+1.0 * v[11]) + (-1.0 * v[12]) + (-1.0 * v[13]) + (+1.0 * v[14]) + (+1.0 * v[15]) + (+1.0 * v[16]) + (+1.0 * v[17]) + (+1.0 * v[18]) + (+1.0 * v[19]) + (+1.0 * v[20]) + (-1.0 * v[21]) + (-1.0 * v[22]) + (+1.0 * v[23]) + (-1.0 * v[24]) + (+1.0 * v[25]) + (-1.0 * v[26]) + (+1.0 * v[27]) + (+1.0 * v[28]) + (+1.0 * v[29]) + (+1.0 * v[30]) + (+1.0 * v[31]) + (+1.0 * v[32]) + (-1.0 * v[33]) + (-1.0 * v[34]) + (+1.0 * v[35]) + (+1.0 * v[36]) + (-1.0 * v[37]) + (+1.0 * v[38]) + (+1.0 * v[39]) + (+1.0 * v[40]) + (+1.0 * v[41]) + (+1.0 * v[42]) + (-1.0 * v[43]) + (-1.0 * v[44]) + (+1.0 * v[45]) + (-1.0 * v[46]) + (-1.0 * v[47]) + (+1.0 * v[48]) + (+1.0 * v[49]) + (-1.0 * v[50]) + (-1.0 * v[51]) + (-1.0 * v[52]) + (-1.0 * v[53]) + (+1.0 * v[54]) + (-1.0 * v[55]) + (+1.0 * v[56]) + (-1.0 * v[57]) + (+1.0 * v[58]) + (-1.0 * v[59]) + (+1.0 * v[60]) + (-1.0 * v[61]) + (+1.0 * v[62]) + (-1.0 * v[63]) + (+1.0 * v[64])) * 0.35355339059327373, 6) AS y0,
      ROUND(((-1.0 * v[1]) + (+1.0 * v[2]) + (+1.0 * v[3]) + (-1.0 * v[4]) + (-1.0 * v[5]) + (+1.0 * v[6]) + (+1.0 * v[7]) + (-1.0 * v[8]) + (+1.0 * v[9]) + (+1.0 * v[10]) + (+1.0 * v[11]) + (-1.0 * v[12]) + (+1.0 * v[13]) + (-1.0 * v[14]) + (-1.0 * v[15]) + (+1.0 * v[16]) + (+1.0 * v[17]) + (+1.0 * v[18]) + (+1.0 * v[19]) + (-1.0 * v[20]) + (+1.0 * v[21]) + (-1.0 * v[22]) + (+1.0 * v[23]) + (+1.0 * v[24]) + (-1.0 * v[25]) + (-1.0 * v[26]) + (-1.0 * v[27]) + (+1.0 * v[28]) + (-1.0 * v[29]) + (+1.0 * v[30]) + (-1.0 * v[31]) + (+1.0 * v[32]) + (+1.0 * v[33]) + (+1.0 * v[34]) + (+1.0 * v[35]) + (+1.0 * v[36]) + (+1.0 * v[37]) + (-1.0 * v[38]) + (+1.0 * v[39]) + (-1.0 * v[40]) + (-1.0 * v[41]) + (-1.0 * v[42]) + (+1.0 * v[43]) + (-1.0 * v[44]) + (+1.0 * v[45]) + (-1.0 * v[46]) + (+1.0 * v[47]) + (+1.0 * v[48]) + (-1.0 * v[49]) + (+1.0 * v[50]) + (+1.0 * v[51]) + (-1.0 * v[52]) + (+1.0 * v[53]) + (-1.0 * v[54]) + (+1.0 * v[55]) + (+1.0 * v[56]) + (+1.0 * v[57]) + (-1.0 * v[58]) + (-1.0 * v[59]) + (+1.0 * v[60]) + (+1.0 * v[61]) + (-1.0 * v[62]) + (+1.0 * v[63]) + (+1.0 * v[64])) * 0.35355339059327373, 6) AS y1,
      ROUND(((-1.0 * v[1]) + (+1.0 * v[2]) + (-1.0 * v[3]) + (+1.0 * v[4]) + (-1.0 * v[5]) + (-1.0 * v[6]) + (-1.0 * v[7]) + (-1.0 * v[8]) + (+1.0 * v[9]) + (-1.0 * v[10]) + (-1.0 * v[11]) + (-1.0 * v[12]) + (-1.0 * v[13]) + (+1.0 * v[14]) + (-1.0 * v[15]) + (-1.0 * v[16]) + (-1.0 * v[17]) + (-1.0 * v[18]) + (+1.0 * v[19]) + (-1.0 * v[20]) + (+1.0 * v[21]) + (-1.0 * v[22]) + (-1.0 * v[23]) + (-1.0 * v[24]) + (+1.0 * v[25]) + (+1.0 * v[26]) + (+1.0 * v[27]) + (-1.0 * v[28]) + (-1.0 * v[29]) + (+1.0 * v[30]) + (+1.0 * v[31]) + (+1.0 * v[32]) + (+1.0 * v[33]) + (+1.0 * v[34]) + (-1.0 * v[35]) + (-1.0 * v[36]) + (-1.0 * v[37]) + (-1.0 * v[38]) + (+1.0 * v[39]) + (+1.0 * v[40]) + (+1.0 * v[41]) + (-1.0 * v[42]) + (+1.0 * v[43]) + (-1.0 * v[44]) + (-1.0 * v[45]) + (+1.0 * v[46]) + (-1.0 * v[47]) + (-1.0 * v[48]) + (+1.0 * v[49]) + (+1.0 * v[50]) + (+1.0 * v[51]) + (+1.0 * v[52]) + (+1.0 * v[53]) + (-1.0 * v[54]) + (+1.0 * v[55]) + (-1.0 * v[56]) + (-1.0 * v[57]) + (+1.0 * v[58]) + (+1.0 * v[59]) + (+1.0 * v[60]) + (-1.0 * v[61]) + (-1.0 * v[62]) + (-1.0 * v[63]) + (+1.0 * v[64])) * 0.35355339059327373, 6) AS y2,
      ROUND(((+1.0 * v[1]) + (-1.0 * v[2]) + (+1.0 * v[3]) + (+1.0 * v[4]) + (-1.0 * v[5]) + (+1.0 * v[6]) + (+1.0 * v[7]) + (+1.0 * v[8]) + (+1.0 * v[9]) + (+1.0 * v[10]) + (+1.0 * v[11]) + (-1.0 * v[12]) + (-1.0 * v[13]) + (+1.0 * v[14]) + (-1.0 * v[15]) + (-1.0 * v[16]) + (+1.0 * v[17]) + (-1.0 * v[18]) + (-1.0 * v[19]) + (-1.0 * v[20]) + (+1.0 * v[21]) + (+1.0 * v[22]) + (-1.0 * v[23]) + (+1.0 * v[24]) + (+1.0 * v[25]) + (+1.0 * v[26]) + (-1.0 * v[27]) + (-1.0 * v[28]) + (-1.0 * v[29]) + (+1.0 * v[30]) + (-1.0 * v[31]) + (-1.0 * v[32]) + (-1.0 * v[33]) + (-1.0 * v[34]) + (+1.0 * v[35]) + (+1.0 * v[36]) + (+1.0 * v[37]) + (+1.0 * v[38]) + (+1.0 * v[39]) + (-1.0 * v[40]) + (+1.0 * v[41]) + (-1.0 * v[42]) + (+1.0 * v[43]) + (-1.0 * v[44]) + (+1.0 * v[45]) + (-1.0 * v[46]) + (+1.0 * v[47]) + (-1.0 * v[48]) + (+1.0 * v[49]) + (-1.0 * v[50]) + (-1.0 * v[51]) + (-1.0 * v[52]) + (+1.0 * v[53]) + (+1.0 * v[54]) + (+1.0 * v[55]) + (+1.0 * v[56]) + (+1.0 * v[57]) + (+1.0 * v[58]) + (+1.0 * v[59]) + (+1.0 * v[60]) + (-1.0 * v[61]) + (+1.0 * v[62]) + (-1.0 * v[63]) + (-1.0 * v[64])) * 0.35355339059327373, 6) AS y3,
      ROUND(((+1.0 * v[1]) + (-1.0 * v[2]) + (-1.0 * v[3]) + (+1.0 * v[4]) + (-1.0 * v[5]) + (+1.0 * v[6]) + (+1.0 * v[7]) + (+1.0 * v[8]) + (-1.0 * v[9]) + (+1.0 * v[10]) + (-1.0 * v[11]) + (+1.0 * v[12]) + (-1.0 * v[13]) + (+1.0 * v[14]) + (+1.0 * v[15]) + (+1.0 * v[16]) + (-1.0 * v[17]) + (-1.0 * v[18]) + (+1.0 * v[19]) + (-1.0 * v[20]) + (+1.0 * v[21]) + (+1.0 * v[22]) + (-1.0 * v[23]) + (+1.0 * v[24]) + (+1.0 * v[25]) + (+1.0 * v[26]) + (+1.0 * v[27]) + (+1.0 * v[28]) + (+1.0 * v[29]) + (+1.0 * v[30]) + (+1.0 * v[31]) + (+1.0 * v[32]) + (-1.0 * v[33]) + (+1.0 * v[34]) + (+1.0 * v[35]) + (+1.0 * v[36]) + (+1.0 * v[37]) + (+1.0 * v[38]) + (-1.0 * v[39]) + (+1.0 * v[40]) + (-1.0 * v[41]) + (-1.0 * v[42]) + (-1.0 * v[43]) + (+1.0 * v[44]) + (-1.0 * v[45]) + (+1.0 * v[46]) + (+1.0 * v[47]) + (+1.0 * v[48]) + (+1.0 * v[49]) + (-1.0 * v[50]) + (-1.0 * v[51]) + (+1.0 * v[52]) + (+1.0 * v[53]) + (-1.0 * v[54]) + (+1.0 * v[55]) + (+1.0 * v[56]) + (-1.0 * v[57]) + (+1.0 * v[58]) + (+1.0 * v[59]) + (+1.0 * v[60]) + (-1.0 * v[61]) + (-1.0 * v[62]) + (+1.0 * v[63]) + (-1.0 * v[64])) * 0.35355339059327373, 6) AS y4,
      ROUND(((-1.0 * v[1]) + (-1.0 * v[2]) + (+1.0 * v[3]) + (-1.0 * v[4]) + (+1.0 * v[5]) + (+1.0 * v[6]) + (-1.0 * v[7]) + (-1.0 * v[8]) + (+1.0 * v[9]) + (+1.0 * v[10]) + (+1.0 * v[11]) + (+1.0 * v[12]) + (+1.0 * v[13]) + (-1.0 * v[14]) + (+1.0 * v[15]) + (-1.0 * v[16]) + (+1.0 * v[17]) + (+1.0 * v[18]) + (+1.0 * v[19]) + (+1.0 * v[20]) + (-1.0 * v[21]) + (+1.0 * v[22]) + (+1.0 * v[23]) + (-1.0 * v[24]) + (+1.0 * v[25]) + (-1.0 * v[26]) + (+1.0 * v[27]) + (-1.0 * v[28]) + (-1.0 * v[29]) + (-1.0 * v[30]) + (-1.0 * v[31]) + (-1.0 * v[32]) + (+1.0 * v[33]) + (+1.0 * v[34]) + (+1.0 * v[35]) + (+1.0 * v[36]) + (-1.0 * v[37]) + (+1.0 * v[38]) + (+1.0 * v[39]) + (-1.0 * v[40]) + (-1.0 * v[41]) + (+1.0 * v[42]) + (+1.0 * v[43]) + (+1.0 * v[44]) + (-1.0 * v[45]) + (-1.0 * v[46]) + (+1.0 * v[47]) + (-1.0 * v[48]) + (-1.0 * v[49]) + (-1.0 * v[50]) + (-1.0 * v[51]) + (+1.0 * v[52]) + (+1.0 * v[53]) + (+1.0 * v[54]) + (+1.0 * v[55]) + (+1.0 * v[56]) + (+1.0 * v[57]) + (+1.0 * v[58]) + (+1.0 * v[59]) + (+1.0 * v[60]) + (+1.0 * v[61]) + (-1.0 * v[62]) + (-1.0 * v[63]) + (-1.0 * v[64])) * 0.35355339059327373, 6) AS y5,
      ROUND(((-1.0 * v[1]) + (+1.0 * v[2]) + (+1.0 * v[3]) + (-1.0 * v[4]) + (+1.0 * v[5]) + (+1.0 * v[6]) + (-1.0 * v[7]) + (-1.0 * v[8]) + (+1.0 * v[9]) + (-1.0 * v[10]) + (-1.0 * v[11]) + (+1.0 * v[12]) + (-1.0 * v[13]) + (+1.0 * v[14]) + (+1.0 * v[15]) + (+1.0 * v[16]) + (-1.0 * v[17]) + (+1.0 * v[18]) + (-1.0 * v[19]) + (-1.0 * v[20]) + (-1.0 * v[21]) + (-1.0 * v[22]) + (-1.0 * v[23]) + (-1.0 * v[24]) + (+1.0 * v[25]) + (-1.0 * v[26]) + (-1.0 * v[27]) + (+1.0 * v[28]) + (-1.0 * v[29]) + (-1.0 * v[30]) + (-1.0 * v[31]) + (+1.0 * v[32]) + (-1.0 * v[33]) + (+1.0 * v[34]) + (+1.0 * v[35]) + (-1.0 * v[36]) + (+1.0 * v[37]) + (-1.0 * v[38]) + (+1.0 * v[39]) + (-1.0 * v[40]) + (-1.0 * v[41]) + (-1.0 * v[42]) + (+1.0 * v[43]) + (-1.0 * v[44]) + (-1.0 * v[45]) + (+1.0 * v[46]) + (-1.0 * v[47]) + (-1.0 * v[48]) + (+1.0 * v[49]) + (+1.0 * v[50]) + (+1.0 * v[51]) + (+1.0 * v[52]) + (-1.0 * v[53]) + (+1.0 * v[54]) + (-1.0 * v[55]) + (+1.0 * v[56]) + (-1.0 * v[57]) + (-1.0 * v[58]) + (-1.0 * v[59]) + (-1.0 * v[60]) + (-1.0 * v[61]) + (+1.0 * v[62]) + (+1.0 * v[63]) + (+1.0 * v[64])) * 0.35355339059327373, 6) AS y6,
      ROUND(((-1.0 * v[1]) + (-1.0 * v[2]) + (-1.0 * v[3]) + (+1.0 * v[4]) + (+1.0 * v[5]) + (+1.0 * v[6]) + (-1.0 * v[7]) + (-1.0 * v[8]) + (-1.0 * v[9]) + (+1.0 * v[10]) + (+1.0 * v[11]) + (-1.0 * v[12]) + (-1.0 * v[13]) + (-1.0 * v[14]) + (-1.0 * v[15]) + (+1.0 * v[16]) + (-1.0 * v[17]) + (+1.0 * v[18]) + (+1.0 * v[19]) + (+1.0 * v[20]) + (-1.0 * v[21]) + (+1.0 * v[22]) + (-1.0 * v[23]) + (-1.0 * v[24]) + (-1.0 * v[25]) + (+1.0 * v[26]) + (-1.0 * v[27]) + (-1.0 * v[28]) + (+1.0 * v[29]) + (+1.0 * v[30]) + (+1.0 * v[31]) + (-1.0 * v[32]) + (-1.0 * v[33]) + (-1.0 * v[34]) + (+1.0 * v[35]) + (+1.0 * v[36]) + (-1.0 * v[37]) + (+1.0 * v[38]) + (+1.0 * v[39]) + (+1.0 * v[40]) + (-1.0 * v[41]) + (-1.0 * v[42]) + (-1.0 * v[43]) + (-1.0 * v[44]) + (+1.0 * v[45]) + (-1.0 * v[46]) + (-1.0 * v[47]) + (-1.0 * v[48]) + (-1.0 * v[49]) + (+1.0 * v[50]) + (-1.0 * v[51]) + (-1.0 * v[52]) + (+1.0 * v[53]) + (+1.0 * v[54]) + (-1.0 * v[55]) + (+1.0 * v[56]) + (-1.0 * v[57]) + (-1.0 * v[58]) + (-1.0 * v[59]) + (-1.0 * v[60]) + (+1.0 * v[61]) + (+1.0 * v[62]) + (-1.0 * v[63]) + (+1.0 * v[64])) * 0.35355339059327373, 6) AS y7
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    ORDER BY vec_id
    """
)


oracle("q_tpch_q7")(
    f"""
    SELECT supp_nation, cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {_TPCH_REV} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    , LATERAL (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation) x
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND ((supp_nation = 'NATION_12' AND cust_nation = 'NATION_10')
        OR (supp_nation = 'NATION_10' AND cust_nation = 'NATION_12'))
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """
)

_Q8_VOL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)

oracle("q_tpch_q8")(
    f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           ROUND(
             CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN {_Q8_VOL}
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM({_Q8_VOL}) AS DOUBLE), 6) AS mkt_share
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    ORDER BY 1
    """
)

oracle("q_tpch_q17")(
    """
    WITH pp AS (
      SELECT l_partkey AS pk,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
             COUNT(*) AS n_li
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) / 7.0, 6) AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN pp ON l_partkey = pk
    WHERE p_brand = 'Brand#1'
      AND CAST(l_quantity AS DECIMAL(18,2))
            * CAST(n_li AS DECIMAL(18,0)) * 5 < sum_qty
    """
)

oracle("q_tpch_q22")(
    """
    WITH pos AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_pos,
             COUNT(*) AS n_pos
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey % 5 AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,2))
            * CAST(n_pos AS DECIMAL(18,0)) > sum_pos
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    ORDER BY 1
    """
)


def _recall_curve_sql() -> str:
    """Recall@10 vs nprobe with the heavy PQ chain evaluated ONCE:
    training/encode/ADC distances and the full-corpus IVF assignment
    are shared MATERIALIZED CTEs; each nprobe branch is then just a
    rank-prefix filter over the probed clusters (qc.rk <= np) — the
    same survivors and ordering as _pq_topk_sql(nprobe=np), without
    re-running the chain per branch (three inline copies OOMed
    DuckDB under full-suite memory pressure)."""
    ctes, joins, total = _pq_chain()
    ctes = list(ctes)
    ctes.append("e AS MATERIALIZED (" + _cosine_topk_sql(10) + ")")
    ctes.append(
        "ivfc AS (SELECT vec_id AS cid, v AS cv FROM vecs "
        "WHERE vec_id % 50 = 0)"
    )
    ctes.append("qfull AS (SELECT v AS qv FROM vecs WHERE vec_id = 0)")
    ctes.append(
        """qc AS (
      SELECT cid, ROW_NUMBER() OVER (
        ORDER BY ROUND(list_cosine_similarity(qv, cv), 6) DESC, cid ASC
      ) AS rk
      FROM ivfc, qfull
    )"""
    )
    ctes.append(
        """iassign AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT vecs.vec_id, ivfc.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY vecs.vec_id
                 ORDER BY ROUND(list_cosine_similarity(vecs.v, ivfc.cv), 6)
                            DESC,
                          ivfc.cid ASC
               ) AS rn
        FROM vecs CROSS JOIN ivfc
      ) WHERE rn = 1
    )"""
    )
    ctes.append(
        f"""adc AS MATERIALIZED (
      SELECT e0.vec_id, ROUND(sqrt({total}), 6) AS pq_dist
      FROM {joins}
    )"""
    )
    rows = []
    for np in (1, 2, 3):
        ctes.append(
            f"""top{np} AS (
      SELECT vec_id FROM (
        SELECT a.vec_id,
               ROW_NUMBER() OVER (
                 ORDER BY a.pq_dist ASC, a.vec_id ASC
               ) AS rk
        FROM adc a
        JOIN iassign ia USING (vec_id)
        JOIN qc ON ia.cid = qc.cid AND qc.rk <= {np}
      ) WHERE rk <= 10
    )"""
        )
        rows.append(
            f"""
    SELECT CAST({np} AS BIGINT) AS nprobe,
           (SELECT CAST(COUNT(*) AS BIGINT)
              FROM top{np} JOIN e USING (vec_id)) AS n_hits,
           ROUND((SELECT COUNT(*)
              FROM top{np} JOIN e USING (vec_id)) / 10.0, 6) AS recall_at_10
    """
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + "\n    UNION ALL\n".join(rows)
        + "\n    ORDER BY nprobe\n"
    )


oracle("q_ivf_recall_curve")(_recall_curve_sql())


oracle("q_lm_transfer")(
    f"""
    WITH tokt AS (
      SELECT doc_id,
        unnest(regexp_extract_all(lower(replace(text, 'İ', 'i')), {_TOKEN_PAT})) AS term,
        generate_subscripts(regexp_extract_all(lower(replace(text, 'İ', 'i')), {_TOKEN_PAT}), 1)
          AS pos
      FROM documents WHERE doc_id % 2 = 0
    ),
    bigt AS (
      SELECT a.doc_id, a.term AS w1, b.term AS w2
      FROM tokt a JOIN tokt b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    cu AS (SELECT term AS w1, COUNT(*) AS c_uni FROM tokt GROUP BY 1),
    cb AS (SELECT w1, w2, COUNT(*) AS c_big FROM bigt GROUP BY 1, 2),
    v AS (SELECT COUNT(DISTINCT term) AS v FROM tokt),
    toks AS (
      SELECT doc_id,
        unnest(regexp_extract_all(lower(replace(text, 'İ', 'i')), {_TOKEN_PAT})) AS term,
        generate_subscripts(regexp_extract_all(lower(replace(text, 'İ', 'i')), {_TOKEN_PAT}), 1)
          AS pos
      FROM documents WHERE doc_id % 2 <> 0
    ),
    bigs AS (
      SELECT a.doc_id, a.term AS w1, b.term AS w2
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    )
    SELECT b.doc_id,
      COUNT(*) AS n_bigrams,
      ROUND(
        CAST(SUM(CAST(ln((COALESCE(cb.c_big, 0) + 1.0)
                         / (COALESCE(cu.c_uni, 0) + v.v))
                      AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6)
        AS lm_score
    FROM bigs b
    LEFT JOIN cb USING (w1, w2)
    LEFT JOIN cu USING (w1)
    CROSS JOIN v
    GROUP BY b.doc_id
    ORDER BY doc_id
    """
)


_NFC_NORM = (
    "trim(regexp_replace(regexp_replace(lower(replace(nfc_normalize(text), 'İ', 'i')),"
    " '[^\\p{L}\\p{M}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
)

oracle("q_nfc_dedup")(
    f"""
    SELECT doc_id,
           md5({_NFC_NORM}) AS nfc_fp,
           (nfc_normalize(text) = text) AS already_nfc
    FROM documents
    ORDER BY doc_id
    """
)


oracle("q_stream_enrich")(
    """
    SELECT event_id, user_id, event_type, "value", c_name, c_mktsegment
    FROM events
    JOIN customer
      ON (user_id % (SELECT COUNT(*) FROM customer)) + 1 = c_custkey
    ORDER BY event_id
    """
)


# Numeric rederivation of the perceptual average-hash: the synthesized
# luminance is closed-form, so the 8x8 box means, cell-mean threshold,
# and MSB-first bit pack are all integer SQL (mirrors
# multimodal.image_ahash + box_resize exactly, incl. round-half-up).
oracle("q_image_dedup")(
    """
    WITH d2 AS (
      SELECT doc_id,
             doc_id - doc_id % 3 AS b,
             8 + ((doc_id - doc_id % 3) // 3) % 5 AS w,
             8 + ((doc_id - doc_id % 3) // 3) % 3 AS h
      FROM documents
    ),
    cells AS (SELECT doc_id, b, w, h, unnest(range(0, 64)) AS c FROM d2),
    boxes AS (
      SELECT doc_id, b, w, h, c,
        (c % 8) * w // 8 AS x0,
        GREATEST((c % 8) * w // 8 + 1, ((c % 8) + 1) * w // 8) AS x1,
        (c // 8) * h // 8 AS y0,
        GREATEST((c // 8) * h // 8 + 1, ((c // 8) + 1) * h // 8) AS y1
      FROM cells
    ),
    cellvals AS (
      SELECT doc_id, c,
        (2 * SUM((b * 31 + (y * w + x)) % 256) + COUNT(*))
          // (2 * COUNT(*)) AS cv
      FROM boxes, LATERAL (SELECT unnest(range(y0, y1)) AS y),
                  LATERAL (SELECT unnest(range(x0, x1)) AS x)
      GROUP BY doc_id, c
    ),
    m AS (SELECT doc_id, SUM(cv) // 64 AS mean FROM cellvals GROUP BY 1),
    bits AS (
      SELECT cv.doc_id,
        SUM(CASE WHEN cv >= mean THEN CAST(1 AS HUGEINT) << (63 - c)
                 ELSE 0 END) AS hsh
      FROM cellvals cv JOIN m USING (doc_id) GROUP BY 1
    )
    SELECT doc_id,
      CAST(CASE WHEN hsh >= CAST(1 AS HUGEINT) << 63
                THEN hsh - (CAST(1 AS HUGEINT) << 64)
                ELSE hsh END AS BIGINT) AS ahash
    FROM bits
    ORDER BY doc_id
    """
)


# Numeric rederivation of the difference-hash (q_image_dhash, round
# 8): same closed-form luminance as q_image_dedup, pooled into a 9×8
# grid (one extra column), bit (x, y) = cell(x+1, y) > cell(x, y)
# strict, MSB-first row-major — integer SQL end to end, mirroring
# multimodal.image_dhash + box_resize exactly (round-half-up means).
oracle("q_image_dhash")(
    """
    WITH d2 AS (
      SELECT doc_id,
             doc_id - doc_id % 3 AS b,
             8 + ((doc_id - doc_id % 3) // 3) % 5 AS w,
             8 + ((doc_id - doc_id % 3) // 3) % 3 AS h
      FROM documents
    ),
    cells AS (SELECT doc_id, b, w, h, unnest(range(0, 72)) AS c FROM d2),
    boxes AS (
      SELECT doc_id, b, w, h, c,
        (c % 9) * w // 9 AS x0,
        GREATEST((c % 9) * w // 9 + 1, ((c % 9) + 1) * w // 9) AS x1,
        (c // 9) * h // 8 AS y0,
        GREATEST((c // 9) * h // 8 + 1, ((c // 9) + 1) * h // 8) AS y1
      FROM cells
    ),
    cellvals AS (
      SELECT doc_id, c % 9 AS cx, c // 9 AS cy,
        (2 * SUM((b * 31 + (y * w + x)) % 256) + COUNT(*))
          // (2 * COUNT(*)) AS cv
      FROM boxes, LATERAL (SELECT unnest(range(y0, y1)) AS y),
                  LATERAL (SELECT unnest(range(x0, x1)) AS x)
      GROUP BY doc_id, c, w, h
    ),
    bits AS (
      SELECT l.doc_id,
        SUM(CASE WHEN r.cv > l.cv
                 THEN CAST(1 AS HUGEINT) << (63 - (l.cy * 8 + l.cx))
                 ELSE 0 END) AS hsh
      FROM cellvals l
      JOIN cellvals r
        ON l.doc_id = r.doc_id AND r.cy = l.cy AND r.cx = l.cx + 1
      WHERE l.cx < 8
      GROUP BY l.doc_id
    )
    SELECT doc_id,
      CAST(CASE WHEN hsh >= CAST(1 AS HUGEINT) << 63
                THEN hsh - (CAST(1 AS HUGEINT) << 64)
                ELSE hsh END AS BIGINT) AS dhash
    FROM bits
    ORDER BY doc_id
    """
)


# Brute-force Hamming truth (q_hamming_pairs, round 8): rebuild the
# closed-form 64-bit fingerprints (LCG base per quadruple, disjoint
# per-member bit flips) in unsigned HUGEINT arithmetic, sign-convert
# to BIGINT, and emit ALL pairs with bit_count(xor) <= 4 — the exact
# ground truth the banded Spark mining must reproduce.
oracle("q_hamming_pairs")(
    """
    WITH h AS (
      SELECT doc_id,
             CAST(
               CASE WHEN hu >= CAST(1 AS HUGEINT) << 63
                    THEN hu - (CAST(1 AS HUGEINT) << 64)
                    ELSE hu END
               AS BIGINT) AS fp
      FROM (
        SELECT doc_id,
               xor(
                 (CAST(doc_id // 4 AS HUGEINT) * 2862933555777941757
                  + 3037000493) % (CAST(1 AS HUGEINT) << 64),
                 CASE doc_id % 4
                   WHEN 0 THEN CAST(0 AS HUGEINT)
                   WHEN 1 THEN CAST(1 AS HUGEINT)
                               << CAST((doc_id // 4) % 64 AS INT)
                   WHEN 2 THEN
                     (CAST(1 AS HUGEINT) << CAST((doc_id // 4 + 7) % 64 AS INT))
                     | (CAST(1 AS HUGEINT) << CAST((doc_id // 4 + 13) % 64 AS INT))
                     | (CAST(1 AS HUGEINT) << CAST((doc_id // 4 + 29) % 64 AS INT))
                   ELSE
                     (CAST(1 AS HUGEINT) << CAST((doc_id // 4 + 1) % 64 AS INT))
                     | (CAST(1 AS HUGEINT) << CAST((doc_id // 4 + 2) % 64 AS INT))
                     | (CAST(1 AS HUGEINT) << CAST((doc_id // 4 + 3) % 64 AS INT))
                     | (CAST(1 AS HUGEINT) << CAST((doc_id // 4 + 4) % 64 AS INT))
                     | (CAST(1 AS HUGEINT) << CAST((doc_id // 4 + 5) % 64 AS INT))
                     | (CAST(1 AS HUGEINT) << CAST((doc_id // 4 + 6) % 64 AS INT))
                     | (CAST(1 AS HUGEINT) << CAST((doc_id // 4 + 8) % 64 AS INT))
                     | (CAST(1 AS HUGEINT) << CAST((doc_id // 4 + 9) % 64 AS INT))
                     | (CAST(1 AS HUGEINT) << CAST((doc_id // 4 + 10) % 64 AS INT))
                 END
               ) AS hu
        FROM documents
      )
    )
    SELECT a.doc_id AS doc_a,
           b.doc_id AS doc_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS dist
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= 4
    ORDER BY doc_a, doc_b
    """
)


# Greedy sentence-packing replay (q_sentence_chunks, round 8): the
# chunk assignment is a recursive running-sum-with-reset over the
# closed-form sentence token counts w_j = 1 + (d + 3j) % 5 at
# budget 7 — new chunk iff acc + w > 7 (an over-budget sentence
# alone in a chunk falls out of the same recursion); chunk text
# rebuilds via repeat() + string_agg in sentence order.
oracle("q_sentence_chunks")(
    """
    WITH RECURSIVE d AS (
      SELECT doc_id, CAST(4 + doc_id % 5 AS BIGINT) AS n_sent
      FROM documents
    ),
    walk(doc_id, n_sent, j, chunk, acc) AS (
      SELECT doc_id, n_sent, CAST(0 AS BIGINT), CAST(0 AS INT),
             CAST(1 + doc_id % 5 AS BIGINT)
      FROM d
      UNION ALL
      SELECT w.doc_id, w.n_sent, w.j + 1,
             CASE WHEN w.acc + (1 + (w.doc_id + 3 * (w.j + 1)) % 5) <= 7
                  THEN w.chunk ELSE w.chunk + 1 END,
             CASE WHEN w.acc + (1 + (w.doc_id + 3 * (w.j + 1)) % 5) <= 7
                  THEN w.acc + (1 + (w.doc_id + 3 * (w.j + 1)) % 5)
                  ELSE (1 + (w.doc_id + 3 * (w.j + 1)) % 5) END
      FROM walk w
      WHERE w.j + 1 < w.n_sent
    ),
    sent AS (
      SELECT doc_id, j, chunk,
             1 + (doc_id + 3 * j) % 5 AS w,
             's' || CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR)
               AS word
      FROM walk
    ),
    sent_str AS (
      SELECT doc_id, j, chunk, w,
             CASE WHEN w > 1 THEN repeat(word || ' ', w - 1) ELSE '' END
               || word || '.' AS s
      FROM sent
    )
    SELECT doc_id AS doc,
           CAST(chunk AS INT) AS chunk_idx,
           CAST(COUNT(*) AS INT) AS n_sentences,
           CAST(SUM(w) AS BIGINT) AS n_tokens,
           md5(string_agg(s, ' ' ORDER BY j)) AS chunk_md5
    FROM sent_str
    GROUP BY doc_id, chunk
    ORDER BY doc, chunk_idx
    """
)


# Closed-form robots verdicts (q_robots, round 8): host m < 9
# disallows prefix /p{m%5} for the crawl agent; host 9 has no
# robots.txt → fetchable.
oracle("q_robots")(
    """
    SELECT doc_id AS url_id,
           'site' || CAST(doc_id % 10 AS VARCHAR) || '.example' AS host,
           (doc_id % 10 = 9 OR doc_id % 7 != (doc_id % 10) % 5)
             AS fetchable
    FROM documents
    ORDER BY url_id
    """
)


# Closed-form rebuild of the composed crawl front door
# (q_warc_extract, round 8): per (doc d, response r) the expected
# canonical URL, HTTP status, and extracted text all derive from the
# synthesis formulas — the oracle grades the WARC walk, HTTP split,
# URL canonicalization, and HTML contract composed, without parsing
# anything.
oracle("q_warc_extract")(
    """
    WITH d AS (
      SELECT doc_id, unnest(range(0, CAST(2 + doc_id % 3 AS BIGINT))) AS r
      FROM documents
    ),
    seg AS (
      SELECT doc_id, r, 3 + (doc_id + r) % 4 AS n_seg FROM d
    ),
    t AS (
      SELECT doc_id, r,
             unnest(range(3, CAST(n_seg AS BIGINT))) AS i
      FROM seg
    ),
    rest AS (
      SELECT doc_id, r,
             string_agg(
               'w' || CAST((doc_id * 7 + r * 29 + i * 13) % 1000 AS VARCHAR),
               ' ' ORDER BY i
             ) AS tail
      FROM t GROUP BY doc_id, r
    ),
    txt AS (
      SELECT s.doc_id, s.r, s.n_seg,
             'w' || CAST((s.doc_id * 7 + s.r * 29) % 1000 AS VARCHAR) || ' ' ||
             'w' || CAST((s.doc_id * 7 + s.r * 29 + 13) % 1000 AS VARCHAR)
               || ' ' ||
             'w' || CAST((s.doc_id * 7 + s.r * 29 + 26) % 1000 AS VARCHAR) ||
             ' & ' || chr(233) ||
             COALESCE(' ' || rest.tail, '') AS text
      FROM seg s LEFT JOIN rest ON s.doc_id = rest.doc_id AND s.r = rest.r
    )
    SELECT doc_id,
           CAST(r AS INT) AS resp_idx,
           CAST(200 AS INT) AS http_status,
           'http://site' || CAST((doc_id + r) % 40 AS VARCHAR)
             || '.example/p' || CAST(r AS VARCHAR) AS canon,
           CAST(2 + n_seg AS BIGINT) AS n_words,
           md5(text) AS text_md5
    FROM txt
    ORDER BY doc_id, resp_idx
    """
)


# Closed-form rebuild of URL canonicalization (q_url_normalize,
# round 8): the canonical string depends only on the quintuple base,
# so the oracle concatenates it directly; the per-variant JVM
# parse_url features (host keeps mode 4's trailing dot, depth counts
# mode 2's dot-segments) derive from the mode.
oracle("q_url_normalize")(
    """
    WITH d AS (
      SELECT doc_id,
             (doc_id - doc_id % 5) // 5 AS g,
             doc_id % 5 AS mode
      FROM documents
    ),
    c AS (
      SELECT doc_id, mode,
             'site' || CAST(g % 40 AS VARCHAR) || '.example' AS host,
             '/a' || CAST(g % 7 AS VARCHAR) || '/c' AS path,
             'k1=' || CAST(g % 9 AS VARCHAR)
               || '&k2=' || CAST(g % 11 AS VARCHAR) AS q
      FROM d
    )
    SELECT doc_id,
           'http://' || host || path || '?' || q AS canon,
           CASE WHEN mode = 4 THEN host || '.' ELSE host END AS url_host,
           CAST(CASE WHEN mode = 2 THEN 5 ELSE 2 END AS INT) AS url_depth
    FROM c
    ORDER BY doc_id
    """
)


# Closed-form rebuild of the HTML extraction's expected text
# (q_html_extract, round 8): the synthesis wraps formula-derived
# segments in markup, so the oracle reconstructs the token join
# directly — title, h1, p segment, '&', chr(233), then the div
# segments — and grades md5 + char/token counts without parsing.
oracle("q_html_extract")(
    """
    WITH d AS (
      SELECT doc_id, 3 + doc_id % 4 AS n_seg FROM documents
    ),
    t AS (
      SELECT doc_id, unnest(range(3, CAST(n_seg AS BIGINT))) AS i
      FROM d
    ),
    rest AS (
      SELECT doc_id,
             string_agg(
               'w' || CAST((doc_id * 7 + i * 13) % 1000 AS VARCHAR),
               ' ' ORDER BY i
             ) AS r
      FROM t GROUP BY doc_id
    ),
    txt AS (
      SELECT d.doc_id, d.n_seg,
             'w' || CAST((d.doc_id * 7) % 1000 AS VARCHAR) || ' ' ||
             'w' || CAST((d.doc_id * 7 + 13) % 1000 AS VARCHAR) || ' ' ||
             'w' || CAST((d.doc_id * 7 + 26) % 1000 AS VARCHAR) ||
             ' & ' || chr(233) ||
             COALESCE(' ' || rest.r, '') AS text
      FROM d LEFT JOIN rest USING (doc_id)
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(2 + n_seg AS BIGINT) AS n_words,
           md5(text) AS text_md5
    FROM txt
    ORDER BY doc_id
    """
)


# Numeric rederivation of per-FRAME perceptual hashes over the APNG
# demux (q_video_dedup, round 8): the q_image_dedup aHash SQL with a
# frame dimension — triples share base b = doc_id - doc_id%3, frame
# f's luminance is (b*31 + f*53 + pos) % 256 (RGB member has r=g=b →
# BT.601 luma collapses to the same value), so one derivation grades
# all three encodings of every frame.
oracle("q_video_dedup")(
    """
    WITH d2 AS (
      SELECT doc_id,
             doc_id - doc_id % 3 AS b,
             8 + ((doc_id - doc_id % 3) // 3) % 5 AS w,
             8 + ((doc_id - doc_id % 3) // 3) % 3 AS h,
             2 + ((doc_id - doc_id % 3) // 3) % 3 AS nf
      FROM documents
    ),
    fr AS (
      SELECT doc_id, b, w, h, nf,
             unnest(range(0, CAST(nf AS BIGINT))) AS f
      FROM d2
    ),
    cells AS (
      SELECT doc_id, b, w, h, nf, f, unnest(range(0, 64)) AS c FROM fr
    ),
    boxes AS (
      SELECT doc_id, b, w, h, nf, f, c,
        (c % 8) * w // 8 AS x0,
        GREATEST((c % 8) * w // 8 + 1, ((c % 8) + 1) * w // 8) AS x1,
        (c // 8) * h // 8 AS y0,
        GREATEST((c // 8) * h // 8 + 1, ((c // 8) + 1) * h // 8) AS y1
      FROM cells
    ),
    cellvals AS (
      SELECT doc_id, nf, f, c,
        (2 * SUM((b * 31 + f * 53 + (y * w + x)) % 256) + COUNT(*))
          // (2 * COUNT(*)) AS cv
      FROM boxes, LATERAL (SELECT unnest(range(y0, y1)) AS y),
                  LATERAL (SELECT unnest(range(x0, x1)) AS x)
      GROUP BY doc_id, nf, f, c
    ),
    m AS (
      SELECT doc_id, f, SUM(cv) // 64 AS mean
      FROM cellvals GROUP BY doc_id, f
    ),
    bits AS (
      SELECT cv.doc_id, cv.nf, cv.f,
        SUM(CASE WHEN cv >= mean THEN CAST(1 AS HUGEINT) << (63 - c)
                 ELSE 0 END) AS hsh
      FROM cellvals cv JOIN m USING (doc_id, f)
      GROUP BY cv.doc_id, cv.nf, cv.f
    )
    SELECT doc_id,
      CAST(f AS INT) AS frame_idx,
      CAST(nf AS INT) AS n_frames,
      CAST(CASE WHEN hsh >= CAST(1 AS HUGEINT) << 63
                THEN hsh - (CAST(1 AS HUGEINT) << 64)
                ELSE hsh END AS BIGINT) AS frame_ahash
    FROM bits
    ORDER BY doc_id, frame_idx
    """
)


# Per-frame rederivation of the APNG demux (q_video_frames, round
# 8): dims/frame-count/delay from the doc_id moduli, per-frame mean
# from the closed-form pixel formula.
oracle("q_video_frames")(
    """
    WITH dims AS (
      SELECT doc_id,
             4 + doc_id % 5 AS w,
             3 + doc_id % 4 AS h,
             2 + doc_id % 3 AS nf
      FROM documents
    ),
    fr AS (
      SELECT doc_id, w, h, nf,
             unnest(range(0, CAST(nf AS BIGINT))) AS f
      FROM dims
    ),
    px AS (
      SELECT doc_id, w, h, nf, f,
             unnest(range(0, CAST(w * h AS BIGINT))) AS k
      FROM fr
    )
    SELECT doc_id,
           CAST(f AS INT) AS frame_idx,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(nf AS INT) AS n_frames,
           CAST((1 + f) * 1000 // 10 AS BIGINT) AS delay_ms,
           ROUND(CAST(SUM((doc_id * 31 + f * 17 + k) % 256) AS DOUBLE)
                 / (w * h), 6) AS mean_pixel
    FROM px
    GROUP BY doc_id, w, h, nf, f
    ORDER BY doc_id, frame_idx
    """
)


oracle("q_seasonal")(
    """
    WITH b AS (
      SELECT user_id AS key, date_trunc('hour', ts) AS bucket,
             SUM(CAST(value AS DECIMAL(18,2))) AS v_dec
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT key, bucket, v_dec,
             (CAST(epoch(bucket) AS BIGINT) // 3600) % 24 AS phase,
             SUM(v_dec) OVER w AS s1,
             COUNT(*) OVER w AS n_win
      FROM b
      WINDOW w AS (PARTITION BY key ORDER BY bucket
                   ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
    ),
    t AS (
      SELECT *, CASE WHEN n_win = 5 THEN CAST(s1 AS DOUBLE) / 5 END AS trend
      FROM p
    ),
    fp AS (
      SELECT key, phase, SUM(v_dec) AS pv, SUM(s1) AS pma,
             COUNT(*) AS pn
      FROM t WHERE trend IS NOT NULL GROUP BY 1, 2
    ),
    fk AS (
      SELECT key, SUM(v_dec) AS gv, SUM(s1) AS gma, COUNT(*) AS gn
      FROM t WHERE trend IS NOT NULL GROUP BY 1
    ),
    s AS (
      SELECT t.key, t.bucket, t.phase, t.v_dec, t.trend,
        (CAST(pv AS DOUBLE) / pn - CAST(pma AS DOUBLE) / (pn * 5))
        - (CAST(gv AS DOUBLE) / gn - CAST(gma AS DOUBLE) / (gn * 5))
          AS seasonal
      FROM t LEFT JOIN fp USING (key, phase) LEFT JOIN fk USING (key)
    )
    SELECT key, bucket, phase,
           ROUND(CAST(v_dec AS DOUBLE), 6) AS v,
           ROUND(trend, 6) AS trend,
           ROUND(seasonal, 6) AS seasonal,
           ROUND(CAST(v_dec AS DOUBLE) - trend - seasonal, 6) AS resid
    FROM s
    ORDER BY key, bucket
    """
)


oracle("q_k_anonymity")(
    """
    SELECT c_custkey, c_mktsegment, c_nationkey,
           COUNT(*) OVER (PARTITION BY c_mktsegment, c_nationkey)
             AS anon_set_size,
           COUNT(*) OVER (PARTITION BY c_mktsegment, c_nationkey) < 5
             AS suppress
    FROM customer
    ORDER BY c_custkey
    """
)


oracle("q_join_view")(
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1
    ORDER BY 1
    """
)


_U52 = (
    "CAST(list_sum(list_transform(range(1, 14), k -> "
    "CAST(strpos('0123456789abcdef', "
    "substr(md5(CAST(doc_id AS VARCHAR)), k, 1)) - 1 AS HUGEINT) "
    "* (CAST(1 AS HUGEINT) << (4 * (13 - k))))) AS DOUBLE)"
)

oracle("q_weighted_draw")(
    f"""
    WITH pri AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars,
             ROUND(-ln(({_U52} + 1.0) / 4503599627370496.0)
                   / CAST(length(text) AS DOUBLE), 9) AS priority
      FROM documents
    )
    SELECT doc_id, n_chars, priority
    FROM pri
    ORDER BY priority, doc_id
    LIMIT 200
    """
)


oracle("q_containment")(
    f"""
    WITH sh AS ({_SHINGLES}),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    rare AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= 50),
    capped AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT c.doc_a, c.doc_b,
        ROUND(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
              / len(x.sh), 6) AS cont_a_in_b,
        ROUND(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
              / len(y.sh), 6) AS cont_b_in_a
      FROM cand c JOIN sh x ON c.doc_a = x.doc_id
                  JOIN sh y ON c.doc_b = y.doc_id
    )
    SELECT doc_a, doc_b, cont_a_in_b, cont_b_in_a
    FROM scored
    WHERE cont_a_in_b >= 0.8 OR cont_b_in_a >= 0.8
    ORDER BY doc_a, doc_b
    """
)


oracle("q_tukey")(
    """
    WITH q AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.25) AS q1,
             quantile_cont(l_extendedprice, 0.75) AS q3
      FROM lineitem GROUP BY 1
    ),
    f AS (
      SELECT l_returnflag, q1, q3, q3 - q1 AS iqr,
             q1 - 1.5 * (q3 - q1) AS lo_fence,
             q3 + 1.5 * (q3 - q1) AS hi_fence
      FROM q
    )
    SELECT l.l_returnflag,
           ROUND(q1, 6) AS q1, ROUND(q3, 6) AS q3,
           ROUND(iqr, 6) AS iqr,
           ROUND(lo_fence, 6) AS lo_fence,
           ROUND(hi_fence, 6) AS hi_fence,
           SUM(CASE WHEN l_extendedprice < lo_fence THEN 1 ELSE 0 END)
             AS n_low,
           SUM(CASE WHEN l_extendedprice > hi_fence THEN 1 ELSE 0 END)
             AS n_high,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem l JOIN f USING (l_returnflag)
    GROUP BY l.l_returnflag, q1, q3, iqr, lo_fence, hi_fence
    ORDER BY l.l_returnflag
    """
)


# ----------------------------------------------------- engine pragmas
# DuckDB's default thread count (one per core — 32 on the grading box)
# fragments the process heap into ~40k anonymous mmaps PER heavy
# PQ-chain oracle (glibc per-thread arena churn under the generated
# chain's allocation pattern); a few such oracles in one process
# approach vm.max_map_count (65530), after which every allocation
# fails as OutOfMemory "bad allocation" with ample free RAM
# (CORRECTNESS_r05: q_ann_recall red). The cap must live INSIDE the
# oracle string — a fresh default connection (the driver's harness)
# never sees the pytest fixture's SET. duckdb>=1.0 execute() runs
# multi-statement strings and returns the last statement's result, so
# prepending pragmas is portable. 8 threads keep the worst chain ~5x
# under the map budget AND ~3x faster on a box co-tenant with the
# Spark JVM (measured: 40074 maps/3.4s at 32 threads vs 7201 maps/
# 1.0s at 8 — see SCALE.md round-5 postscript).
HEAVY_ORACLES: tuple[str, ...] = (
    "q_ann_recall",
    "q_ivfpq_pretrained",
    "q_ivfpq_topk",
    "q_pq_topk",
    "q_ivfpq_residual",
    "q_embed_near_dup",
    "q_ivf_recall_curve",
    "q_incr_neardup",
    "q_kmeans_ivf",
)

def _duck_pragmas() -> str:
    """Derive the thread/memory caps from the actual box instead of
    hard-coding the grading machine's (round 8, ADVICE r7): a
    quarter of the cores capped at 8 (the measured map-budget sweet
    spot above), ~20% of physical RAM capped at 24GB (the oracle is
    co-tenant with a big Spark JVM). SPARK_GRAFT_DUCK_THREADS /
    SPARK_GRAFT_DUCK_MEM override both for unusual boxes. On the
    32-core/128GB grading box this resolves to the previously pinned
    threads=8 / 24GB exactly."""
    import os

    threads = int(os.environ.get("SPARK_GRAFT_DUCK_THREADS", "0")) or max(
        2, min(8, (os.cpu_count() or 8) // 4)
    )
    mem = os.environ.get("SPARK_GRAFT_DUCK_MEM", "")
    if not mem:
        try:
            total_gb = (
                os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
            ) / (1 << 30)
            mem = f"{max(2, min(24, int(total_gb * 0.2)))}GB"
        except (ValueError, OSError, AttributeError):
            mem = "24GB"
    return f"SET threads={threads}; SET memory_limit='{mem}';\n"


_PRAGMAS = _duck_pragmas()

for _name in HEAVY_ORACLES:
    if _name in ORACLES and not ORACLES[_name].lstrip().startswith("SET "):
        ORACLES[_name] = _PRAGMAS + ORACLES[_name]


# Training-shard manifest truth (q_train_shards, round 8): recompute
# the seeded md5 shuffle key, the 8-hex-prefix shard assignment, and
# the within-shard rank with ties broken by doc_id — byte-for-byte
# the layout write_shards exports.
oracle("q_train_shards")(
    """
    WITH k AS (
      SELECT doc_id,
             md5('7:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM documents
    ),
    s AS (
      SELECT doc_id, shuffle_key,
             ('0x' || substr(shuffle_key, 1, 8))::BIGINT % 8 AS shard
      FROM k
    )
    SELECT doc_id, shard,
           ROW_NUMBER() OVER (
             PARTITION BY shard ORDER BY shuffle_key, doc_id
           ) AS pos
    FROM s
    ORDER BY shard, pos
    """
)


# Scalar-quantization truth (q_scalar_quant, round 8): per-dim
# extrema over the exploded embeddings, then the identical affine
# floor(x+0.5) code rule and dequantization, clamp and degenerate
# mx=mn case mirrored verbatim.
oracle("q_scalar_quant")(
    """
    WITH ex AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    ),
    stats AS (
      SELECT dim, min(val) AS mn, max(val) AS mx FROM ex GROUP BY dim
    )
    SELECT ex.vec_id, ex.dim,
           CASE WHEN s.mx = s.mn THEN 0
                ELSE least(255, greatest(0,
                  CAST(floor((ex.val - s.mn) / (s.mx - s.mn) * 255.0 + 0.5)
                       AS INT)))
           END AS code,
           round(
             s.mn
             + CAST(CASE WHEN s.mx = s.mn THEN 0
                    ELSE least(255, greatest(0,
                      CAST(floor((ex.val - s.mn) / (s.mx - s.mn) * 255.0 + 0.5)
                           AS INT)))
               END AS DOUBLE) / 255.0 * (s.mx - s.mn),
             9) AS recon
    FROM ex JOIN stats s USING (dim)
    ORDER BY vec_id, dim
    """
)


# Z-order skipping truth (q_zorder, round 8): the 20-term Morton
# interleave re-derived bit lane by bit lane (x at even bits, y at
# odd — z_value's i*n+j rule for cols=[x, y]), then both bucketings
# (top 5 bits of z / of x), zone-map min-max per bucket, and the
# band-intersection touch flags, all mirrored exactly.
_Z_INTERLEAVE = " + ".join(
    f"((((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1}))"
    for i in range(10)
)

oracle("q_zorder")(
    f"""
    WITH base AS (
      SELECT CAST((event_id * 53) % 1024 AS INT) AS x,
             CAST((event_id * 193 + 7) % 1024 AS INT) AS y
      FROM events
    ),
    zb AS (
      SELECT 'zorder' AS layout,
             CAST(({_Z_INTERLEAVE}) >> 15 AS INT) AS bucket, x, y
      FROM base
      UNION ALL
      SELECT 'linear' AS layout, CAST(x >> 5 AS INT) AS bucket, x, y
      FROM base
    ),
    st AS (
      SELECT layout, bucket, count(*) AS n,
             min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y
      FROM zb GROUP BY layout, bucket
    )
    SELECT layout, bucket, n, min_x, max_x, min_y, max_y,
           CAST(min_x <= 415 AND max_x >= 384 AS INT) AS touch_x,
           CAST(min_y <= 415 AND max_y >= 384 AS INT) AS touch_y
    FROM st
    ORDER BY layout, bucket
    """
)


# VARIANT truth (q_variant, round 8): the same nested JSON built from
# event columns, every typed path probe re-derived with DuckDB's JSON
# functions (0-based array index, null for the missing path), and the
# malformed-row gate via json_valid.
oracle("q_variant")(
    """
    WITH j AS (
      SELECT event_id,
             '{"u":' || user_id
               || ',"tags":["t' || (user_id % 5)
               || '","t' || (event_id % 7)
               || '"],"m":{"v":' || CAST(floor(value) AS BIGINT)
               || ',"t":"' || event_type || '"}}' AS js
      FROM events
    )
    SELECT event_id,
           CAST(json_extract(js, '$.u') AS BIGINT) AS u,
           json_extract_string(js, '$.tags[1]') AS tag1,
           CAST(json_extract(js, '$.m.v') AS BIGINT) AS mv,
           json_extract_string(js, '$.m.t') AS typ,
           json_extract_string(js, '$.missing') AS absent,
           CASE WHEN event_id % 10 = 0
                THEN CASE WHEN json_valid('{"u":') THEN 1 ELSE 0 END
                ELSE CASE WHEN json_valid(js) THEN 1 ELSE 0 END
           END AS parse_ok
    FROM j
    ORDER BY event_id
    """
)


# KMV sketch truth (q_kmv, round 8): same md5-60bit hash, per-group
# top-8 by row_number, kth-minimum estimator with the exact branch
# when the sketch is not full, and the union row merged from sketch
# contents only.
oracle("q_kmv")(
    """
    WITH pairs AS (
      SELECT DISTINCT event_type AS grp,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM events
    ),
    ranked AS (
      SELECT grp, h,
             row_number() OVER (PARTITION BY grp ORDER BY h) AS rk
      FROM pairs
    ),
    sk AS (SELECT * FROM ranked WHERE rk <= 8),
    per_grp AS (
      SELECT grp, count(*) AS n_sketch,
             max(CASE WHEN rk = 8 THEN h END) AS h_k
      FROM sk GROUP BY grp
    ),
    merged AS (
      SELECT h, row_number() OVER (ORDER BY h) AS rk
      FROM (SELECT DISTINCT h FROM sk)
    ),
    uni AS (
      SELECT '__union__' AS grp, count(*) AS n_sketch,
             max(CASE WHEN rk = 8 THEN h END) AS h_k
      FROM merged WHERE rk <= 8
    ),
    allrows AS (
      SELECT * FROM per_grp UNION ALL SELECT * FROM uni
    )
    SELECT grp, n_sketch, h_k,
           round(CASE WHEN h_k IS NULL THEN CAST(n_sketch AS DOUBLE)
                 ELSE 7.0 * 1152921504606846976.0 / CAST(h_k AS DOUBLE)
                 END, 6) AS est
    FROM allrows
    ORDER BY grp
    """
)


# Entity-resolution truth (q_entity_match, round 8): the dirty-feed
# synthesis, digit-key blocking, Levenshtein verify, four
# min-label-propagation rounds (the shared _lp_rounds body), singleton
# preservation, and arg_max survivorship, all replayed exactly.
oracle("q_entity_match")(
    f"""
    WITH c AS (
      SELECT c_custkey AS k, c_name, c_acctbal,
             '555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
               AS phone
      FROM customer
    ),
    recs AS (
      SELECT k * 2 AS rec_id, c_name AS name, phone, c_acctbal AS bal,
             1 AS seq
      FROM c
      UNION ALL
      SELECT k * 2 + 1,
             CASE WHEN k % 5 = 0
                  THEN 'Anon#' || regexp_extract(c_name, '([0-9]+)', 1)
                  ELSE c_name || '.' END,
             CASE WHEN k % 4 = 0 THEN NULL ELSE phone END,
             NULL, 2
      FROM c
    ),
    keyed AS (
      SELECT rec_id, name, regexp_extract(name, '([0-9]+)', 1) AS bk
      FROM recs
    ),
    pairs AS (
      SELECT a.rec_id AS src, b.rec_id AS dst
      FROM keyed a JOIN keyed b ON a.bk = b.bk AND a.rec_id < b.rec_id
      WHERE levenshtein(a.name, b.name) <= 2
    ),
    edges AS (
      SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
    ),
    l0 AS (SELECT DISTINCT src AS doc, src AS label FROM edges){_lp_rounds},
    lab AS (
      SELECT r.rec_id, COALESCE(l.label, r.rec_id) AS cluster
      FROM recs r LEFT JOIN l4 l ON l.doc = r.rec_id
    ),
    j AS (
      SELECT lab.cluster, r.name, r.phone, r.bal, r.seq
      FROM recs r JOIN lab ON lab.rec_id = r.rec_id
    )
    SELECT cluster,
           arg_max(name, CASE WHEN name IS NOT NULL THEN seq END) AS name,
           arg_max(phone, CASE WHEN phone IS NOT NULL THEN seq END) AS phone,
           arg_max(bal, CASE WHEN bal IS NOT NULL THEN seq END) AS bal,
           MAX(seq) AS last_seen,
           COUNT(*) AS n_recs
    FROM j GROUP BY cluster
    ORDER BY cluster
    """
)


# Confusables-fold dedup truth (q_homoglyph_dedup, round 8): the
# same shadow synthesis and the SAME fold table — these two literals
# are string-pinned to operators/text.CONFUSABLES_FROM/TO by
# tests/test_new_ops_r8.py, so the fold definition cannot drift
# between engines.
_CONF_FROM = "аеорсхуіѕјАВЕКМНОРСТХУονΑΒΕΖΗΙΚΜΝΟΡΤΥΧ"
_CONF_TO = "aeopcxyisjABEKMHOPCTXYovABEZHIKMNOPTYX"

oracle("q_homoglyph_dedup")(
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, translate(text, 'aeo', 'аео')
      FROM documents WHERE doc_id % 7 = 0
    )
    SELECT doc_id,
           CAST(doc_id >= 1000000 AS INT) AS is_shadow,
           count(*) OVER (PARTITION BY md5(text)) AS n_naive,
           count(*) OVER (
             PARTITION BY md5(translate(text, '{_CONF_FROM}', '{_CONF_TO}'))
           ) AS n_folded
    FROM corpus
    ORDER BY doc_id
    """
)


# KMV Jaccard truth (q_kmv_jaccard, round 8): same tokenizer, same
# md5-60bit hash, per-source top-64 sketches, evidence-pair surfacing
# via the hash equi-join, pooled top-64 bottom-k estimator.
oracle("q_kmv_jaccard")(
    f"""
    WITH tok AS (
      SELECT DISTINCT source AS grp,
             CAST('0x' || substr(md5(term), 1, 15) AS BIGINT) AS h
      FROM (
        SELECT source,
               unnest(regexp_extract_all(
                 lower(replace(text, 'İ', 'i')), {_TOKEN_PAT})) AS term
        FROM documents
      )
    ),
    ranked AS (
      SELECT grp, h,
             row_number() OVER (PARTITION BY grp ORDER BY h) AS rk
      FROM tok
    ),
    sk AS (SELECT grp, h FROM ranked WHERE rk <= 64),
    cand AS (
      SELECT DISTINCT a.grp AS ga, b.grp AS gb
      FROM sk a JOIN sk b ON a.h = b.h AND a.grp < b.grp
    ),
    pooled0 AS (
      SELECT c.ga, c.gb, s.h, 1 AS in_a, 0 AS in_b
      FROM cand c JOIN sk s ON s.grp = c.ga
      UNION ALL
      SELECT c.ga, c.gb, s.h, 0, 1
      FROM cand c JOIN sk s ON s.grp = c.gb
    ),
    pooled AS (
      SELECT ga, gb, h, max(in_a) AS in_a, max(in_b) AS in_b
      FROM pooled0 GROUP BY ga, gb, h
    ),
    merged AS (
      SELECT *, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rk
      FROM pooled
    )
    SELECT ga AS grp_a, gb AS grp_b,
           count(*) AS k_used,
           CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_both,
           round(CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS jacc
    FROM merged WHERE rk <= 64
    GROUP BY ga, gb
    ORDER BY grp_a, grp_b
    """
)


# Attribution truth (q_attribution, round 8): equi-join on user with
# the (conv_ts - 3 days, conv_ts] window, endpoints under the total
# (touch_ts, touch_id) order, unattributed conversions preserved via
# the left join.
oracle("q_attribution")(
    """
    WITH conv AS (
      SELECT user_id AS u, ts AS conv_ts, event_id AS conv_id
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id AS u, ts AS touch_ts, event_id AS touch_id,
             event_type AS touch_type
      FROM events WHERE event_type IN ('click', 'view')
    ),
    paired AS (
      SELECT c.conv_id, c.u, t.touch_type, t.touch_ts, t.touch_id
      FROM conv c JOIN touch t ON c.u = t.u
      WHERE t.touch_ts <= c.conv_ts
        AND t.touch_ts > c.conv_ts - INTERVAL 3 DAY
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY conv_id ORDER BY touch_ts, touch_id
             ) AS rn_f,
             row_number() OVER (
               PARTITION BY conv_id ORDER BY touch_ts DESC, touch_id DESC
             ) AS rn_l
      FROM paired
    ),
    ends AS (
      SELECT conv_id, u,
             max(CASE WHEN rn_f = 1 THEN touch_type END) AS first_touch,
             max(CASE WHEN rn_l = 1 THEN touch_type END) AS last_touch
      FROM ranked GROUP BY conv_id, u
    ),
    per_conv AS (
      SELECT c.conv_id, e.first_touch, e.last_touch
      FROM conv c LEFT JOIN ends e ON e.conv_id = c.conv_id AND e.u = c.u
    )
    SELECT first_touch, last_touch, count(*) AS n_conversions
    FROM per_conv GROUP BY first_touch, last_touch
    ORDER BY first_touch, last_touch
    """
)


# Blocklist truth (q_blocklist, round 8): same tokenizer, occurrence
# counts against the same three-term list, zero-hit docs preserved.
oracle("q_blocklist")(
    f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(regexp_extract_all(
               lower(replace(text, 'İ', 'i')), {_TOKEN_PAT})) AS term
      FROM documents
    ),
    hits AS (
      SELECT doc_id, count(*) AS n_hits, count(DISTINCT term) AS n_terms
      FROM tok WHERE term IN ('merge', 'window', 'dup')
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_hits, 0) AS n_hits,
           COALESCE(h.n_terms, 0) AS n_terms,
           COALESCE(h.n_hits, 0) <= 4 AS kept
    FROM documents d LEFT JOIN hits h USING (doc_id)
    ORDER BY d.doc_id
    """
)


# Point-in-time feature truth (q_feature_matrix, round 8; hardened
# round 10): the same epoch-second range frame ending 1 s before the
# row, the same total (epoch, event_id) lag order, left dimension
# join. The monetary sum is exact integer cents derived with pure
# IEEE-754 double ops (floor(value*100 + 0.5)) — bit-identical in
# any engine version, no DOUBLE→DECIMAL rounding path on any graded
# column.
oracle("q_feature_matrix")(
    """
    WITH base AS (
      SELECT event_id, user_id,
             -- floor, not round: Spark unix_timestamp truncates the
             -- fractional seconds
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS val_cents
      FROM events
    ),
    feat AS (
      SELECT event_id, user_id,
             count(*) OVER w3 AS n_prior_3d,
             CAST(COALESCE(sum(val_cents) OVER w3, 0) AS BIGINT)
               AS sum_prior_3d_cents,
             epoch - lag(epoch) OVER (
               PARTITION BY user_id ORDER BY epoch, event_id
             ) AS gap_s
      FROM base
      WINDOW w3 AS (
        PARTITION BY user_id ORDER BY epoch
        RANGE BETWEEN 259200 PRECEDING AND 1 PRECEDING
      )
    )
    SELECT f.event_id, f.n_prior_3d, f.sum_prior_3d_cents, f.gap_s,
           c.c_mktsegment AS segment
    FROM feat f LEFT JOIN customer c ON c.c_custkey = f.user_id
    ORDER BY f.event_id
    """
)


# PSI drift truth (q_psi_drift, round 8): fixed-width bins, fixed
# time split, Laplace smoothing, per-bin terms rounded then summed
# as exact decimals.
oracle("q_psi_drift")(
    """
    WITH b AS (
      SELECT least(9, CAST(floor(value / 35) AS INT)) AS bin,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
               AS is_ref
      FROM events
    ),
    counts AS (
      SELECT bin, SUM(is_ref) AS n_ref, SUM(1 - is_ref) AS n_cur
      FROM b GROUP BY bin
    ),
    tot AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM counts),
    terms AS (
      SELECT bin,
             CAST(n_ref AS BIGINT) AS n_ref,
             CAST(n_cur AS BIGINT) AS n_cur,
             round(
               (CAST(n_ref + 1 AS DOUBLE) / CAST(t_ref + 10 AS DOUBLE)
                - CAST(n_cur + 1 AS DOUBLE) / CAST(t_cur + 10 AS DOUBLE))
               * ln((CAST(n_ref + 1 AS DOUBLE) / CAST(t_ref + 10 AS DOUBLE))
                    / (CAST(n_cur + 1 AS DOUBLE) / CAST(t_cur + 10 AS DOUBLE))),
               6) AS term
      FROM counts, tot
    )
    SELECT bin, n_ref, n_cur, term,
           SUM(CAST(term AS DECIMAL(18,6))) OVER () AS psi
    FROM terms
    ORDER BY bin
    """
)


# Label-generation truth (q_labels, round 8): the strictly-future
# 7-day range frame and the total-order next-event gap, epochs
# floored like unix_timestamp.
oracle("q_labels")(
    """
    WITH base AS (
      SELECT event_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch
      FROM events
    )
    SELECT event_id,
           CAST(count(*) OVER (
             PARTITION BY user_id ORDER BY epoch
             RANGE BETWEEN 1 FOLLOWING AND 604800 FOLLOWING
           ) > 0 AS INT) AS label_7d,
           lead(epoch) OVER (
             PARTITION BY user_id ORDER BY epoch, event_id
           ) - epoch AS next_gap_s
    FROM base
    ORDER BY event_id
    """
)


# Null-aware anti-join truth (q_null_anti, round 8): the identical
# NOT IN pair — with_null must count 0 under three-valued logic.
oracle("q_null_anti")(
    """
    WITH probe AS (
      SELECT user_id AS u FROM events
      WHERE event_type = 'error' AND user_id % 4 = 0
    ),
    with_null AS (
      SELECT u FROM probe UNION ALL SELECT CAST(NULL AS BIGINT)
    ),
    v1 AS (
      SELECT 'not_in_with_null' AS variant, count(*) AS n
      FROM events WHERE user_id NOT IN (SELECT u FROM with_null)
    ),
    v2 AS (
      SELECT 'not_in_null_filtered' AS variant, count(*) AS n
      FROM events
      WHERE user_id NOT IN (SELECT u FROM with_null WHERE u IS NOT NULL)
    )
    SELECT * FROM v1 UNION ALL SELECT * FROM v2 ORDER BY variant
    """
)


# Collation-fold truth (q_collation, round 8): the same case-variant
# synthesis, folded with lower(), binary variant count per fold.
oracle("q_collation")(
    """
    WITH v AS (
      SELECT CASE
        WHEN c_custkey % 3 = 0 THEN upper(c_mktsegment)
        WHEN c_custkey % 3 = 1 THEN lower(c_mktsegment)
        ELSE upper(substr(lower(c_mktsegment), 1, 1))
             || substr(lower(c_mktsegment), 2)
      END AS seg_raw
      FROM customer
    )
    SELECT lower(seg_raw) AS seg,
           count(*) AS n_rows,
           count(DISTINCT seg_raw) AS n_variants
    FROM v GROUP BY lower(seg_raw)
    ORDER BY seg
    """
)


# Recursive-CTE truth (q_recursive, round 8): DuckDB's own recursive
# walk over the same synthetic tree (parent = key // 10).
oracle("q_recursive")(
    """
    WITH RECURSIVE walk(node, depth) AS (
      SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
      UNION ALL
      SELECT b.k, w.depth + 1
      FROM (
        SELECT c_custkey AS k, c_custkey // 10 AS parent
        FROM customer WHERE c_custkey <> 0
      ) b
      JOIN walk w ON b.parent = w.node
    )
    SELECT node, depth FROM walk ORDER BY node
    """
)


# SQL-surface truth (q_sql_surface, round 8): the pipe-syntax + SQL
# UDF query re-expressed as classic SQL — identical decimals.
oracle("q_sql_surface")(
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))))
                AS DECIMAL(38,4)) AS revenue,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """
)


# Naive-Bayes quality classifier (text.nb_quality_scores,
# q_quality_clf, round 9): the full train-and-score replay — label
# rule, per-class token counts, add-one log-likelihood-ratio weights
# quantized to DECIMAL(20,10), OOV fallback, class prior — over the
# same even/odd doc split.
oracle("q_quality_clf")(
    f"""
    WITH lab AS (
      SELECT doc_id, text,
        CASE WHEN ROUND(len(list_filter(
                 string_split_regex(lower(replace(trim(text), 'İ', 'i')), '\\s+'),
                 w -> w IN {_STOPS}))
               / len(string_split_regex(lower(replace(trim(text), 'İ', 'i')), '\\s+')), 6)
             >= 0.06 THEN 1 ELSE 0 END AS y
      FROM documents WHERE doc_id % 2 = 0
    ),
    tok AS (
      SELECT doc_id, y,
        unnest(regexp_extract_all(lower(replace(text, 'İ', 'i')), {_TOKEN_PAT})) AS term
      FROM lab
    ),
    per_term AS (
      SELECT term, SUM(y) AS c1, SUM(1 - y) AS c0 FROM tok GROUP BY term
    ),
    totals AS (
      SELECT (SELECT SUM(y) FROM tok) AS n1,
             (SELECT SUM(1 - y) FROM tok) AS n0,
             (SELECT COUNT(DISTINCT term) FROM tok) AS v,
             (SELECT SUM(y) FROM lab) AS d1,
             (SELECT SUM(1 - y) FROM lab) AS d0
    ),
    model AS (
      SELECT term,
        CAST(ln((c1 + 1.0) / (n1 + v)) - ln((c0 + 1.0) / (n0 + v))
             AS DECIMAL(20,10)) AS w
      FROM per_term, totals
    ),
    consts AS (
      SELECT CAST(ln(1.0 / (n1 + v)) - ln(1.0 / (n0 + v))
                  AS DECIMAL(20,10)) AS w_oov,
             CAST(ln((d1 + 1.0) / (d0 + 1.0)) AS DECIMAL(20,10)) AS prior
      FROM totals
    ),
    stok AS (
      SELECT doc_id AS doc,
        unnest(regexp_extract_all(lower(replace(text, 'İ', 'i')), {_TOKEN_PAT})) AS term
      FROM documents WHERE doc_id % 2 = 1
    ),
    scored AS (
      SELECT doc, COUNT(*) AS n_terms,
        ROUND(CAST(ANY_VALUE(prior) + SUM(COALESCE(m.w, w_oov)) AS DOUBLE), 6)
          AS nb_margin
      FROM stok LEFT JOIN model m USING (term)
      CROSS JOIN consts
      GROUP BY doc
    )
    SELECT doc, n_terms, nb_margin, nb_margin > 0 AS pred
    FROM scored ORDER BY doc
    """
)


# RFM truth (q_rfm, round 8; boundary-scored round 9): the same
# user aggregates (epochs floored like unix_timestamp, exact decimal
# monetary floored to whole units), exact type-7 quintile boundaries
# (quantile_cont ≡ Spark's percentile on integer domains), the same
# CASE bucketing (recency scored on last_epoch directly — ascending
# epoch bucket = r_score), the same grid. DuckDB lists are 1-indexed.
oracle("q_rfm")(
    """
    WITH metrics AS (
      SELECT user_id,
             max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_epoch,
             count(*) AS freq,
             CAST(floor(CAST(SUM(CAST(value AS DECIMAL(18,2)))
                             AS DECIMAL(28,2))) AS BIGINT) AS mon_u
      FROM events GROUP BY user_id
    ),
    bounds AS (
      SELECT quantile_cont(last_epoch, [0.2, 0.4, 0.6, 0.8]) AS rb,
             quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS fb,
             quantile_cont(mon_u, [0.2, 0.4, 0.6, 0.8]) AS mb
      FROM metrics
    ),
    scored AS (
      SELECT user_id,
             1 + CASE WHEN last_epoch > rb[1] THEN 1 ELSE 0 END
               + CASE WHEN last_epoch > rb[2] THEN 1 ELSE 0 END
               + CASE WHEN last_epoch > rb[3] THEN 1 ELSE 0 END
               + CASE WHEN last_epoch > rb[4] THEN 1 ELSE 0 END AS r_score,
             1 + CASE WHEN freq > fb[1] THEN 1 ELSE 0 END
               + CASE WHEN freq > fb[2] THEN 1 ELSE 0 END
               + CASE WHEN freq > fb[3] THEN 1 ELSE 0 END
               + CASE WHEN freq > fb[4] THEN 1 ELSE 0 END AS f_score,
             1 + CASE WHEN mon_u > mb[1] THEN 1 ELSE 0 END
               + CASE WHEN mon_u > mb[2] THEN 1 ELSE 0 END
               + CASE WHEN mon_u > mb[3] THEN 1 ELSE 0 END
               + CASE WHEN mon_u > mb[4] THEN 1 ELSE 0 END AS m_score
      FROM metrics, bounds
    )
    SELECT r_score, f_score, m_score, count(*) AS n_users
    FROM scored GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """
)


# ---------------------------------------------- TPC-H 22/22 (round 10)
# The derived partsupp CTE — pinned integer formulas over 0-based
# keys, the exact mirror of queries_ext._partsupp (see its block
# comment). Pure integer arithmetic ⇒ bit-identical rows in both
# engines by construction.
_PARTSUPP_CTE = """
    sc AS (SELECT COUNT(*) AS s_cnt FROM supplier),
    ps0 AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey + i.i * (sc.s_cnt // 4)) % sc.s_cnt AS ps_suppkey
      FROM part, sc, (VALUES (0),(1),(2),(3)) AS i(i)
    ),
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             (ps_partkey * 7 + ps_suppkey * 11) % 9999 + 1 AS ps_availqty,
             (ps_partkey * 31 + ps_suppkey * 17) % 900 + 1 AS ps_supplycost
      FROM ps0
    )
"""

oracle("q_tpch_q2")(
    f"""
    WITH {_PARTSUPP_CTE},
    eu AS (
      SELECT ps_partkey, ps_suppkey, ps_supplycost,
             s_name, s_acctbal, n_name
      FROM partsupp
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    mn AS (
      SELECT ps_partkey, MIN(ps_supplycost) AS min_cost
      FROM eu GROUP BY ps_partkey
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_brand,
           e.ps_supplycost
    FROM eu e
    JOIN mn ON e.ps_partkey = mn.ps_partkey
           AND e.ps_supplycost = mn.min_cost
    JOIN part p ON p.p_partkey = e.ps_partkey
    WHERE p.p_size = 15
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """
)

oracle("q_tpch_q9")(
    f"""
    WITH {_PARTSUPP_CTE}
    SELECT n_name AS nation,
           EXTRACT(year FROM o_orderdate) AS o_year,
           CAST(SUM(
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) -
                   CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
             - CAST(ps_supplycost * CAST(l_quantity AS BIGINT)
                    AS DECIMAL(18,4))
           ) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    ORDER BY nation, o_year DESC
    """
)

oracle("q_tpch_q11")(
    f"""
    WITH {_PARTSUPP_CTE},
    scoped AS (
      SELECT ps_partkey, ps_supplycost * ps_availqty AS v
      FROM partsupp
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    tot AS (
      SELECT SUM(v) AS total_v, COUNT(DISTINCT ps_partkey) AS np
      FROM scoped
    )
    SELECT ps_partkey, CAST(SUM(v) AS DOUBLE) AS value_dollars
    FROM scoped, tot
    GROUP BY ps_partkey, total_v, np
    HAVING SUM(v) * np * 10 > total_v * 12
    ORDER BY value_dollars DESC, ps_partkey
    """
)

oracle("q_tpch_q16")(
    f"""
    WITH {_PARTSUPP_CTE}
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 9, 15, 25, 36, 49)
      AND ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """
)

oracle("q_tpch_q20")(
    f"""
    WITH {_PARTSUPP_CTE},
    shipped AS (
      SELECT l_partkey, l_suppkey, CAST(SUM(l_quantity) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name, s_suppkey
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
      AND s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        WHERE ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
          )
          AND ps_availqty * 2 > qty
      )
    ORDER BY s_name
    """
)


# Streaming CDF hop truth (q_stream_cdf, round 10): batch v+1 holds
# exactly the events with event_id % 3 == v, landed downstream ONCE —
# a duplicate replay (engine-offset or foreachBatch) would double a
# count; a missed commit would drop a group. Money in exact integer
# cents (the q_feature_matrix derivation).
oracle("q_stream_cdf")(
    """
    SELECT CAST(event_id % 3 + 1 AS BIGINT) AS batch_v,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """
)


# Declarative-pipeline medallion truth (q_sdp_pipeline, round 10):
# gold is exactly q_gold_window's diff/cumsum shape — the oracle
# grades the SDP path (registry → fixpoint resolution → three
# physical materializations) against the same bitwise windows.
oracle("q_sdp_pipeline")(
    """
    SELECT
      l_orderkey, l_linenumber, l_shipdate, l_quantity, l_extendedprice,
      COALESCE(
        l_extendedprice - lag(l_extendedprice) OVER w, l_extendedprice
      ) AS diff_extendedprice,
      COALESCE(l_quantity - lag(l_quantity) OVER w, l_quantity) AS diff_quantity,
      SUM(l_quantity) OVER (
        PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber, l_quantity, l_extendedprice
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS cumsum_quantity
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber, l_quantity, l_extendedprice)
    """
)


# Incremental SemDeDup truth (q_incr_semdedup, round 10): identical
# assignment argmax for both halves, history matches (odd vs even,
# same cluster) union batch matches (odd vs smaller odd), dup_of =
# min over both, keep = no match. A history row wrongly re-deduped
# against itself, a missed cross-half match, or a wrong min all
# mismatch.
oracle("q_incr_semdedup")(
    """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    c AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 50 = 0
    ),
    a AS (
      SELECT e.vec_id, e.v, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC,
                        c.cid ASC
             ) AS rn
      FROM e CROSS JOIN c
    ),
    asg AS (SELECT vec_id, v, cid FROM a WHERE rn = 1),
    hist AS (
      SELECT o.vec_id AS id, MIN(h.vec_id) AS m
      FROM asg o JOIN asg h
        ON o.cid = h.cid AND h.vec_id % 2 = 0
      WHERE o.vec_id % 2 = 1
        AND ROUND(list_cosine_similarity(o.v, h.v), 6) >= 0.3
      GROUP BY o.vec_id
    ),
    batchm AS (
      SELECT o.vec_id AS id, MIN(b.vec_id) AS m
      FROM asg o JOIN asg b
        ON o.cid = b.cid AND b.vec_id % 2 = 1 AND b.vec_id < o.vec_id
      WHERE o.vec_id % 2 = 1
        AND ROUND(list_cosine_similarity(o.v, b.v), 6) >= 0.3
      GROUP BY o.vec_id
    ),
    dup AS (
      SELECT id, MIN(m) AS dup_of
      FROM (SELECT * FROM hist UNION ALL SELECT * FROM batchm)
      GROUP BY id
    )
    SELECT o.vec_id, o.cid AS cluster_id, d.dup_of,
           d.dup_of IS NULL AS keep
    FROM asg o LEFT JOIN dup d ON o.vec_id = d.id
    WHERE o.vec_id % 2 = 1
    ORDER BY o.vec_id
    """
)


# Connected-components truth (q_components, round 10): the decade
# graph's components are closed-form — every node connects to its
# decade's min via the chain (and the skip edges stay in-decade), so
# cluster(doc) = the smallest doc_id of its decade PRESENT among the
# graph's nodes (edges reference doc_id+1 / doc_id+5, which also lie
# in the table for the fixture's dense 0..N-1 ids — asserted by the
# count parity with the Spark side).
oracle("q_components")(
    """
    WITH ids AS (SELECT doc_id FROM documents),
    edges AS (
      SELECT doc_id AS a, doc_id + 1 AS b FROM ids WHERE doc_id % 10 != 9
      UNION ALL
      SELECT doc_id AS a, doc_id + 5 AS b FROM ids WHERE doc_id % 10 < 5
    ),
    nodes AS (
      SELECT DISTINCT x AS doc
      FROM (SELECT a AS x FROM edges UNION ALL SELECT b FROM edges)
    ),
    labeled AS (
      SELECT doc, (doc // 10) * 10 AS decade FROM nodes
    ),
    mins AS (
      SELECT decade, MIN(doc) AS cluster, COUNT(*) AS n_members
      FROM labeled GROUP BY decade
    )
    SELECT l.doc, m.cluster, m.n_members
    FROM labeled l JOIN mins m ON l.decade = m.decade
    ORDER BY l.doc
    """
)

oracle("q_dv_cdf")(
    """
    WITH base AS (
      SELECT doc_id, doc_id % 1000 AS bucket FROM documents
    ),
    del AS (
      SELECT CAST(2 AS BIGINT) AS _commit_version,
             'delete' AS _change_type,
             COUNT(*) AS n,
             CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
             CAST(SUM(bucket) AS BIGINT) AS sum_bucket
      FROM base WHERE doc_id % 5 = 0
    ),
    touched AS (
      SELECT * FROM base WHERE doc_id % 7 = 0 AND doc_id % 5 <> 0
    ),
    pre AS (
      SELECT CAST(3 AS BIGINT) AS _commit_version,
             'update_preimage' AS _change_type,
             COUNT(*) AS n,
             CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
             CAST(SUM(bucket) AS BIGINT) AS sum_bucket
      FROM touched
    ),
    post AS (
      SELECT CAST(3 AS BIGINT) AS _commit_version,
             'update_postimage' AS _change_type,
             COUNT(*) AS n,
             CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
             CAST(-COUNT(*) AS BIGINT) AS sum_bucket
      FROM touched
    )
    SELECT * FROM del
    UNION ALL SELECT * FROM pre
    UNION ALL SELECT * FROM post
    ORDER BY _commit_version, _change_type
    """
)

oracle("q_rename_read")(
    """
    SELECT
      c_mktsegment AS segment,
      COUNT(*) AS n,
      CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
      CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
        AS sum_cents
    FROM customer
    WHERE c_mktsegment <> 'BUILDING'
    GROUP BY c_mktsegment
    ORDER BY segment
    """
)

oracle("q_partitioned_read")(
    """
    SELECT
      o_orderpriority,
      COUNT(*) AS n,
      CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
      CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        AS sum_cents
    FROM orders
    WHERE o_orderpriority <> '1-URGENT'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """
)

oracle("q_dv_merge")(
    """
    WITH base AS (
      SELECT c_custkey, c_mktsegment,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ),
    n AS (SELECT COUNT(*) AS n_cust FROM base),
    src AS (
      SELECT c_custkey, 'MERGED' AS c_mktsegment, CAST(0 AS BIGINT) AS cents
      FROM base WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey + n_cust * 10, 'FRESH', CAST(1 AS BIGINT)
      FROM base, n WHERE c_custkey % 5 = 0
    ),
    merged AS (
      SELECT b.* FROM base b
      WHERE NOT EXISTS (
        SELECT 1 FROM src s WHERE s.c_custkey = b.c_custkey
      )
      UNION ALL
      SELECT * FROM src
    )
    SELECT c_mktsegment,
           COUNT(*) AS n,
           CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM merged
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """
)

oracle("q_cdf_spec")(
    """
    WITH base AS (
      SELECT c_custkey, c_mktsegment,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ),
    changes AS (
      SELECT 'insert' AS _change_type, CAST(0 AS BIGINT) AS _commit_version,
             c_custkey, cents
      FROM base
      UNION ALL
      SELECT 'delete', CAST(1 AS BIGINT), c_custkey, cents
      FROM base WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT 'update_preimage', CAST(2 AS BIGINT), c_custkey, cents
      FROM base
      WHERE c_mktsegment <> 'BUILDING' AND c_custkey % 10 = 3
      UNION ALL
      SELECT 'update_postimage', CAST(2 AS BIGINT), c_custkey, cents + 1
      FROM base
      WHERE c_mktsegment <> 'BUILDING' AND c_custkey % 10 = 3
      -- v3 = plain INSERT OVERWRITE, no cdc: derived as deletes of
      -- the v2 LIVE set (DV masks applied) + inserts of the new rows
      UNION ALL
      SELECT 'delete', CAST(3 AS BIGINT), c_custkey,
             cents + CASE WHEN c_custkey % 10 = 3 THEN 1 ELSE 0 END
      FROM base WHERE c_mktsegment <> 'BUILDING'
      UNION ALL
      SELECT 'insert', CAST(3 AS BIGINT), c_custkey, CAST(5 AS BIGINT)
      FROM base WHERE c_custkey % 3 = 0
    )
    SELECT _change_type, _commit_version,
           COUNT(*) AS n,
           CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM changes
    GROUP BY _change_type, _commit_version
    ORDER BY _change_type, _commit_version
    """
)

oracle("q_clone_read")(
    """
    SELECT c_mktsegment,
           COUNT(*) AS n,
           CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM customer
    WHERE c_mktsegment <> 'MACHINERY'
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """
)

oracle("q_pruned_read")(
    """
    WITH m AS (SELECT MAX(o_orderkey) AS mk FROM orders)
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM orders, m
    WHERE o_orderkey % 10 <> 7
      AND o_orderkey BETWEEN mk // 3 AND 2 * mk // 3
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """
)

oracle("q_purge_read")(
    """
    WITH base AS (
      SELECT p_partkey, p_brand,
             CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
      FROM part
    ),
    post AS (
      -- post-purge snapshot: DELETE %10=3 gone, UPDATE %10=6 +7,
      -- purge itself changes NO logical row
      SELECT p_partkey, p_brand,
             cents + CASE WHEN p_partkey % 10 = 6 THEN 7 ELSE 0 END
               AS cents
      FROM base
      WHERE p_partkey % 10 <> 3
    )
    SELECT p_brand,
           COUNT(*) AS n,
           CAST(SUM(p_partkey) AS BIGINT) AS sum_key,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(0 AS BIGINT) AS cdf_after_purge,
           CAST(0 AS BIGINT) AS dvs_after_purge
    FROM post
    GROUP BY p_brand
    ORDER BY p_brand
    """
)

oracle("q_identity_read")(
    """
    WITH e AS (
      SELECT s_suppkey, s_nationkey,
             ROW_NUMBER() OVER (ORDER BY s_suppkey) AS r
      FROM supplier WHERE s_suppkey % 2 = 0
    ),
    o AS (
      SELECT s_suppkey, s_nationkey,
             ROW_NUMBER() OVER (ORDER BY s_suppkey) AS r
      FROM supplier WHERE s_suppkey % 2 = 1
    ),
    ids AS (
      -- uid = 1000 + 7*(rank-1); the append continues at the
      -- first write's advanced watermark
      SELECT s_suppkey, s_nationkey, 993 + 7 * r AS uid FROM e
      UNION ALL
      SELECT s_suppkey, s_nationkey,
             993 + 7 * ((SELECT MAX(r) FROM e) + r) AS uid
      FROM o
    )
    SELECT s_nationkey,
           COUNT(*) AS n,
           CAST(SUM(uid) AS BIGINT) AS sum_uid,
           CAST(SUM(s_suppkey) AS BIGINT) AS sum_key,
           CAST(MIN(uid) AS BIGINT) AS min_uid,
           CAST(MAX(uid) AS BIGINT) AS max_uid
    FROM ids
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """
)
