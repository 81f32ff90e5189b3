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
    SELECT nationkey FROM (
      (SELECT c_nationkey AS nationkey FROM customer
       UNION
       SELECT s_nationkey FROM supplier)
      EXCEPT
      (SELECT c_nationkey FROM customer
       INTERSECT
       SELECT s_nationkey FROM supplier)
    )
    ORDER BY nationkey
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
