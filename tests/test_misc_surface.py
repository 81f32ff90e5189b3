"""Surface tests: approximate sketches, the foreachBatch→MERGE
streaming sink, and the public functions module."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_deltalake_spark.sources.catalog import load_table


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    """HLL sketches are engine-specific (not oracle-gated); pin the
    contract instead: within 5% of exact at default rsd."""
    orders = load_table(spark, "orders", sf_dir)
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey").alias("approx"),
    ).head()
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_stream_merge_into_upserts(spark, sf_dir, tmp_path):
    """foreachBatch → MERGE sink: draining the same stream twice must
    be idempotent (keyed upsert, not blind append)."""
    import shutil

    from etl_deltalake_spark.sources.table_format import read_table
    from etl_deltalake_spark.streaming import pipeline as P

    target = str(tmp_path / "target")
    stream = P.user_running_totals(
        P.read_events_stream(spark, sf_dir, sf_dir)
    )
    ck1 = str(tmp_path / "ck1")
    P.stream_merge_into(stream, target, ["user_id"], ck1)
    n_users = read_table(spark, target).count()
    assert n_users > 0

    # replay from scratch (fresh checkpoint): same keys → same count
    shutil.rmtree(ck1)
    stream2 = P.user_running_totals(
        P.read_events_stream(spark, sf_dir, sf_dir)
    )
    P.stream_merge_into(stream2, target, ["user_id"], str(tmp_path / "ck2"))
    assert read_table(spark, target).count() == n_users


def test_functions_module_surface(spark):
    from etl_deltalake_spark import functions as EF

    df = spark.createDataFrame(
        [(1, "The quick brown fox. The end!", "Alice Smith")],
        ["id", "text", "name"],
    )
    row = df.select(
        EF.token_count("text").alias("nt"),
        EF.normalize_text("text").alias("norm"),
        EF.quality_score("text").alias("q"),
        EF.synth_email("name").alias("email"),
        EF.fingerprint_md5("text").alias("fp"),
    ).head()
    assert row.nt == 8
    assert row.norm == "the quick brown fox the end"
    assert 0.0 <= row.q <= 1.0
    assert row.email.endswith("@alicesmith.org")
    assert len(row.fp) == 32


def test_sentence_spans_udtf(spark):
    """UDTF extension surface: registered table function + lateral
    join against a documents-shaped frame."""
    from pyspark.sql import functions as F

    from etl_deltalake_spark.operators.udfs import sentence_spans_udtf

    fn = sentence_spans_udtf()
    spark.udtf.register("sentence_spans", fn)
    rows = spark.sql(
        "SELECT * FROM sentence_spans('One. Two two! Three? ')"
    ).collect()
    assert [(r["sent_idx"], r["sentence"]) for r in rows] == [
        (0, "One."), (1, "Two two!"), (2, "Three?"),
    ]
    assert rows[1]["start_pos"] == 4 and rows[1]["end_pos"] == 13

    docs = spark.createDataFrame(
        [(1, "A b. C d!"), (2, None), (3, "No terminator")],
        ["doc_id", "text"],
    )
    docs.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        "SELECT doc_id, sent_idx, sentence FROM udtf_docs, "
        "LATERAL sentence_spans(text) ORDER BY doc_id, sent_idx"
    ).collect()
    got = [(r["doc_id"], r["sent_idx"], r["sentence"]) for r in out]
    assert got == [(1, 0, "A b."), (1, 1, "C d!"), (3, 0, "No terminator")]


def test_bloom_prefilter_join_equals_plain_semi_join(spark, sf_dir):
    """The Bloom pre-filter must be invisible in the RESULT: no
    false negatives means bloom_prefilter_join == plain left_semi
    join exactly, row for row."""
    from pyspark.sql import functions as F

    from etl_deltalake_spark.operators.bloom import bloom_prefilter_join
    from etl_deltalake_spark.sources.catalog import load_table

    orders = load_table(spark, "orders", sf_dir)
    dim = load_table(spark, "customer", sf_dir).filter(
        F.col("c_acctbal") > 9000
    )
    got = sorted(
        r["o_orderkey"]
        for r in bloom_prefilter_join(
            orders, dim, "o_custkey", "c_custkey", n_words=64
        ).select("o_orderkey").collect()
    )
    want = sorted(
        r["o_orderkey"]
        for r in orders.join(
            dim.select(F.col("c_custkey").alias("o_custkey")).distinct(),
            "o_custkey",
            "left_semi",
        ).select("o_orderkey").collect()
    )
    assert got == want and len(want) > 0


def test_delta_session_config_strings_pinned():
    """Pin the dormant delta-spark session configs to the exact
    public-docs class names (delta.io quickstart). delta-spark is
    absent in-container so the branch never executes here — round-5
    verdict found a wrong catalog class that only a string pin can
    catch before a real deployment does."""
    from etl_deltalake_spark.session import DELTA_SESSION_CONFIGS

    assert DELTA_SESSION_CONFIGS == {
        "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
        "spark.sql.catalog.spark_catalog": (
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        ),
    }


def test_plans_md_covers_exactly_the_registered_queries():
    """PLANS.md is machine-generated per round (tools/gen_plans_md.py)
    — its row set must equal the driver registry, or the inventory has
    gone stale after a slot rotation (round-6 shipped a stale file)."""
    import re
    from pathlib import Path

    from etl_deltalake_spark.plans.registry import REGISTERED

    text = Path(__file__).resolve().parent.parent.joinpath("PLANS.md").read_text()
    rows = set(re.findall(r"^\| (q_\w+) \|", text, flags=re.M))
    assert rows == set(REGISTERED), (
        f"PLANS.md stale: missing={sorted(set(REGISTERED) - rows)} "
        f"extra={sorted(rows - set(REGISTERED))} — rerun tools/gen_plans_md.py"
    )


def test_casefold_inventory_outside_text_module():
    """Grep-backed İ-casefold inventory (round 8, carried from r6
    task #6): folded_lower (operators/text.py) is THE canonical
    lowercase for text-corpus columns. Every other lower() in the
    package must be on this documented allowlist with a reason —
    a new bare lower() on a text column fails here until it's
    either routed through folded_lower or explicitly exempted.

    Allowlisted exemptions:
     - operators/pii.py synth_email: reference-parity mirror of
       main.py:499's plain .lower() on a NAME column; oracle uses
       plain LOWER (see its docstring).
     - operators/pii.py faker variant: nondeterministic fidelity
       path, gated behind ImportError, not oracle-graded.
     - sources/files.py: lowercases an OPTION STRING ("true"/
       "false"), not data.
     - plans/oracles.py: Python-side .lower() on SCRIPT-NAME
       constants while building SQL text, not on data columns.
    """
    import re
    import subprocess
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / "etl_deltalake_spark"
    out = subprocess.run(
        ["grep", "-rn", r"F\.lower(\|\.lower()", str(pkg)],
        capture_output=True,
        text=True,
    ).stdout
    hits = []
    for line in out.splitlines():
        path, lineno, code = line.split(":", 2)
        rel = str(Path(path).relative_to(pkg))
        if rel == "operators/text.py":
            continue  # the canonical module itself
        if code.lstrip().startswith("#") or rel.endswith((".md", ".txt")):
            continue
        hits.append((rel, code.strip()))

    allowed = {
        # (file, substring that identifies the exempted site)
        ("operators/pii.py", "F.lower(F.regexp_replace"),
        ("operators/pii.py", "str(n).lower()"),
        ("operators/pii.py", "row[name].lower()"),  # docstring citation
        ("operators/pii.py", "plain ``.lower()``"),  # docstring text
        # bpe_encode's fold(): İ→i BEFORE lower — this IS
        # folded_lower's semantics, reimplemented Python-side for the
        # Arrow kernel (see the fold() comment in bpe.py)
        ("operators/bpe.py", 'replace("İ", "i").lower()'),
        ("sources/files.py", "str(header).lower()"),
        ("plans/oracles.py", "s.lower()"),
        # round-8 protocol-level case-insensitivity, NOT text-corpus
        # folding: URI schemes and hostnames are case-insensitive per
        # RFC 3986 (schemes are ASCII by grammar; non-ASCII hosts
        # arrive punycoded), and WARC/HTTP header NAMES are
        # case-insensitive per their specs — İ cannot legally occur
        # in any of these positions.
        ("operators/urls.py", "parts.scheme.lower()"),
        ("operators/urls.py", 'parts.hostname or "").lower()'),
        ("operators/urls.py", 'F.lower(F.parse_url(c, F.lit("HOST")))'),
        ("operators/warc.py", "name.strip().lower()"),
        # round-8 fourth wave:
        # q_collation deliberately SYNTHESIZES ASCII case variants of
        # c_mktsegment (upper/lower/initcap) and re-lowers the folded
        # group key — the case play IS the query's subject, mirrored
        # verbatim in its DuckDB oracle; these are not corpus-text
        # folds (c_mktsegment is ASCII by fixture construction).
        ("plans/queries_ext.py", 'F.lower("c_mktsegment")'),
        ("plans/queries_ext.py", 'F.lower(F.col("k")).alias("seg")'),
        # option-string normalization ("true"/"false"), the
        # sources/files.py precedent
        ("sources/http_source.py", '"false")).lower()'),
        # round-11 deltastream source: option strings and DDL type
        # KEYWORDS (bigint/double/...), never data columns
        ("sources/delta_stream.py", "t = ddl_type.lower()"),
        # round-14 Arrow fast path: the same DDL-type-keyword lower in
        # _pa_type_of (maps DDL tokens to Arrow types), never data
        ("sources/delta_stream.py", "t = ddl_type.strip().lower()"),
        # round-13 stats pruning: the same DDL-type-keyword lower in
        # delta_log._partition_value_typed (the batch twin of the
        # line above), never data columns
        ("sources/delta_log.py", "t = ddl_type.lower()"),
        ("sources/delta_stream.py", '"skipChangeCommits", "false").lower()'),
        ("sources/delta_stream.py", '"ignoreDeletes", "false").lower()'),
        # round-12 CDF streaming: the readChangeFeed OPTION STRING
        # ("true"/"false"), same class as the two above
        ("sources/delta_stream.py", '"readChangeFeed", "false").lower()'),
        # round-14 identity columns: the DDL type TOKEN of the target
        # column ("BIGINT" vs "bigint"), the sources/delta_stream.py
        # ddl_type precedent — never data columns
        ("sources/versioned.py", 't = (schema_cols[column] or "").lower()'),
    }
    unexpected = [
        (rel, code)
        for rel, code in hits
        if not any(rel == f and frag in code for f, frag in allowed)
    ]
    assert not unexpected, (
        "bare lower() outside operators/text.py not on the casefold "
        f"allowlist — route through folded_lower or exempt with a "
        f"documented reason: {unexpected}"
    )


def test_duck_pragmas_derived_with_env_override(monkeypatch):
    """Heavy-oracle pragmas derive from the box (cores/RAM) with env
    overrides, and every HEAVY_ORACLES entry actually carries them
    (the driver's fresh default connection only sees in-string SETs)."""
    from etl_deltalake_spark.plans import oracles as O

    for name in O.HEAVY_ORACLES:
        if name in O.ORACLES:
            assert O.ORACLES[name].lstrip().startswith("SET threads="), name

    monkeypatch.setenv("SPARK_GRAFT_DUCK_THREADS", "3")
    monkeypatch.setenv("SPARK_GRAFT_DUCK_MEM", "5GB")
    assert O._duck_pragmas() == "SET threads=3; SET memory_limit='5GB';\n"

    monkeypatch.delenv("SPARK_GRAFT_DUCK_THREADS")
    monkeypatch.delenv("SPARK_GRAFT_DUCK_MEM")
    import os
    derived = O._duck_pragmas()
    want_threads = max(2, min(8, (os.cpu_count() or 8) // 4))
    assert f"SET threads={want_threads};" in derived
    # memory stays within the co-tenancy band
    import re
    gb = int(re.search(r"memory_limit='(\d+)GB'", derived).group(1))
    assert 2 <= gb <= 24


def test_functions_module_round8_surface(spark):
    """The round-8 crawl/multimodal column functions compose from
    the public functions import like every other family."""
    from etl_deltalake_spark import functions as EF

    df = spark.createDataFrame(
        [(1, "<p>fish &amp; chips</p>", "HTTP://A.Example:80/x?b=2&a=1#f",
          "abc " * 50, 7, 5)],
        ["id", "page", "url", "text", "h1", "h2"],
    )
    row = df.select(
        EF.html_to_text("page").alias("txt"),
        EF.canonical_url("url").alias("canon"),
        EF.zlib_ratio("text").alias("zr"),
        EF.hamming64("h1", "h2").alias("hd"),
    ).head()
    assert row.txt == "fish & chips"
    assert row.canon == "http://a.example/x?a=1&b=2"
    assert 0.0 < row.zr < 0.3
    assert row.hd == 1  # 7 ^ 5 = 2 -> one bit


def test_global_window_inventory():
    """Grep-backed inventory of every partition-less Window in the
    package (round 9, VERDICT r8 Next #3 — the casefold-inventory
    pattern): a ``Window.orderBy(...)`` with no ``partitionBy`` is a
    single-task global sort, the one plan shape that cannot survive a
    100× scale-up. Every surviving site must be on this allowlist
    with a documented cardinality bound — each one runs AFTER a
    distributed ``orderBy().limit(k)`` (TakeOrderedAndProject:
    per-partition heaps, merged at k rows), so the Window's input is
    bounded by a constant, not by the corpus. A new unbounded global
    sort fails here until it is converted to the TakeOrdered-then-
    rank form or exempted with a bound.

    Round-9 conversions this gate pins: q_tpch_q15 (rank → 1-row max
    broadcast), q_copair / bm25_topk / ivfpq_topk / pq_adc_topk
    (rank-then-filter → limit-then-rank), q_rfm (three global ntiles
    → one percentile aggregate, no Window at all — see
    test_plan_shapes.test_rfm_plan_has_no_window).
    """
    import re
    import subprocess
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / "etl_deltalake_spark"
    out = subprocess.run(
        ["grep", "-rn", r"Window\.orderBy(", str(pkg)],
        capture_output=True,
        text=True,
    ).stdout
    hits = []
    for line in out.splitlines():
        path, lineno, code = line.split(":", 2)
        rel = str(Path(path).relative_to(pkg))
        stripped = code.strip()
        if stripped.startswith("#") or "``" in stripped:
            continue  # comments / docstring markup
        hits.append(rel)
    counts: dict[str, int] = {}
    for rel in hits:
        counts[rel] = counts.get(rel, 0) + 1

    allowed = {
        # bm25_topk: Window runs on orderBy().limit(k) output (≤k
        # rows, k=10 default) — rank assignment over the survivors
        "operators/search.py": 1,
        # ivfpq_topk + pq_adc_topk: Window on the ≤k ADC survivors
        # (post-limit); kmeans seeding: Window on the ≤k seed rows
        # (orderBy("id").limit(k) runs first)
        "operators/similarity.py": 3,
        # q_copair: Window on the ≤50 TakeOrdered survivors
        "plans/queries_ext.py": 1,
    }
    assert counts == allowed, (
        "partition-less Window.orderBy sites drifted from the "
        f"documented allowlist: found {counts}, allowed {allowed} — "
        "convert new sites to TakeOrdered-then-rank or exempt with a "
        "cardinality bound"
    )
