"""CSV / JSONL ingestion with corrupt-record quarantine
(sources/files.py): the load must be TOTAL — every input line lands
in exactly one of (clean, quarantine) — with clean values parsed
exactly and raw offending lines preserved for audit."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_deltalake_spark.sources.catalog import load_table
from etl_deltalake_spark.sources.files import (
    read_csv,
    read_jsonl,
    split_corrupt,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]
)


def test_jsonl_split(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    lines = [
        '{"id": 1, "name": "a", "score": 1.5}',
        'this is not json at all',
        '{"id": 2, "name": "b", "score": 2.25}',
        '{"id": "NOT_A_NUMBER", "name": "c", "score": 3.0}',
        '{"id": 4, "name": "d"}',  # missing field -> null, still clean
    ]
    p.write_text("\n".join(lines) + "\n")
    clean, bad = split_corrupt(read_jsonl(spark, str(p), SCHEMA))
    got = {r["id"]: (r["name"], r["score"]) for r in clean.collect()}
    assert got == {1: ("a", 1.5), 2: ("b", 2.25), 4: ("d", None)}
    raw = sorted(r["raw_line"] for r in bad.collect())
    assert raw == sorted([lines[1], lines[3]])
    # total: every line in exactly one side
    assert clean.count() + bad.count() == len(lines)


def test_csv_split(spark, tmp_path):
    p = tmp_path / "data.csv"
    rows = [
        "id,name,score",
        "1,a,1.5",
        "2,b,not_a_double",
        "3,c,3.75",
    ]
    p.write_text("\n".join(rows) + "\n")
    clean, bad = split_corrupt(
        read_csv(spark, str(p), SCHEMA, header=True)
    )
    got = {r["id"]: (r["name"], r["score"]) for r in clean.collect()}
    assert got == {1: ("a", 1.5), 3: ("c", 3.75)}
    assert [r["raw_line"] for r in bad.collect()] == ["2,b,not_a_double"]


def test_clean_branch_prunes_corrupt_column(spark, tmp_path):
    p = tmp_path / "d2.jsonl"
    p.write_text('{"id": 1, "name": "x", "score": 0.5}\n')
    clean, _ = split_corrupt(read_jsonl(spark, str(p), SCHEMA))
    assert "_corrupt_record" not in clean.columns
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan


def test_columnar_roundtrip_both_formats(spark, sf_dir, tmp_path):
    """ORC and Parquet round-trip byte-identical row sets (native
    Spark support, no packages)."""
    from etl_deltalake_spark.sources.files import (
        read_columnar,
        write_columnar,
    )

    src = load_table(spark, "nation", sf_dir)
    want = sorted(tuple(r) for r in src.collect())
    for fmt in ("orc", "parquet"):
        path = str(tmp_path / f"col_{fmt}")
        write_columnar(src, path, fmt=fmt)
        got = sorted(tuple(r) for r in read_columnar(spark, path, fmt=fmt).collect())
        assert got == want


def test_columnar_partition_layout_prunes(spark, sf_dir, tmp_path):
    """partitionBy writes hive-style directories and an equality
    filter touches ONLY the matching partition's files."""
    from etl_deltalake_spark.operators.partitioning import files_touched
    from etl_deltalake_spark.sources.files import (
        read_columnar,
        write_columnar,
    )

    src = load_table(spark, "nation", sf_dir)
    path = str(tmp_path / "part_orc")
    write_columnar(src, path, fmt="orc", partition_by=["n_regionkey"])
    full = read_columnar(spark, path, fmt="orc")
    pruned = full.filter(F.col("n_regionkey") == 0)
    assert pruned.count() == src.filter(F.col("n_regionkey") == 0).count()
    assert files_touched(pruned) < files_touched(full)


def test_columnar_corrupt_file_quarantine(spark, sf_dir, tmp_path):
    """The file-level quarantine posture: a garbage file in the scan
    directory kills the strict read but is skipped (rows intact from
    good files) with ignore_corrupt_files=True."""
    import pytest

    from etl_deltalake_spark.sources.files import (
        read_columnar,
        write_columnar,
    )

    src = load_table(spark, "region", sf_dir)
    path = str(tmp_path / "quar_orc")
    write_columnar(src, path, fmt="orc")
    n = src.count()
    # splice a torn file into the directory
    (tmp_path / "quar_orc" / "part-junk.orc").write_bytes(b"ORC\x00garbage")

    with pytest.raises(Exception, match="(?i)orc|corrupt|malformed"):
        read_columnar(spark, path, fmt="orc", schema=src.schema).count()
    got = read_columnar(
        spark, path, fmt="orc", schema=src.schema, ignore_corrupt_files=True
    )
    assert got.count() == n


def test_xml_split(spark, tmp_path):
    """XML leg (round 8, Spark 4 native XML source): one record per
    rowTag element, typed fields from child elements, type-corrupt
    elements quarantined with their raw text — the same total-load
    contract as the CSV/JSONL legs."""
    from etl_deltalake_spark.sources.files import read_xml

    p = tmp_path / "data.xml"
    p.write_text(
        "<rows>"
        "<row><id>1</id><name>a</name><score>1.5</score></row>"
        "<row><id>oops</id><name>b</name><score>2.0</score></row>"
        "<row><id>3</id><name>c</name><score>3.75</score></row>"
        "<row><id>4</id><name>d</name></row>"
        "</rows>"
    )
    clean, bad = split_corrupt(read_xml(spark, str(p), "row", SCHEMA))
    got = {r["id"]: (r["name"], r["score"]) for r in clean.collect()}
    assert got == {1: ("a", 1.5), 3: ("c", 3.75), 4: ("d", None)}
    raws = [r["raw_line"] for r in bad.collect()]
    assert len(raws) == 1 and "oops" in raws[0]
    assert clean.count() + bad.count() == 4


def test_xml_nested_attributes(spark, tmp_path):
    """Attributes (_attr convention) and nested structs parse typed —
    the shapes real vendor XML actually uses."""
    from pyspark.sql.types import StructType as ST, StructField as SF
    from etl_deltalake_spark.sources.files import read_xml

    p = tmp_path / "nested.xml"
    p.write_text(
        "<feed>"
        '<item kind="x"><meta><n>7</n></meta></item>'
        '<item kind="y"><meta><n>9</n></meta></item>'
        "</feed>"
    )
    schema = ST(
        [
            SF("_kind", StringType()),
            SF("meta", ST([SF("n", LongType())])),
        ]
    )
    clean, bad = split_corrupt(read_xml(spark, str(p), "item", schema))
    rows = sorted((r["_kind"], r["meta"]["n"]) for r in clean.collect())
    assert rows == [("x", 7), ("y", 9)]
    assert bad.count() == 0


def test_httpjson_datasource_parallel_pages(spark, tmp_path):
    """Spark 4 Python DataSource leg (round 8, sources/http_source):
    one InputPartition per page URL (executor-side parallel fetch —
    the 100 TB form of the reference's driver loop), stringly fields
    + _src provenance, envelope unwrap, and lenient page quarantine
    (a broken page yields one all-null row, not a dead job)."""
    import json

    from etl_deltalake_spark.sources.http_source import HttpJsonDataSource

    spark.dataSource.register(HttpJsonDataSource)
    p1 = tmp_path / "page1.json"
    p1.write_text(json.dumps({"data": [
        {"id": 1, "name": "btc", "price_usd": "97000.1"},
        {"id": 2, "name": "eth", "price_usd": None},
    ]}))
    p2 = tmp_path / "page2.json"
    p2.write_text(json.dumps({"data": [{"id": 3, "name": "sol"}]}))
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    urls = ";".join(f"file://{p}" for p in (p1, p2, bad))
    df = (
        spark.read.format("httpjson")
        .option("urls", urls)
        .option("fields", "id,name,price_usd")
        .option("data_key", "data")
        .option("lenient", "true")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # one per page
    rows = df.collect()
    got = sorted(
        ((r["id"], r["name"], r["price_usd"]) for r in rows), key=str
    )
    assert ("1", "btc", "97000.1") in got
    assert ("2", "eth", None) in got          # null field survives
    assert ("3", "sol", None) in got          # missing field -> null
    quarantined = [r for r in rows if r["id"] is None]
    assert len(quarantined) == 1
    assert quarantined[0]["_src"].endswith("bad.json")
    assert len(rows) == 4


def test_httpjson_datasource_strict_mode_raises(spark, tmp_path):
    """Without lenient=true a broken page must fail the read loudly
    (silent drop is the one forbidden outcome)."""
    import pytest as _pytest

    from etl_deltalake_spark.sources.http_source import HttpJsonDataSource

    spark.dataSource.register(HttpJsonDataSource)
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    df = (
        spark.read.format("httpjson")
        .option("urls", f"file://{bad}")
        .option("fields", "id")
        .load()
    )
    # PySpark 4 rethrows the Python worker's exception natively
    with _pytest.raises(Exception, match="Expecting property name"):
        df.collect()


def test_jsonl_manifest_sink_two_phase_commit(spark, tmp_path):
    """The writer leg of the DataSource (round 8): tasks write
    UUID-named files, the driver's commit publishes an atomic
    manifest naming exactly the committed files — so a stray file
    from a dead/retried task is INVISIBLE to manifest readers. Round
    trip must preserve all rows; the planted orphan file must not
    leak into the read."""
    from etl_deltalake_spark.sources.http_source import (
        HttpJsonDataSource,
        read_jsonl_manifest,
    )

    spark.dataSource.register(HttpJsonDataSource)
    df = spark.range(100).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS bucket"
    ).repartition(4)
    out = str(tmp_path / "sink")
    df.write.format("httpjson").option("path", out).mode("append").save()

    # simulate a dead task's leftover: a data-shaped file the commit
    # never published
    (tmp_path / "sink" / "part-deadtask.jsonl").write_text(
        '{"id": 99999, "bucket": "x"}\n'
    )
    got, total = read_jsonl_manifest(spark, out)
    assert total == 100
    assert got.count() == 100
    ids = {r["id"] for r in got.collect()}
    assert ids == set(range(100))
    assert 99999 not in ids  # orphan invisible
