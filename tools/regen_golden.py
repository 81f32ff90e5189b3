"""Regenerate tests/data/golden_delta_log.json from the scripted
histories in tests/test_delta_log.py.

The golden fixture is the in-repo substitute for an external-reader
conformance run (delta-rs / duckdb-delta are uninstallable in this
container): it byte-pins the normalized Delta action stream the
writer emits, so any later change to action shapes is a DELIBERATE,
reviewed regeneration — run this script, eyeball the diff, commit
both. Never regenerate to paper over an unexplained mismatch.

Usage: python tools/regen_golden.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    import pyarrow.parquet as pq

    from etl_deltalake_spark.session import get_spark
    from etl_deltalake_spark.sources import delta_log as DL
    from etl_deltalake_spark.sources.versioned import versioned_table
    import test_delta_log as T

    spark = get_spark("regen-golden")
    tmp = tempfile.mkdtemp(prefix="golden_")
    golden: dict = {}

    # ---- main table script (unchanged history since round 11/12) --
    vt = versioned_table(spark, f"{tmp}/dl", use_delta=False)
    T._golden_script(spark, vt)
    golden["json_actions"] = T._normalize_stream(spark, vt.path)

    ck = f"{vt.path}/_delta_log/{9:020d}.checkpoint.parquet"
    local = ck[len("file:"):] if ck.startswith("file:") else ck
    sch = pq.read_schema(local)
    fields = {}
    for i in range(len(sch.names)):
        fld = sch.field(i)
        fields[fld.name] = (
            sorted(sf.name for sf in fld.type)
            if str(fld.type).startswith("struct")
            else str(fld.type)
        )
    golden["checkpoint_struct_fields"] = fields
    rows = pq.read_table(local).to_pylist()
    golden["checkpoint_row_kinds"] = sorted(
        next(
            k
            for k in ("protocol", "metaData", "add", "remove", "txn")
            if r.get(k) is not None
        )
        for r in rows
    )
    assert DL.cleanup_log(spark, vt.path) == 9
    golden["surviving_json_versions"] = sorted(
        {v for v, _ in DL.delta_log_actions(spark, vt.path)}
    )

    # ---- round-13 tail: CDF + clone + v2 manifest + multipart -----
    t = T._golden_script_cdf(spark, f"{tmp}/gcdf")
    golden["cdf_json_actions"] = T._normalize_stream(spark, t.path)

    DL.shallow_clone(
        spark, t.path, f"{tmp}/gclone",
        timestamp="2026-02-10T00:00:00", version=1,
    )
    golden["clone_json_actions"] = T._normalize_stream(
        spark, f"{tmp}/gclone", src=t.path
    )

    DL._CHECKPOINT_PART_MAX = 4
    tv2 = versioned_table(
        spark, f"{tmp}/gv2", use_delta=False, v2_checkpoints=True
    )
    for i in range(10):
        tv2.write(
            spark.createDataFrame(
                [(i, f"r{i}")], "id long, val string"
            ).coalesce(1),
            timestamp=f"2026-03-{i + 1:02d}T00:00:00",
        )
    log = f"{tv2.path}/_delta_log".replace("file:", "")
    manifest = next(
        n for n in os.listdir(log)
        if len(n.split(".")) == 4
        and n.split(".")[1] == "checkpoint"
        and n.endswith(".json")
    )
    with open(f"{log}/{manifest}", encoding="utf-8") as f:
        golden["v2_manifest_actions"] = T._normalize_manifest(f)

    tmp_t = versioned_table(spark, f"{tmp}/gmp", use_delta=False)
    for i in range(10):
        tmp_t.write(
            spark.createDataFrame(
                [(i, f"r{i}")], "id long, val string"
            ).coalesce(1),
            timestamp=f"2026-04-{i + 1:02d}T00:00:00",
        )
    mlog = f"{tmp_t.path}/_delta_log".replace("file:", "")
    golden["multipart_checkpoint_files"] = sorted(
        n for n in os.listdir(mlog)
        if not n.startswith(".")
        and ".checkpoint." in n
        and n.endswith(".parquet")
        and len(n.split(".")) == 5
    )

    # ---- round-14 tail: identity + generated metadata, REORG PURGE
    # shapes, and the swept two-generation checkpoint layout --------
    t14 = T._golden_script_r14(spark, f"{tmp}/g14")
    golden["r14_json_actions"] = T._normalize_stream(spark, t14.path)
    golden["r14_swept_json_count"] = DL.cleanup_log(spark, t14.path)
    mlog14 = f"{t14.path}/_delta_log".replace("file:", "")
    golden["r14_swept_checkpoint_files"] = sorted(
        n
        for n in os.listdir(mlog14)
        if ".checkpoint." in n and not n.startswith(".")
    )
    golden["r14_surviving_json_versions"] = sorted(
        {v for v, _ in DL.delta_log_actions(spark, t14.path)}
    )
    with open(f"{mlog14}/_last_checkpoint", encoding="utf-8") as f:
        golden["r14_last_checkpoint_version"] = json.load(f)["version"]

    # ---- round-14 third wave: row tracking + clustering shapes ----
    t14b = T._golden_script_r14b(spark, f"{tmp}/g14b")
    golden["r14b_json_actions"] = T._normalize_stream(spark, t14b.path)

    out = os.path.join(REPO, "tests", "data", "golden_delta_log.json")
    with open(out, "w", encoding="utf-8") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}")
    for k, v in golden.items():
        n = len(v) if isinstance(v, (list, dict)) else v
        print(f"  {k}: {n}")


if __name__ == "__main__":
    main()
