"""Structured Streaming source over a REAL Delta transaction log.

``sources/cdf_source.py`` streams the CUSTOM VersionedTable log; this
module is its spec twin: ``spark.readStream.format("deltastream")
.option("path", <table>)`` tails any spec-conformant ``_delta_log`` —
a table this repo mirrored OR a foreign table written by delta-spark /
delta-rs — without delta-spark installed. Reference analogue: the
reference engine reads its stored Delta tables (main.py:414,465); the
streaming form is delta-spark's ``readStream.format("delta")``, whose
public semantics this reimplements:

- the FIRST batch is the table's current snapshot (all live files,
  deletion-vector masks applied), exactly delta-spark's
  initial-snapshot behavior; ``startingVersion`` (an int, or
  ``"latest"``) replays the commit tail instead;
- each later batch covers the commit versions that landed since the
  engine-checkpointed offset; only APPEND commits stream;
- a commit that removes or rewrites data (overwrite, DV DELETE /
  UPDATE, merge) REFUSES by default — the delta-spark "Detected a
  data update" contract, because silently streaming a rewrite
  duplicates rows downstream; ``skipChangeCommits=true`` skips such
  commits wholesale (the public escape hatch), and ``ignoreDeletes=
  true`` permits delete-ONLY commits (removes, no adds) to be
  skipped;
- ``dataChange=false`` commits (OPTIMIZE) are invisible.

Scope matches cdf_source: file-scheme table roots (planner walks the
log with plain file I/O; executors read parquet via pyarrow in Python
workers). Deletion vectors are decoded in-worker from the descriptor
(inline / UUID sidecar / absolute path). Column mapping is REFUSED
honestly (physical-name scans need the JVM reader — use
``delta_log.read_delta`` for batch reads of such tables); genuinely
unknown reader features refuse with the feature name.

Register per session: ``spark.dataSource.register(
DeltaStreamDataSource)``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_DELTA_DIR = "_delta_log"


def _local(path: str) -> str:
    for prefix in ("file://", "file:"):
        if path.startswith(prefix):
            return path[len(prefix):]
    return path


def _log_versions(root: str) -> list[int]:
    log_dir = os.path.join(_local(root), _DELTA_DIR)
    if not os.path.isdir(log_dir):
        return []
    return sorted(
        int(n[:-5])
        for n in os.listdir(log_dir)
        if n.endswith(".json") and n[:-5].isdigit()
    )


def _commit_actions(root: str, version: int) -> list[dict]:
    p = os.path.join(
        _local(root), _DELTA_DIR, f"{version:020d}.json"
    )
    with open(p, encoding="utf-8") as f:
        return [json.loads(line) for line in f if line.strip()]


def _checkpoint_actions_py(root: str) -> tuple[int, list[dict]] | None:
    """(checkpoint version, action dicts) from ``_last_checkpoint``,
    resolved across the classic / multi-part / v2-named layouts with
    pyarrow — the pure-Python twin of ``delta_log.checkpoint_actions``
    (this module's planner has no SparkSession)."""
    import pyarrow.parquet as pq

    log = os.path.join(_local(root), _DELTA_DIR)
    lc = os.path.join(log, "_last_checkpoint")
    if not os.path.exists(lc):
        return None
    with open(lc, encoding="utf-8") as f:
        ckpt = json.load(f)
    v = int(ckpt["version"])
    v20 = f"{v:020d}"

    def rows(path: str) -> list[dict]:
        return [
            {k: val for k, val in r.items() if val is not None}
            for r in pq.read_table(path).to_pylist()
        ]

    parts = ckpt.get("parts")
    if parts:
        out: list[dict] = []
        for i in range(int(parts)):
            out.extend(
                rows(
                    os.path.join(
                        log,
                        f"{v20}.checkpoint.{i + 1:010d}"
                        f".{int(parts):010d}.parquet",
                    )
                )
            )
        return v, out
    classic = os.path.join(log, f"{v20}.checkpoint.parquet")
    if os.path.exists(classic):
        return v, rows(classic)
    manifest = None
    for name in os.listdir(log):
        seg = name.split(".")
        if (
            len(seg) == 4
            and seg[0] == v20
            and seg[1] == "checkpoint"
            and seg[3] in ("parquet", "json")
        ):
            manifest = name
    if manifest is None:
        raise ValueError(
            f"{root}: _last_checkpoint names version {v} but no "
            "checkpoint file exists for it"
        )
    if manifest.endswith(".json"):
        with open(os.path.join(log, manifest), encoding="utf-8") as f:
            raw = [json.loads(line) for line in f if line.strip()]
    else:
        raw = rows(os.path.join(log, manifest))
    out = []
    for a in raw:
        if a.get("sidecar") is not None:
            out.extend(
                rows(os.path.join(log, "_sidecars", a["sidecar"]["path"]))
            )
        elif a.get("checkpointMetadata") is None:
            out.append(a)
    return v, out


_READER_FEATURES_OK = {
    "deletionVectors",
    "timestampNtz",
    "v2Checkpoint",
    "typeWidening",
    "typeWidening-preview",
    "vacuumProtocolCheck",
    "variantType",
    "variantType-preview",
}


def _snapshot_py(root: str, version: int | None = None) -> dict:
    """Pure-Python snapshot replay (checkpoint + JSON tail, or JSON
    from 0 for time travel below the checkpoint): {"version",
    "schema_json", "protocol", "partition_columns", "adds": [add
    dicts, path-ordered]} — refusing honestly when log retention
    removed a needed commit, same contract as delta_snapshot."""
    live: dict[str, dict] = {}
    schema_json = None
    partition_columns: list[str] = []
    protocol: dict | None = None
    tip = -1
    tail_from = 0
    ck = _checkpoint_actions_py(root)
    if ck is not None and version is not None and ck[0] > version:
        ck = None
    if ck is not None:
        tip, actions = ck
        tail_from = tip + 1
        for a in actions:
            if a.get("protocol") is not None:
                protocol = a["protocol"]
            if a.get("metaData") is not None:
                schema_json = a["metaData"]["schemaString"]
                partition_columns = list(
                    a["metaData"].get("partitionColumns") or []
                )
            if a.get("add") is not None:
                live[a["add"]["path"]] = a["add"]
            if a.get("remove") is not None:
                live.pop(a["remove"]["path"], None)
    versions = [v for v in _log_versions(root) if v >= tail_from]
    if version is not None:
        missing = sorted(set(range(tail_from, version + 1)) - set(versions))
        if missing:
            raise ValueError(
                f"{root}: cannot stream from version {version} — commit "
                f"files {missing} were removed by log retention"
            )
        versions = [v for v in versions if v <= version]
    for v in versions:
        tip = max(tip, v)
        for a in _commit_actions(root, v):
            if "metaData" in a:
                schema_json = a["metaData"]["schemaString"]
                partition_columns = list(
                    a["metaData"].get("partitionColumns") or []
                )
            elif "protocol" in a:
                protocol = a["protocol"]
            elif "add" in a:
                live[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                live.pop(a["remove"]["path"], None)
    if tip < 0:
        raise ValueError(f"{root} has no _delta_log commits")
    return {
        "version": tip,
        "schema_json": schema_json,
        "protocol": protocol,
        "partition_columns": partition_columns,
        "adds": [live[k] for k in sorted(live)],
    }


def _check_protocol(root: str, snap: dict) -> None:
    proto = snap.get("protocol") or {}
    mrv = int(proto.get("minReaderVersion", 1))
    feats = set(proto.get("readerFeatures") or []) if mrv >= 3 else set()
    if mrv == 2 or "columnMapping" in feats:
        # honest refusal: physical-name scans need the JVM reader
        raise ValueError(
            f"{root}: column mapping is not supported by the "
            "deltastream source — read batches via "
            "delta_log.read_delta instead"
        )
    unsupported = sorted(feats - _READER_FEATURES_OK - {"columnMapping"})
    if unsupported or mrv > 3:
        raise ValueError(
            f"{root} requires unsupported reader features "
            f"{unsupported or mrv}"
        )


def _dv_positions_py(root: str, desc: dict) -> set[int]:
    import base64
    import uuid as _uuid

    from etl_deltalake_spark.sources.delta_log import (
        roaring_array_positions,
    )

    st = desc["storageType"]
    if st == "i":
        data = base64.b85decode(desc["pathOrInlineDv"])
    elif st in ("u", "p"):
        if st == "u":
            enc = desc["pathOrInlineDv"]
            prefix, enc_uuid = enc[:-20], enc[-20:]
            u = _uuid.UUID(bytes=base64.b85decode(enc_uuid))
            path = os.path.join(
                _local(root), prefix, f"deletion_vector_{u}.bin"
            )
        else:
            path = _local(desc["pathOrInlineDv"])
        with open(path, "rb") as f:
            raw = f.read()
        off = int(desc["offset"])
        size = int.from_bytes(raw[off : off + 4], "big")
        data = raw[off + 4 : off + 4 + size]
    else:
        raise ValueError(f"unknown deletionVector storageType {st!r}")
    return set(roaring_array_positions(data))


def _partition_value(raw: str | None, ddl_type: str):
    """Spec partitionValues are strings; inject them as typed Python
    values per the schema (the serialization rules of PROTOCOL.md
    "Partition Value Serialization")."""
    if raw is None or raw == "":
        return None
    t = ddl_type.lower()
    if t in ("tinyint", "smallint", "int", "bigint", "long", "integer"):
        return int(raw)
    if t in ("float", "double"):
        return float(raw)
    if t == "boolean":
        return raw == "true"
    if t == "date":
        import datetime

        return datetime.date.fromisoformat(raw)
    return raw


class DeltaFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        version: int,
        dv: dict | None,
        partition_values: dict,
    ):
        self.path = path
        self.version = version
        self.dv = dv
        self.partition_values = partition_values


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, options, fields: list[tuple[str, str]]):
        self.root = options.get("path", "")
        if not self.root:
            raise ValueError("deltastream requires the 'path' option")
        self.fields = fields  # (name, ddl type) of the TABLE schema
        self.skip_change = (
            options.get("skipChangeCommits", "false").lower() == "true"
        )
        self.ignore_deletes = (
            options.get("ignoreDeletes", "false").lower() == "true"
        )
        self.starting = options.get("startingVersion")

    # offset {"version": V, "initial": bool}: V = last consumed
    # commit version; initial=True means the snapshot AS OF V still
    # has to stream (it becomes the first batch).
    def initialOffset(self):
        if self.starting is None:
            return {"version": -1, "initial": True}
        if str(self.starting) == "latest":
            snap = _snapshot_py(self.root)
            return {"version": snap["version"], "initial": False}
        return {"version": int(self.starting) - 1, "initial": False}

    def latestOffset(self):
        versions = _log_versions(self.root)
        ck = None
        if not versions:
            ck = _checkpoint_actions_py(self.root)
        tip = versions[-1] if versions else (ck[0] if ck else -1)
        return {"version": tip, "initial": False}

    def partitions(self, start, end):
        hi = end["version"]
        parts: list[DeltaFilePartition] = []
        if start.get("initial"):
            # initial snapshot AS OF `hi` — all live files, masks on
            snap = _snapshot_py(self.root, version=hi)
            _check_protocol(self.root, snap)
            for a in snap["adds"]:
                parts.append(self._part(a, hi))
            return parts
        lo = start["version"]
        snap = _snapshot_py(self.root)
        _check_protocol(self.root, snap)
        in_range = [v for v in _log_versions(self.root) if lo < v <= hi]
        missing = sorted(set(range(lo + 1, hi + 1)) - set(in_range))
        if missing:
            # a Delta log is contiguous by construction — a gap means
            # log retention deleted commits the stream still needs
            raise ValueError(
                f"{self.root}: commit files {missing} were removed by "
                "log retention — the stream cannot resume from "
                f"version {lo + 1}"
            )
        for v in in_range:
            actions = _commit_actions(self.root, v)
            adds = [
                a["add"]
                for a in actions
                if a.get("add") is not None and a["add"].get("dataChange", True)
            ]
            removes = [
                a["remove"]
                for a in actions
                if a.get("remove") is not None
                and a["remove"].get("dataChange", True)
            ]
            if not adds and not removes:
                continue  # OPTIMIZE / metadata-only commit
            if removes:
                if self.skip_change:
                    continue
                if not adds and self.ignore_deletes:
                    continue
                op = ""
                for a in actions:
                    if a.get("commitInfo") is not None:
                        op = a["commitInfo"].get("operation", "")
                raise ValueError(
                    f"deltastream: version {v} ({op or 'unknown op'}) "
                    "removes or rewrites data — streaming it would "
                    "duplicate or lose rows downstream. Set "
                    "skipChangeCommits=true to skip such commits"
                    + (
                        ""
                        if adds
                        else ", or ignoreDeletes=true for delete-only"
                        " commits"
                    )
                )
            for a in adds:
                parts.append(self._part(a, v))
        return parts

    def _part(self, add: dict, version: int) -> DeltaFilePartition:
        return DeltaFilePartition(
            os.path.join(_local(self.root), add["path"]),
            version,
            add.get("deletionVector"),
            dict(add.get("partitionValues") or {}),
        )

    def read(self, part: DeltaFilePartition):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(part.path)
        present = set(pf.schema_arrow.names)
        wanted = [n for n, _ in self.fields if n in present]
        table = pf.read(columns=wanted)
        by_name = {n: table.column(n).to_pylist() for n in wanted}
        n_rows = table.num_rows
        cols = []
        for name, ddl_type in self.fields:
            if name in by_name:
                cols.append(by_name[name])
            elif name in part.partition_values:
                val = _partition_value(
                    part.partition_values.get(name), ddl_type
                )
                cols.append([val] * n_rows)
            else:  # pre-schema-evolution file: null fill
                cols.append([None] * n_rows)
        masked = (
            _dv_positions_py(self.root, part.dv) if part.dv else None
        )
        for i, row in enumerate(zip(*cols) if cols else ()):
            if masked is not None and i in masked:
                continue
            yield (*row, part.version)

    def commit(self, end):
        pass  # offsets live in the engine checkpoint


class DeltaStreamDataSource(DataSource):
    """``format("deltastream")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "deltastream"

    def _table_fields(self) -> list[tuple[str, str]]:
        from pyspark.sql.types import StructType

        root = self.options.get("path", "")
        snap = _snapshot_py(root)
        # fail at load(), not first batch: an unsupported protocol
        # means the declared schema would be wrong
        _check_protocol(root, snap)
        if snap["schema_json"] is None:
            raise ValueError("deltastream: table has no metaData action")
        struct = StructType.fromJson(json.loads(snap["schema_json"]))
        return [(f.name, f.dataType.simpleString()) for f in struct.fields]

    def schema(self) -> str:
        cols = ", ".join(f"`{n}` {t}" for n, t in self._table_fields())
        return f"{cols}, `_commit_version` bigint"

    def streamReader(self, schema) -> DeltaStreamReader:
        return DeltaStreamReader(self.options, self._table_fields())
