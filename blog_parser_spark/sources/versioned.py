"""Versioned snapshot tables on plain parquet — the Iceberg commit
mechanism (manifest + atomic pointer swap) rebuilt on the pieces this
sandbox has. Production target is Iceberg proper (sources/io.py
TABLE_FORMAT switch); this module exists so the snapshot/time-travel/
rollback SEMANTICS are implemented and tested, not just asserted.

Layout:
    root/data/v<N>/part-*.parquet   immutable per-commit data dirs
    root/meta/v<N>.json             manifest: dirs visible at version N
    root/meta/CURRENT               latest committed version pointer

Commit protocol (single writer; readers never block):
  1. write the new data dir COMPLETELY (Spark job finishes first);
  2. write manifest v<N>.json via temp-file + atomic rename;
  3. swap CURRENT via temp-file + atomic rename.
A crash before (2) leaves an orphan data dir no manifest references —
readers never see it, `vacuum()` collects it, the next commit just takes
the next version number. A crash between (2) and (3) leaves a committed-
but-not-current version — identical to a rollback target; the next
commit's manifest parents off CURRENT, so the orphan version stays
readable by explicit version until vacuumed.

Readers resolve CURRENT → manifest → fixed file list once, so every
query runs against an immutable snapshot (snapshot isolation) and old
versions stay readable forever (time travel) until `vacuum()`.

On a real object store the rename in (3) must be a single-key PUT
(S3 rename isn't atomic for directories — this protocol only renames
single FILES, which is atomic-enough via PUT-then-visible semantics;
Iceberg solves the same problem with a catalog swap).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _meta_dir(root: str) -> str:
    return os.path.join(root, "meta")


def _data_dir(root: str, v: int) -> str:
    return os.path.join(root, "data", f"v{v}")


def _atomic_write(path: str, payload: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def current_version(root: str) -> int | None:
    cur = os.path.join(_meta_dir(root), "CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        return int(f.read().strip())


def _read_manifest(root: str, v: int) -> dict:
    with open(os.path.join(_meta_dir(root), f"v{v}.json")) as f:
        return json.load(f)


def _next_version(root: str) -> int:
    """Next free version number — scans manifests AND data dirs, so a
    crash orphan (data written, no manifest) is skipped over instead of
    colliding with the next commit's write."""
    vs = [0]
    md = _meta_dir(root)
    if os.path.isdir(md):
        vs += [int(n[1:-5]) for n in os.listdir(md)
               if n.startswith("v") and n.endswith(".json")]
    dd = os.path.join(root, "data")
    if os.path.isdir(dd):
        vs += [int(n[1:]) for n in os.listdir(dd)
               if n.startswith("v") and n[1:].isdigit()]
    return max(vs) + 1


def commit(df: DataFrame, root: str, mode: str = "append") -> int:
    """Commit `df` as a new version. mode='append' makes the new version
    the parent's dirs + this commit's dir; mode='overwrite' makes it this
    commit's dir alone (logical replace — old files stay for time
    travel). Returns the new version number."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown commit mode {mode!r}")
    v = _next_version(root)
    ddir = _data_dir(root, v)
    df.write.mode("error").parquet(ddir)  # step 1: data fully down first
    n_rows = df.sparkSession.read.parquet(ddir).count()
    parent = current_version(root)
    dirs = [ddir] if (mode == "overwrite" or parent is None) else \
        _read_manifest(root, parent)["dirs"] + [ddir]
    os.makedirs(_meta_dir(root), exist_ok=True)
    manifest = {"version": v, "parent": parent, "op": mode,
                "dirs": dirs, "rows_added": n_rows}
    _atomic_write(os.path.join(_meta_dir(root), f"v{v}.json"),
                  json.dumps(manifest, indent=1))          # step 2
    _atomic_write(os.path.join(_meta_dir(root), "CURRENT"), str(v))  # step 3
    return v


def read_version(spark: SparkSession, root: str,
                 version: int | None = None) -> DataFrame:
    """Snapshot read: `version=None` resolves CURRENT once; any earlier
    version stays readable (time travel) until vacuumed."""
    v = current_version(root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version at {root}")
    return spark.read.parquet(*_read_manifest(root, v)["dirs"])


def rollback(root: str, version: int) -> None:
    """Point CURRENT back at an earlier version (pure pointer swap —
    no data is touched, the abandoned versions stay time-travelable)."""
    _read_manifest(root, version)  # raises if the target was never committed
    _atomic_write(os.path.join(_meta_dir(root), "CURRENT"), str(version))


def vacuum(root: str, keep_versions: int = 1) -> list[str]:
    """Drop data dirs unreachable from the last `keep_versions` manifests
    ending at CURRENT (and delete the orphaned manifests). Also collects
    crash orphans: data dirs no manifest ever referenced. Returns the
    deleted paths. Single-writer maintenance op, like compaction."""
    cur = current_version(root)
    if cur is None:
        return []
    keep_vs = []
    v: int | None = cur
    while v is not None and len(keep_vs) < keep_versions:
        if not os.path.exists(os.path.join(_meta_dir(root), f"v{v}.json")):
            break  # parent chain truncated by an earlier vacuum
        keep_vs.append(v)
        v = _read_manifest(root, v)["parent"]
    live = {d for kv in keep_vs for d in _read_manifest(root, kv)["dirs"]}
    deleted = []
    droot = os.path.join(root, "data")
    for name in sorted(os.listdir(droot)):
        p = os.path.join(droot, name)
        if p not in live:
            shutil.rmtree(p)
            deleted.append(p)
    md = _meta_dir(root)
    for name in sorted(os.listdir(md)):
        if name.startswith("v") and name.endswith(".json"):
            if int(name[1:-5]) not in keep_vs:
                os.remove(os.path.join(md, name))
                deleted.append(os.path.join(md, name))
    return deleted


def diff_versions(spark: SparkSession, root: str, v_from: int, v_to: int,
                  key_cols: list[str]) -> DataFrame:
    """Change-data-feed between two committed versions (the
    `table_changes` a lakehouse reader exposes): returns the table's
    columns plus `_change_type` in {insert, delete, update_preimage,
    update_postimage}.

    Append-chain fast path: when v_to's manifest is a superset of
    v_from's dirs (pure appends in between), the diff reads ONLY the new
    data dirs — O(delta), never a two-snapshot comparison; this is the
    incremental-scan shape that matters at 100 TB. Otherwise (an
    overwrite in the chain) it falls back to a key-joined snapshot
    compare: one full-outer join on the key, value structs compared
    null-safely; assumes keys are unique per snapshot (raises if not —
    a diff against duplicate keys is ambiguous)."""
    from pyspark.sql import functions as F

    mf_from = _read_manifest(root, v_from)
    mf_to = _read_manifest(root, v_to)
    if set(mf_from["dirs"]) <= set(mf_to["dirs"]):
        new_dirs = [d for d in mf_to["dirs"]
                    if d not in set(mf_from["dirs"])]
        base = read_version(spark, root, v_to)
        if not new_dirs:
            return (base.withColumn("_change_type", F.lit("insert"))
                    .limit(0))
        return (spark.read.parquet(*new_dirs)
                .withColumn("_change_type", F.lit("insert")))

    a = read_version(spark, root, v_from)
    b = read_version(spark, root, v_to)
    val_cols = [c for c in b.columns if c not in key_cols]
    for side, df in (("from", a), ("to", b)):
        dup = (df.groupBy(*key_cols).count().filter("count > 1"))
        if dup.limit(1).count():
            raise ValueError(
                f"duplicate keys in v_{side} snapshot — CDF is ambiguous")
    sa = a.select(*key_cols, F.struct(*val_cols).alias("_va"))
    sb = b.select(*key_cols, F.struct(*val_cols).alias("_vb"))
    j = sa.join(sb, key_cols, "full_outer")

    def emit(side: str, tag: str, cond):
        return (j.filter(cond)
                .select(*key_cols, f"_{side}.*")
                .withColumn("_change_type", F.lit(tag)))

    changed = (F.col("_va").isNotNull() & F.col("_vb").isNotNull()
               & ~F.col("_va").eqNullSafe(F.col("_vb")))
    return (emit("vb", "insert", F.col("_va").isNull())
            .unionByName(emit("va", "delete", F.col("_vb").isNull()))
            .unionByName(emit("va", "update_preimage", changed))
            .unionByName(emit("vb", "update_postimage", changed)))
