"""Lance-preferred, Parquet-fallback table IO + checkpoint manifests.

The north rule stores image+caption rows in Lance tables. This Ray
version (2.49.2) exposes ``read_lance``/``write_lance`` but the
``pylance`` package is not installed in this container, so the seam
prefers Lance when importable and falls back to Parquet with the
identical Arrow schema (SURVEY §7). All call sites go through here —
swapping the format is a one-line config change on a real cluster.

Checkpoints: every stage output directory gets a ``lineage.json``
manifest (stage name, config digest, row count, schema, wall time) —
the per-partition lineage/metrics the resumability criterion requires.
A checkpoint is valid iff its manifest exists and the config digest
matches; resume = skip stages with valid checkpoints.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


FORMAT = "lance" if lance_available() else "parquet"


def shared_scratch_dir(name: str) -> str:
    """A scratch directory EVERY node of the cluster can read — for
    intermediate tables that distributed actors re-open by path (e.g.
    embedding_neardup's chunk store).

    On a real cluster set ``$KIT_RAY_SHARED_DIR`` to a shared mount or
    object-store URI; unset, we fall back to ``/tmp``, which is
    node-local and therefore valid ONLY single-node — asserted against
    the live cluster so a multi-node run fails loudly instead of
    silently reading empty directories on remote nodes."""
    root = os.environ.get("KIT_RAY_SHARED_DIR")
    if root is None:
        try:
            import ray

            alive = [n for n in ray.nodes() if n.get("Alive")]
        except Exception:  # pragma: no cover - no ray session yet
            alive = []
        if len(alive) > 1:  # pragma: no cover - single-node sandbox
            raise RuntimeError(
                "KIT_RAY_SHARED_DIR must point at shared storage "
                "(NFS mount / object-store URI) on a multi-node "
                "cluster; the /tmp fallback is node-local."
            )
        root = "/tmp"
    path = os.path.join(root, name)
    os.makedirs(path, exist_ok=True)
    return path


def write_dataset(ds, path: str, *, partition_cols=None):
    """Write a ray.data.Dataset to ``path`` in the preferred format."""
    if FORMAT == "lance":
        ds.write_lance(path)  # pragma: no cover - no pylance in sandbox
    else:
        ds.write_parquet(path, partition_cols=partition_cols)


def read_dataset(path: str):
    import ray.data as rd

    if FORMAT == "lance":
        return rd.read_lance(path)  # pragma: no cover
    return rd.read_parquet(path)


def write_table(table: pa.Table, path: str):
    """Driver-side small-table write (robots cache, order metadata)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(table, path)


def read_table(path: str) -> pa.Table:
    return pq.read_table(path)


# ---------------------------------------------------------------------------
# Checkpoint manifests
# ---------------------------------------------------------------------------

def manifest_path(dir_path: str) -> str:
    # Leading underscore: pyarrow/Ray dataset readers treat the file as
    # hidden, so the manifest can live inside the data directory.
    return os.path.join(dir_path, "_lineage.json")


def write_manifest(dir_path: str, *, stage: str, digest: str, rows: int,
                   schema: list[str], started: float, extra: dict | None = None,
                   ended: float | None = None):
    """``ended`` pins the stage's COMPUTE end time when the manifest is
    written later by an overlapped background writer — otherwise the
    wall_time_s diagnostic (read by bench.py per stage) would be
    inflated by whatever ran concurrently with the write."""
    os.makedirs(dir_path, exist_ok=True)
    m = {
        "stage": stage,
        "config_digest": digest,
        "rows": rows,
        "schema": schema,
        "wall_time_s": round((ended or time.time()) - started, 3),
        "completed_at": time.time(),
    }
    if extra:
        m.update(extra)
    tmp = manifest_path(dir_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1)
    os.replace(tmp, manifest_path(dir_path))  # atomic completion marker
    return m


def valid_checkpoint(dir_path: str, digest: str) -> dict | None:
    """Return the manifest if ``dir_path`` holds a completed checkpoint
    for this config, else None (stale/partial output is removed)."""
    p = manifest_path(dir_path)
    if not os.path.exists(p):
        if os.path.isdir(dir_path):
            shutil.rmtree(dir_path)  # partial output from a crashed run
        return None
    try:
        with open(p) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        shutil.rmtree(dir_path)
        return None
    if m.get("config_digest") != digest:
        shutil.rmtree(dir_path)
        return None
    return m


def strip_schema_metadata(ds):
    """Zero-copy strip of block schema metadata right after a read.

    Pandas-written parquet files carry ``b'pandas'`` footer metadata
    whose nested dict makes ``pa.Schema`` unhashable: every downstream
    hash join / sort / repartition over such blocks logs ``Failed to
    hash the schemas (for deduplication)`` per block and ships
    redundant schema bytes with each shuffle message. ``batch_size=
    None`` keeps blocks whole so this fuses with the read and copies
    nothing.
    """
    return ds.map_batches(
        lambda t: (t.replace_schema_metadata(None)
                   if t.schema.metadata else t),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
