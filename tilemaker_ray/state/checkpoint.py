"""Per-partition checkpointing with lineage + row-count metrics.

The reference has no checkpointing (its closest feature is ``--merge``,
which re-reads an existing archive and replays finished tiles,
/root/reference/src/tilemaker.cpp:112-127, docs/RUNNING.md:72-92). For
a 10¹²-row ``ray job submit`` run the north rule requires better: a
killed run must resume without recomputing completed partitions.

Design (the FIXTURES.md §4 manifest schema):
- work is partitioned by ``partition_key`` (here: a range of scrambled
  shard keys — the same unit the tile shuffle reduces);
- each partition's output parquet is written ATOMICALLY (tmp dir +
  rename), then a manifest row
  (stage, partition_key, input_fingerprint, rows_in, rows_out,
  wall_ms, completed_at) is appended as one parquet file per
  partition under ``<out>/_manifest/``;
- on restart, completed partition keys (manifest row present AND the
  partition directory on disk) are skipped — their outputs are reused
  verbatim. The skip is PRESENCE-based: validating the stored input
  fingerprint would require recomputing the partition's input, which
  defeats the resume. The fingerprint is recorded for post-hoc audit
  (``fingerprint_table`` over a recomputed partition input must match
  the manifest row); a run whose INPUT changed must use a fresh
  checkpoint dir.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_SCHEMA = pa.schema([
    ("stage", pa.string()),
    ("partition_key", pa.string()),
    ("input_fingerprint", pa.string()),
    ("rows_in", pa.int64()),
    ("rows_out", pa.int64()),
    ("wall_ms", pa.int64()),
    ("completed_at", pa.timestamp("us")),
])


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def partition_dir(out_dir: str, partition_key: str) -> str:
    return os.path.join(out_dir, f"part={partition_key}")


def load_completed(out_dir: str, stage: str) -> dict[str, str]:
    """partition_key → input_fingerprint of completed partitions."""
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return {}
    done = {}
    for f in sorted(os.listdir(mdir)):
        if not f.endswith(".parquet"):
            continue
        try:
            t = pq.read_table(os.path.join(mdir, f))
        except Exception:
            continue  # torn write of the manifest row itself → not completed
        for row in t.to_pylist():
            if row["stage"] == stage:
                done[row["partition_key"]] = row["input_fingerprint"]
    return done


def fingerprint_table(t: pa.Table, columns=("fuid",)) -> str:
    """Order-insensitive fingerprint of a partition's input rows."""
    h = np.uint64(0)
    for c in columns:
        if c not in t.column_names:
            continue
        vals = t[c].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            mixed = (vals ^ (vals >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
            h = h + mixed.sum(dtype=np.uint64)  # commutative → order-free
    return f"{int(h):016x}_{t.num_rows}"


def write_partition(out_dir: str, stage: str, partition_key: str,
                    input_fp: str, rows_in: int, result: pa.Table,
                    wall_ms: int) -> None:
    """Atomic partition output + manifest row."""
    pdir = partition_dir(out_dir, partition_key)
    tmp = pdir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(result, os.path.join(tmp, "data.parquet"))
    shutil.rmtree(pdir, ignore_errors=True)
    os.replace(tmp, pdir)
    mdir = manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    row = pa.table({
        "stage": [stage], "partition_key": [partition_key],
        "input_fingerprint": [input_fp],
        "rows_in": [rows_in], "rows_out": [result.num_rows],
        "wall_ms": [wall_ms],
        "completed_at": pa.array([int(time.time() * 1e6)],
                                 pa.timestamp("us")),
    }, schema=MANIFEST_SCHEMA)
    mtmp = os.path.join(mdir, f".{partition_key}.tmp")
    pq.write_table(row, mtmp)
    os.replace(mtmp, os.path.join(mdir, f"{partition_key}.parquet"))


def read_partition(out_dir: str, partition_key: str) -> pa.Table:
    return pq.read_table(os.path.join(partition_dir(out_dir, partition_key),
                                      "data.parquet"))


class CheckpointedEncoder:
    """Actor-pool stage wrapping the tile encoder with per-partition
    checkpoints. The partition key is ``shard_scram % n_partitions`` —
    each map_groups group belongs to exactly one partition, so a
    partition's output is the union of its groups' tiles.

    Used via ``fan.groupby("ckpt_part").map_groups(enc)`` where
    ``ckpt_part`` is the partition id column; completed partitions are
    skipped by filtering them out BEFORE the shuffle (cheapest resume:
    the skipped rows never move)."""

    def __init__(self, out_dir: str, cfg=None):
        from ..config import DEFAULT_CONFIG
        self.out_dir = out_dir
        self.cfg = cfg or DEFAULT_CONFIG

    def __call__(self, group: pa.Table) -> pa.Table:
        from ..stages.tile_encode import encode_shard
        part_key = str(int(group["ckpt_part"][0].as_py()))
        fp = fingerprint_table(group)
        t0 = time.perf_counter()
        results = []
        # a ckpt partition contains many shards: encode each
        scrams = group["shard_scram"].to_numpy(zero_copy_only=False)
        order = np.argsort(scrams, kind="stable")
        sorted_g = group.take(pa.array(order))
        scrams = scrams[order]
        bounds = np.flatnonzero(np.diff(scrams)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(scrams)]])
        for s, e in zip(starts, ends):
            results.append(encode_shard(sorted_g.slice(s, e - s), self.cfg))
        tiles = pa.concat_tables(results) if results else None
        from ..stages.tile_encode import _empty_tiles
        tiles = tiles if tiles is not None else _empty_tiles()
        write_partition(self.out_dir, "tiles", part_key, fp,
                        group.num_rows, tiles,
                        int((time.perf_counter() - t0) * 1000))
        return tiles


def resumable_tiles(fan_ds, out_dir: str, cfg=None, n_partitions: int = 64):
    """Checkpointed variant of the tile shuffle: returns (dataset of
    newly-computed tiles, list of reused partition keys). Completed
    partitions are filtered out before the shuffle and their tiles are
    read back from their checkpoints."""
    import pyarrow.compute as pc

    from ..config import DEFAULT_CONFIG
    cfg = cfg or DEFAULT_CONFIG
    done = load_completed(out_dir, "tiles")

    def add_part(batch: pa.Table) -> pa.Table:
        part = (batch["shard_scram"].to_numpy(zero_copy_only=False)
                % n_partitions).astype(np.int64)
        return batch.append_column("ckpt_part", pa.array(part, pa.int64()))

    fan_ds = fan_ds.map_batches(add_part, batch_format="pyarrow")
    reused = []
    if done:
        # trust fingerprints only when the partition exists on disk
        done_keys = np.asarray(
            [int(k) for k in done
             if os.path.isdir(partition_dir(out_dir, k))], dtype=np.int64)
        if len(done_keys):
            reused = [str(k) for k in done_keys.tolist()]
            fan_ds = fan_ds.map_batches(
                lambda b: b.filter(
                    pc.invert(pc.is_in(b["ckpt_part"],
                                       value_set=pa.array(done_keys)))),
                batch_format="pyarrow")
    enc = CheckpointedEncoder(out_dir, cfg)

    def encode_checkpointed(group: pa.Table) -> pa.Table:
        return enc(group)

    new_tiles = fan_ds.groupby("ckpt_part").map_groups(
        encode_checkpointed, batch_format="pyarrow")
    return new_tiles, reused
