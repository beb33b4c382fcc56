"""Deterministic small-file compaction for partitioned Parquet output.

The ops tool the resumable-write story needs at 100 TB: a long run (or
many resumed runs) leaves directories of thousands of small shards;
readers then pay per-file open/schema costs and the driver pays
per-file metadata. This compactor re-slices a directory into
~``target_bytes`` outputs with three properties a production pipeline
needs:

- **Deterministic plan**: inputs are taken in sorted-filename order and
  greedily binned by on-disk size, so the same input directory always
  produces the same groups (re-running a killed compaction converges).
- **Resumable**: each output lands as ``compact-NNNNN.parquet`` next to
  a ``.done`` marker written AFTER the atomic rename; a rerun skips
  finished groups (the checkpoint.py contract applied to maintenance).
- **Distributed**: one Ray task per output group (``flat_map`` over the
  plan) — the driver touches only file metadata, never rows.

The reference analog is granularity control, not a feature: tilemaker
warns when .pbf blocks are too big/too small because block size is the
unit of parallelism (/root/reference/src/pbf_processor.cpp:594-606);
here shard size is that unit and this tool restores it after
fine-grained writes.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def plan_groups(in_dir: str, target_bytes: int = 64 * 1024 * 1024):
    """Greedy size-binned grouping of the directory's parquet files in
    sorted-name order. Returns a list of lists of absolute paths.
    A file larger than ``target_bytes`` forms its own group (never
    split — row-group level splitting is the reader's job)."""
    files = sorted(f for f in os.listdir(in_dir)
                   if f.endswith(".parquet"))
    groups, cur, cur_bytes = [], [], 0
    for f in files:
        p = os.path.join(in_dir, f)
        sz = os.path.getsize(p)
        if cur and cur_bytes + sz > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(p)
        cur_bytes += sz
    if cur:
        groups.append(cur)
    return groups


def _compact_one(paths: list, out_path: str) -> int:
    tables = [pq.read_table(p) for p in paths]
    t = pa.concat_tables(tables, promote_options="default")
    tmp = f"{out_path}.tmp.{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, out_path)
    with open(out_path + ".done", "w") as fh:
        fh.write(f"{len(paths)} {t.num_rows}")
    return t.num_rows


def compact_dir(in_dir: str, out_dir: str,
                target_bytes: int = 64 * 1024 * 1024,
                use_ray: bool = True) -> dict:
    """Compact ``in_dir``'s parquet shards into ``out_dir``.

    Returns ``{"groups": N, "skipped": K, "rows": total}``. Safe to
    re-run: finished groups (``.done`` marker present) are skipped;
    a killed run leaves only ``.tmp.*`` garbage that the next run
    overwrites. The input directory is never modified."""
    os.makedirs(out_dir, exist_ok=True)
    groups = plan_groups(in_dir, target_bytes)
    todo = []
    skipped = 0
    for i, g in enumerate(groups):
        out = os.path.join(out_dir, f"compact-{i:05d}.parquet")
        if os.path.exists(out + ".done"):
            skipped += 1
            continue
        todo.append((g, out))

    rows = 0
    if use_ray and todo:
        import ray

        @ray.remote
        def _task(paths, out):
            return _compact_one(paths, out)

        rows = sum(ray.get([_task.remote(g, o) for g, o in todo]))
    else:
        for g, o in todo:
            rows += _compact_one(g, o)
    return {"groups": len(groups), "skipped": skipped, "rows": rows}


def main(argv=None):
    """``python -m tilemaker_ray.state.compact IN OUT [--target-mb N]``
    — owns its Ray session (guarded init, shutdown on exit) like the
    other CLI entry points."""
    import argparse
    import json

    p = argparse.ArgumentParser(prog="tilemaker_ray.state.compact")
    p.add_argument("in_dir")
    p.add_argument("out_dir")
    p.add_argument("--target-mb", type=int, default=64)
    args = p.parse_args(argv)
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        res = compact_dir(args.in_dir, args.out_dir,
                          target_bytes=args.target_mb * 1024 * 1024)
        print(json.dumps(res))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
