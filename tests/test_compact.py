"""Small-file compactor (state/compact.py): deterministic plan,
lossless rows, resume-skips-finished."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tilemaker_ray.state.compact import compact_dir, plan_groups


@pytest.fixture()
def shard_dir(tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    rng = np.random.RandomState(3)
    for i in range(32):
        n = int(rng.randint(50, 200))
        t = pa.table({
            "id": pa.array(np.arange(n) + i * 1000, pa.int64()),
            "v": pa.array(rng.randint(0, 10, n), pa.int64())})
        pq.write_table(t, str(d / f"part-{i:04d}.parquet"))
    return str(d)


def test_plan_is_deterministic_and_size_binned(shard_dir):
    g1 = plan_groups(shard_dir, target_bytes=8 * 1024)
    g2 = plan_groups(shard_dir, target_bytes=8 * 1024)
    assert g1 == g2
    assert len(g1) > 1
    # groups partition the sorted file list in order, no loss
    flat = [p for g in g1 for p in g]
    assert flat == sorted(flat)
    assert len(flat) == 32


def test_compaction_is_lossless(shard_dir, tmp_path, ray_session):
    out = str(tmp_path / "compacted")
    res = compact_dir(shard_dir, out, target_bytes=8 * 1024)
    assert res["skipped"] == 0
    outs = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert 1 < len(outs) < 32
    a = pq.read_table(shard_dir).sort_by("id")
    b = pq.read_table(
        [os.path.join(out, f) for f in outs]).sort_by("id")
    assert a.equals(b)
    assert res["rows"] == a.num_rows


def test_rerun_skips_finished_groups(shard_dir, tmp_path, ray_session):
    out = str(tmp_path / "compacted")
    first = compact_dir(shard_dir, out, target_bytes=8 * 1024)
    again = compact_dir(shard_dir, out, target_bytes=8 * 1024)
    assert again["skipped"] == first["groups"]
    assert again["rows"] == 0


def test_partial_run_resumes(shard_dir, tmp_path, ray_session):
    out = str(tmp_path / "compacted")
    groups = plan_groups(shard_dir, target_bytes=8 * 1024)
    # simulate a killed run: only group 0 finished
    from tilemaker_ray.state.compact import _compact_one
    os.makedirs(out, exist_ok=True)
    _compact_one(groups[0], os.path.join(out, "compact-00000.parquet"))
    res = compact_dir(shard_dir, out, target_bytes=8 * 1024)
    assert res["skipped"] == 1
    a = pq.read_table(shard_dir).sort_by("id")
    outs = [os.path.join(out, f) for f in sorted(os.listdir(out))
            if f.endswith(".parquet")]
    b = pq.read_table(outs).sort_by("id")
    assert a.equals(b)
