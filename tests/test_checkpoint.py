"""Checkpoint/resume: kill-and-rerun semantics — completed partitions
are not recomputed, and the resumed output equals a fresh full run."""

import os
import shutil

import pandas as pd
import pytest

from tilemaker_ray.pipelines import flagship
from tilemaker_ray.sources import pages
from tilemaker_ray.state import checkpoint as cp


@pytest.fixture()
def pages_ds(ray_session):
    return pages.pages_dataset(1500, parallelism=4)


def _collect(tiles_ds, reused, out_dir):
    import pyarrow as pa
    parts = [tiles_ds.to_pandas()]
    for k in reused:
        parts.append(cp.read_partition(out_dir, k).to_pandas())
    df = pd.concat(parts)
    return df.sort_values("tile_id").reset_index(drop=True)


def test_resume_skips_completed_partitions(pages_ds, tmp_path):
    out = str(tmp_path / "tiles_ckpt")

    # full run
    tiles, reused = flagship.resumable_tiles_pipeline(
        pages_ds, out, n_partitions=16)
    full = _collect(tiles, reused, out)
    assert reused == []
    assert len(full) > 100
    mdir = cp.manifest_dir(out)
    done = cp.load_completed(out, "tiles")
    assert len(done) > 4

    # simulate a kill mid-run: drop half the partitions (+ manifests)
    keys = sorted(done, key=int)
    killed = keys[::2]
    survivors = [k for k in keys if k not in killed]
    for k in killed:
        shutil.rmtree(cp.partition_dir(out, k), ignore_errors=True)
        os.remove(os.path.join(mdir, f"{k}.parquet"))
    mtimes_before = {k: os.path.getmtime(cp.partition_dir(out, k))
                     for k in survivors}

    # resume
    tiles2, reused2 = flagship.resumable_tiles_pipeline(
        pages.pages_dataset(1500, parallelism=4), out, n_partitions=16)
    resumed = _collect(tiles2, reused2, out)

    # survivors were reused, not recomputed (mtime unchanged)
    assert sorted(reused2, key=int) == survivors
    for k in survivors:
        assert os.path.getmtime(cp.partition_dir(out, k)) == mtimes_before[k]

    # resumed output == full run output
    assert list(resumed["tile_hash"]) == list(full["tile_hash"])
    assert list(resumed["tile_id"]) == list(full["tile_id"])

    # manifest rows carry lineage + metrics
    done2 = cp.load_completed(out, "tiles")
    assert set(done2) == set(keys)
    import pyarrow.parquet as pq
    one = pq.read_table(os.path.join(mdir, f"{keys[0]}.parquet")).to_pylist()[0]
    assert one["rows_in"] > 0 and one["rows_out"] >= 0
    assert one["wall_ms"] >= 0 and one["input_fingerprint"]


def _dedup_docs():
    """Small corpus with planted near-duplicate clusters."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(60)]
    base = [" ".join(rng.choice(vocab, 30)) for _ in range(40)]
    docs = []
    for i, b in enumerate(base):
        docs.append(b)
        if i % 4 == 0:           # near-dup: one word changed
            docs.append(b.replace(b.split()[0], "zzz", 1))
        if i % 8 == 0:           # exact dup
            docs.append(b)
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    return rd.from_arrow(t).repartition(4)


def _collect_kept(new_ds, reused, out):
    parts = [new_ds.to_pandas()]
    for k in reused:
        parts.append(cp.read_partition(out, k).to_pandas())
    df = pd.concat(parts)
    return df.sort_values("doc_id").reset_index(drop=True)


def test_dedup_keep_resume(ray_session, tmp_path):
    """Kill/resume for the dedup family (mirrors the flagship
    demonstration): completed 'kept' partitions are reused verbatim,
    the 'drops' decision artifact is not recomputed, and the resumed
    corpus equals a fresh full run."""
    from tilemaker_ray.stages.dedup import (minhash_dedup_keep,
                                            resumable_minhash_dedup_keep)

    out = str(tmp_path / "dedup_ckpt")
    kept1, reused1 = resumable_minhash_dedup_keep(
        _dedup_docs(), out, threshold=0.6, n_partitions=8)
    full = _collect_kept(kept1, reused1, out)
    assert reused1 == []
    # equals the non-checkpointed pipeline's keep set
    plain = sorted(minhash_dedup_keep(_dedup_docs(), threshold=0.6)
                   .to_pandas()["doc_id"])
    assert sorted(full["doc_id"]) == plain
    assert len(full) < 55 < len(full) + 20   # something was dropped

    done = cp.load_completed(out, "kept")
    keys = sorted(done, key=int)
    assert len(keys) >= 4
    mdir = cp.manifest_dir(out)
    drops_mtime = os.path.getmtime(cp.partition_dir(out, "all"))

    # kill half the kept partitions
    killed = keys[::2]
    survivors = [k for k in keys if k not in killed]
    for k in killed:
        shutil.rmtree(cp.partition_dir(out, k), ignore_errors=True)
        os.remove(os.path.join(mdir, f"{k}.parquet"))
    mtimes = {k: os.path.getmtime(cp.partition_dir(out, k))
              for k in survivors}

    kept2, reused2 = resumable_minhash_dedup_keep(
        _dedup_docs(), out, threshold=0.6, n_partitions=8)
    resumed = _collect_kept(kept2, reused2, out)
    assert sorted(reused2, key=int) == survivors
    for k in survivors:                       # reused, not recomputed
        assert os.path.getmtime(cp.partition_dir(out, k)) == mtimes[k]
    # decision pass skipped too
    assert os.path.getmtime(cp.partition_dir(out, "all")) == drops_mtime
    assert list(resumed["doc_id"]) == list(full["doc_id"])
    assert list(resumed["text"]) == list(full["text"])
