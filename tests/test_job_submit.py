"""ray-job-submit wrapper: entrypoint construction + the local
fallback running the real engine end-to-end (and resuming)."""

import json
import os
import shlex

from tilemaker_ray import job


def test_build_entrypoint_quotes_and_flags():
    ep = job.build_entrypoint("in dir/pages.parquet", "out.mbtiles",
                              checkpoint_dir="/tmp/ck pt", merge=True,
                              threads=4, bbox="0,0,10,10")
    parts = shlex.split(ep)
    assert parts[1:3] == ["-m", "tilemaker_ray"]
    assert "in dir/pages.parquet" in parts
    assert "--merge" in parts and "--threads" in parts
    assert parts[parts.index("--checkpoint-dir") + 1] == "/tmp/ck pt"


def test_local_submit_runs_engine_and_resumes(tmp_path):
    from tilemaker_ray.sources import pages
    src = pages.ensure_pages_parquet(400)
    out = str(tmp_path / "out.mbtiles")
    ck = str(tmp_path / "ckpt")
    ep = job.build_entrypoint(src, out, checkpoint_dir=ck)
    res = job.submit(ep)
    assert res["status"] == "SUCCEEDED", res.get("stderr_tail")
    assert res["mode"] == "local"
    assert os.path.exists(out)
    n_tiles = res["summary"].get("tiles")
    assert n_tiles and n_tiles > 0
    # resubmit with the same checkpoint dir: resumes (skips partitions)
    res2 = job.submit(ep)
    assert res2["status"] == "SUCCEEDED", res2.get("stderr_tail")
    assert res2["summary"].get("tiles") == n_tiles
    assert res2["summary"].get("reused_partitions", 0) > 0


def test_engine_pmtiles_output_and_merge(tmp_path):
    """Review finding: .pmtiles output dispatches to the archive sink
    (not the parquet fallback) and --merge reads an existing archive."""
    from tilemaker_ray.sources import pages
    from tilemaker_ray.stages import pmtiles
    src = pages.ensure_pages_parquet(400)
    out = str(tmp_path / "out.pmtiles")
    res = job.submit(job.build_entrypoint(src, out))
    assert res["status"] == "SUCCEEDED", res.get("stderr_tail")
    h = pmtiles.read_header(out)
    assert h["n_addressed"] == res["summary"]["tiles"] > 0
    # merge into the existing archive: still a valid archive afterwards
    ep = job.build_entrypoint(src, out, merge=True)
    res2 = job.submit(ep)
    assert res2["status"] == "SUCCEEDED", res2.get("stderr_tail")
    assert pmtiles.read_header(out)["n_addressed"] > 0


def test_engine_process_udf_path(tmp_path):
    """--process module:function end-to-end: the engine hosts the
    example page UDF (the --process script.lua analog) and the output
    tileset contains the UDF's layers."""
    import gzip
    import sqlite3

    from tilemaker_ray.sources import pages
    from tilemaker_ray.stages import mvt
    src = pages.ensure_pages_parquet(400)
    out = str(tmp_path / "udf.mbtiles")
    ep = job.build_entrypoint(
        src, out, process="tilemaker_ray.functions.examples:poi_function")
    res = job.submit(ep)
    assert res["status"] == "SUCCEEDED", res.get("stderr_tail")
    con = sqlite3.connect(out)
    rows = con.execute(
        "SELECT tile_data FROM tiles ORDER BY zoom_level DESC LIMIT 40"
    ).fetchall()
    con.close()
    layers = set()
    for (blob,) in rows:
        layers |= set(mvt.decode_tile(gzip.decompress(blob)).keys())
    assert "poi" in layers, layers
