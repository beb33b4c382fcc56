"""The flagship pipeline: web pages → extracted geo features → cell
encode → PIP join → tile shuffle → MVT tiles.

The Ray-Data re-expression of tilemaker's main run
(/root/reference/src/tilemaker.cpp:90-566, traced in SURVEY.md §3.1):

    read pages (Parquet / generated)          # the PBF read phases
     └─ map_batches(ExtractFeatures, actors)  # the per-entity Lua UDF
     └─ map_batches(cell_encoder)             # latpLon2index + H3/S2
     └─ map_batches(PIPTagger, actors)        # Intersects("admin")
     └─ map_batches(fanout)                   # insertIntermediateTiles
     └─ groupby(z6_id).map_groups(encode)     # THE shuffle + tile_worker
     └─ write_parquet(partition by zoom)      # MBTiles/PMTiles analog

Everything before the groupby is streaming map_batches over zero-copy
Arrow; the one all-to-all exchange is the z6 shuffle, mirroring the
reference's single z6-bucketed feature store.
"""

from __future__ import annotations

import functools

import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..sources import polygons as _polygons
from ..stages.encode import make_cell_encoder
from ..stages.extract import ExtractFeatures
from ..stages.fanout import make_fanout
from ..stages.join import PIPTagger
from ..stages.tile_encode import encode_shard


def features_pipeline(pages_ds, cfg: EngineConfig = DEFAULT_CONFIG,
                      concurrency: int | None = None):
    """pages Dataset → encoded feature Dataset (no join, no shuffle).

    Stateless tasks with worker-global state caches instead of actor
    pools: setup still runs once per worker, but the whole
    read→extract→encode→tag→fanout chain fuses into one task per block
    and reuses warm workers — the actor-pool variant measured ~4s of
    pool spin-up per run, which capped scaling efficiency on short
    jobs."""
    from ..stages.extract import extract_features_batch
    ds = pages_ds.map_batches(extract_features_batch, batch_format="pyarrow",
                              batch_size=4096)
    return ds.map_batches(make_cell_encoder(cfg), batch_format="pyarrow",
                          batch_size=4096)


def joined_features_pipeline(pages_ds, cfg: EngineConfig = DEFAULT_CONFIG,
                             polygons_table: pa.Table | None = None,
                             concurrency: int | None = None):
    """features + admin-membership tags (the Intersects() step)."""
    import ray

    from ..stages.join import make_tagger_fn
    poly = polygons_table if polygons_table is not None else _polygons.admin_polygons()
    poly_ref = ray.put(poly)  # broadcast ONCE; workers build the index once
    ds = features_pipeline(pages_ds, cfg, concurrency)
    return ds.map_batches(make_tagger_fn(poly_ref, cfg.hex_res),
                          batch_format="pyarrow", batch_size=4096)


def tiles_pipeline(pages_ds, cfg: EngineConfig = DEFAULT_CONFIG,
                   polygons_table: pa.Table | None = None,
                   concurrency: int | None = None,
                   include_layer_tiles: bool = False):
    """Full pipeline → tile Dataset (zoom, x, y, tile_id, n_features,
    tile_gz, tile_hash). ``include_layer_tiles`` also tiles the external
    polygon layers themselves (z0..5 low-zoom pyramid + their own
    zoom range), like the reference's shapefile layers."""
    import ray
    ds = joined_features_pipeline(pages_ds, cfg, polygons_table, concurrency)
    if include_layer_tiles:
        import ray.data as rd

        from ..sources.polygons import layers_as_features
        from ..stages.encode import make_cell_encoder
        poly_feats = make_cell_encoder(cfg)(layers_as_features())
        cols = [c for c in ds.schema().names if c in poly_feats.column_names]
        ds = ds.select_columns(cols).union(
            rd.from_arrow(poly_feats.select(cols)))
    ds = ds.map_batches(make_fanout(cfg), batch_format="pyarrow",
                        batch_size=4096)
    # enough reduce partitions that hot shards don't co-schedule; the
    # scrambled key spreads spatially-adjacent hot shards across them.
    # 4× CPU count: a reduce task runs its groups sequentially, so the
    # encode tail is the COST sum of a partition, not one shard —
    # measured max task 20.6 s at 2×, 11.9 s at 4× (800k pages) with
    # identical total CPU; 8× was measured WORSE (repartition cost
    # outgrew the tail win: 12.5–15.7 s vs 8.2–10.3 s at 200k pages)
    n_blocks = max(48, int(ray.cluster_resources().get("CPU", 16)) * 4)
    ds = ds.repartition(n_blocks)
    enc = functools.partial(encode_shard, cfg=cfg)
    return ds.groupby("shard_scram").map_groups(enc, batch_format="pyarrow")


def write_tiles(tiles_ds, out_dir: str):
    """Partitioned, resumable tile output (one dir per zoom)."""
    tiles_ds.write_parquet(out_dir, partition_cols=["zoom"])


def resumable_tiles_pipeline(pages_ds, out_dir: str,
                             cfg: EngineConfig = DEFAULT_CONFIG,
                             polygons_table: pa.Table | None = None,
                             concurrency: int | None = None,
                             n_partitions: int = 64):
    """Checkpointed flagship: per-partition tile outputs + lineage
    manifest under ``out_dir``; a rerun skips completed partitions
    before the shuffle (their rows never move). Returns
    (new_tiles_dataset, reused_partition_keys)."""
    from ..state.checkpoint import resumable_tiles
    ds = joined_features_pipeline(pages_ds, cfg, polygons_table, concurrency)
    ds = ds.map_batches(make_fanout(cfg), batch_format="pyarrow",
                        batch_size=4096)
    import ray
    n_blocks = max(48, int(ray.cluster_resources().get("CPU", 16)) * 2)
    ds = ds.repartition(n_blocks)
    return resumable_tiles(ds, out_dir, cfg, n_partitions)
