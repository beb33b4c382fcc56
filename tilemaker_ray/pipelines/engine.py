"""Engine runner + JSON config — the `tilemaker in.pbf out.mbtiles`
analog (/root/reference/src/tilemaker.cpp:90-566 lifecycle,
include/options_parser.h:24-50 options).

``run()`` executes the full lifecycle: load config → load/broadcast
external polygon layers → extract (built-in vectorized extractor or a
user UDF) → cell encode → spatial tag → tile shuffle (optionally
checkpointed) → sink (mbtiles / archive / file tree / parquet).

JSON config mirrors the reference's layer config knobs
(/root/reference/src/shared_data.cpp:248-357):

    {"basezoom": 14, "minzoom": 6,
     "layers": {"place": {"minzoom": 6, "feature_limit": 256,
                          "combine_points": true},
                "track": {"simplify_below": 14, "simplify_level": 1.0}}}
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from ..config import DEFAULT_CONFIG, DEFAULT_LAYERS, EngineConfig, LayerDef
from . import flagship


def config_from_json(path_or_dict) -> EngineConfig:
    cfg = path_or_dict
    if isinstance(cfg, str):
        with open(cfg) as f:
            cfg = json.load(f)
    layers = []
    for name, knobs in cfg.get("layers", {}).items():
        layers.append(LayerDef(name=name, **knobs))
    if not layers:
        layers = list(DEFAULT_LAYERS)
    fields = {k: v for k, v in cfg.items() if k != "layers"
              and k in EngineConfig.__dataclass_fields__}
    return EngineConfig(layers=tuple(layers), **fields)


def run(input_path: str, output: str, config: EngineConfig | str | dict | None = None,
        page_function=None, merge: bool = False,
        checkpoint_dir: str | None = None, concurrency: int | None = None):
    """One engine run. ``output`` suffix selects the sink:
    .mbtiles | .tmra (archive) | directory (parquet + file tree).
    ``merge`` replays an existing .mbtiles (reference --merge).
    ``checkpoint_dir`` enables resumable per-partition encoding.
    Returns a summary dict."""
    import ray.data as rd

    from ..sources import polygons as _polygons
    from ..stages import sinks
    if config is None:
        cfg = DEFAULT_CONFIG
    elif isinstance(config, EngineConfig):
        cfg = config
    else:
        cfg = config_from_json(config)

    pages_ds = rd.read_parquet(input_path)

    if page_function is not None:
        import ray

        from ..stages.encode import make_cell_encoder
        from ..udf import UDFExtractor
        poly_ref = ray.put(_polygons.all_layers())
        feats = pages_ds.map_batches(
            UDFExtractor, batch_format="pyarrow", batch_size=2048,
            fn_constructor_args=(page_function, poly_ref),
            concurrency=(1, concurrency or 4))
        feats = feats.map_batches(make_cell_encoder(cfg),
                                  batch_format="pyarrow")
        from ..stages.fanout import make_fanout
        from ..stages.tile_encode import encode_shard
        import functools
        import ray as _ray
        fan = feats.map_batches(make_fanout(cfg), batch_format="pyarrow")
        n_blocks = max(48, int(_ray.cluster_resources().get("CPU", 16)) * 2)
        tiles = fan.repartition(n_blocks).groupby("shard_scram").map_groups(
            functools.partial(encode_shard, cfg=cfg), batch_format="pyarrow")
        reused = []
    elif checkpoint_dir:
        tiles, reused = flagship.resumable_tiles_pipeline(
            pages_ds, checkpoint_dir, cfg, concurrency=concurrency)
        if reused:
            # the sink must also receive the checkpointed tiles of
            # reused partitions — they were filtered out before the
            # shuffle (review finding: a resumed run otherwise wrote an
            # incomplete tileset)
            from ..state.checkpoint import read_partition
            old = pa.concat_tables([read_partition(checkpoint_dir, k)
                                    for k in reused])
            tiles = tiles.union(rd.from_arrow(old))
    else:
        tiles = flagship.tiles_pipeline(pages_ds, cfg,
                                        concurrency=concurrency)
        reused = []

    summary = {"reused_partitions": len(reused)}
    is_archive = output.endswith((".pmtiles", ".tmra"))
    if merge and os.path.exists(output):
        if output.endswith(".mbtiles"):
            tiles = sinks.merge_tilesets(tiles, sinks.read_mbtiles(output))
        elif is_archive:
            from ..stages import pmtiles
            tiles = sinks.merge_tilesets(tiles,
                                         pmtiles.read_all_tiles(output))
    if output.endswith(".mbtiles"):
        summary["tiles"] = sinks.write_mbtiles(
            tiles, output, metadata=sinks.tileset_metadata(cfg))
    elif is_archive:
        summary["tiles"] = sinks.write_archive(tiles, output)
    else:
        flagship.write_tiles(tiles, output)
        summary["tiles"] = "parquet"
    summary["output"] = output
    return summary


def main(argv=None):
    """CLI mirroring the reference's option surface
    (--input/--output/--config/--merge/--threads; store-tuning flags
    have no meaning in a share-nothing engine and are absent)."""
    import argparse
    p = argparse.ArgumentParser(prog="tilemaker_ray")
    p.add_argument("--input", required=True,
                   help="pages parquet file/dir (url, warc_ts, html, text, lang)")
    p.add_argument("--output", required=True,
                   help="out.mbtiles | out.tmra | out_dir/")
    p.add_argument("--config", default=None, help="JSON config path")
    p.add_argument("--process", default=None,
                   help="user page-function as 'module.path:function' "
                        "(the --process script.lua analog)")
    p.add_argument("--bbox", default=None,
                   help="clipping box 'lonW,latS,lonE,latN'")
    p.add_argument("--merge", action="store_true",
                   help="merge into an existing .mbtiles")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--threads", type=int, default=None,
                   help="actor-pool concurrency hint")
    args = p.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    page_function = None
    if args.process:
        import importlib
        mod_name, fn_name = args.process.split(":")
        page_function = getattr(importlib.import_module(mod_name), fn_name)
    config = args.config
    if args.bbox:
        import dataclasses
        cfg = (config_from_json(config) if config else DEFAULT_CONFIG)
        config = dataclasses.replace(
            cfg, bbox=tuple(float(v) for v in args.bbox.split(",")))
    summary = run(args.input, args.output, config=config,
                  page_function=page_function,
                  merge=args.merge, checkpoint_dir=args.checkpoint_dir,
                  concurrency=args.threads)
    print(json.dumps(summary))
    ray.shutdown()
    return 0
