"""Vectorized cell/tile encode stage.

The analog of the reference's coordinate kernel applied per feature
(latpLon2index, /root/reference/src/coordinates.cpp:27-41): adds
``h3_cell`` (hex index), ``s2_cell`` (quadtree index), ``tile_x`` /
``tile_y`` / ``tile_id`` at the base zoom. Stateless, zero-copy Arrow
in/out, pure numpy — no Python loop over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..geo import tilemath as tm


def make_cell_encoder(cfg: EngineConfig = DEFAULT_CONFIG):
    """Returns a map_batches body: features(lon, lat) → + cell columns."""
    basezoom, hex_res, quad_level = cfg.basezoom, cfg.hex_res, cfg.quad_level

    def encode(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        h3 = tm.hex_cell(lon, lat, hex_res)
        s2 = tm.quad_cell(lon, lat, quad_level)
        x, y = tm.point_tiles(lon, lat, basezoom)
        tid = tm.tile_id(basezoom, x, y)
        return (batch
                .append_column("h3_cell", pa.array(h3, pa.int64()))
                .append_column("s2_cell", pa.array(s2, pa.int64()))
                .append_column("tile_x", pa.array(x, pa.int32()))
                .append_column("tile_y", pa.array(y, pa.int32()))
                .append_column("tile_id", pa.array(tid, pa.int64())))

    return encode
