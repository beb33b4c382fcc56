"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or anywhere in tilemaker_ray.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline at sf0.001: synthetic Common-Crawl-style pages
    (deterministic, scaled to the sf dir) → extract → cell encode →
    PIP tag → tile shuffle → MVT tiles. Returns the tile Dataset."""
    from tilemaker_ray.pipelines import flagship
    from tilemaker_ray.sources import pages

    n = pages.n_pages_for_sf_dir(SF0001)
    ds = pages.pages_dataset(n)
    tiles = flagship.tiles_pipeline(ds)
    # drop the binary payload for the smoke check's schema stability
    return tiles.select_columns(["zoom", "x", "y", "tile_id", "n_features",
                                 "tile_hash"])


def queries() -> dict[str, Callable[[str], Any]]:
    from tilemaker_ray.pipelines.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tilemaker_ray.pipelines.queries import ORACLE_SQL
    return dict(ORACLE_SQL)
