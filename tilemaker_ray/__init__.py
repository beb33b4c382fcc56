"""tilemaker_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the query and data-processing
capabilities of systemed/tilemaker (reference at /root/reference,
C++14), re-expressed as idiomatic Ray Data pipelines over zero-copy
Arrow batches:

- ``geo``       pure-numpy kernels: Web-Mercator tile math
                (reference: src/coordinates.cpp), Morton/Hilbert tile
                ids, hexagonal + quadtree cell indexes (H3/S2-style),
                WKB codec, point-in-polygon, clipping, simplification.
- ``sources``   deterministic synthetic web-page corpus (the
                Common-Crawl-style input table) and polygon layers
                (analog of tilemaker's shapefile/GeoJSON external
                sources, src/shp_processor.cpp).
- ``stages``    Ray Data stage builders: extraction (the UDF host,
                analog of src/osm_lua_processing.cpp), cell encode,
                PIP/kNN spatial join actor pool (analog of
                src/shp_mem_tiles.cpp), tile fan-out, tile encoding
                (analog of src/tile_worker.cpp), dedup, text analysis,
                similarity search.
- ``pipelines`` end-to-end compositions (the flagship pages→tiles
                pipeline mirroring src/tilemaker.cpp's lifecycle).
- ``state``     per-partition checkpoint/lineage manifest.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — the
caller owns the Ray session.
"""

__version__ = "0.1.0"
