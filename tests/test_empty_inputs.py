"""Empty-input behavior of the spatial-statistics kernels."""

import pyarrow as pa

from tilemaker_ray.stages.spatialstats import (gi_star_cells,
                                               gi_star_finish_fn,
                                               geary_finish,
                                               lattice_edges,
                                               moran_finish,
                                               moran_scalars,
                                               moran_significance)


def _empty_ds(ray_session):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "tile_x": pa.array([], pa.int64()),
        "tile_y": pa.array([], pa.int64()),
        "n_events": pa.array([], pa.int64())}))


def test_moran_empty(ray_session):
    sc = moran_scalars(_empty_ds(ray_session))
    assert sc["n_tiles"] == 0 and sc["w_pairs"] == 0
    assert moran_finish(sc) is None
    assert geary_finish(sc) is None
    assert moran_significance(sc, moran_finish(sc)) == (None, None)


def test_gi_star_empty(ray_session):
    cells = gi_star_cells(_empty_ds(ray_session))
    out = cells.map_batches(
        lambda b: gi_star_finish_fn(b, 0, 0, 0),
        batch_format="pyarrow")
    assert out.count() == 0


def test_lattice_edges_empty(ray_session):
    assert lattice_edges(_empty_ds(ray_session)).count() == 0
