"""Entity assembly (J1/J2/J6) and significant-tags prefilter (M1)."""

import numpy as np
import pyarrow as pa
import pytest

from tilemaker_ray.stages import assembly, sigfilter


def square_segs():
    """A square split into 3 open segments, one reversed."""
    a = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    b = np.array([[1.0, 1.0], [0.0, 1.0]])
    c = np.array([[0.0, 0.0], [0.0, 1.0]])  # needs reversal to attach
    return [a, b, c]


def test_stitch_rings_square():
    rings = assembly.stitch_rings(square_segs())
    assert len(rings) == 1
    r = rings[0]
    assert np.array_equal(r[0], r[-1])
    assert len(r) == 5
    # all 4 corners present
    corners = {tuple(p) for p in r.tolist()}
    assert {(0, 0), (1, 0), (1, 1), (0, 1)}.issubset(corners)


def test_stitch_rings_two_rings_and_leftover():
    segs = square_segs()
    segs += [np.array([[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 6.0],
                       [5.0, 5.0]])]          # already closed
    segs += [np.array([[9.0, 9.0], [10.0, 9.0]])]  # unclosable
    rings = assembly.stitch_rings(segs)
    assert len(rings) == 2


def test_assemble_ways_small(ray_session):
    import ray.data as rd
    mem = pa.table({"way_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
                    "seq": pa.array([1, 2, 3, 1, 2], pa.int64()),
                    "node_id": pa.array([10, 20, 30, 40, 50], pa.int64())})
    out = assembly.assemble_ways(rd.from_arrow(mem)).to_pandas()
    out = out.sort_values("way_id").reset_index(drop=True)
    assert out["n_points"].tolist() == [3, 2]
    assert out["first_node"].tolist() == [10, 40]
    assert out["last_node"].tolist() == [30, 50]
    # length matches manual computation
    lon, lat = assembly.node_lonlat(np.array([10, 20, 30]))
    seg = np.sqrt(np.diff(lon) ** 2 + np.diff(lat) ** 2)
    expect = int(np.floor(seg * 1e6).astype(np.int64).sum())
    assert out["length_um"].tolist()[0] == expect


def test_assemble_relations(ray_session):
    import ray.data as rd
    # relation 7: two outer segments forming a square + one inner ring
    segs = square_segs()
    inner = np.array([[0.2, 0.2], [0.4, 0.2], [0.4, 0.4], [0.2, 0.4],
                      [0.2, 0.2]])
    mem = pa.table({"rel_id": pa.array([7, 7, 7, 7], pa.int64()),
                    "role": pa.array(["outer", "outer", "outer", "inner"]),
                    "way_id": pa.array([1, 2, 3, 4], pa.int64())})
    from tilemaker_ray.geo import wkb
    geoms = pa.table({"way_id": pa.array([1, 2, 3, 4], pa.int64()),
                      "geom_wkb": pa.array(
                          [wkb.linestring_wkb(s) for s in segs]
                          + [wkb.linestring_wkb(inner)], pa.binary())})
    out = assembly.assemble_relations(
        rd.from_arrow(mem), rd.from_arrow(geoms)).to_pandas()
    assert out["n_outer"].tolist() == [1]
    assert out["n_inner"].tolist() == [1]


def test_sigfilter_grammar():
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "lang": pa.array(["en", "de", "fr", "en"]),
                  "source": pa.array(["src1", "src2", "src1", "src2"])})
    f = sigfilter.make_sigfilter_fn(["lang=en", "lang=de", "~source=src2"])
    out = f(t)
    assert out["doc_id"].to_pylist() == [0]  # en+src1 only
    # presence / absence entries
    t2 = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                   "tag": pa.array(["x", None])})
    assert sigfilter.make_sigfilter_fn(["tag"])(t2)["doc_id"].to_pylist() == [0]
    assert sigfilter.make_sigfilter_fn(["~tag"])(t2)["doc_id"].to_pylist() == [1]
