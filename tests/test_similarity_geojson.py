"""IVF ANN (scale path) + GeoJSON sources."""

import json

import numpy as np
import pyarrow as pa
import pytest

from tilemaker_ray.sources import geojson
from tilemaker_ray.stages import similarity


@pytest.fixture(scope="module")
def emb(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(11)
    # 4 well-separated gaussian clusters in 16-d
    centers = rng.normal(scale=5.0, size=(4, 16))
    V = np.vstack([c + rng.normal(scale=0.3, size=(100, 16))
                   for c in centers]).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(len(V)), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in V],
                                        pa.list_(pa.float32()))})
    return rd.from_arrow(t), V


def brute_topk(V, qids, k):
    Vn = V.astype(np.float64)
    Vn /= np.linalg.norm(Vn, axis=1, keepdims=True)
    out = {}
    for q in qids:
        sims = Vn @ Vn[q]
        order = np.lexsort((np.arange(len(V)), -sims))
        out[q] = list(order[:k])
    return out


def test_ivf_exact_at_full_probe(emb):
    ds, V = emb
    qids = np.array([0, 150, 250, 350])
    got = similarity.ivf_topk(ds, qids, V[qids], k=5, n_clusters=8,
                              nprobe=8).to_pandas()
    expect = brute_topk(V, qids, 5)
    for q in qids:
        g = got[got["query_id"] == q].sort_values("rank")
        assert g["neighbor_id"].tolist() == expect[q]


def test_ivf_recall_at_low_probe(emb):
    ds, V = emb
    qids = np.arange(0, 400, 25)
    got = similarity.ivf_topk(ds, qids, V[qids], k=5, n_clusters=8,
                              nprobe=2).to_pandas()
    expect = brute_topk(V, qids, 5)
    hits = total = 0
    for q in qids:
        g = set(got[got["query_id"] == q]["neighbor_id"])
        hits += len(g & set(expect[q]))
        total += 5
    assert hits / total >= 0.9


def test_kmeans_deterministic():
    X = np.random.RandomState(0).normal(size=(200, 8))
    a = similarity.kmeans(X, 4)
    b = similarity.kmeans(X, 4)
    np.testing.assert_array_equal(a, b)


def test_geojson_featurecollection(tmp_path):
    doc = {"type": "FeatureCollection", "features": [
        {"type": "Feature",
         "geometry": {"type": "Polygon",
                      "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]},
         "properties": {"layer": "admin", "name": "sq", "class": "b",
                        "minzoom": 3}},
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [5.0, 6.0]},
         "properties": {"name": "pt"}},
        {"type": "Feature", "geometry": None, "properties": {}},
    ]}
    p = tmp_path / "x.geojson"
    p.write_text(json.dumps(doc))
    t = geojson.read_geojson(str(p))
    assert t.num_rows == 2
    assert t["layer"].to_pylist() == ["admin", "geojson"]
    from tilemaker_ray.geo import wkb
    gt, rings = wkb.parse_wkb(t["geom_wkb"][0].as_py())
    assert gt == wkb.POLYGON and len(rings[0]) == 5


def test_geojsonl_distributed(ray_session, tmp_path):
    lines = []
    for i in range(50):
        lines.append(json.dumps({
            "type": "Feature",
            "geometry": {"type": "Point", "coordinates": [i * 0.1, i * 0.2]},
            "properties": {"name": f"p{i}", "layer": "pts"}}))
    p = tmp_path / "x.geojsonl"
    p.write_text("\n".join(lines))
    ds = geojson.read_geojsonl(str(p))
    t = ds.to_pandas()
    assert len(t) == 50
    assert set(t["layer"]) == {"pts"}


def test_geojson_layer_into_pip_join(tmp_path):
    """A GeoJSON layer slots into the same join machinery."""
    doc = {"type": "FeatureCollection", "features": [
        {"type": "Feature",
         "geometry": {"type": "Polygon",
                      "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10],
                                       [0, 0]]]},
         "properties": {"layer": "admin", "name": "big", "class": "x",
                        "minzoom": 2}}]}
    p = tmp_path / "l.geojson"
    p.write_text(json.dumps(doc))
    t = geojson.read_geojson(str(p))
    from tilemaker_ray.stages.join import PIPTagger
    tagger = PIPTagger(t)
    batch = pa.table({"lon": pa.array([5.0, 50.0]),
                      "lat": pa.array([5.0, 50.0])})
    out = tagger(batch)
    assert out["in_layer"].to_pylist() == [True, False]
