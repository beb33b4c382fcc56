"""Measures (Area/Length/Centroid/polylabel) + multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from tilemaker_ray.geo import measures
from tilemaker_ray.stages import multimodal


def square(cx, cy, half):
    return np.array([[cx - half, cy - half], [cx + half, cy - half],
                     [cx + half, cy + half], [cx - half, cy + half],
                     [cx - half, cy - half]])


def test_spherical_area_known():
    # 1°×1° cell at the equator ≈ 111.19 km × 111.19 km ≈ 1.236e10 m²
    a = measures.polygon_area_sq_m([square(0, 0.5, 0.5)])
    assert a == pytest.approx(1.2364e10, rel=0.01)
    # with a hole: area decreases by the hole
    hole = square(0, 0.5, 0.1)
    ah = measures.polygon_area_sq_m([square(0, 0.5, 0.5), hole])
    assert ah == pytest.approx(a - measures.polygon_area_sq_m([hole]), rel=1e-9)
    # higher latitude cell is smaller
    a60 = measures.polygon_area_sq_m([square(0, 60, 0.5)])
    assert a60 < 0.6 * a


def test_line_length_known():
    # 1° of longitude at the equator ≈ 111.19 km
    line = np.array([[0.0, 0.0], [1.0, 0.0]])
    assert measures.line_length_m(line) == pytest.approx(111_195, rel=0.001)
    # 1° of latitude anywhere ≈ 111.19 km
    line2 = np.array([[10.0, 40.0], [10.0, 41.0]])
    assert measures.line_length_m(line2) == pytest.approx(111_195, rel=0.001)


def test_centroid_and_polylabel_square():
    rings = [square(3, 7, 2)]
    cx, cy = measures.centroid_xy(rings)
    assert (cx, cy) == pytest.approx((3, 7))
    px, py = measures.polylabel(rings, precision=1e-3)
    assert (px, py) == pytest.approx((3, 7), abs=0.01)


def test_polylabel_with_hole_off_center():
    # hole at the center pushes the pole away from it
    rings = [square(0, 0, 10), square(0, 0, 3)]
    px, py = measures.polylabel(rings, precision=1e-2)
    assert abs(px) > 3 or abs(py) > 3  # outside the hole
    from tilemaker_ray.geo.pip import points_in_polygon
    assert points_in_polygon(np.array([px]), np.array([py]), rings)[0]


def test_media_decode_features():
    t = multimodal.synth_media_batch({"id": np.arange(30)})
    out = multimodal.MediaFeatures()(t)
    assert out.num_rows == 30
    assert set(out["kind"].to_pylist()) == {"image", "audio", "video"}
    assert all(n > 0 for n in out["n_elems"].to_pylist())


def test_media_resize_and_frames():
    t = multimodal.synth_media_batch({"id": np.arange(30)})
    resized = multimodal.ImageResize()(t)
    assert resized.num_rows == 10  # one third are images
    for w, h, p in zip(resized["width"].to_pylist(),
                       resized["height"].to_pylist(),
                       resized["payload"].to_pylist()):
        k, img = multimodal._decode(p)
        assert k == "image" and img.shape == (h, w)
    frames = multimodal.FrameSampler(every=2)(t)
    assert frames.num_rows > 10  # videos × sampled frames
    assert frames["frame_idx"].to_pylist()[0] == 0


def test_media_pipeline_ray(ray_session):
    ds = multimodal.media_dataset(200)
    out = ds.map_batches(multimodal.MediaFeatures, batch_format="pyarrow",
                         batch_size=64, concurrency=(1, 2))
    df = out.to_pandas()
    assert len(df) == 200
    assert "payload" not in df.columns  # wide column dropped


def test_decode_external_is_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_external(b"\x89PNG....")
