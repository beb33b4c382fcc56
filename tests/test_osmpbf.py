"""Literal .osm.pbf codec + Ray Data source (sources/osmpbf.py).

Round-trip oracles: every wire-format feature the decoder handles is
exercised through the deterministic encoder (blob framing, zlib/raw,
string tables, delta+zigzag packed sint64, DenseNodes keys_vals
0-termination, granularity/offset coordinate scaling, the
Sort.Type_then_ID type-range bisection). The reference semantics live
in /root/reference/src/pbf_reader.cpp:1-603 — intentional divergence:
we ACCEPT non-dense Node messages the reference rejects
(pbf_reader.cpp:297-299)."""

import numpy as np
import pyarrow as pa
import pytest

from tilemaker_ray.sources import osmpbf as O


def _nodes(ids, lats, lons, tags=None):
    n = len(ids)
    return pa.table({
        "node_id": pa.array(ids, pa.int64()),
        "lat_i7": pa.array(lats, pa.int64()),
        "lon_i7": pa.array(lons, pa.int64()),
        "tags": pa.array(tags or ["{}"] * n, pa.string()),
    })


def _ways(ids, refs, tags=None):
    return pa.table({
        "way_id": pa.array(ids, pa.int64()),
        "refs": pa.array(refs, pa.list_(pa.int64())),
        "tags": pa.array(tags or ["{}"] * len(ids), pa.string()),
        "lats_i7": pa.array([None] * len(ids), pa.list_(pa.int64())),
        "lons_i7": pa.array([None] * len(ids), pa.list_(pa.int64())),
    })


def _rels(ids, mids, mtypes, mroles, tags=None):
    return pa.table({
        "relation_id": pa.array(ids, pa.int64()),
        "member_ids": pa.array(mids, pa.list_(pa.int64())),
        "member_types": pa.array(mtypes, pa.list_(pa.string())),
        "member_roles": pa.array(mroles, pa.list_(pa.string())),
        "tags": pa.array(tags or ["{}"] * len(ids), pa.string()),
    })


def _decode_all(path):
    out = {"nodes": [], "ways": [], "relations": []}
    for b in O.scan_blobs(path):
        if b["kind"] != "OSMData":
            continue
        d = O.decode_primitive_block(
            O.read_blob_payload(path, b["offset"], b["size"]))
        for k in out:
            out[k].append(d[k])
    return {k: pa.concat_tables(v) if v else None
            for k, v in out.items()}


# ---------------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------------

def test_packed_varint_kernel_matches_scalar():
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.integers(0, 1 << 62, 500).astype(np.uint64),
        np.array([0, 1, 127, 128, 16383, 16384,
                  (1 << 64) - 1, 1 << 63], dtype=np.uint64)])
    payload = O.encode_packed_u64(vals)
    got = O.decode_packed_u64(payload)
    assert got.dtype == np.uint64
    assert np.array_equal(got, vals)


def test_packed_varint_empty_and_errors():
    assert O.decode_packed_u64(b"").size == 0
    with pytest.raises(ValueError):
        O.decode_packed_u64(b"\x80")  # truncated
    with pytest.raises(ValueError):
        O.decode_packed_u64(b"\x80" * 11 + b"\x01")  # > 10 bytes


def test_zigzag_delta_roundtrip_extremes():
    v = np.array([0, -1, 1, 2**62, -(2**62), 40, 39],
                 dtype=np.int64)
    back = O.decode_packed_s64_delta(O.encode_packed_s64_delta(v))
    assert np.array_equal(back, v)


# ---------------------------------------------------------------------------
# full-file round trips
# ---------------------------------------------------------------------------

def test_roundtrip_all_entities_multiblock(tmp_path):
    nodes = _nodes([1, 5, 9, 1_000_000_007],
                   [-850000000, 0, 123456789, 850000000],
                   [-1800000000, 7, -123, 1800000000],
                   ['{"t":"v1"}', "{}", '{"a":"b","t":"v2"}', "{}"])
    ways = _ways([10, 20], [[1, 5, 9], [9, 1]], ['{"w":"h1"}', "{}"])
    rels = _rels([100], [[10, 1]], [["way", "node"]],
                 [["outer", "label"]], ['{"r":"x"}'])
    path = str(tmp_path / "rt.osm.pbf")
    nb = O.write_osm_pbf(path, nodes, ways, rels, block_entities=2)
    assert nb == 4  # 2 node blocks + 1 way + 1 relation
    got = _decode_all(path)
    assert got["nodes"].equals(nodes)
    assert got["ways"]["way_id"].to_pylist() == [10, 20]
    assert got["ways"]["refs"].to_pylist() == [[1, 5, 9], [9, 1]]
    assert got["ways"]["tags"].to_pylist() == ['{"w":"h1"}', "{}"]
    assert got["relations"].equals(rels)
    hdr = O.read_header(path)
    assert "DenseNodes" in hdr["required_features"]
    assert "Sort.Type_then_ID" in hdr["optional_features"]


def test_roundtrip_raw_uncompressed(tmp_path):
    nodes = _nodes([3, 4], [11, -11], [22, -22])
    path = str(tmp_path / "raw.osm.pbf")
    O.write_osm_pbf(path, nodes, compress=False)
    assert _decode_all(path)["nodes"].equals(nodes)


def test_granularity_and_offsets(tmp_path):
    # granularity 1000 with offsets: representable coords only
    g, lato, lono = 1000, 5000, -7000
    lat = np.array([5000, 15000, -9995000], dtype=np.int64) // 100
    lon = np.array([-7000, 3000, 1993000], dtype=np.int64) // 100
    nodes = _nodes([1, 2, 3], lat, lon)
    path = str(tmp_path / "g.osm.pbf")
    O.write_osm_pbf(path, nodes, granularity=g, lat_offset=lato,
                    lon_offset=lono)
    assert _decode_all(path)["nodes"].equals(nodes)
    # unrepresentable coords must refuse, not silently round
    with pytest.raises(ValueError):
        O.write_osm_pbf(str(tmp_path / "bad.osm.pbf"),
                        _nodes([1], [7], [0]), granularity=g,
                        lat_offset=lato, lon_offset=lono)


def test_way_with_inline_locations(tmp_path):
    ways = pa.table({
        "way_id": pa.array([7], pa.int64()),
        "refs": pa.array([[1, 2]], pa.list_(pa.int64())),
        "tags": pa.array(["{}"], pa.string()),
        "lats_i7": pa.array([[100, 200]], pa.list_(pa.int64())),
        "lons_i7": pa.array([[-100, -200]], pa.list_(pa.int64())),
    })
    path = str(tmp_path / "wl.osm.pbf")
    O.write_osm_pbf(path, ways=ways)
    got = _decode_all(path)["ways"]
    assert got["lats_i7"].to_pylist() == [[100, 200]]
    assert got["lons_i7"].to_pylist() == [[-100, -200]]


def test_header_bbox(tmp_path):
    path = str(tmp_path / "bb.osm.pbf")
    O.write_osm_pbf(path, _nodes([1], [0], [0]),
                    bbox_i9=(-1_000_000_000, -500_000_000,
                             2_000_000_000, 800_000_000))
    hdr = O.read_header(path)
    assert hdr["bbox"] == (-1.0, -0.5, 2.0, 0.8)


def test_plain_node_decode_divergence():
    # hand-encode a non-dense Node (id=9, lat raw=50, lon raw=-60,
    # one tag) — the reference rejects these; we accept
    st = (O._field_len(1, b"") + O._field_len(1, b"k") +
          O._field_len(1, b"v"))

    def zz(v):
        return O.encode_varint(int(O.zigzag_encode(
            np.array([v], dtype=np.int64))[0]))

    node = (O._field(1, 0, zz(9)) +
            O._field_len(2, O.encode_packed_u64([1])) +
            O._field_len(3, O.encode_packed_u64([2])) +
            O._field(8, 0, zz(50)) + O._field(9, 0, zz(-60)))
    block = (O._field_len(1, st) +
             O._field_len(2, O._field_len(1, node)))
    got = O.decode_primitive_block(block)["nodes"]
    assert got["node_id"].to_pylist() == [9]
    assert got["lat_i7"].to_pylist() == [50]   # granularity 100
    assert got["lon_i7"].to_pylist() == [-60]
    assert got["tags"].to_pylist() == ['{"k":"v"}']


def test_tagless_dense_block_empty_keys_vals(tmp_path):
    # all-tagless DenseNodes may omit keys_vals terminators entirely
    nodes = _nodes([1, 2, 3], [0, 1, 2], [0, -1, -2])
    path = str(tmp_path / "nt.osm.pbf")
    O.write_osm_pbf(path, nodes)
    assert _decode_all(path)["nodes"].equals(nodes)


# ---------------------------------------------------------------------------
# type-range bisection (Sort.Type_then_ID)
# ---------------------------------------------------------------------------

def test_probe_and_sorted_range(tmp_path):
    nodes = _nodes(list(range(1, 9)), [0] * 8, [0] * 8)
    ways = _ways([10, 11, 12], [[1], [2], [3]])
    rels = _rels([20], [[10]], [["way"]], [["outer"]])
    path = str(tmp_path / "sr.osm.pbf")
    O.write_osm_pbf(path, nodes, ways, rels, block_entities=2)
    blocks = [b for b in O.scan_blobs(path) if b["kind"] == "OSMData"]
    kinds = [O.probe_block_kinds(path, b) for b in blocks]
    assert kinds == [{"nodes"}] * 4 + [{"ways"}] * 2 + [{"relations"}]
    for kind, lo, hi in (("nodes", 0, 4), ("ways", 4, 6),
                         ("relations", 6, 7)):
        sel = O._sorted_kind_range(path, blocks, kind)
        assert sel == blocks[lo:hi], kind


def _write_mixed_boundary_file(path):
    """Hand-compose a Sort.Type_then_ID file whose node→way boundary
    block is MIXED (one PrimitiveGroup holding both the last DenseNodes
    run and the first Way) — the layout real planet extracts can have
    and the repo's own writer never emits. Layout:
    block0 nodes[1,2] · block1 node[3]+way[10] · block2 ways[11,12] ·
    block3 relation[20]."""
    def dense_group(ids):
        n = len(ids)
        z = np.zeros(n, dtype=np.int64)
        dense = (O._field_len(1, O.encode_packed_s64_delta(
                     np.array(ids, np.int64))) +
                 O._field_len(8, O.encode_packed_s64_delta(z)) +
                 O._field_len(9, O.encode_packed_s64_delta(z)) +
                 O._field_len(10, O.encode_packed_u64([0] * n)))
        return O._field_len(2, dense)

    def way_group(wid, refs):
        msg = (O._field_varint(1, wid) +
               O._field_len(8, O.encode_packed_s64_delta(
                   np.array(refs, np.int64))))
        return O._field_len(3, msg)

    def rel_group(rid, mids):
        msg = (O._field_varint(1, rid) +
               O._field_len(8, O.encode_packed_u64([0] * len(mids))) +
               O._field_len(9, O.encode_packed_s64_delta(
                   np.array(mids, np.int64))) +
               O._field_len(10, O.encode_packed_u64([1] * len(mids))))
        return O._field_len(4, msg)

    def frame_block(group_bytes):
        block = O._encode_primitive_block(group_bytes, O._StringTable())
        return O._frame("OSMData", O._encode_blob(block, True))

    header = (O._field_len(4, b"OsmSchema-V0.6") +
              O._field_len(4, b"DenseNodes") +
              O._field_len(5, b"Sort.Type_then_ID"))
    with open(path, "wb") as f:
        f.write(O._frame("OSMHeader", O._encode_blob(header, True)))
        f.write(frame_block(dense_group([1, 2])))
        f.write(frame_block(dense_group([3]) + way_group(10, [1, 2])))
        f.write(frame_block(way_group(11, [2, 3]) + way_group(12, [3])))
        f.write(frame_block(rel_group(20, [10])))


def test_sorted_range_mixed_boundary_block(tmp_path):
    # ADVICE r4 (high): a boundary blob holding both nodes and ways
    # must land in BOTH adjacent kind ranges — min-kind half-open
    # ranges silently dropped its ways (reference keeps the transition
    # block in each range, pbf_processor.cpp:545-591)
    path = str(tmp_path / "mix.osm.pbf")
    _write_mixed_boundary_file(path)
    blocks = [b for b in O.scan_blobs(path) if b["kind"] == "OSMData"]
    assert O.probe_block_kinds(path, blocks[1]) == {"nodes", "ways"}
    sel_n = O._sorted_kind_range(path, blocks, "nodes")
    sel_w = O._sorted_kind_range(path, blocks, "ways")
    sel_r = O._sorted_kind_range(path, blocks, "relations")
    assert sel_n == blocks[0:2]
    assert sel_w == blocks[1:3]   # includes the mixed boundary block
    assert sel_r == blocks[3:4]


def test_read_mixed_boundary_file_loses_nothing(ray_session, tmp_path):
    path = str(tmp_path / "mix2.osm.pbf")
    _write_mixed_boundary_file(path)
    nodes = O.read_osm_pbf(path, "nodes").to_pandas()
    ways = O.read_osm_pbf(path, "ways").to_pandas()
    rels = O.read_osm_pbf(path, "relations").to_pandas()
    assert sorted(nodes["node_id"]) == [1, 2, 3]
    assert sorted(ways["way_id"]) == [10, 11, 12]
    assert rels["relation_id"].tolist() == [20]


def test_negative_way_relation_ids_roundtrip(tmp_path):
    # ADVICE r4 (low): plain int64 varint ids — a negative id arrives
    # as a 10-byte varint >= 2^63 and must get the two's-complement
    # sign fix (same as lat_offset/lon_offset fields 19/20)
    ways = _ways([-7, 5], [[1], [2]])
    rels = _rels([-99], [[-7]], [["way"]], [["outer"]])
    path = str(tmp_path / "neg.osm.pbf")
    O.write_osm_pbf(path, None, ways, rels)
    got = _decode_all(path)
    assert got["ways"]["way_id"].to_pylist() == [-7, 5]
    assert got["relations"]["relation_id"].to_pylist() == [-99]
    assert got["relations"]["member_ids"].to_pylist() == [[-7]]


def test_unsorted_ids_drop_feature(tmp_path):
    path = str(tmp_path / "us.osm.pbf")
    O.write_osm_pbf(path, _nodes([5, 1], [0, 0], [0, 0]))
    hdr = O.read_header(path)
    assert "Sort.Type_then_ID" not in hdr["optional_features"]


# ---------------------------------------------------------------------------
# distributed source
# ---------------------------------------------------------------------------

def test_read_osm_pbf_distributed(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    n = 500
    ids = np.sort(rng.choice(10**9, n, replace=False)).astype(np.int64)
    nodes = _nodes(ids, rng.integers(-850000000, 850000000, n),
                   rng.integers(-1800000000, 1800000000, n),
                   [f'{{"t":"v{int(i) % 5}"}}' for i in ids])
    ways = _ways([1, 2, 3],
                 [ids[:3].tolist(), ids[3:4].tolist(), ids[4:9].tolist()])
    path = str(tmp_path / "d.osm.pbf")
    O.write_osm_pbf(path, nodes, ways, block_entities=64)

    got_n = (O.read_osm_pbf(path, "nodes").to_pandas()
             .sort_values("node_id").reset_index(drop=True))
    exp_n = _decode_all(path)["nodes"].to_pandas() \
        .sort_values("node_id").reset_index(drop=True)
    assert got_n.equals(exp_n)

    got_w = O.read_osm_pbf(path, "ways").to_pandas()
    assert got_w["way_id"].tolist() == [1, 2, 3]
    assert [list(r) for r in got_w["refs"]] == \
        [ids[:3].tolist(), ids[3:4].tolist(), ids[4:9].tolist()]

    # no relations in the file → typed empty dataset
    got_r = O.read_osm_pbf(path, "relations")
    assert got_r.count() == 0
    assert "relation_id" in got_r.schema().names


def test_read_osm_pbf_bad_kind(tmp_path):
    with pytest.raises(ValueError):
        O.read_osm_pbf("/nonexistent", "junk")
