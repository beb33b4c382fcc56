"""Sorted-neighborhood linkage oracles: lane-vectorized Levenshtein vs
scalar DP, and the windowed pairing rule vs a brute enumeration."""

import numpy as np

from tilemaker_ray.pipelines.queries import (_SNM_MAXD, _SNM_W,
                                             _lev_batch)


def _lev_scalar(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != cb))
        prev = cur
    return prev[len(b)]


def test_lev_batch_matches_scalar():
    rng = np.random.RandomState(0)
    alpha = "abcde"
    pairs = []
    for _ in range(200):
        la, lb = rng.randint(0, 12, 2)
        pairs.append(("".join(rng.choice(list(alpha), la)),
                      "".join(rng.choice(list(alpha), lb))))
    a, b = zip(*pairs)
    d = _lev_batch(list(a), list(b))
    for i, (x, y) in enumerate(pairs):
        assert d[i] == _lev_scalar(x, y), (x, y)


def test_lev_batch_unicode():
    a = ["café", "日本語", ""]
    b = ["cafe", "日本", "xyz"]
    d = _lev_batch(a, b)
    assert d.tolist() == [1, 1, 3]


def test_window_pairing_brute(ray_session):
    """The distributed pipeline's pairs at sf0.001 equal the brute
    (rank-sorted, all (r, r+k) k<=W) enumeration."""
    import duckdb

    from tilemaker_ray.pipelines.queries import (_SNM_KLEN,
                                                 q_sorted_neighborhood_docs)
    got = q_sorted_neighborhood_docs("/root/testdata/sf0.001") \
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    rows = duckdb.sql(
        "SELECT doc_id, substr(text, 1, %d) AS k FROM "
        "'/root/testdata/sf0.001/documents.parquet'" % _SNM_KLEN
    ).fetchall()
    rows.sort(key=lambda r: (r[1], r[0]))
    want = []
    for i in range(len(rows)):
        for k in range(1, _SNM_W + 1):
            if i + k >= len(rows):
                continue
            d = _lev_scalar(rows[i][1], rows[i + k][1])
            if d <= _SNM_MAXD:
                want.append((rows[i][0], rows[i + k][0], d))
    want.sort()
    assert len(got) == len(want)
    assert list(map(tuple, got.to_numpy())) == want
