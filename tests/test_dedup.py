"""Dedup + text-analysis operators vs brute-force oracles on planted
corpora (the LSH paths must find every planted near-dup and nothing
spurious after verification)."""

import numpy as np
import pyarrow as pa
import pytest

from tilemaker_ray.stages import dedup, textstats

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lamda mu nu xi omicron pi rho sigma tau upsilon").split()


def corpus(n=60, seed=7):
    """Random docs + planted near-dup pairs (ids 1000+i ≈ copy of i
    with one word changed) + exact dups (2000+i == i)."""
    rng = np.random.RandomState(seed)
    ids, texts = [], []
    for i in range(n):
        ids.append(i)
        texts.append(" ".join(rng.choice(WORDS, 40)))
    for i in range(6):
        t = texts[i].split()
        t[5] = "REPLACED"
        ids.append(1000 + i)
        texts.append(" ".join(t))
    for i in range(4):
        ids.append(2000 + i)
        texts.append(texts[i])
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def brute_jaccard_pairs(t, k, threshold):
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    sh = [dedup._shingle_hashes(x, k) for x in texts]
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if dedup.jaccard(sh[i], sh[j]) >= threshold:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd
    return rd.from_arrow(corpus())


def test_minhash_finds_planted_dups(docs_ds):
    t = corpus()
    got = dedup.minhash_near_dups(docs_ds, threshold=0.7).to_pandas()
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))
    expect = brute_jaccard_pairs(t, 5, 0.7)
    # verification removes false positives → got ⊆ expect
    assert got_pairs.issubset(expect)
    # planted exact dups must all be found (sig identical → same buckets)
    for i in range(4):
        assert (i, 2000 + i) in got_pairs
    # near-dups (1 word / 40 changed → jac ≈ 0.75) overwhelmingly found
    planted = {(i, 1000 + i) for i in range(6)} & expect
    found = planted & got_pairs
    assert len(found) >= len(planted) - 1


def test_minhash_signature_jaccard_estimate():
    h = dedup.MinHasher(128)
    a = dedup._shingle_hashes(" ".join(WORDS * 3), 3)
    t2 = " ".join(WORDS * 3) + " extra words here now"
    b = dedup._shingle_hashes(t2, 3)
    true_j = dedup.jaccard(a, b)
    est = (h.signature(a) == h.signature(b)).mean()
    assert abs(est - true_j) < 0.15


def test_simhash_near_dups(docs_ds):
    got = dedup.simhash_near_dups(docs_ds, max_hamming=3).to_pandas()
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    # exact dups: hamming 0
    for i in range(4):
        assert (i, 2000 + i) in pairs
    ham = dict(zip(zip(got["doc_a"], got["doc_b"]), got["hamming"]))
    for i in range(4):
        assert ham[(i, 2000 + i)] == 0
    # brute-force check: every reported pair truly within hamming 3
    t = corpus()
    sigs = dict(zip(t["doc_id"].to_pylist(),
                    dedup.simhash64(t["text"].to_pylist()).tolist()))
    for a, b in pairs:
        x = np.uint64(sigs[a]) ^ np.uint64(sigs[b])
        assert bin(int(x)).count("1") <= 3


def test_embedding_near_dups(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(3)
    V = rng.normal(size=(50, 16)).astype(np.float32)
    V[40] = V[0] + rng.normal(scale=0.01, size=16)  # planted near-dup
    V[41] = V[1]                                    # planted exact dup
    t = pa.table({"vec_id": pa.array(range(50), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in V],
                                        pa.list_(pa.float32()))})
    got = dedup.embedding_near_dups(rd.from_arrow(t), dim=16,
                                    threshold=0.95).to_pandas()
    pairs = set(zip(got["vec_a"], got["vec_b"]))
    assert (0, 40) in pairs and (1, 41) in pairs
    # verify: all reported pairs truly ≥ threshold
    Vn = V.astype(np.float64)
    Vn /= np.linalg.norm(Vn, axis=1, keepdims=True)
    for a, b in pairs:
        assert Vn[a] @ Vn[b] >= 0.95


def test_langid():
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array([
                      "the cat and the dog sat in the garden of the house",
                      "der Hund und die Katze ist nicht in der Küche",
                      "xyzzy qwerty plugh"], pa.string())})
    out = textstats.make_langid_fn()(t)
    assert out["lang_pred"].to_pylist() == ["en", "de", "und"]


def test_quality():
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array([
                      "a sensible document with plenty of normal words here",
                      "!!! ??? ... ###"], pa.string())})
    out = textstats.make_quality_fn()(t)
    assert out["quality_keep"].to_pylist() == [True, False]
    assert out["n_words"].to_pylist()[0] == 9


def test_fingerprint_stability_and_md5():
    import hashlib
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["hello world " * 20,
                                    "hello world " * 20,
                                    "different text " * 20], pa.string())})
    out = textstats.make_fingerprint_fn()(t)
    fp = out["fingerprint"].to_pylist()
    assert fp[0] == fp[1] and fp[0] != fp[2]
    assert out["content_md5"].to_pylist()[0] == hashlib.md5(
        ("hello world " * 20).encode()).hexdigest()


def test_token_counts():
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["one two three four"], pa.string())})
    out = textstats.token_count_fn(t)
    assert out["n_ws_tokens"].to_pylist() == [4]
    assert out["n_subword_est"].to_pylist()[0] >= 4


def test_minhash_dedup_keep_matches_union_find(docs_ds):
    """The anti-join keep-min rule must equal classic union-find
    keep-one-per-component over the CONFIRMED pair set."""
    t = corpus()
    got_pairs = dedup.minhash_near_dups(docs_ds, threshold=0.7).to_pandas()
    pairs = list(zip(got_pairs["doc_a"], got_pairs["doc_b"]))
    # union-find over the pairs the pipeline itself confirmed
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    all_ids = t["doc_id"].to_pylist()
    expect = {i for i in all_ids if find(i) == i}
    got = set(dedup.minhash_dedup_keep(docs_ds, threshold=0.7)
              .to_pandas()["doc_id"])
    assert got == expect
    # sanity: every planted exact dup (2000+i) was dropped
    for i in range(4):
        assert 2000 + i not in got and i in got


def test_simhash_dedup_keep(docs_ds):
    """SimHash keep-one: all exact dups dropped, originals kept, result
    is a subset of the corpus with one representative per component."""
    got = set(dedup.simhash_dedup_keep(docs_ds, max_hamming=3)
              .to_pandas()["doc_id"])
    for i in range(4):
        assert i in got and 2000 + i not in got
    all_ids = set(corpus()["doc_id"].to_pylist())
    assert got <= all_ids and len(got) >= len(all_ids) - 15


def test_embedding_near_dups_measured_recall(ray_session):
    """Quantified recall: 40 planted pairs spread across the ≥0.9
    cosine band; the unioned multi-set LSH must recover ≥85% of the
    brute-force pair set (theory: miss ≈ (1-(1-θ/π)^p)^s ≈ 0.02 at
    cos 0.95, ~0.18 at cos 0.90), and precision must be exactly 1
    (the verify stage is exact cosine)."""
    import ray.data as rd
    rng = np.random.RandomState(29)
    base = rng.normal(size=(200, 16))
    planted = []
    V = list(base)
    for i in range(40):
        # rotate a copy toward a random direction to hit a target cos
        target = 0.90 + 0.0025 * i          # 0.90 .. 0.9975
        v = base[i] / np.linalg.norm(base[i])
        r = rng.normal(size=16)
        r -= (r @ v) * v
        r /= np.linalg.norm(r)
        w = target * v + np.sqrt(1 - target ** 2) * r
        V.append(w * np.linalg.norm(base[i]))
        planted.append((i, 200 + i))
    V = np.asarray(V, dtype=np.float32)
    Vn = V.astype(np.float64)
    Vn /= np.linalg.norm(Vn, axis=1, keepdims=True)
    S = Vn @ Vn.T
    ia, ib = np.triu_indices(len(V), k=1)
    truth = {(int(a), int(b)) for a, b in zip(ia[S[ia, ib] >= 0.9],
                                              ib[S[ia, ib] >= 0.9])}
    assert len(truth) >= 40
    t = pa.table({"vec_id": pa.array(range(len(V)), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in V],
                                        pa.list_(pa.float32()))})
    got = dedup.embedding_near_dups(rd.from_arrow(t), dim=16,
                                    threshold=0.9).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(got["vec_a"], got["vec_b"])}
    assert pairs <= truth                  # precision 1.0 (exact verify)
    recall = len(pairs & truth) / len(truth)
    assert recall >= 0.85, f"recall {recall:.3f}"


def test_cc_distributed_path_on_high_diameter_graph(ray_session):
    """driver_cap=0 forces the distributed loop; a 120-node path plus a
    16x16 grid (diameter ~30) converges only because of the pointer-
    jump round (plain relaxation needs diameter rounds and used to hit
    the iteration cap unconverged on exactly this shape)."""
    import ray.data as rd
    edges = []
    base = 10_000
    edges += [(base + i, base + i + 1) for i in range(120)]  # path
    W = 16
    for gx in range(W):
        for gy in range(W):
            nid = 20_000 + gx * W + gy
            if gx + 1 < W:
                edges.append((nid, nid + W))
            if gy + 1 < W:
                edges.append((nid, nid + 1))
    a = pa.array([e[0] for e in edges], pa.int64())
    b = pa.array([e[1] for e in edges], pa.int64())
    pairs = rd.from_arrow(pa.table({"doc_a": a, "doc_b": b}))
    comp = dedup.connected_components_min_label(
        pairs, num_buckets=8, driver_cap=0).to_pandas()
    got = dict(zip(comp["doc_id"], comp["comp"]))
    assert len(got) == 121 + W * W
    assert all(got[10_000 + i] == 10_000 for i in range(121))
    assert all(got[20_000 + i] == 20_000 for i in range(W * W))


def test_cc_driver_path_matches_distributed(ray_session):
    """Same random edge set through both paths → identical labels."""
    import ray.data as rd
    rng = np.random.RandomState(31)
    a = rng.randint(0, 300, 400).astype(np.int64)
    b = rng.randint(0, 300, 400).astype(np.int64)
    keep = a != b
    pairs_t = pa.table({"doc_a": pa.array(a[keep], pa.int64()),
                        "doc_b": pa.array(b[keep], pa.int64())})
    d1 = dedup.connected_components_min_label(
        rd.from_arrow(pairs_t)).to_pandas()
    d2 = dedup.connected_components_min_label(
        rd.from_arrow(pairs_t), num_buckets=8, driver_cap=0).to_pandas()
    m1 = dict(zip(d1["doc_id"], d1["comp"]))
    m2 = dict(zip(d2["doc_id"], d2["comp"]))
    assert m1 == m2


# ---------------------------------------------------------------------------
# round 3: oversized-LSH-bucket degradation (star pairs, no silent drop)
# ---------------------------------------------------------------------------

def test_bucket_pairs_oversized_run_degrades_to_star():
    import pyarrow as pa
    from tilemaker_ray.stages.dedup import bucket_pairs_from_runs
    n = 50
    g = pa.table({"band": pa.array([1] * n, pa.int32()),
                  "band_hash": pa.array([7] * n, pa.int64()),
                  "doc_id": pa.array(list(range(100, 100 + n)),
                                     pa.int64())})
    out = bucket_pairs_from_runs(g, ["band", "band_hash"], "doc_id",
                                 max_bucket=10)
    # star: min id (100) paired with every other member, m-1 pairs
    assert out.num_rows == n - 1
    assert set(out["doc_a"].to_pylist()) == {100}
    assert sorted(out["doc_b"].to_pylist()) == list(range(101, 100 + n))


def test_minhash_dedup_keep_survives_mega_bucket(ray_session):
    # 250 identical docs (> max_bucket=200 in EVERY band) + 5 unique:
    # the star fallback must keep the component connected so exactly
    # one of the 250 survives; pre-fix the cap silently dropped every
    # pair and all 250 survived
    import pyarrow as pa
    import ray.data as rd
    from tilemaker_ray.stages.dedup import minhash_dedup_keep
    same = "the quick brown fox jumps over the lazy dog again and again"
    uniq = [f"completely different document number {i} about topic {i}"
            for i in range(5)]
    t = pa.table({
        "doc_id": pa.array(list(range(255)), pa.int64()),
        "text": pa.array([same] * 250 + uniq, pa.string())})
    kept = minhash_dedup_keep(rd.from_arrow(t).repartition(4),
                              threshold=0.7)
    ids = sorted(kept.to_pandas()["doc_id"].tolist())
    assert ids == [0, 250, 251, 252, 253, 254]


def test_embedding_near_dups_oversized_bucket_star(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from tilemaker_ray.stages.dedup import embedding_near_dups
    rng = np.random.RandomState(3)
    base = rng.normal(size=8)
    # 20 near-identical vectors -> same LSH bucket in every set
    V = np.stack([base + rng.normal(scale=1e-4, size=8)
                  for _ in range(20)])
    t = pa.table({
        "vec_id": pa.array(list(range(20)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float32()))})
    out = embedding_near_dups(rd.from_arrow(t), dim=8, threshold=0.9,
                              max_bucket=10).to_pandas()
    # star verify: every member reachable from the rep (vec 0)
    got = set(map(tuple, out[["vec_a", "vec_b"]].values))
    assert {(0, b) for b in range(1, 20)} <= got
