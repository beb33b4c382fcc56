"""Oracles for the round-4 second-wave operators: canonical-URL dedup,
interval-union coverage, compression-ratio signal, Count-Min sketch."""

import numpy as np
import pyarrow as pa
import pytest

# ---------------------------------------------------------------------------
# canonicalize_urls: Arrow kernel vs the DuckDB SQL mirror, adversarial
# ---------------------------------------------------------------------------

ADVERSARIAL_URLS = [
    "https://Example.COM:443/Path/To?utm_source=feed&utm_campaign=x#frag",
    "http://a.com:80/",
    "https://a.com/x/?a=1&utm_medium=y&b=2",
    "https://a.com/x?utm_a=1&utm_b=2&c=3",      # consecutive tracking
    "https://a.com/x?utm_a=1&utm_b=2",
    "https://a.com/x?gclid=123",
    "HTTPS://A.COM/UPPER/Path",                 # path case preserved
    "ftp://Host.net:21/file",                   # non-default port kept
    "no-scheme/paTh/",                          # schemeless fallback
    "https://a.com//",
    "https://a.com/x/y/#sec?utm_x=1",           # tracking inside frag
    "https://a.com/?fbclid=abc&q=1",
    "https://a.com:8080/x",
    "https://a.com/x?a=1&b=2",
    "https://a.com",
    "https://a.com/x#a#b",
    "https://a.com/x?utm_source=a#f?utm_medium=b",
]


def test_canonicalize_urls_matches_sql_mirror():
    import duckdb

    from tilemaker_ray.stages.urlstats import (CANON_SQL_EXPR,
                                               CANON_SQL_STEPS,
                                               canonicalize_urls)
    got = canonicalize_urls(pa.array(ADVERSARIAL_URLS)).to_pylist()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)",
                    [(u,) for u in ADVERSARIAL_URLS])
    sql = ("SELECT " + CANON_SQL_EXPR + " AS c FROM ("
           + CANON_SQL_STEPS.format(col="u", src="t") + ")")
    exp = [r[0] for r in con.execute(sql).fetchall()]
    assert got == exp


def test_canonicalize_urls_semantics():
    from tilemaker_ray.stages.urlstats import canonicalize_urls

    def c(u):
        return canonicalize_urls(pa.array([u]))[0].as_py()

    # the five rule families, asserted on VALUES (not just parity)
    assert c("https://A.com/x#frag") == "https://a.com/x"
    assert c("https://a.com/x?utm_source=s&q=1") == "https://a.com/x?q=1"
    assert c("https://a.com:443/x") == "https://a.com/x"
    assert c("http://a.com:80/x") == "http://a.com/x"
    assert c("https://a.com/x/") == "https://a.com/x"
    # case preserved where it matters
    assert c("https://a.com/CaseSensitive?Q=V") == \
        "https://a.com/CaseSensitive?Q=V"
    # dedup behavior: all dirty variants of one page collapse
    variants = [
        "https://example.br/tokyo/7",
        "https://example.br/tokyo/7?utm_source=feed&utm_campaign=x#top",
        "HTTPS://EXAMPLE.BR:443/tokyo/7",
        "https://example.br/tokyo/7/",
    ]
    forms = set(canonicalize_urls(pa.array(variants)).to_pylist())
    assert forms == {"https://example.br/tokyo/7"}


# ---------------------------------------------------------------------------
# interval_coverage: brute-force single-process oracle
# ---------------------------------------------------------------------------

def _brute_coverage(rows):
    """rows = (user, start_us, end_us); returns {user: (n_isl, cov)}."""
    from collections import defaultdict
    by_user = defaultdict(list)
    for u, s, e in rows:
        by_user[u].append((s, e))
    out = {}
    for u, iv in by_user.items():
        iv.sort()
        n_isl, cov = 0, 0
        cur_s, cur_e = None, None
        for s, e in iv:
            if cur_s is None or s > cur_e:     # strict: touching merges
                if cur_s is not None:
                    cov += cur_e - cur_s
                n_isl += 1
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        cov += cur_e - cur_s
        out[u] = (n_isl, cov)
    return out


def test_interval_coverage_matches_brute(ray_session):
    import ray.data as rd

    from tilemaker_ray.stages.windows import interval_coverage
    rng = np.random.RandomState(7)
    n = 4000
    users = rng.randint(0, 37, n)
    base = 1_700_000_000_000_000
    starts = base + rng.randint(0, 10_000_000_000, n)
    durs = rng.randint(0, 50_000_000, n) / 1e6  # seconds, incl. zeros
    tbl = pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(starts, pa.timestamp("us")),
        "value": pa.array(durs, pa.float64())})
    got = interval_coverage(
        rd.from_arrow(tbl).repartition(13)).to_pandas()
    rows = [(int(u), int(s), int(s) + max(int(np.floor(d * 1e6)), 0))
            for u, s, d in zip(users, starts, durs)]
    exp = _brute_coverage(rows)
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert exp[r.user_id] == (r.n_islands, r.covered_us), r.user_id


def test_interval_coverage_touching_and_zero(ray_session):
    import ray.data as rd

    from tilemaker_ray.stages.windows import interval_coverage
    # [0,10] + [10,20] merge (touching); [30,30] is a zero-length island
    tbl = pa.table({
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([0, 10_000_000, 30_000_000], pa.timestamp("us")),
        "value": pa.array([10.0, 10.0, 0.0], pa.float64())})
    got = interval_coverage(rd.from_arrow(tbl)).to_pandas()
    assert len(got) == 1
    assert got.n_islands[0] == 2
    assert got.covered_us[0] == 20_000_000


# ---------------------------------------------------------------------------
# compress_stats_fn: golden values + determinism
# ---------------------------------------------------------------------------

def test_compress_stats_golden():
    import zlib

    from tilemaker_ray.stages.textstats import compress_stats_fn
    texts = ["ababababababab" * 10, "the quick brown fox", "",
             "z" * 1000, "Üñïçøðé text"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = compress_stats_fn(t)
    for i, s in enumerate(texts):
        raw = s.encode("utf-8")
        assert got["n_bytes"][i].as_py() == len(raw)
        assert got["comp_bytes"][i].as_py() == len(zlib.compress(raw, 6))
    # repetitive text compresses far better than prose
    ratios = [c.as_py() / max(n.as_py(), 1)
              for c, n in zip(got["comp_bytes"], got["n_bytes"])]
    assert ratios[0] < 0.15 < ratios[1]


# ---------------------------------------------------------------------------
# Count-Min sketch: bit-exact merge, partition invariance, guarantees
# ---------------------------------------------------------------------------

def _reference_cms(word_counts, depth, width):
    from tilemaker_ray.stages.dedup import _word_hash
    from tilemaker_ray.stages.sketch import cms_cells
    mat = np.zeros(depth * width, dtype=np.int64)
    for w, c in word_counts.items():
        cells = cms_cells(np.array([_word_hash(w)], dtype=np.uint64),
                          depth, width)[:, 0]
        mat[cells] += c
    return mat.reshape(depth, width)


def test_cms_bit_exact_and_partition_invariant(ray_session):
    from collections import Counter

    import ray
    import ray.data as rd

    from tilemaker_ray.stages.dedup import _word_hash
    from tilemaker_ray.stages.sketch import (CMS_DEPTH, CMS_WIDTH,
                                             cms_estimate, cms_matrix,
                                             cms_word_cells)
    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(500)]
    texts = [" ".join(rng.choice(vocab, rng.randint(3, 40)))
             for _ in range(800)]
    tbl = pa.table({"text": pa.array(texts, pa.string())})

    def merged(nparts):
        ds = cms_word_cells(rd.from_arrow(tbl).repartition(nparts))
        return cms_matrix(
            pa.concat_tables(ray.get(list(ds.to_arrow_refs()))))

    m4, m17 = merged(4), merged(17)
    assert np.array_equal(m4, m17)  # partition invariance

    true = Counter(w for t in texts for w in t.split(" "))
    ref = _reference_cms(true, CMS_DEPTH, CMS_WIDTH)
    assert np.array_equal(m4, ref)  # bit-exact vs single-process

    # never undercounts, for EVERY word; error bounded in expectation
    words = list(true)
    wh = np.fromiter((_word_hash(w) for w in words), dtype=np.uint64,
                     count=len(words))
    est = cms_estimate(m4, wh)
    exact = np.array([true[w] for w in words])
    assert (est >= exact).all()
    n_total = sum(true.values())
    # standard bound: err <= e/width * N with prob 1 - e^-depth per
    # query; assert the 99th percentile stays under it (loose, stable)
    bound = np.e / CMS_WIDTH * n_total
    assert np.quantile(est - exact, 0.99) <= bound


def test_cms_query_smoke(ray_session):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.queries()["cms_word_freq_docs"](
        "/root/testdata/sf0.001").to_pandas()
    assert len(df) == 20
    assert (df.n_est >= df.n_exact).all()
    assert (df.overcount == df.n_est - df.n_exact).all()
