"""Kernel oracles for the fourth-wave round-4 operators: MIME
sniffing, eTLD+1 registered-domain resolution, training sequence
packing, mixture sampling, re-crawl scheduling. End-to-end DuckDB-hash
coverage lives in test_queries_oracle.py (all five queries are
ORACLE_SQL-backed); here each kernel is pinned against a brute-force
single-process reference.
"""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.multimodal import (SNIFF_RULES, prefix_matrix,
                                             sniff_mime)
from tilemaker_ray.stages.urlstats import (NO_REG_DOMAIN,
                                           PUBLIC_SUFFIXES,
                                           registered_domain)


# ---------------------------------------------------------------------------
# MIME sniffing
# ---------------------------------------------------------------------------

CASES = [
    (b"\x89PNG\r\n\x1a\n" + b"x" * 20, "image/png"),
    (b"\xff\xd8\xff\xe0rest", "image/jpeg"),
    (b"RIFF\x10\x00\x00\x00WAVEfmt ", "audio/wav"),
    (b"RIFF\x10\x00\x00\x00AVI LIST", "application/riff"),
    (b"RIFF\x00\x00", "application/riff"),  # too short for WAVE check
    (b"\x1f\x8b\x08\x00gz", "application/gzip"),
    (b"PK\x03\x04\x14\x00zip", "application/zip"),
    (b"%PDF-1.7\n", "application/pdf"),
    (b"FAKI\x04\x00\x04\x00px", "x-fake/image"),
    (b"FAKA\x10\x00\x00\x00ss", "x-fake/audio"),
    (b"FAKV\x02\x00\x02\x00\x01\x00f", "x-fake/video"),
    (b"<html><body>t</body></html>", "text/html"),
    (b"<", "text/html"),
    (b"", "empty"),
    (b"\x89PN", "unknown"),                  # truncated png magic
    (b"plain text here", "unknown"),
    (b"\xff\xd8", "unknown"),                # jpeg needs 3 bytes
]


def brute_sniff(payload: bytes) -> str:
    for mime, off, magic in SNIFF_RULES:
        if len(payload) < off + len(magic):
            continue
        if mime == "audio/wav" and payload[:4] != b"RIFF":
            continue
        if payload[off:off + len(magic)] == magic:
            return mime
    return "empty" if len(payload) == 0 else "unknown"


def test_sniff_mime_cases():
    col = pa.array([p for p, _ in CASES], pa.binary())
    assert sniff_mime(col).to_pylist() == [m for _, m in CASES]
    # and the table above agrees with the rule-driven brute force
    assert [brute_sniff(p) for p, _ in CASES] == [m for _, m in CASES]


def test_sniff_mime_sliced_and_chunked():
    col = pa.array([p for p, _ in CASES], pa.binary())
    sl = col.slice(3, 9)
    assert sniff_mime(sl).to_pylist() == [m for _, m in CASES][3:12]
    ch = pa.chunked_array([col.slice(0, 5), col.slice(5)])
    assert sniff_mime(ch).to_pylist() == [m for _, m in CASES]


def test_sniff_mime_random_brute():
    rng = np.random.RandomState(7)
    magics = [m for _, _, m in SNIFF_RULES] + [b"", b"RIFF", b"\x89"]
    payloads = []
    for i in range(500):
        head = magics[rng.randint(len(magics))]
        body = bytes(rng.randint(0, 256, rng.randint(0, 24),
                                 dtype=np.uint8).tolist())
        payloads.append(head + body if rng.rand() < 0.8 else body)
    col = pa.array(payloads, pa.binary())
    assert sniff_mime(col).to_pylist() == [brute_sniff(p)
                                           for p in payloads]


def test_prefix_matrix_matches_python_slices():
    rng = np.random.RandomState(3)
    payloads = [bytes(rng.randint(0, 256, rng.randint(0, 30),
                                  dtype=np.uint8).tolist())
                for _ in range(200)]
    mat, lengths = prefix_matrix(pa.array(payloads, pa.binary()), 12)
    for i, p in enumerate(payloads):
        assert lengths[i] == len(p)
        want = (p[:12] + b"\x00" * 12)[:12]
        assert bytes(mat[i].tobytes()) == want


# ---------------------------------------------------------------------------
# registered domain (eTLD+1)
# ---------------------------------------------------------------------------

def brute_reg_domain(host: str, suffixes=PUBLIC_SUFFIXES) -> str:
    best = None
    for s in suffixes:
        if (host == s or host.endswith("." + s)) \
                and (best is None or len(s) > len(best)):
            best = s
    if best is None:                      # implicit * rule: last label
        labels = host.split(".")
        if len(labels) < 2:
            return NO_REG_DOMAIN
        return ".".join(labels[-2:])
    if host == best:
        return NO_REG_DOMAIN
    stem = host[:-(len(best) + 1)]
    return stem.split(".")[-1] + "." + best


def test_registered_domain_cases():
    cases = {
        "www.bbc.co.uk": "bbc.co.uk",
        "news.bbc.co.uk": "bbc.co.uk",
        "a.b.github.io": "b.github.io",
        "github.io": NO_REG_DOMAIN,       # host IS a public suffix
        "mysite.github.io": "mysite.github.io",
        "x.com": "x.com",
        "deep.sub.shop.com.au": "shop.com.au",
        "weird.zz": "weird.zz",           # implicit rule
        "a.b.weird.zz": "weird.zz",
        "localhost": NO_REG_DOMAIN,       # single label, no rule
        "k12.ca.us": NO_REG_DOMAIN,
        "pupil.school.k12.ca.us": "school.k12.ca.us",
        "ca.us": "ca.us",                 # matches 'us', label 'ca'
    }
    got = registered_domain(pa.array(list(cases), pa.string()))
    assert got.to_pylist() == list(cases.values())
    assert [brute_reg_domain(h) for h in cases] == list(cases.values())


def test_registered_domain_random_brute():
    rng = np.random.RandomState(11)
    subs = ["", "www", "a.b", "x"]
    names = ["acme", "github", "co", "k12"]
    sfx = PUBLIC_SUFFIXES + ["zz", "dev", "ca.us"]
    hosts = []
    for i in range(800):
        parts = [p for p in (subs[rng.randint(len(subs))],
                             names[rng.randint(len(names))],
                             sfx[rng.randint(len(sfx))]) if p]
        hosts.append(".".join(parts) if rng.rand() < 0.9
                     else sfx[rng.randint(len(sfx))])
    got = registered_domain(pa.array(hosts, pa.string())).to_pylist()
    assert got == [brute_reg_domain(h) for h in hosts]


# ---------------------------------------------------------------------------
# sequence packing arithmetic
# ---------------------------------------------------------------------------

def test_pack_sequences_brute(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.cumulative import cumulative

    rng = np.random.RandomState(5)
    n_tok = rng.randint(0, 40, 300)
    L = 16
    ds = rd.from_arrow(pa.table({
        "part": pa.array(np.zeros(300, np.int64)),
        "doc_id": pa.array(np.arange(300), pa.int64()),
        "cost": pa.array(n_tok + 1, pa.int64())}))
    cum = cumulative(ds, ["part"], ["doc_id"], "cost",
                     ops=("sum",), out_cols=["cum"]).to_pandas()
    cum = cum.sort_values("doc_id").reset_index(drop=True)
    run = 0
    for i in range(300):
        run += n_tok[i] + 1
        assert cum["cum"][i] == run
        start = run - (n_tok[i] + 1)
        # the arithmetic the query applies per row
        assert start // L <= (run - 1) // L
        assert (run - 1) // L - start // L + 1 >= 1


# ---------------------------------------------------------------------------
# mixture sampling + re-crawl arithmetic (pure-rule mirrors)
# ---------------------------------------------------------------------------

def test_mixture_sample_brute(ray_session):
    """End-to-end mixture sampling vs a pandas walk: per source, the
    kept set is exactly the quota-best docs by (n_chars DESC, doc_id)."""
    import pyarrow.parquet as pq
    from tilemaker_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["mixture_sample_docs"](sf).to_pandas()
    docs = pq.read_table(sf + "/documents.parquet",
                         columns=["doc_id", "source",
                                  "n_chars"]).to_pandas()
    kept = set()
    for src, g in docs.groupby("source"):
        quota = 3 + (int(src[3:]) * 5) % 11
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True]).head(quota)
        kept.update(g["doc_id"])
    assert set(out["doc_id"]) == kept
    # rn column really is the per-source quality rank
    one = out[out["source"] == "src0"].sort_values("rn")
    assert (one["n_chars"].diff().dropna() <= 0).all()


def test_recrawl_interval_monotone():
    # more changes -> shorter interval; bounds are [8, 30] days
    prev = None
    for changes in range(5):
        rate = changes / 4.0
        iv = int(np.ceil(30.0 / (1.0 + 3.0 * rate)))
        if prev is not None:
            assert iv <= prev
        prev = iv
    assert int(np.ceil(30.0 / 1.0)) == 30
    assert int(np.ceil(30.0 / 4.0)) == 8


# ---------------------------------------------------------------------------
# hashed-linear classifier + int8 quantized ANN
# ---------------------------------------------------------------------------

def test_classifier_integer_scores_brute(ray_session):
    """End-to-end classify_docs vs a pure-Python scorer over the same
    deterministic weights and crc32 hashing."""
    import zlib
    import ray.data as rd
    from tilemaker_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["classify_docs"](sf).to_pandas() \
        .set_index("doc_id").sort_index()

    import pyarrow.parquet as pq
    docs = pq.read_table(sf + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    N_BUCKETS, N_CLASSES = 64, 3
    W = np.zeros((N_CLASSES, N_BUCKETS + 1), dtype=np.int64)
    for c in range(N_CLASSES):
        W[c, 0] = (c * 13) % 7 - 3
        for b in range(N_BUCKETS):
            W[c, b + 1] = (b * 31 + c * 17) % 21 - 10
    for _, row in docs.iterrows():
        x = np.zeros(N_BUCKETS + 1, dtype=np.int64)
        x[0] = 1
        for w in row["text"].split(" "):
            x[1 + zlib.crc32(w.encode()) % N_BUCKETS] += 1
        s = W @ x
        pred = int(np.argmin(-s))
        assert out.loc[row["doc_id"], "pred_class"] == pred
        assert out.loc[row["doc_id"], "score"] == s[pred]


def test_int8_quantization_roundtrip_error():
    """Symmetric int8 quantization: |v - dequant(v)| <= scale/2 and
    zero vectors survive (scale guard)."""
    rng = np.random.RandomState(2)
    V = rng.randn(50, 64)
    V[7] = 0.0
    s = np.abs(V).max(axis=1) / 127.0
    s = np.where(s == 0, 1.0, s)
    Q = np.rint(V / s[:, None])
    assert np.abs(Q).max() <= 127
    err = np.abs(V - Q * s[:, None])
    assert (err <= s[:, None] / 2 + 1e-12).all()
    assert (Q[7] == 0).all()


# ---------------------------------------------------------------------------
# token budget + crawl-trap templates
# ---------------------------------------------------------------------------

def test_token_budget_prefix_rule(ray_session):
    """keep iff running total <= budget is a PREFIX per source (token
    counts are >= 1, so the cumsum is strictly increasing) and the
    query's kept set matches a brute per-source walk."""
    import pyarrow.parquet as pq
    from tilemaker_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["token_budget_docs"](sf).to_pandas()
    docs = pq.read_table(sf + "/documents.parquet").to_pandas()
    docs["n_tokens"] = docs["text"].map(lambda t: len(t.split(" ")))
    budgets = {f"src{i}": 300 + ((i * 7) % 5) * 150 for i in range(20)}
    kept = set()
    for src, g in docs.groupby("source"):
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True])
        run = 0
        for _, row in g.iterrows():
            run += row["n_tokens"]
            if run <= budgets[src]:
                kept.add(row["doc_id"])
            else:
                break               # prefix: once over, always over
    assert set(out["doc_id"]) == kept


def test_crawl_trap_template_rule():
    """Template extraction: hex runs first (they subsume digits), then
    digit runs — same RE2 order both engines apply."""
    import re
    cases = {
        "https://h.com/cal/2026/8/14": "https://h.com/cal/N/N/N",
        "https://h.com/s/0a1b2c3d4e5f6071/view":
            "https://h.com/s/H/view",
        "https://h.com/p/123?page=9": "https://h.com/p/N?page=N",
        "https://h.com/deadbeef99/x": "https://h.com/H/x",
        "https://h.com/plain": "https://h.com/plain",
        # 7 hex chars: below the run threshold, digits still fold
        "https://h.com/abc1234/x": "https://h.com/abcN/x",
    }
    for url, want in cases.items():
        t = re.sub(r"[0-9a-f]{8,}", "H", url)
        t = re.sub(r"[0-9]+", "N", t)
        assert t == want, (url, t, want)


def test_registered_domain_null_host():
    """parse_url_fn emits null hosts for malformed URLs; the kernel
    must pass nulls through, not crash."""
    got = registered_domain(
        pa.array(["www.acme.com", None, "x.co.uk"], pa.string()))
    assert got.to_pylist() == ["acme.com", None, "x.co.uk"]


def test_sniff_mime_null_payload():
    """A null payload (failed fetch) is 'null', distinct from 'empty',
    matching the oracle's CASE WHEN payload IS NULL branch."""
    got = sniff_mime(pa.array([None, b"", b"\x1f\x8b"], pa.binary()))
    assert got.to_pylist() == ["null", "empty", "application/gzip"]


def test_phrase_match_overlaps_and_boundaries(ray_session):
    """Overlapping matches count at every position; pairs never match
    across doc boundaries; the 'no match' phrase reports zeros."""
    import ray
    import ray.data as rd
    import pandas as pd
    from tilemaker_ray.pipelines import queries as Q

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        # doc1: 'batch batch batch' -> 2 overlapping hits
        # doc2 ends with 'batch', doc3 starts with 'batch' -> no
        # cross-doc match; doc3 has one more hit
        "text": pa.array(["batch batch batch", "x batch",
                          "batch batch y"], pa.string())})
    import tempfile, os
    import pyarrow.parquet as pq
    d = tempfile.mkdtemp(prefix="phrase_")
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    out = Q.QUERIES["phrase_match_docs"](d).to_pandas() \
        .set_index("phrase")
    assert out.loc["batch batch", "n_hits"] == 3
    assert out.loc["batch batch", "n_docs"] == 2
    assert out.loc["no match", "n_hits"] == 0
    assert out.loc["no match", "n_docs"] == 0


def test_hits_end_to_end_brute(ray_session):
    """q_hits_sites vs an independent single-process recomputation:
    re-derive the link universe with page_links + the same modular
    site resolution, dedup + drop self-loops in pandas, then check
    authority = in-degree and hub = Σ authority over out-links for
    EVERY site."""
    import ray.data as rd
    import pandas as pd
    from tilemaker_ray.pipelines.queries import QUERIES
    from tilemaker_ray.sources import pages as P
    from tilemaker_ray.stages.pagerank import page_links

    sf = "/root/testdata/sf0.001"
    out = QUERIES["hits_sites"](sf).to_pandas().set_index("site")

    n = P.n_pages_for_sf_dir(sf)
    links = rd.read_parquet(P.ensure_pages_parquet(n),
                            columns=["url"]) \
        .map_batches(lambda b: page_links(b, 3),
                     batch_format="pyarrow").to_pandas()
    sites = sorted(links["src"].unique())
    links["dst"] = [sites[int(h) % len(sites)]
                    for h in links["dsth"].astype("uint64")]
    e = links[links["src"] != links["dst"]][["src", "dst"]] \
        .drop_duplicates()
    indeg = e.groupby("dst").size()
    hub = e.assign(a=e["dst"].map(indeg)).groupby("src")["a"].sum()
    assert set(out.index) == set(hub.index)
    for s in out.index:
        assert out.loc[s, "hub"] == hub[s]
        assert out.loc[s, "authority"] == int(indeg.get(s, 0))


# ---------------------------------------------------------------------------
# winnowing fingerprints
# ---------------------------------------------------------------------------

def brute_winnow(text, k, w):
    """Pure-Python Schleimer–Wilkerson–Aiken reference."""
    from tilemaker_ray.stages.textindex import WINNOW_B, WINNOW_M
    b = text.encode("utf-8")
    hs = []
    for i in range(len(b) - k + 1):
        h = 0
        for j in range(k):
            h = (h * WINNOW_B + b[i + j]) % WINNOW_M
        hs.append(h)
    out = set()
    for e in range(w - 1, len(hs)):
        window = hs[e - w + 1:e + 1]
        mn = min(window)
        # rightmost minimal
        p = e - list(reversed(window)).index(mn)
        out.add((p, hs[p]))
    return out


def test_winnow_brute_random():
    import random
    from tilemaker_ray.stages.textindex import winnow_fingerprints
    rng = random.Random(9)
    alpha = "abcdef gh"
    texts = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 60)))
             for _ in range(60)]
    k, w = 5, 4
    d, p, h = winnow_fingerprints(texts, k=k, w=w)
    got = {}
    for di, pi, hi in zip(d.tolist(), p.tolist(), h.tolist()):
        got.setdefault(di, set()).add((pi, hi))
    for i, t in enumerate(texts):
        assert got.get(i, set()) == brute_winnow(t, k, w), i


def test_winnow_guarantees():
    """Shared substrings >= w+k-1 share a fingerprint; gaps <= w."""
    import numpy as np
    from tilemaker_ray.stages.textindex import winnow_fingerprints
    a = "prefix COMMON SHARED RUN OF TEXT suffix one"
    b = "other COMMON SHARED RUN OF TEXT tail piece"
    d, p, h = winnow_fingerprints([a, b], k=8, w=4)
    s0 = set(h[d == 0].tolist())
    s1 = set(h[d == 1].tolist())
    assert s0 & s1
    pp = np.sort(p[d == 0])
    assert (np.diff(pp) <= 4).all()
