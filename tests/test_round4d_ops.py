"""Kernel oracles for the fifth-wave round-4 operators: the Gopher
quality-rule battery, politeness crawl scheduling, and reciprocal-link
spam scoring. End-to-end DuckDB-hash coverage lives in
test_queries_oracle.py (all three queries are ORACLE_SQL-backed);
here each kernel is pinned against a brute-force single-process
reference.
"""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.textstats import GOPHER_STOPWORDS, gopher_rules_fn


# ---------------------------------------------------------------------------
# Gopher rules
# ---------------------------------------------------------------------------

def brute_gopher(text: str) -> dict:
    """Pure-Python reference for one document (same tokenization:
    split on single space or newline, empty tokens kept)."""
    ws = []
    for part in text.split("\n"):
        ws.extend(part.split(" "))
    ls = text.split("\n")
    n_words = len(ws)
    n_alpha = sum(1 for w in ws if any("a" <= c <= "z" for c in w))
    n_hash = text.count("#")
    n_ell = (len(text) - len(text.replace("...", ""))) // 3
    n_bullet = sum(1 for l in ls if l.startswith("- "))
    n_ellline = sum(1 for l in ls if l.endswith("..."))
    n_stop = sum(1 for sw in GOPHER_STOPWORDS if sw in ws)
    frac_alpha = n_alpha / n_words
    symbol_ratio = (n_hash + n_ell) / n_words
    frac_bullet = n_bullet / len(ls)
    frac_ellline = n_ellline / len(ls)
    return {
        "n_words": n_words,
        "frac_alpha_words": frac_alpha,
        "symbol_word_ratio": symbol_ratio,
        "frac_bullet_lines": frac_bullet,
        "frac_ellipsis_lines": frac_ellline,
        "n_stop_hits": n_stop,
        "gopher_keep": bool(
            20 <= n_words <= 100000 and frac_alpha >= 0.8
            and symbol_ratio < 0.1 and frac_bullet <= 0.9
            and frac_ellline <= 0.3 and n_stop >= 1),
    }


GOPHER_CASES = [
    "- the cat and dog...\nwith a #",
    "x y z",
    "a  b",                              # double space -> empty token
    "the be to of and that have with " + "word " * 20 + "end",
    "- a\n- b\n- c",                     # all bullets
    "tail...\nalso...\nplain",
    "#### # #",
    "one\n\ntwo",                        # empty line
    "....",                              # 4 dots -> one '...' (non-overlap)
    "the be to of and that have with",   # exactly the stopword list (8 words)
    "- " + "the be to of and that have with okay " * 4 + "x",
]


def test_gopher_rules_brute():
    batch = pa.table({
        "doc_id": pa.array(range(len(GOPHER_CASES)), pa.int64()),
        "dtext": pa.array(GOPHER_CASES, pa.string())})
    out = gopher_rules_fn(batch).to_pylist()
    for row, text in zip(out, GOPHER_CASES):
        ref = brute_gopher(text)
        for k, v in ref.items():
            assert row[k] == v, (text, k, row[k], v)


def test_gopher_rules_random_brute():
    rng = np.random.RandomState(7)
    vocab = ["the", "and", "word", "x9", "-", "#", "be", "alpha",
             "beta...", "of"]
    texts = []
    for _ in range(200):
        n = rng.randint(1, 60)
        ws = [vocab[rng.randint(len(vocab))] for _ in range(n)]
        t = " ".join(ws)
        # sprinkle newlines / bullet prefixes deterministically
        t = t.replace(" x9 ", "\n- x9 ").replace(" of ", " of\n")
        texts.append(t)
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "dtext": pa.array(texts, pa.string())})
    out = gopher_rules_fn(batch).to_pylist()
    for row, text in zip(out, texts):
        ref = brute_gopher(text)
        for k, v in ref.items():
            assert row[k] == v, (text, k, row[k], v)


def test_gopher_keep_binds_both_ways():
    """At sf0.001 the composite flag must actually filter (some True,
    some False) — otherwise the rule battery certifies a constant."""
    from tilemaker_ray.pipelines.queries import q_gopher_rules_docs
    out = q_gopher_rules_docs("/root/testdata/sf0.001").to_pandas()
    assert out["gopher_keep"].any()
    assert not out["gopher_keep"].all()
    # the dirtying pass must exercise every rule axis
    assert (out["frac_bullet_lines"] > 0).any()
    assert (out["frac_ellipsis_lines"] > 0).any()
    assert (out["symbol_word_ratio"] > 0).any()
    assert (out["frac_alpha_words"] < 1.0).any()


# ---------------------------------------------------------------------------
# Politeness scheduling
# ---------------------------------------------------------------------------

def test_politeness_waves_pandas_oracle():
    from tilemaker_ray.pipelines.queries import q_politeness_wave_urls
    out = q_politeness_wave_urls("/root/testdata/sf0.001").to_pandas()
    # per-host wave = rank of url within host
    ref = out.sort_values(["host", "url"]).copy()
    ref["w2"] = ref.groupby("host").cumcount() + 1
    m = out.merge(ref[["url", "w2"]], on="url")
    assert (m["wave"] == m["w2"]).all()
    # global slot = rank over (wave, host, url), a permutation of 1..n
    s = out.sort_values(["wave", "host", "url"])["slot"].to_numpy()
    assert (s == np.arange(1, len(out) + 1)).all()
    # politeness invariant: within a host, waves are 1..k distinct
    g = out.groupby("host")["wave"]
    assert (g.max() == g.size()).all() and (g.min() == 1).all()


# ---------------------------------------------------------------------------
# Link reciprocity
# ---------------------------------------------------------------------------

def test_link_reciprocity_hand_graph():
    """Run the pair-resolution kernel on a hand graph with known
    reciprocity."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from tilemaker_ray.pipelines import queries as Q

    edges = pa.table({
        "src": pa.array(["a", "b", "a", "c", "d"], pa.string()),
        "dst": pa.array(["b", "a", "c", "d", "c"], pa.string())})
    # reuse the query's internal kernels via a tiny pipeline
    import tilemaker_ray.stages.common as common
    from tilemaker_ray.stages.dedup import _word_hash

    def pair_key(batch):
        src = np.asarray(batch["src"].to_pylist(), dtype=object)
        dst = np.asarray(batch["dst"].to_pylist(), dtype=object)
        flip = src > dst
        lo = np.where(flip, dst, src)
        hi = np.where(flip, src, dst)
        h = np.fromiter((_word_hash(a + "\x00" + b) & 0x7FFFFFFF
                         for a, b in zip(lo, hi)),
                        dtype=np.int64, count=len(lo))
        return pa.table({
            "src": batch["src"],
            "lo": pa.array(lo, pa.string()),
            "hi": pa.array(hi, pa.string()),
            "pbkt": pa.array(common.mix_bucket(h, 8), pa.int64())})

    def mark_recip(g):
        lo = np.asarray(g["lo"].to_pylist(), dtype=object)
        hi = np.asarray(g["hi"].to_pylist(), dtype=object)
        vocab, codes = np.unique(np.concatenate([lo, hi]),
                                 return_inverse=True)
        v = np.int64(max(len(vocab), 1))
        key = codes[:len(lo)] * v + codes[len(lo):]
        uk, cnt = np.unique(key, return_counts=True)
        recip = cnt[np.searchsorted(uk, key)] == 2
        return pa.table({
            "site": g["src"],
            "recip": pa.array(recip.astype(np.int64), pa.int64())})

    out = (rd.from_arrow(edges)
           .map_batches(pair_key, batch_format="pyarrow")
           .groupby("pbkt").map_groups(mark_recip, batch_format="pyarrow")
           .groupby("site").aggregate(Count(), Sum("recip"))
           .to_pandas().set_index("site"))
    # a->b reciprocated (b->a), a->c not, c->d and d->c reciprocated
    assert out.loc["a", "count()"] == 2 and out.loc["a", "sum(recip)"] == 1
    assert out.loc["b", "count()"] == 1 and out.loc["b", "sum(recip)"] == 1
    assert out.loc["c", "count()"] == 1 and out.loc["c", "sum(recip)"] == 1
    assert out.loc["d", "count()"] == 1 and out.loc["d", "sum(recip)"] == 1


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

def test_dsir_weights_brute():
    """Pure-Python reference: hashed-unigram counts, add-one smoothed
    log-ratio, exact fixed-point dot — over sf0.001."""
    import math
    import zlib

    import pyarrow.parquet as pq

    from tilemaker_ray.pipelines.queries import q_dsir_weights_docs

    B = 256
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    docs = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist(),
                    t["lang"].to_pylist()))
    cr = [0] * B
    ct = [0] * B
    feats = {}
    for did, text, lang in docs:
        c = {}
        for w in text.split(" "):
            b = zlib.crc32(w.encode()) % B
            c[b] = c.get(b, 0) + 1
        feats[did] = c
        for b, n in c.items():
            cr[b] += n
            if lang == "en":
                ct[b] += n
    Cr, Ct = sum(cr), sum(ct)
    lam = [int(round(1e9 * (math.log((ct[b] + 1) / (Ct + B))
                            - math.log((cr[b] + 1) / (Cr + B)))))
           for b in range(B)]
    ref = {did: sum(n * lam[b] for b, n in c.items())
           for did, c in feats.items()}

    out = q_dsir_weights_docs("/root/testdata/sf0.001").to_pandas()
    assert len(out) == len(ref)
    for did, wfp in zip(out["doc_id"], out["weight_fp"]):
        assert ref[did] == wfp, (did, ref[did], wfp)
    # weights must separate: target-like docs score higher on average
    m = out.merge(t.select(["doc_id", "lang"]).to_pandas(), on="doc_id")
    assert (m[m.lang == "en"]["weight"].mean()
            > m[m.lang != "en"]["weight"].mean())


# ---------------------------------------------------------------------------
# TF-IDF keywords
# ---------------------------------------------------------------------------

def test_tfidf_keywords_pandas_oracle():
    import math

    import pyarrow.parquet as pq

    from tilemaker_ray.pipelines.queries import q_tfidf_keywords_docs

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    docs = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    n = float(len(docs))
    tf = {}
    df = {}
    for did, text in docs:
        c = {}
        for w in text.split(" "):
            c[w] = c.get(w, 0) + 1
        tf[did] = c
        for w in c:
            df[w] = df.get(w, 0) + 1
    ref = {}
    for did, c in tf.items():
        rows = sorted(
            ((t_, f, df[t_],
              f * int(math.floor(1e9 * math.log(n / float(df[t_])))))
             for t_, f in c.items()),
            key=lambda r: (-r[3], r[0]))[:3]
        ref[did] = [(t_, f, d, s, i + 1)
                    for i, (t_, f, d, s) in enumerate(rows)]

    out = q_tfidf_keywords_docs("/root/testdata/sf0.001").to_pandas()
    got = {}
    for r in out.sort_values(["doc_id", "rank"]).itertuples():
        got.setdefault(r.doc_id, []).append(
            (r.term, r.tf, r.df, r.score_fp, r.rank))
    assert got == ref


# ---------------------------------------------------------------------------
# HTML -> text extraction
# ---------------------------------------------------------------------------

def brute_html_extract(h: str) -> dict:
    import re as _re
    h1 = _re.sub(r"(?s)<script[^>]*>.*?</script>", "", h)
    h1 = _re.sub(r"(?s)<style[^>]*>.*?</style>", "", h1)
    m = _re.search(r"(?s)<title>(.*?)</title>", h1)
    title = m.group(1) if m else ""
    h2 = _re.sub(r"(?s)<head[^>]*>.*?</head>", "", h1)
    n_links = (len(h2) - len(h2.replace("<a ", ""))) // 3
    t1 = _re.sub(r"<[^>]*>", " ", h2)
    t1 = _re.sub(r"[ \n\t]+", " ", t1).strip()
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")):
        t1 = t1.replace(ent, ch)
    n_words = len(t1.split(" "))
    return {
        "title": title, "text_out": t1, "n_links": n_links,
        "n_words_out": n_words,
        "link_density": n_links / max(n_words, 1),
        "is_soft404": bool(
            _re.search(r"(?i)(404|not found|page missing)", title)
            or n_words < 5)}


HTML_CASES = [
    '<html><head><title>Error 404 not found</title></head>'
    '<body><p>gone</p></body></html>',
    '<html><head><title>ok page</title><style>a{}</style></head>'
    '<body><h1>Hello</h1><p>one <a href="/x">two</a> three '
    '&amp; four x&lt;y</p><script>var q="<i>no</i>";</script>'
    '</body></html>',
    '<p>bare fragment no head</p>',
    '<html><head><title>multi\nline</title></head><body>'
    '<p>a</p>\n<p>b</p>\t<p>c d e f g</p></body></html>',
    '<body><a href="1">l1</a> <a href="2">l2</a> <a href="3">l3</a>'
    ' w</body>',
]


def test_html_extract_brute():
    import ray.data as rd

    import tilemaker_ray.pipelines.queries as Q

    # drive the kernel through the query's extract fn via a tiny
    # staged table (reuse the public pipeline on handcrafted HTML)
    batch = pa.table({
        "doc_id": pa.array(range(len(HTML_CASES)), pa.int64()),
        "html": pa.array(HTML_CASES, pa.string())})
    # the extract closure is defined inside the query; exercise it by
    # monkey-staging: call the query at sf0.001 for end-to-end, and
    # check the handcrafted cases against DuckDB's mirrored SQL here.
    import duckdb
    import os
    import shutil
    d = "/tmp/tilemaker_ray_oracle/html_extract_docs_test"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    import pyarrow.parquet as pq
    pq.write_table(batch, os.path.join(d, "part.parquet"))
    sql = Q.ORACLE_SQL["html_extract_docs"].replace(
        "html_extract_docs/*.parquet", "html_extract_docs_test/*.parquet")
    rows = duckdb.connect().execute(sql).fetchdf() \
        .sort_values("doc_id").to_dict("records")
    for row, h in zip(rows, HTML_CASES):
        ref = brute_html_extract(h)
        for k, v in ref.items():
            got = row[k]
            assert got == v, (h, k, got, v)


def test_html_extract_end_to_end_binding():
    from tilemaker_ray.pipelines.queries import q_html_extract_docs
    out = q_html_extract_docs("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    # the templating pass must exercise every signal
    assert out["is_soft404"].any() and not out["is_soft404"].all()
    assert (out["n_links"] > 0).any()
    assert (out["link_density"] > 0).any()
    # no tag remnants or entities survive extraction ('x<y' from the
    # unescaped &lt; entity is legitimate text, not a tag)
    rem = out["text_out"].str.contains(
        r"</|<p>|<a |<h1|<script|<style|<html|<head|<body", regex=True)
    assert not rem.any()
    assert not out["text_out"].str.contains("&amp;|&lt;", regex=True).any()
    # body words survive: extracted text ends with the doc's last word
    import pyarrow.parquet as pq
    src = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas()
    m = out.merge(src, on="doc_id")
    tail_src = m["text"].str.split(" ").str[-1]
    tail_out = m["text_out"].str.split(" ").str[-1]
    # docs whose last group got the entity suffix end with 'x<y'
    ok = (tail_out == tail_src) | (tail_out == "x<y")
    assert ok.all()


# ---------------------------------------------------------------------------
# Product-quantization ANN
# ---------------------------------------------------------------------------

def test_ann_pq_brute():
    """Single-process PQ reference over sf0.001: same sample-trained
    codebooks, same encode, same fixed-point ADC — ranks must agree
    bit-for-bit; and PQ must be a sane ANN (recall vs exact brute-L2
    well above chance)."""
    import pyarrow.parquet as pq

    from tilemaker_ray.pipelines.queries import q_ann_pq_top5
    from tilemaker_ray.stages.similarity import kmeans

    m, sub, n_codes, k = 8, 8, 64, 5
    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["vec_id", "embedding"]).to_pandas() \
        .sort_values("vec_id")
    V = np.asarray(t["embedding"].tolist(), dtype=np.float64)
    ids = t["vec_id"].to_numpy()
    Xt = V[ids < 256]
    books = [kmeans(Xt[:, j * sub:(j + 1) * sub], n_codes, n_iter=10,
                    seed=42 + j) for j in range(m)]
    codes = np.stack(
        [((V[:, j * sub:(j + 1) * sub][:, None, :]
           - books[j][None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
         for j in range(m)], axis=1)
    ref = {}
    for qid in range(10):
        qi = np.flatnonzero(ids == qid)[0]
        dist = np.zeros(len(ids), dtype=np.int64)
        for j in range(m):
            d2 = ((books[j] - V[qi, j * sub:(j + 1) * sub]) ** 2) \
                .sum(axis=1)
            lut = np.floor(1e9 * d2 + 0.5).astype(np.int64)
            dist += lut[codes[:, j]]
        order = np.lexsort((ids, dist))[:k]
        ref[qid] = [(r + 1, int(ids[o]), int(dist[o]))
                    for r, o in enumerate(order)]

    out = q_ann_pq_top5("/root/testdata/sf0.001").to_pandas()
    got = {}
    for r in out.sort_values(["query_id", "rank"]).itertuples():
        got.setdefault(r.query_id, []).append(
            (r.rank, r.neighbor_id, r.dist_fp))
    assert got == ref

    # ANN sanity: PQ top-5 must overlap the exact L2 top-5 far above
    # chance (random 5-of-n overlap expectation ≈ 25/n « 1)
    hits = total = 0
    for qid in range(10):
        qi = np.flatnonzero(ids == qid)[0]
        exact = ids[np.lexsort(
            (ids, ((V - V[qi]) ** 2).sum(axis=1)))[:k]]
        gotn = {n for _, n, _ in ref[qid]}
        hits += len(gotn & set(exact.tolist()))
        total += k
    assert hits / total >= 0.35, hits / total
