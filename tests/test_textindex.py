"""Inverted index: postings + df band vs a brute-force dict oracle."""

from collections import Counter

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.textindex import build_inverted_index, copy_pairs


def test_inverted_index_brute(ray_session):
    import ray.data as rd
    docs = {
        1: "the cat sat on the mat",
        2: "the dog sat",
        3: "a cat and a dog",
        4: "unique words only here",
        5: "the the the",
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}))
    out = build_inverted_index(ds, df_min=2, df_max=3).to_pandas()

    tf = {(d, w): c for d, t in docs.items()
          for w, c in Counter(t.split(" ")).items()}
    df = Counter(w for (_, w) in tf)
    want = {(w, d): (c, df[w]) for (d, w), c in tf.items()
            if 2 <= df[w] <= 3}
    got = {(r.word, r.doc_id): (r.tf, r.df) for r in out.itertuples()}
    assert got == want
    # 'the' appears in 3 docs (df=3, kept); 'sat' in 2; 'unique' df=1 dropped
    assert ("the", 5) in got and got[("the", 5)] == (3, 3)
    assert all(w != "unique" for (w, _) in got)


def test_inverted_index_empty_and_spaces(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a  b", "a  b"], pa.string())}))
    # double space yields an empty token in BOTH engines' tokenization
    out = build_inverted_index(ds, df_min=2, df_max=10).to_pandas()
    assert set(out["word"]) == {"a", "b", ""}
    assert (out["df"] == 2).all()


def test_inverted_index_bigrams(ray_session):
    import ray.data as rd
    docs = {1: "a b c a b", 2: "a b x", 3: "c a b"}
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}))
    out = build_inverted_index(ds, df_min=2, df_max=10,
                               ngram=2).to_pandas()
    grams = {d: [" ".join(t.split(" ")[i:i + 2])
                 for i in range(len(t.split(" ")) - 1)]
             for d, t in docs.items()}
    tf = {(d, g): c for d, gs in grams.items()
          for g, c in Counter(gs).items()}
    df = Counter(g for (_, g) in tf)
    want = {(g, d): (c, df[g]) for (d, g), c in tf.items()
            if 2 <= df[g] <= 10}
    got = {(r.word, r.doc_id): (r.tf, r.df) for r in out.itertuples()}
    assert got == want
    assert ("a b", 1) in got and got[("a b", 1)] == (2, 3)

def _brute_copy_pairs(docs, ngram, df_max, min_shared):
    sh = {d: {" ".join(t.split(" ")[i:i + ngram])
              for i in range(len(t.split(" ")) - ngram + 1)}
          for d, t in docs.items()}
    df = Counter(g for s in sh.values() for g in s)
    ids = sorted(docs)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            n = sum(1 for g in sh[a] & sh[b] if 2 <= df[g] <= df_max)
            if n >= min_shared:
                out[(a, b)] = n
    return out


def test_copy_pairs_brute(ray_session):
    import ray.data as rd
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = {
        1: base + " one two three",
        2: base + " four five six",          # shares base's 6 5-grams with 1
        3: "totally different words with no overlap at all here",
        4: "alpha beta gamma delta epsilon extra tail words here now",
        5: "common common common common common filler filler filler",
        6: "common common common common common filler filler filler",
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}))
    out = copy_pairs(ds, ngram=5, df_max=50, min_shared=3).to_pandas()
    got = {(r.doc_a, r.doc_b): r.n_shared for r in out.itertuples()}
    want = _brute_copy_pairs(docs, 5, 50, 3)
    assert got == want
    assert (1, 2) in got and (5, 6) in got and (1, 3) not in got


def test_copy_pairs_df_cap_excludes_boilerplate(ray_session):
    import ray.data as rd
    # a shingle present in EVERY doc is boilerplate: df=4 > df_max=3
    boiler = "same old boiler plate text"
    docs = {i: boiler + f" unique{i} tail{i} words{i} here{i} now{i}"
            for i in range(1, 5)}
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}))
    out = copy_pairs(ds, ngram=5, df_max=3, min_shared=1).to_pandas()
    got = {(r.doc_a, r.doc_b): r.n_shared for r in out.itertuples()}
    assert got == _brute_copy_pairs(docs, 5, 3, 1)


def test_bigram_lm_brute(ray_session):
    import math
    import ray.data as rd
    from tilemaker_ray.stages.textindex import bigram_lm
    docs = {
        1: "a b a b c",
        2: "b c a b",
        3: "",                    # empty doc: no bigrams, no crossing
        4: "a b",
        5: "x",                   # single token: no bigrams
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())})) \
        .repartition(2)
    out = bigram_lm(ds, min_count=2).to_pandas()
    got = {(r.w1, r.w2): (r.c12, r.c1, r.logp) for r in out.itertuples()}

    big = Counter()
    for t in docs.values():
        ws = t.split(" ")
        for i in range(len(ws) - 1):
            big[(ws[i], ws[i + 1])] += 1
    c1 = Counter()
    for (w1, _), c in big.items():
        c1[w1] += c
    want = {(w1, w2): (c, c1[w1], math.log(float(c) / float(c1[w1])))
            for (w1, w2), c in big.items() if c >= 2}
    assert got == want
    # docs 1 (x2), 2, 4 -> c12=4; '' doc contributes no bigrams
    assert got[("a", "b")][0] == 4
    assert got[("b", "c")][:2] == (2, 3)


def test_lm_doc_scores_oov_and_short(ray_session):
    import math
    import ray.data as rd
    from tilemaker_ray.stages.textindex import (bigram_lm,
                                                lm_doc_scores)
    docs = {1: "a b a b", 2: "a b zz qq", 3: "x", 4: "c c c"}
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())}))
    lm = pa.Table.from_pandas(bigram_lm(ds, min_count=2).to_pandas())
    out = lm_doc_scores(ds, lm).to_pandas().set_index("doc_id")
    oov = int(np.floor(math.log(0.000001) * 1e9))
    # LM (min_count 2): (a,b) c12=3, c1=3 (only a-starting bigram) ->
    # logp 0; (c,c) c12=c1=2 -> logp 0; (b,a)/(b,zz)/(zz,qq) are OOV
    assert out.loc[1, "sum_logp_fp"] == oov          # 0 + oov + 0
    assert out.loc[2, "sum_logp_fp"] == 2 * oov      # 0 + oov + oov
    assert out.loc[3, "n_bigrams"] == 0
    assert np.isnan(out.loc[3, "avg_logp"])
    assert out.loc[4, "sum_logp_fp"] == 0            # 2 in-LM bigrams


def test_windowed_cooc_pmi_vs_bruteforce(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd
    from tilemaker_ray.stages.textindex import windowed_cooc_pmi

    docs = ["a b c a b", "b a", "c", "a b c d e a b c d e"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    W, MIN, K = 2, 2, 10
    # brute force
    from collections import Counter
    cx, cp = Counter(), Counter()
    n_tok = n_pairs = 0
    for d in docs:
        ws = d.split()
        cx.update(ws)
        n_tok += len(ws)
        for i in range(len(ws)):
            for dd in (1, 2):
                if i + dd < len(ws):
                    a, b = sorted((ws[i], ws[i + dd]))
                    cp[(a, b)] += 1
                    n_pairs += 1
    want = sorted(((c, a, b) for (a, b), c in cp.items()
                   if c >= MIN), key=lambda x: (-x[0], x[1], x[2]))[:K]
    out = windowed_cooc_pmi(rd.from_arrow(t).repartition(3),
                            window=W, min_count=MIN, k=K).to_pandas()
    got = list(zip(out["c_xy"], out["w1"], out["w2"]))
    assert got == [(c, a, b) for c, a, b in want]
    for _, r in out.iterrows():
        exp = math.log(((float(r["c_xy"]) * n_tok) * n_tok)
                       / ((float(cx[r["w1"]]) * cx[r["w2"]])
                          * n_pairs))
        assert r["pmi"] == exp
    # cross-document pairs must NOT be counted: ('b','c') appears
    # within docs only; ('a','a') via doc edges would be spurious
    assert ("a", "a") not in {(a, b) for _, a, b in want} or \
        cp[("a", "a")] >= MIN


def test_windowed_cooc_pmi_irregular_whitespace(ray_session):
    """Both passes must tokenize like the oracle's string_split(text,
    ' '): runs of spaces yield EMPTY tokens that count toward n_tok,
    cx, and pairs. Real web text has double/leading/trailing spaces —
    a str.split() unigram pass would diverge (and KeyError on '')."""
    import math

    import pyarrow as pa
    import ray.data as rd
    from tilemaker_ray.stages.textindex import windowed_cooc_pmi

    docs = ["a  b a  b", " a b", "b a ", "a\tb a\tb a"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    W, MIN, K = 2, 1, 20
    from collections import Counter
    cx, cp = Counter(), Counter()
    n_tok = n_pairs = 0
    for d in docs:
        ws = d.split(" ")          # keeps empties, tabs stay in-token
        cx.update(ws)
        n_tok += len(ws)
        for i in range(len(ws)):
            for dd in range(1, W + 1):
                if i + dd < len(ws):
                    a, b = sorted((ws[i], ws[i + dd]))
                    cp[(a, b)] += 1
                    n_pairs += 1
    want = sorted(((c, a, b) for (a, b), c in cp.items()
                   if c >= MIN), key=lambda x: (-x[0], x[1], x[2]))[:K]
    out = windowed_cooc_pmi(rd.from_arrow(t).repartition(2),
                            window=W, min_count=MIN, k=K).to_pandas()
    got = list(zip(out["c_xy"], out["w1"], out["w2"]))
    assert got == [(c, a, b) for c, a, b in want]
    for _, r in out.iterrows():
        exp = math.log(((float(r["c_xy"]) * n_tok) * n_tok)
                       / ((float(cx[r["w1"]]) * cx[r["w2"]])
                          * n_pairs))
        assert r["pmi"] == exp


def test_jaccard_pairs_vs_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from tilemaker_ray.stages.textindex import jaccard_pairs

    docs = ["a b c d e f", "a b c d e g", "x y z w v u",
            "a b c d e f", "p q r s t u v w x y z"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    NG, DF, TH = 3, 50, 0.4
    # brute force over df-filtered trigram sets
    from collections import Counter
    sets = []
    for d in docs:
        ws = d.split(" ")
        sets.append({" ".join(ws[i:i + NG])
                     for i in range(len(ws) - NG + 1)})
    df = Counter(s for st in sets for s in st)
    sets = [{s for s in st if df[s] <= DF} for st in sets]
    want = []
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            c = len(sets[i] & sets[j])
            if c and c / (len(sets[i]) + len(sets[j]) - c) >= TH:
                want.append((i, j, c,
                             float(c) / (len(sets[i]) + len(sets[j])
                                         - c)))
    out = jaccard_pairs(rd.from_arrow(t).repartition(3), ngram=NG,
                        df_max=DF, threshold=TH).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    got = [(int(r.doc_a), int(r.doc_b), int(r.n_shared),
            float(r.jaccard)) for r in out.itertuples()]
    assert got == sorted(want)
    # the exact duplicate pair (0, 3) must be J = 1.0
    assert (0, 3, 4, 1.0) in got


def test_jaccard_pairs_df_cap_excludes_boilerplate(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from tilemaker_ray.stages.textindex import jaccard_pairs

    # the same boilerplate trigram in every doc; df_max=2 excludes it,
    # so docs share NOTHING that counts
    docs = ["same same same u%d" % i for i in range(5)]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    out = jaccard_pairs(rd.from_arrow(t).repartition(2), ngram=3,
                        df_max=2, threshold=0.01).to_pandas()
    assert len(out) == 0
