"""Aho–Corasick lexicon tagging: brute find-loop oracle (overlapping
occurrences, bordered patterns, nested patterns, multilingual bytes),
chunked-padding invariance, and the driver-query shape."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages import lexicon


def brute_counts(patterns, texts):
    cats = sorted({c for c, _ in patterns})
    out = np.zeros((len(texts), len(cats)), np.int64)
    for i, t in enumerate(texts):
        for c, kw in patterns:
            start = 0
            while True:
                j = t.find(kw, start)
                if j < 0:
                    break
                out[i, cats.index(c)] += 1
                start = j + 1          # overlapping: advance one char
    return out


PATTERNS = [
    ("a", "aba"),          # bordered: overlaps itself in 'ababa'
    ("a", "aa"),           # bordered: 'aaaa' has 3 hits
    ("b", "ba"),
    ("b", "b"),            # nested inside 'ba' and 'aba'
    ("c", "xyz"),
    ("u", "é"),            # multi-byte UTF-8 keyword
]

TEXTS = [
    "ababa",               # aba x2 (overlap), ba x2, b x2
    "aaaa",                # aa x3
    "", "b", "xyzxyz", "axyza",
    "café été éé",         # é x4
    "日本語テキスト aba 日本",  # multibyte text, ASCII pattern inside
    "a" * 3000 + "b",      # long doc: aa x2999
]


def test_brute_parity():
    trans, outc, cats = lexicon.build_automaton(PATTERNS)
    got = lexicon.scan_counts(trans, outc, pa.array(TEXTS, pa.string()))
    exp = brute_counts(PATTERNS, TEXTS)
    assert (got == exp).all(), (got, exp)


def test_chunked_padding_invariance():
    """Tiny pad budget forces many chunks — counts must not change."""
    trans, outc, cats = lexicon.build_automaton(PATTERNS)
    arr = pa.array(TEXTS * 7, pa.string())
    full = lexicon.scan_counts(trans, outc, arr)
    old = lexicon._PAD_BUDGET
    lexicon._PAD_BUDGET = 4096
    try:
        small = lexicon.scan_counts(trans, outc, arr)
    finally:
        lexicon._PAD_BUDGET = old
    assert (full == small).all()


def test_large_string_and_chunked_input():
    trans, outc, cats = lexicon.build_automaton(PATTERNS)
    exp = brute_counts(PATTERNS, TEXTS)
    for arr in (pa.array(TEXTS, pa.large_string()),
                pa.chunked_array([TEXTS[:4], TEXTS[4:]],
                                 pa.string())):
        got = lexicon.scan_counts(trans, outc, arr)
        assert (got == exp).all()


def test_sliced_array_offsets():
    trans, outc, cats = lexicon.build_automaton(PATTERNS)
    arr = pa.array(TEXTS, pa.string()).slice(2, 5)
    got = lexicon.scan_counts(trans, outc, arr)
    exp = brute_counts(PATTERNS, TEXTS[2:7])
    assert (got == exp).all()


def test_query_matches_duckdb_oracle():
    """The driver protocol at sf0.001: Ray result vs the replace-count
    SQL (valid because the query LEXICON is border-free)."""
    import duckdb

    from tilemaker_ray.pipelines.queries import (ORACLE_SQL,
                                                 q_lexicon_tag_docs)

    got = q_lexicon_tag_docs("/root/testdata/sf0.001").to_pandas() \
        .sort_values("category").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("""CREATE VIEW documents AS SELECT * FROM
        read_parquet('/root/testdata/sf0.001/documents.parquet')""")
    exp = con.execute(ORACLE_SQL["lexicon_tag_docs"]).fetchdf() \
        .sort_values("category").reset_index(drop=True)
    assert got["category"].tolist() == exp["category"].tolist()
    assert got["n_docs"].tolist() == exp["n_docs"].tolist()
    assert got["n_hits"].tolist() == exp["n_hits"].tolist()
    assert (got["n_hits"] > 0).any()
