"""Corpus-wide unit dedup (stages/linededup.py) vs a brute-force
single-process oracle, with planted duplicate lines, vanishing docs,
and unit runs spanning block boundaries."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tilemaker_ray.stages.linededup import dedup_units


def _brute(docs, sep):
    seen = {}
    for doc_id, text in sorted(docs):
        for ord_, u in enumerate(text.split(sep)):
            seen.setdefault(u, (doc_id, ord_))
    out = []
    for doc_id, text in sorted(docs):
        kept = [u for ord_, u in enumerate(text.split(sep))
                if seen[u] == (doc_id, ord_)]
        if kept:
            out.append((doc_id, sep.join(kept)))
    return pd.DataFrame(out, columns=["doc_id", "text"])


def _run(docs, sep, blocks=8):
    import ray.data as rd
    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([t for _, t in docs])})
    ds = rd.from_arrow(t).repartition(blocks)
    got = (dedup_units(ds, sep=sep).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = _brute(docs, sep).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "text"]], exp)
    return got


def test_line_dedup_planted(ray_session):
    docs = [
        (1, "alpha\nshared boilerplate\nbeta"),
        (2, "shared boilerplate\ngamma"),          # loses line 0
        (3, "alpha\nshared boilerplate"),          # loses everything
        (4, "delta\n\nepsilon"),                   # empty line kept once
        (5, "\nzeta"),                             # empty line dropped here
        (6, "beta\ndelta\nunique tail"),
    ]
    got = _run(docs, "\n")
    assert 3 not in set(got["doc_id"])             # fully-duplicate doc gone
    assert got.loc[got.doc_id == 2, "text"].item() == "gamma"
    assert got.loc[got.doc_id == 4, "text"].item() == "delta\n\nepsilon"
    assert got.loc[got.doc_id == 5, "text"].item() == "zeta"


def test_word_dedup_heavy_duplication(ray_session):
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(17)]
    docs = [(i, " ".join(rng.choice(vocab, rng.integers(1, 12))))
            for i in range(400)]
    got = _run(docs, " ", blocks=32)
    # every vocab word survives exactly once corpus-wide
    all_words = [w for t in got["text"] for w in t.split(" ")]
    assert sorted(all_words) == sorted(set(all_words))
    assert set(all_words) == set(
        w for _, t in docs for w in t.split(" "))
