"""Duplicated-span removal vs the single-process reference."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.spandedup import (dedup_spans,
                                            dedup_spans_reference)

PARA = ("the quick brown fox jumps over the lazy dog while the "
        "cat watches from the warm windowsill nearby")


def _docs():
    rng = np.random.RandomState(9)
    docs = {}
    for i in range(12):
        filler = " ".join(f"w{int(x)}" for x in rng.randint(0, 500, 30))
        if i % 3 == 0:      # plant the duplicated paragraph
            docs[i] = filler + " " + PARA
        else:
            docs[i] = filler
    return docs


def _ds(docs, n_blocks):
    import ray.data as rd
    t = pa.table({"doc_id": pa.array(sorted(docs), pa.int64()),
                  "text": pa.array([docs[d] for d in sorted(docs)],
                                   pa.string())})
    return rd.from_arrow(t).repartition(n_blocks)


def test_dedup_spans_matches_reference_any_layout(ray_session):
    docs = _docs()
    want = dedup_spans_reference(docs, k=8)
    # the planted paragraph must actually be removed somewhere
    assert sum(n for _, n in want.values()) > 10
    for n_blocks in (2, 5):
        out = dedup_spans(_ds(docs, n_blocks), k=8).to_pandas() \
            .set_index("doc_id").sort_index()
        got = {d: (r["text"], int(r["n_removed_tokens"]))
               for d, r in out.iterrows()}
        assert got == want, n_blocks


def test_dedup_spans_first_occurrence_survives(ray_session):
    docs = {0: PARA, 1: PARA, 2: "totally unrelated words only here"}
    out = dedup_spans(_ds(docs, 2), k=8).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[0, "text"] == PARA          # first copy intact
    assert out.loc[1, "n_removed_tokens"] == len(PARA.split())
    assert out.loc[1, "text"] == ""            # later copy fully cut
    assert out.loc[2, "text"] == docs[2]       # untouched


def test_dedup_spans_short_docs_pass_through(ray_session):
    docs = {0: "too short", 1: "also tiny"}
    out = dedup_spans(_ds(docs, 1), k=8).to_pandas()
    assert sorted(out["text"]) == sorted(docs.values())
    assert (out["n_removed_tokens"] == 0).all()
