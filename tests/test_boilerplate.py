"""Site-level boilerplate stripping: planted-template brute oracle
(multi-word blocks), threshold edge exactness, fully-stripped-doc
omission, and driver-protocol parity at sf0.001."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from tilemaker_ray.stages.boilerplate import (explode_blocks,
                                              frequent_blocks,
                                              strip_boilerplate)


def _mk_docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string())}))


def brute_strip(rows, k, num, den):
    """Single-process reference: same block grammar, same threshold."""
    blocks = {}
    per_site = {}
    for doc, site, text in rows:
        per_site[site] = per_site.get(site, 0) + 1
        toks = text.split(" ") if text != "" else [""]
        seen = set()
        for b in range(0, len(toks), k):
            seen.add(" ".join(toks[b:b + k]))
        for u in seen:
            blocks[(site, u)] = blocks.get((site, u), 0) + 1
    bad = {su for su, dc in blocks.items()
           if dc * den > per_site[su[0]] * num}
    out = {}
    for doc, site, text in rows:
        toks = text.split(" ") if text != "" else [""]
        kept = [" ".join(toks[b:b + k])
                for b in range(0, len(toks), k)
                if (site, " ".join(toks[b:b + k])) not in bad]
        if kept:
            out[doc] = " ".join(kept)
    return out


def test_planted_template_blocks():
    """Two-word template planted on every doc of site A; site B clean;
    a block on exactly 4/5 docs sits ON the threshold (> means kept)."""
    tmpl = "nav bar"
    rows = []
    for i in range(5):
        body = f"alpha{i} beta{i} gamma{i} delta{i}"
        rows.append((i, "A", f"{tmpl} {body}"))
    # exactly 4 of 5 docs share 'foot er' -> 4*5 > 5*4 is FALSE -> kept
    for i in range(4):
        d, s, t = rows[i]
        rows[i] = (d, s, t + " foot er")
    for i in range(5, 8):
        rows.append((i, "B", f"nav bar only{i} here{i}"))  # 3/3 on B
    exp = brute_strip(rows, 2, 4, 5)
    got = dict(strip_boilerplate(_mk_docs(rows), block_words=2,
                                 num=4, den=5).to_pandas()
               .itertuples(index=False, name=None))
    assert got == exp
    # the planted template is gone from site A and site B
    assert all("nav bar" not in t for t in got.values())
    # the exactly-at-threshold block survives
    assert sum("foot er" in t for t in got.values()) == 4


def test_fully_stripped_doc_omitted():
    rows = [(0, "S", "same same"), (1, "S", "same same"),
            (2, "S", "same same extra word")]
    got = dict(strip_boilerplate(_mk_docs(rows), block_words=2,
                                 num=1, den=2).to_pandas()
               .itertuples(index=False, name=None))
    assert got == {2: "extra word"}


def test_explode_blocks_ragged_tail():
    batch = pa.table({"doc_id": pa.array([7, 8], pa.int64()),
                      "source": pa.array(["x", "y"], pa.string()),
                      "text": pa.array(["a b c d e", "f"], pa.string())})
    doc, site, bid, bt, h = explode_blocks(batch, 2)
    assert list(doc) == [7, 7, 7, 8]
    assert bt.to_pylist() == ["a b", "c d", "e", "f"]
    assert list(bid) == [0, 1, 2, 0]
    assert site.to_pylist() == ["x", "x", "x", "y"]


def test_frequent_blocks_exact_counting():
    """A unit repeated MANY times inside one doc counts that doc once."""
    rows = [(0, "S", "dup dup dup dup"), (1, "S", "dup other"),
            (2, "S", "clean text here")]
    freq = frequent_blocks(_mk_docs(rows), 1, 1, 2)
    got = {(s, u) for s, u in zip(freq["site"].to_pylist(),
                                  freq["unit"].to_pylist())}
    assert got == {("S", "dup")}   # 2/3 docs > 1/2; others 1/3


def test_query_matches_duckdb_oracle():
    import duckdb

    from tilemaker_ray.pipelines.queries import (
        ORACLE_SQL, q_boilerplate_strip_docs)

    got = q_boilerplate_strip_docs("/root/testdata/sf0.001") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("""CREATE VIEW documents AS SELECT * FROM
        read_parquet('/root/testdata/sf0.001/documents.parquet')""")
    exp = con.execute(ORACLE_SQL["boilerplate_strip_docs"]).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["text"].tolist() == exp["text"].tolist()
    # the operator actually strips something at sf0.001
    src = duckdb.sql("""SELECT sum(len(text)) FROM
        read_parquet('/root/testdata/sf0.001/documents.parquet')
        """).fetchone()[0]
    assert got["text"].str.len().sum() < src
