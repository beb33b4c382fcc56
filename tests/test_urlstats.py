"""URL/domain analytics (stages/urlstats.py) vs urllib.parse + pandas
brute-force oracles — the rows-only check for host_stats_pages."""

from urllib.parse import urlsplit

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tilemaker_ray.stages.urlstats import host_stats, host_topk, parse_url_fn

TRICKY = [
    "https://example.com/seattle/42",
    "HTTP://Example.COM",                      # scheme/host case, empty path
    "https://a.b.example.co/x/y/z?q=1#frag",   # query+fragment split off
    "https://example.org/",                    # root path → depth 0
    "https://example.org/x/",                  # trailing slash
    "https://example.org//x///y",              # repeated slashes collapse
    "https://user:pw@example.net:8080/a",      # userinfo + port stripped
    "https://localhost/a/b",                   # single-label host
    "ftp://files.example.de/pub",
    "https://[::1]:443/v6/path",               # IPv6 literal kept whole
]


def _oracle_row(url):
    sp = urlsplit(url)
    host = sp.hostname or ""
    if host.startswith("["):  # urlsplit strips brackets; ours keeps them
        pass
    labels = host.split(".")
    dom = ".".join(labels[-2:]) if len(labels) >= 2 and labels[-2] and labels[-1] else host
    tld = labels[-1] if len(labels) >= 2 and labels[-2] and labels[-1] else host
    depth = len([s for s in sp.path.split("/") if s])
    return sp.scheme.lower(), host, dom, tld, depth


def test_parse_url_fn_matches_urllib():
    out = parse_url_fn(pa.table({"url": pa.array(TRICKY)})).to_pandas()
    for i, url in enumerate(TRICKY):
        scheme, host, dom, tld, depth = _oracle_row(url)
        got_host = out["host"][i]
        if url.startswith("https://[::1]"):
            # we keep the brackets; urllib's hostname strips them
            assert got_host == "[::1]"
        else:
            assert got_host == host, url
            assert out["domain"][i] == dom, url
            assert out["tld"][i] == tld, url
        assert out["scheme"][i] == scheme, url
        assert out["path_depth"][i] == depth, url


def _pages_df(n=3000):
    from tilemaker_ray.sources.pages import page_batch
    t = page_batch({"id": np.arange(n, dtype=np.int64)})
    return t.select(["url", "text"]).to_pandas()


def test_host_stats_matches_pandas_oracle(ray_session):
    import ray.data as rd
    df = _pages_df()
    exp = (df.assign(host=[urlsplit(u).hostname for u in df["url"]],
                     n_chars=[len(t) for t in df["text"]])
             .groupby("host", as_index=False)
             .agg(n_pages=("host", "size"), sum_chars=("n_chars", "sum"))
             .sort_values("host").reset_index(drop=True))
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    got = (host_stats(ds).to_pandas()
           .sort_values("host").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["host", "n_pages", "sum_chars"]],
        exp[["host", "n_pages", "sum_chars"]], check_dtype=False)


def test_host_topk_order(ray_session):
    import ray.data as rd
    df = _pages_df(1500)
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    top = host_topk(ds, k=3).to_pandas()
    assert len(top) == 3
    assert list(top["n_pages"]) == sorted(top["n_pages"], reverse=True)
