"""Kernel oracles for the third-wave crawl operators (round 4):
SURT keys, robots longest-match filtering, snapshot delta, anchor-text
aggregation. End-to-end + DuckDB-hash coverage lives in
test_queries_oracle.py (all four queries are ORACLE_SQL-backed); here
each kernel is pinned against a brute-force single-process reference.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tilemaker_ray.stages.pagerank import page_links_anchored
from tilemaker_ray.stages.urlstats import (make_robots_rules,
                                           robots_verdict_fn, surt_key)


# ---------------------------------------------------------------------------
# SURT
# ---------------------------------------------------------------------------

def test_surt_key_cases():
    urls = pa.array([
        "https://maps.Example.com/x/1?q=2#f",   # subdomain + query + frag
        "https://www.foo.IO:8080/a/",            # www + port stripped
        "http://example.de/tokyo/123",           # plain
        "not a url",                             # schemeless fallback
        "https://single/",                       # one-label host
        "ftp://A.B.C.D/e",                       # deep host
    ])
    assert surt_key(urls).to_pylist() == [
        "com,example,maps)/x/1?q=2",
        "io,foo)/a/",
        "de,example)/tokyo/123",
        "not a url",
        "single)/",
        "d,c,b,a)/e",
    ]


def test_surt_key_brute_reversal():
    # the offsets-permutation reversal vs a per-row Python reference
    rng = np.random.RandomState(7)
    hosts = []
    for _ in range(500):
        n = rng.randint(1, 6)
        hosts.append(".".join(
            "l%d" % rng.randint(0, 9) for _ in range(n)))
    urls = pa.array([f"https://{h}/p/{i}" for i, h in enumerate(hosts)])
    got = surt_key(urls).to_pylist()
    for u, h, g in zip(urls.to_pylist(), hosts, got):
        exp = ",".join(reversed(h.split("."))) + ")" + u.split(h, 1)[1]
        assert g == exp, (u, g, exp)


# ---------------------------------------------------------------------------
# Robots longest-match
# ---------------------------------------------------------------------------

def _brute_verdict(url, rules):
    import re
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)([^#]*)", url)
    host = m.group(1).lower()
    path = re.sub(r"\?.*$", "", m.group(2))
    best_allow = best_dis = 0
    for rh, rp, ra in rules:
        if rh == host and path.startswith(rp):
            if ra:
                best_allow = max(best_allow, len(rp))
            else:
                best_dis = max(best_dis, len(rp))
    return ("allow" if best_allow >= best_dis else "disallow",
            max(best_allow, best_dis))


def test_robots_verdict_brute():
    rules_t = make_robots_rules()
    rules = list(zip(rules_t["host"].to_pylist(),
                     rules_t["prefix"].to_pylist(),
                     rules_t["allow"].to_pylist()))
    # sample urls covering every host and hot/override sections
    urls = []
    for i, (h, p, a) in enumerate(rules):
        urls.append(f"https://{h}{p}{i}")         # exact-prefix hit
        urls.append(f"https://{h}{p.rstrip('/')}x/{i}")  # near-miss
    urls += [f"https://example.com/losangeles/{s}" for s in
             ("1", "19", "2", "", "100/deep")]
    got = robots_verdict_fn(rules_t)(
        pa.table({"url": pa.array(urls)})).to_pydict()
    for u, v, ln in zip(got["url"], got["verdict"], got["rule_len"]):
        ev, eln = _brute_verdict(u, rules)
        assert (v, ln) == (ev, eln), (u, v, ln, ev, eln)


def test_robots_allow_override_tiebreak():
    rules = pa.table({
        "host": pa.array(["h.x", "h.x", "h.x"]),
        "prefix": pa.array(["/a/", "/a/1", "/b/"]),
        "allow": pa.array([False, True, False])})
    fn = robots_verdict_fn(rules)
    out = fn(pa.table({"url": pa.array([
        "https://h.x/a/19",   # allow (longer override)
        "https://h.x/a/29",   # disallow
        "https://h.x/c/1",    # no match -> allow, len 0
    ])})).to_pydict()
    assert out["verdict"] == ["allow", "disallow", "allow"]
    assert out["rule_len"] == [4, 3, 0]
    # equal-length allow vs disallow resolves to allow
    rules2 = pa.table({"host": pa.array(["h.x", "h.x"]),
                       "prefix": pa.array(["/a/", "/a/"]),
                       "allow": pa.array([True, False])})
    out2 = robots_verdict_fn(rules2)(
        pa.table({"url": pa.array(["https://h.x/a/1"])})).to_pydict()
    assert out2["verdict"] == ["allow"]


# ---------------------------------------------------------------------------
# Snapshot delta (brute dict oracle over the real documents table)
# ---------------------------------------------------------------------------

def test_snapshot_delta_brute(ray_session):
    import pyarrow.parquet as pq

    from tilemaker_ray.pipelines.queries import q_snapshot_delta_docs

    sf = "/root/testdata/sf0.001"
    got = q_snapshot_delta_docs(sf).to_pandas()
    t = pq.read_table(sf + "/documents.parquet",
                      columns=["doc_id", "lang", "n_chars"]).to_pydict()
    exp = {}
    for did, lang, nch in zip(t["doc_id"], t["lang"], t["n_chars"]):
        in_old, in_new = did % 10 != 0, did % 7 != 0
        sig_old, sig_new = nch, nch + (8 if did % 3 == 0 else 0)
        if in_old and in_new:
            st = "unchanged" if sig_old == sig_new else "changed"
        elif in_old:
            st = "removed"
        elif in_new:
            st = "added"
        else:
            continue
        exp[did] = (lang, st)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert exp[r["doc_id"]] == (r["lang"], r["status"])
    # every status class must actually occur
    assert set(got["status"]) == {"added", "removed", "changed",
                                  "unchanged"}


# ---------------------------------------------------------------------------
# Anchored link derivation: partition invariance
# ---------------------------------------------------------------------------

def test_page_links_anchored_partition_invariant():
    urls = pa.array([f"https://example.com/city{i % 7}/{i}"
                     for i in range(100)])
    whole = page_links_anchored(pa.table({"url": urls}), 3)
    parts = [page_links_anchored(
        pa.table({"url": urls.slice(off, 25)}), 3) for off in
        range(0, 100, 25)]
    merged = pa.concat_tables(parts)
    key = lambda t: sorted(zip(t["src"].to_pylist(),
                               t["dsth"].to_pylist(),
                               t["anchor"].to_pylist()))
    assert key(whole) == key(merged)
    # anchors draw from the corpus vocabulary and repeat across sources
    assert len(set(whole["anchor"].to_pylist())) > 1


def test_anchor_rollup_matches_pandas():
    # the per-bucket rollup kernel (sum / distinct / modal anchor with
    # count-desc, anchor-asc ties) vs a pandas reference
    import pandas as pd

    rng = np.random.RandomState(3)
    dst = rng.choice(["s1", "s2", "s3"], 400)
    anchor = rng.choice(["a", "b", "c", "d"], 400)
    df = pd.DataFrame({"dst": dst, "anchor": anchor})
    c = df.groupby(["dst", "anchor"]).size().reset_index(name="n")
    exp = {}
    for d, g in c.groupby("dst"):
        g = g.sort_values(["n", "anchor"], ascending=[False, True])
        exp[d] = (int(g["n"].sum()), len(g), g.iloc[0]["anchor"])

    from tilemaker_ray.pipelines.queries import ORACLE_SQL  # noqa: F401
    # exercise the same kernel shape the query uses: pack, unique, sum
    t = pa.table({"dst": pa.array(dst), "anchor": pa.array(anchor),
                  "n": pa.array(np.ones(400, np.int64))})
    dd = t["dst"].combine_chunks().dictionary_encode()
    ad = t["anchor"].combine_chunks().dictionary_encode()
    dc = dd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ac = ad.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    na = len(ad.dictionary)
    key = dc * na + ac
    uk, inv = np.unique(key, return_inverse=True)
    cnt = np.zeros(len(uk), np.int64)
    np.add.at(cnt, inv, t["n"].to_numpy())
    d2, a2 = uk // na, uk % na
    anchors = np.asarray(ad.dictionary.to_pylist())
    dsts = np.asarray(dd.dictionary.to_pylist())
    order = np.lexsort((anchors[a2], -cnt, d2))
    first = np.ones(len(order), bool)
    first[1:] = d2[order][1:] != d2[order][:-1]
    top = order[first]
    for i in range(len(top)):
        d = dsts[d2[top[i]]]
        n_links = int(cnt[d2 == d2[top[i]]].sum())
        n_anchors = int((d2 == d2[top[i]]).sum())
        assert exp[d] == (n_links, n_anchors, anchors[a2[top[i]]])


# ---------------------------------------------------------------------------
# robots.txt parsing (REP wire format)
# ---------------------------------------------------------------------------

def test_parse_robots_txt_groups_and_rules():
    from tilemaker_ray.stages.urlstats import parse_robots_txt
    txt = """
# comment line
User-agent: googlebot
Disallow: /nogoogle/

User-agent: *
Disallow: /private/
Allow: /private/open
Disallow: /*.pdf$
Disallow:
Allow: /tmp/*/ok
Crawl-delay: 10
Sitemap: https://ex.com/sitemap.xml
"""
    r = parse_robots_txt("ex.com", txt)
    rows = list(zip(r["prefix"].to_pylist(), r["allow"].to_pylist(),
                    r["pattern"].to_pylist()))
    # '*' group selected (we are not googlebot); empty Disallow and
    # unknown fields dropped; wildcard rules translated to RE2
    assert rows == [
        ("/private/", False, None),
        ("/private/open", True, None),
        ("/*.pdf$", False, "^/.*\\.pdf$"),
        ("/tmp/*/ok", True, "^/tmp/.*/ok"),
    ]
    # named-agent selection beats '*', longest agent token wins
    g = parse_robots_txt("ex.com", txt, agent="googlebot-news")
    assert g["prefix"].to_pylist() == ["/nogoogle/"]


def test_parse_robots_txt_consecutive_agents_share_group():
    from tilemaker_ray.stages.urlstats import parse_robots_txt
    txt = """User-agent: a
User-agent: b
Disallow: /x/
User-agent: *
Disallow: /y/
"""
    assert parse_robots_txt("h", txt, agent="a")["prefix"] \
        .to_pylist() == ["/x/"]
    assert parse_robots_txt("h", txt, agent="b")["prefix"] \
        .to_pylist() == ["/x/"]
    assert parse_robots_txt("h", txt, agent="zzz")["prefix"] \
        .to_pylist() == ["/y/"]


def test_robots_wildcard_verdicts():
    import pyarrow as pa
    from tilemaker_ray.stages.urlstats import (parse_robots_txt,
                                               robots_verdict_wildcard_fn)
    txt = """User-agent: *
Disallow: /private/
Allow: /private/open
Disallow: /*.pdf$
Allow: /tmp/*/ok
"""
    fn = robots_verdict_wildcard_fn(parse_robots_txt("ex.com", txt))
    out = fn(pa.table({"url": pa.array([
        "https://ex.com/private/x",      # prefix disallow
        "https://ex.com/private/open/y",  # longer allow wins
        "https://ex.com/doc.pdf",         # $-anchored wildcard
        "https://ex.com/doc.pdfx",        # anchor rejects
        "https://ex.com/tmp/a/ok",        # mid-pattern wildcard
        "https://other.com/doc.pdf",      # other host unaffected
    ])}))
    assert out["verdict"].to_pylist() == [
        "disallow", "allow", "disallow", "allow", "allow", "allow"]


# ---------------------------------------------------------------------------
# sitemap parsing + frontier assembly
# ---------------------------------------------------------------------------

def test_parse_sitemap_urlset_and_index():
    from tilemaker_ray.stages.urlstats import parse_sitemap_xml
    xml = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc> https://ex.com/a?x=1&amp;y=2 </loc>
       <lastmod>2026-01-01</lastmod></url>
  <url><loc>https://ex.com/b</loc></url>
  <url><priority>0.5</priority></url>
</urlset>"""
    t = parse_sitemap_xml(xml)
    assert t["url"].to_pylist() == ["https://ex.com/a?x=1&y=2",
                                    "https://ex.com/b"]
    assert t["lastmod"].to_pylist() == ["2026-01-01", None]
    assert t["is_index"].to_pylist() == [False, False]

    idx = ("<sitemapindex><sitemap>"
           "<loc>https://ex.com/s1.xml</loc></sitemap>"
           "<sitemap><loc>https://ex.com/s2.xml</loc>"
           "<lastmod>2026-02-02</lastmod></sitemap></sitemapindex>")
    ti = parse_sitemap_xml(idx)
    assert ti["url"].to_pylist() == ["https://ex.com/s1.xml",
                                     "https://ex.com/s2.xml"]
    assert ti["is_index"].to_pylist() == [True, True]


def test_sitemap_discovery_from_robots():
    from tilemaker_ray.stages.urlstats import extract_sitemap_urls
    txt = """User-agent: *
Disallow: /x/
Sitemap: https://ex.com/sitemap.xml
sitemap: https://ex.com/news.xml  # comment
"""
    assert extract_sitemap_urls(txt) == [
        "https://ex.com/sitemap.xml", "https://ex.com/news.xml"]


def test_sitemap_frontier_robots_filtered():
    import pyarrow as pa
    from tilemaker_ray.stages.urlstats import (parse_robots_txt,
                                               sitemap_frontier_fn)
    xml = ("<urlset><url><loc>https://ex.com/ok</loc></url>"
           "<url><loc>https://ex.com/private/no</loc></url></urlset>")
    rules = {"ex.com": parse_robots_txt(
        "ex.com", "User-agent: *\nDisallow: /private/\n")}
    out = sitemap_frontier_fn(rules)(
        pa.table({"host": ["ex.com", "other.com"],
                  "body": [xml, "<urlset></urlset>"]}))
    assert out["url"].to_pylist() == ["https://ex.com/ok"]
    assert out["host"].to_pylist() == ["ex.com"]


def test_robots_group_separator_lines():
    """Sitemap/Crawl-delay/unknown lines END a group header: a
    User-agent line after them starts a NEW group (RFC 9309 grammar),
    it does not join the previous group."""
    from tilemaker_ray.stages.urlstats import parse_robots_txt
    txt = """User-agent: a
Sitemap: https://x/s.xml
User-agent: b
Disallow: /y/
"""
    assert parse_robots_txt("h", txt, agent="a")["prefix"] \
        .to_pylist() == []          # a's group carries no rules
    assert parse_robots_txt("h", txt, agent="b")["prefix"] \
        .to_pylist() == ["/y/"]


def test_robots_wildcard_matches_query_string():
    """RFC 9309 matches against path AND query: $-anchored rules must
    not match a stripped path, and ?sessionid= trap rules must fire."""
    import pyarrow as pa
    from tilemaker_ray.stages.urlstats import (parse_robots_txt,
                                               robots_verdict_wildcard_fn)
    txt = """User-agent: *
Disallow: /*.pdf$
Disallow: /*?sessionid=
"""
    fn = robots_verdict_wildcard_fn(parse_robots_txt("ex.com", txt))
    out = fn(pa.table({"url": pa.array([
        "https://ex.com/doc.pdf?x=1",        # query breaks the $ match
        "https://ex.com/page?sessionid=abc",  # trap rule fires
        "https://ex.com/doc.pdf",             # plain $ match
    ])}))
    assert out["verdict"].to_pylist() == ["allow", "disallow",
                                          "disallow"]


def test_sitemap_entity_unescape_order():
    """'&amp;' unescapes LAST: literal '&amp;lt;' in a loc is the text
    '&lt;', never double-unescaped to '<'."""
    from tilemaker_ray.stages.urlstats import parse_sitemap_xml
    xml = ("<urlset><url>"
           "<loc>https://ex.com/a?t=&amp;lt;b&amp;gt;</loc>"
           "</url></urlset>")
    assert parse_sitemap_xml(xml)["url"].to_pylist() == [
        "https://ex.com/a?t=&lt;b&gt;"]


def test_frontier_merge_collapses_variants(ray_session):
    """The three candidate streams collapse onto one canonical URL:
    base (prio 2), trailing-slash sitemap variant (prio 1), tracking-
    param re-crawl variant (prio 0) — best_prio wins, counts add."""
    from tilemaker_ray.pipelines.queries import QUERIES
    out = QUERIES["frontier_merge_urls"]("/root/testdata/sf0.001") \
        .to_pandas().set_index("canon_url")
    # page ids divisible by 60 are in ALL three streams
    hit = [c for c in out.index if c.endswith("/0")]
    assert hit
    row = out.loc[hit[0]]
    assert row["n_candidates"] == 3
    assert row["best_prio"] == 0
    # ids divisible by neither 3 nor 20 appear once at prio 2
    lone = out[(out["n_candidates"] == 1)]
    assert (lone["best_prio"] == 2).all()
