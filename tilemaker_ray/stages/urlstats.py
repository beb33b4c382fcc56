"""URL / domain analytics over the Common-Crawl-style pages table.

The crawl-side sibling of the tag prefilter (the reference's
significant-tags scan walks every object's keys before any geometry
work, /root/reference/src/significant_tags.cpp; here the first thing a
web corpus pipeline does is bucket pages by registered domain). All
parsing is one ``pc.extract_regex`` pass over the url column — no
per-row Python — so the stage fuses into the read at corpus scale.

Provided:
- :func:`parse_url_fn` — map_batches body adding scheme / host /
  registered domain / tld / path depth columns;
- :func:`host_stats` — combiner-first per-host aggregation (partial
  counts inside map_batches, one slim groupby-sum exchange);
- :func:`host_topk` — top-k hosts by page count (groupby + sort+limit).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# scheme://host[/path...] — query/fragment split off the path
_URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
           r"(?P<host>[^/?#]*)(?P<path>[^?#]*)")


def parse_url_fn(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Vectorized URL decomposition. ``host`` drops userinfo and port
    (urllib ``hostname`` semantics, lowercased); ``domain`` is the
    registered domain approximated as the last two host labels (no
    public-suffix list in this container — documented heuristic, exact
    for the synthetic corpus and for .com/.org/... hosts); ``tld`` the
    last label; ``path_depth`` the number of non-empty path segments."""
    parts = pc.extract_regex(batch[url_col], _URL_RE)
    # utf8_lower, not ascii_lower: urllib's .hostname lowercases with
    # str.lower() (Unicode), and the warc_host_stats SQL oracle's
    # lower() is Unicode too — ascii_lower would diverge on any
    # non-ASCII host label in real crawl data
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    netloc = pc.utf8_lower(pc.struct_field(parts, "host"))
    path = pc.struct_field(parts, "path")
    # host = netloc minus userinfo / port (IPv6 brackets kept whole)
    hostm = pc.extract_regex(netloc, r"^(?:[^@]*@)?(?P<h>\[[^\]]*\]|[^:]*)")
    host = pc.struct_field(hostm, "h")
    # registered domain = last two dot-labels of the host (regex
    # anchored at end — no per-row Python, no list indexing)
    tail2 = pc.extract_regex(host, r"(?P<dom>[^.]+\.(?P<tld>[^.]+))$")
    domain = pc.if_else(pc.is_valid(tail2),
                        pc.struct_field(tail2, "dom"), host)
    tld = pc.if_else(pc.is_valid(tail2),
                     pc.struct_field(tail2, "tld"), host)
    # path depth = non-empty '/'-segments: collapse runs of '/', then
    # '/a/b/c' → 3, '/a/' → 1, '' or '/' → 0
    norm = pc.replace_substring_regex(path, "/+", "/")
    seg = pc.count_substring(norm, "/")
    trailing = pc.ends_with(norm, "/")
    depth = pc.subtract(seg, pc.cast(trailing, pa.int32()))
    return (batch.append_column("scheme", scheme)
                 .append_column("host", host)
                 .append_column("domain", domain)
                 .append_column("tld", tld)
                 .append_column("path_depth",
                                pc.cast(depth, pa.int64())))


def _partial_host_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (host, n_pages, sum_chars) partials so the
    exchange moves one slim row per distinct host per batch."""
    b = parse_url_fn(batch)
    host = b["host"].combine_chunks().dictionary_encode()
    codes = host.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nchars = pc.utf8_length(b["text"]).to_numpy(zero_copy_only=False).astype(np.int64)
    n_host = len(host.dictionary)
    cnt = np.bincount(codes, minlength=n_host)
    chars = np.bincount(codes, weights=nchars, minlength=n_host).astype(np.int64)
    return pa.table({"host": host.dictionary,
                     "part_pages": pa.array(cnt, pa.int64()),
                     "part_chars": pa.array(chars, pa.int64())})


def host_stats(pages_ds):
    """Per-host page count + total extracted-text chars. One shuffle of
    pre-aggregated partials (distinct-hosts × batches rows)."""
    from ray.data.aggregate import Sum
    ds = pages_ds.map_batches(_partial_host_counts, batch_format="pyarrow")
    return (ds.groupby("host")
            .aggregate(Sum("part_pages", alias_name="n_pages"),
                       Sum("part_chars", alias_name="sum_chars")))


def host_topk(pages_ds, k: int = 50):
    """Top-k hosts by page count (stable tie-break on host name)."""
    return (host_stats(pages_ds)
            .sort(["n_pages", "host"], descending=[True, False]).limit(k))


# ---------------------------------------------------------------------------
# URL canonicalization (crawl dedup by canonical URL)
# ---------------------------------------------------------------------------

# RE2 on both engines: Arrow's replace_substring_regex and DuckDB's
# regexp_replace share the regex dialect AND the global-replace resume
# semantics, so the SQL oracle can mirror this chain verbatim.
_TRACK_RE = r"([?&])(?:utm_[a-z]+|gclid|fbclid)=[^&]*"


def canonicalize_urls(arr) -> pa.Array:
    """Vectorized crawl-style URL canonicalization — the key function of
    a duplicate-URL collapse pass over a 10^12-row crawl frontier.

    Rules (each a single RE2 pass, applied in this order):
      1. strip the fragment (``#...``);
      2. drop tracking query params (``utm_*`` / ``gclid`` / ``fbclid``),
         keeping the leading separator;
      3. collapse the separator runs rule 2 leaves behind
         (``?&&a=1`` → ``?a=1``) and 4. strip a dangling ``?``/``&``;
      5. lowercase the scheme+authority only (path/query stay
         case-sensitive per RFC 3986) and drop a default ``:80``/``:443``
         port; schemeless strings are lowercased whole;
      6. strip one trailing slash (``/x/`` ≡ ``/x``, ``/`` ≡ root).

    Consecutive tracking params are handled by rule 2+3 together: RE2
    global replace resumes AFTER each replacement, so ``?utm_a=1&utm_b=2``
    becomes ``?&&`` debris that rule 3 collapses — the oracle relies on
    the identical resume behavior. Known approximation (documented, and
    mirrored by the oracle either way): ``//`` runs in the path are kept
    and only ONE trailing slash is stripped.
    """
    u = pc.replace_substring_regex(arr, r"#.*", "")
    u = pc.replace_substring_regex(u, _TRACK_RE, r"\1")
    u = pc.replace_substring_regex(u, r"([?&])&+", r"\1")
    u = pc.replace_substring_regex(u, r"[?&]$", "")
    m = pc.extract_regex(
        u, r"^(?P<head>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(?P<tail>.*)$")
    head = pc.utf8_lower(pc.struct_field(m, "head"))
    head = pc.replace_substring_regex(head, r":(80|443)$", "")
    tail = pc.struct_field(m, "tail")
    canon = pc.if_else(pc.is_valid(m),
                       pc.binary_join_element_wise(head, tail, ""),
                       pc.utf8_lower(u))
    return pc.replace_substring_regex(canon, r"/$", "")


# The DuckDB mirror of canonicalize_urls over a column named u —
# kept next to the kernel so the two rule chains are reviewed together.
# {col} is substituted with the source column expression.
CANON_SQL_EXPR = """
        regexp_replace(
          CASE WHEN regexp_matches(c3, '^[A-Za-z][A-Za-z0-9+.-]*://')
               THEN regexp_replace(lower(regexp_extract(c3,
                        '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)),
                    ':(80|443)$', '')
                    || regexp_replace(c3,
                        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')
               ELSE lower(c3) END,
          '/$', '')
"""

CANON_SQL_STEPS = """
      SELECT *, regexp_replace(c2, '[?&]$', '') AS c3 FROM (
        SELECT *, regexp_replace(c1, '([?&])&+', '\\1', 'g') AS c2 FROM (
          SELECT *, regexp_replace(c0,
              '([?&])(?:utm_[a-z]+|gclid|fbclid)=[^&]*', '\\1', 'g') AS c1
          FROM (SELECT *, regexp_replace({col}, '#.*', '') AS c0
                FROM {src}) s0) s1) s2
"""


# ---------------------------------------------------------------------------
# SURT keys (CDX-style canonical URL index ordering)
# ---------------------------------------------------------------------------

_SURT_URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
                r"(?P<host>[^/?#]*)(?P<rest>[^#]*)")


def surt_key(arr) -> pa.Array:
    """Vectorized SURT (Sort-friendly URI Reordering Transform) keys —
    the ordering key of a web-archive CDX index (Common Crawl's index
    files sort captures by SURT so one host's pages, and one domain's
    hosts, are contiguous on disk).

    Key = reversed host labels joined with ',' + ')' + path?query:
    ``https://maps.example.com/x/1?q=2#f`` → ``com,example,maps)/x/1?q=2``.
    The scheme and fragment are dropped, the host is lowercased, one
    ``www.`` prefix and an explicit port are stripped. Schemeless
    strings fall back to the whole string lowercased.

    The label reversal is pure Arrow+numpy: split_pattern gives a
    ListArray, a permutation built from its offsets reverses each
    list's slots in one ``take``, and binary_join re-joins — no Python
    loop, so the stage fuses into the frontier scan at crawl scale.
    """
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    m = pc.extract_regex(arr, _SURT_URL_RE)
    host = pc.utf8_lower(pc.struct_field(m, "host"))
    host = pc.replace_substring_regex(host, r":[0-9]+$", "")
    host = pc.replace_substring_regex(host, r"^www\.", "")
    rest = pc.struct_field(m, "rest")
    labels = pc.split_pattern(host, ".")
    if isinstance(labels, pa.ChunkedArray):
        labels = labels.combine_chunks()
    lens = pc.fill_null(pc.list_value_length(labels), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    values = labels.flatten()
    starts, ends = offs[:-1], offs[1:]
    list_id = np.repeat(np.arange(len(lens)), lens)
    idx = np.arange(offs[-1], dtype=np.int64)
    # element at output slot k of list i reads input slot s_i+e_i-1-k
    perm = (starts + ends - 1)[list_id] - idx
    rev_values = values.take(pa.array(perm, pa.int64()))
    rev_lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                         rev_values)
    joined = pc.binary_join(rev_lists, ",")
    built = pc.binary_join_element_wise(joined, ")", rest, "")
    return pc.if_else(pc.is_valid(m), built, pc.utf8_lower(arr))


# DuckDB mirror of surt_key over {col} (RE2 + the same list reversal).
SURT_SQL_EXPR = """
    CASE WHEN regexp_matches({col}, '^[A-Za-z][A-Za-z0-9+.-]*://')
         THEN array_to_string(list_reverse(string_split(
                  regexp_replace(regexp_replace(
                      lower(regexp_extract({col},
                          '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
                      ':[0-9]+$', ''), '^www\\.', ''), '.')), ',')
              || ')' || regexp_extract({col},
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1)
         ELSE lower({col}) END
"""


# ---------------------------------------------------------------------------
# Robots-style URL prefix filtering (longest-match, allow wins ties)
# ---------------------------------------------------------------------------

def make_robots_rules() -> pa.Table:
    """Deterministic synthetic robots rule set over the crawl's host ×
    section universe (the link-extraction stand-in pattern of
    stages/pagerank.py::page_links: the RULES are fixture data; the
    matching semantics below are the real operator).

    Per (host=example.{tld}, section): a splitmix draw disallows ~1/4
    of sections (``Disallow: /{section}/``); half of those also carry a
    LONGER allow override (``Allow: /{section}/1``) so page ids
    starting with '1' stay crawlable — exercising true longest-match
    resolution, not just first-match. Every host additionally
    disallows ``/private/`` (a prefix no synthetic URL has — the
    zero-match path).
    """
    from ..sources.pages import CITIES, _TLDS, _splitmix64

    hosts, prefixes, allows = [], [], []
    for ti, tld in enumerate(_TLDS):
        host = f"example.{tld}"
        hosts.append(host); prefixes.append("/private/"); allows.append(False)
        for ci, (cname, _, _) in enumerate(CITIES):
            h = int(_splitmix64(np.array([ti * 1009 + ci + 7],
                                         dtype=np.uint64))[0])
            if h % 4 == 0:
                hosts.append(host); prefixes.append(f"/{cname}/")
                allows.append(False)
                if h % 8 == 0:
                    hosts.append(host); prefixes.append(f"/{cname}/1")
                    allows.append(True)
    return pa.table({"host": pa.array(hosts, pa.string()),
                     "prefix": pa.array(prefixes, pa.string()),
                     "allow": pa.array(allows, pa.bool_())})


def robots_verdict_fn(rules: pa.Table):
    """map_batches body: url → (url, verdict, rule_len) under Google
    robots semantics — the longest matching rule governs; an allow and
    a disallow of equal length resolve to allow; no match → allow with
    rule_len 0.

    The rule table is broadcast once (callers pass it through the
    closure / ray.put — a few KB per million URLs of frontier per
    host shard). Matching is one C-speed ``starts_with`` + host
    equality per rule over the whole batch — O(R·B) vector ops with
    R small. At real-web rule counts, dictionary-encode the host
    column and apply only each host's rule group (same kernel,
    per-group slices); the synthetic universe has 8 hosts so the flat
    pass is already host-grouped in practice.

    Path-only matching (query stripped) — the semantics this
    function's SQL-mirrored query (robots_filter_urls) certifies;
    delegates to the generalized evaluator so the kernel exists once.
    """
    return robots_verdict_wildcard_fn(rules, match_query=False)


# --------------------------------------------------------------------
# Registered domain (eTLD+1) via public-suffix longest match
# --------------------------------------------------------------------
# Per-site rollups (crawl budgets, dedup scopes, PageRank nodes) must
# group by the REGISTERED domain, not the host: a.blogspot.com and
# b.blogspot.com are different sites, www.bbc.co.uk and news.bbc.co.uk
# are the same one. Resolution follows the publicsuffix.org algorithm
# restricted to plain rules: the longest suffix-table entry that
# label-matches the host wins; unmatched hosts fall to the implicit
# "*" rule (suffix = last label); a host that IS a public suffix has
# no registrable domain. The suffix table is tiny (≈10k rules for the
# real PSL) — broadcast once, matching is one C-speed ends_with pass
# per rule, fused into the scan (no shuffle).

# Fixture stand-in for the real PSL (same resolution semantics; mixes
# 1-, 2- and 3-label rules plus nested pairs so longest-match is
# genuinely exercised).
PUBLIC_SUFFIXES = [
    "com", "org", "net", "io", "us", "uk", "jp", "au",
    "co.uk", "org.uk", "co.jp", "ac.jp", "com.au",
    "github.io", "k12.ca.us",
]

NO_REG_DOMAIN = "(public-suffix)"


def make_suffix_table() -> pa.Table:
    return pa.table({"suffix": pa.array(PUBLIC_SUFFIXES, pa.string())})


def registered_domain(host_col, suffixes=None) -> pa.Array:
    """Vectorized eTLD+1: one ends_with pass per suffix rule tracks the
    longest match (matching rules on one host are necessarily nested
    label-suffixes, so char length IS specificity); per-rule regexp
    extracts label+'.'+suffix; unmatched hosts use the implicit rule
    (last two labels); suffix-only and single-label hosts get the
    NO_REG_DOMAIN sentinel."""
    import re as _re
    arr = (host_col.combine_chunks()
           if isinstance(host_col, pa.ChunkedArray) else host_col)
    n = len(arr)
    if suffixes is None:
        suffixes = PUBLIC_SUFFIXES
    best_len = np.zeros(n, dtype=np.int64)
    best_idx = np.full(n, -1, dtype=np.int64)
    # null hosts (parse_url_fn emits them for malformed URLs) must not
    # poison the masks — fill to False here, emit null at the end
    nulls = pc.is_null(arr).to_numpy(zero_copy_only=False)
    for i, s in enumerate(suffixes):
        m = pc.fill_null(
            pc.or_(pc.equal(arr, s), pc.ends_with(arr, "." + s)),
            False).to_numpy(zero_copy_only=False).astype(bool)
        m = m & (len(s) > best_len)
        best_idx[m] = i
        best_len[m] = len(s)
    out = np.full(n, NO_REG_DOMAIN, dtype=object)
    groups = [(i, "(?P<r>[^.]+[.]" + _re.escape(s) + ")$")
              for i, s in enumerate(suffixes)] \
        + [(-1, "(?P<r>[^.]+[.][^.]+)$")]
    for gi, pat in groups:
        rows = np.flatnonzero(best_idx == gi)
        if not len(rows):
            continue
        sub = arr.take(pa.array(rows, pa.int64()))
        ex = pc.extract_regex(sub, pat)
        # no-match rows are null at the STRUCT level; the child field
        # carries '' with its own validity set, so take ok from ex
        reg = ex.field(0) if ex.type.num_fields else ex
        regv = reg.to_numpy(zero_copy_only=False)
        ok = pc.is_valid(ex).to_numpy(zero_copy_only=False)
        out[rows[ok]] = regv[ok]
    out[nulls] = None
    return pa.array(out.tolist(), pa.string())


# Mirrors registered_domain for one (host, suffix) pair the oracle's
# longest-match join has already resolved; {host}/{suffix} columns.
REG_DOMAIN_SQL_CASE = """
    CASE WHEN {suffix} IS NOT NULL THEN
           COALESCE(NULLIF(regexp_extract({host},
               '([^.]+[.]' || replace({suffix}, '.', '[.]') || ')$', 1),
               ''), '(public-suffix)')
         ELSE
           COALESCE(NULLIF(regexp_extract({host},
               '([^.]+[.][^.]+)$', 1), ''), '(public-suffix)')
    END
"""


# --------------------------------------------------------------------
# robots.txt parsing (REP wire format → rule table)
# --------------------------------------------------------------------

def parse_robots_txt(host: str, text: str,
                     agent: str = "*") -> pa.Table:
    """Parse one robots.txt body into the (host, prefix, allow,
    pattern) rule table the frontier filter consumes — the Robots
    Exclusion Protocol per RFC 9309 / the public Google robots spec:

    - ``User-agent`` lines open a group; CONSECUTIVE user-agent lines
      share the group's rules; group selection picks the most
      specific matching agent (longest agent token that is a prefix
      of ours, '*' matches anything and loses to any named match).
    - ``Allow`` / ``Disallow`` carry path patterns; an empty
      ``Disallow:`` means no rule (crawl everything).
    - ``#`` starts a comment; field names are case-insensitive;
      unknown fields (Crawl-delay, Sitemap) are ignored here.
    - Patterns may contain ``*`` (any run) and a trailing ``$``
      (end anchor). Plain prefixes stay prefixes (``pattern`` NULL);
      wildcard rules get an RE2 translation in ``pattern`` for
      match_substring_regex — the evaluator applies whichever form a
      rule carries. Longest-match precedence counts PATTERN length
      (spec rule), not matched length.

    Returns the same columns robots_verdict_fn broadcasts, plus
    ``pattern`` (NULL for plain prefix rules).
    """
    import re as _re

    groups = []          # (agent_tokens, rules)
    cur_agents, cur_rules = [], []
    in_group_header = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_group_header and cur_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(value.lower())
            in_group_header = True
        elif field in ("allow", "disallow"):
            in_group_header = False
            if not cur_agents:
                continue             # rules before any user-agent line
            if value == "" and field == "disallow":
                continue             # empty Disallow: = no rule
            cur_rules.append((field == "allow", value))
        else:
            # any other recognized-shape line (Sitemap, Crawl-delay,
            # unknown fields) ends a group header: per the RFC 9309
            # grammar a User-agent line AFTER it starts a NEW group
            # rather than joining the previous header
            in_group_header = False
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    agent = agent.lower()
    best_key, chosen = None, []
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                key = (0, 0)
            elif agent.startswith(a):
                key = (1, len(a))
            else:
                continue
            if best_key is None or key > best_key:
                best_key, chosen = key, rules
            elif key == best_key:
                chosen = chosen + rules   # spec: merge same-specificity
    hosts, prefixes, allows, patterns = [], [], [], []
    for allow, pat in chosen:
        hosts.append(host)
        allows.append(allow)
        if "*" in pat or pat.endswith("$"):
            anchored = pat.endswith("$")
            body = pat[:-1] if anchored else pat
            rx = "^" + ".*".join(_re.escape(p)
                                 for p in body.split("*"))
            if anchored:
                rx += "$"
            prefixes.append(pat)      # length for precedence
            patterns.append(rx)
        else:
            prefixes.append(pat)
            patterns.append(None)
    return pa.table({"host": pa.array(hosts, pa.string()),
                     "prefix": pa.array(prefixes, pa.string()),
                     "allow": pa.array(allows, pa.bool_()),
                     "pattern": pa.array(patterns, pa.string())})


def robots_verdict_wildcard_fn(rules: pa.Table,
                               match_query: bool = True):
    """robots_verdict_fn generalized to parsed rule tables that may
    carry RE2-translated wildcard patterns: plain rules use the
    C-speed starts_with pass, wildcard rules one match_substring_regex
    pass each — same O(R·B) shape, precedence by PATTERN length.

    RFC 9309 matches against path AND query (the classic
    ``Disallow: /*?sessionid=`` trap rule, and ``$`` must not match a
    stripped path) — the default. ``match_query=False`` reproduces
    the path-only semantics of the legacy prefix evaluator and its
    SQL-mirrored query."""
    has_pattern = "pattern" in rules.column_names
    rule_rows = list(zip(
        rules["host"].to_pylist(), rules["prefix"].to_pylist(),
        rules["allow"].to_pylist(),
        rules["pattern"].to_pylist() if has_pattern
        else [None] * rules.num_rows))

    def fn(batch: pa.Table) -> pa.Table:
        parts = pc.extract_regex(batch["url"], _SURT_URL_RE)
        host = pc.utf8_lower(pc.struct_field(parts, "host"))
        rest = pc.struct_field(parts, "rest")
        path = rest if match_query else \
            pc.replace_substring_regex(rest, r"\?.*$", "")
        n = batch.num_rows
        best_allow = np.zeros(n, dtype=np.int64)
        best_dis = np.zeros(n, dtype=np.int64)
        for rh, rp, ra, rx in rule_rows:
            if rx is None:
                mk = pc.and_(pc.equal(host, rh),
                             pc.starts_with(path, rp))
            else:
                mk = pc.and_(pc.equal(host, rh),
                             pc.match_substring_regex(path, rx))
            mk = pc.fill_null(mk, False) \
                .to_numpy(zero_copy_only=False).astype(bool)
            tgt = best_allow if ra else best_dis
            np.maximum(tgt, np.where(mk, len(rp), 0), out=tgt)
        verdict = np.where(best_allow >= best_dis, "allow", "disallow")
        return pa.table({
            "url": batch["url"],
            "verdict": pa.array(verdict.tolist(), pa.string()),
            "rule_len": pa.array(np.maximum(best_allow, best_dis),
                                 pa.int64())})

    return fn


# --------------------------------------------------------------------
# sitemap parsing (sitemaps.org XML) + frontier assembly
# --------------------------------------------------------------------

def extract_sitemap_urls(text: str) -> list:
    """robots.txt ``Sitemap:`` lines → absolute sitemap URLs (the
    discovery path RFC 9309 reserves; case-insensitive field name,
    comments stripped)."""
    out = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def parse_sitemap_xml(text: str) -> pa.Table:
    """One sitemaps.org document → (url, lastmod, is_index) rows.

    Handles both ``<urlset>`` (leaf) and ``<sitemapindex>`` (pointers
    to child sitemaps — is_index True, to be fetched and parsed by the
    same stage). Regex-based on purpose: the format is line-oriented
    machine output, the per-host files are small and parsed once per
    crawl (NOT the per-URL hot path), and the container has no XML
    parser beyond stdlib — entities in <loc> are unescaped per the
    spec's escaping table."""
    import re as _re

    is_index = bool(_re.search(r"<\s*sitemapindex[\s>]", text))
    urls, mods = [], []
    blocks = _re.findall(r"<(?:url|sitemap)\s*>(.*?)</(?:url|sitemap)\s*>",
                         text, _re.S)
    for b in blocks:
        m = _re.search(r"<loc\s*>\s*(.*?)\s*</loc\s*>", b, _re.S)
        if not m:
            continue
        loc = m.group(1)
        # '&amp;' must unescape LAST: doing it first turns the literal
        # text '&amp;lt;' into '&lt;' which the later pass would then
        # wrongly unescape to '<' (double-unescape)
        for ent, ch in (("&apos;", "'"), ("&quot;", '"'),
                        ("&gt;", ">"), ("&lt;", "<"), ("&amp;", "&")):
            loc = loc.replace(ent, ch)
        lm = _re.search(r"<lastmod\s*>\s*(.*?)\s*</lastmod\s*>", b, _re.S)
        urls.append(loc)
        mods.append(lm.group(1) if lm else None)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "lastmod": pa.array(mods, pa.string()),
        "is_index": pa.array([is_index] * len(urls), pa.bool_())})


def sitemap_frontier_fn(robots_by_host: dict):
    """map_batches body assembling a crawl frontier from fetched
    sitemap bodies: rows (host, body) → robots-filtered candidate
    URLs with lastmod. The per-host robots rule tables are broadcast
    once (``ray.put`` the dict); parsing is per FILE (thousands of
    files), verdicts per URL are the vectorized wildcard evaluator —
    the per-URL hot path stays C-speed."""
    def fn(batch: pa.Table) -> pa.Table:
        outs = []
        for host, body in zip(batch["host"].to_pylist(),
                              batch["body"].to_pylist()):
            t = parse_sitemap_xml(body)
            t = t.filter(pc.invert(t["is_index"]))
            if t.num_rows == 0:
                continue
            rules = robots_by_host.get(host)
            if rules is not None and rules.num_rows:
                v = robots_verdict_wildcard_fn(rules)(
                    pa.table({"url": t["url"]}))
                keep = pc.equal(v["verdict"], "allow")
                t = t.filter(keep)
            outs.append(pa.table({
                "host": pa.array([host] * t.num_rows, pa.string()),
                "url": t["url"], "lastmod": t["lastmod"]}))
        if not outs:
            return pa.table({"host": pa.array([], pa.string()),
                             "url": pa.array([], pa.string()),
                             "lastmod": pa.array([], pa.string())})
        return pa.concat_tables(outs)

    return fn
