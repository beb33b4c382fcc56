"""Link-analysis math pins (no Ray): the SALSA closed form against an
explicit power iteration of the authority Markov chain, and the
Adamic–Adar / neighbor-Jaccard definitions against brute loops.

The distributed engines behind salsa_sites / adamic_adar_sites /
neighbor_jaccard_sites are certified against DuckDB SQL mirrors by the
driver protocol; these tests defend the MATH those mirrors encode —
in particular that the per-component in-degree closed form really is
the stationary distribution SALSA's walk converges to.
"""

import numpy as np


def _random_bipartite(rng, n_hubs=12, n_auth=9, p=0.3):
    A = (rng.random((n_hubs, n_auth)) < p).astype(np.float64)
    # every hub links somewhere, every authority has an in-link
    for i in range(n_hubs):
        if A[i].sum() == 0:
            A[i, rng.integers(n_auth)] = 1.0
    for j in range(n_auth):
        if A[:, j].sum() == 0:
            A[rng.integers(n_hubs), j] = 1.0
    return A


def _salsa_closed_form(A):
    """π(j) = (|C_j|/|A|) · d_in(j)/Σ_{C_j} d_in — components over
    the authority co-citation graph (authorities sharing a hub)."""
    n_auth = A.shape[1]
    din = A.sum(axis=0)
    # authority components via shared hubs
    adj = (A.T @ A) > 0
    comp = -np.ones(n_auth, dtype=int)
    c = 0
    for s in range(n_auth):
        if comp[s] >= 0:
            continue
        stack = [s]
        comp[s] = c
        while stack:
            u = stack.pop()
            for v in np.flatnonzero(adj[u]):
                if comp[v] < 0:
                    comp[v] = c
                    stack.append(v)
        c += 1
    pi = np.zeros(n_auth)
    for cc in range(c):
        mem = comp == cc
        pi[mem] = (mem.sum() / n_auth) * din[mem] / din[mem].sum()
    return pi, comp


def test_salsa_closed_form_is_stationary():
    rng = np.random.default_rng(7)
    for trial in range(20):
        A = _random_bipartite(rng)
        # authority chain: j -> uniform in-hub h -> uniform out-auth
        Dh = A.sum(axis=1, keepdims=True)     # hub out-degrees
        Da = A.sum(axis=0, keepdims=True)     # authority in-degrees
        # P[j, k] = sum_h A[h,j]/din(j) * A[h,k]/dout(h)
        P = (A / Da).T @ (A / Dh)
        pi, comp = _salsa_closed_form(A)
        # stationarity: pi P = pi (the walk preserves the closed form)
        assert np.allclose(pi @ P, pi, atol=1e-12), trial
        assert abs(pi.sum() - 1.0) < 1e-12
        # power iteration from the uniform start converges to a
        # distribution with the same per-component mass profile
        x = np.full(A.shape[1], 1.0 / A.shape[1])
        for _ in range(500):
            x = x @ P
        for cc in range(comp.max() + 1):
            mem = comp == cc
            assert abs(x[mem].sum() - pi[mem].sum()) < 1e-9


def test_adamic_adar_brute():
    rng = np.random.default_rng(11)
    n_src, n_dst = 30, 20
    E = set()
    for _ in range(120):
        E.add((int(rng.integers(n_src)), int(rng.integers(n_dst))))
    outdeg = {}
    for s, t in E:
        outdeg[s] = outdeg.get(s, 0) + 1
    # the engine's rule: weight floor(1e9/ln d) per common source of
    # degree d in [2, 64]
    scores = {}
    common = {}
    for s in outdeg:
        if not (2 <= outdeg[s] <= 64):
            continue
        ts = sorted(t for (ss, t) in E if ss == s)
        w = int(np.floor(1e9 / np.log(float(outdeg[s]))))
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                key = (ts[i], ts[j])
                scores[key] = scores.get(key, 0) + w
                common[key] = common.get(key, 0) + 1
    from tilemaker_ray.pipelines.queries import _aa_weight_fp
    for s, d in outdeg.items():
        if 2 <= d <= 64:
            assert int(_aa_weight_fp(np.asarray([d]))[0]) == \
                int(np.floor(1e9 / np.log(float(d))))
    # pairs with >= 2 common sources have positive exact scores
    kept = {k: v for k, v in scores.items() if common[k] >= 2}
    assert kept, "fixture degenerate"
    for k, v in kept.items():
        assert v > 0 and isinstance(v, int)


def test_neighbor_jaccard_definition():
    # jac = c / (da + db - c) is the set Jaccard when c counts the
    # intersection and da/db the set sizes
    Sa = {1, 2, 3, 4}
    Sb = {3, 4, 5}
    c = len(Sa & Sb)
    jac = c / (len(Sa) + len(Sb) - c)
    assert jac == len(Sa & Sb) / len(Sa | Sb)
