"""Smith–Waterman oracles: anti-diagonal kernel vs the cell-loop
reference on random token sequences; hand shapes."""

import numpy as np

from tilemaker_ray.stages.align import sw_score, sw_score_reference


def test_hand_values():
    assert sw_score(list("abc"), list("abc")) == 6
    assert sw_score(list("abc"), list("xyz")) == 0
    # 'ab' aligned inside 'xxabyy': 2 matches
    assert sw_score(list("ab"), list("xxabyy")) == 4
    # gap: 'abc' vs 'abxc' -> a,b match (4), gap (-1), c match (+2)
    assert sw_score(list("abc"), list("abxc")) == 5
    assert sw_score([], list("abc")) == 0
    assert sw_score(list("a"), list("a")) == 2


def test_random_vs_reference():
    rng = np.random.RandomState(3)
    for _ in range(60):
        la, lb = rng.randint(0, 25, 2)
        a = rng.randint(0, 6, la).tolist()
        b = rng.randint(0, 6, lb).tolist()
        assert sw_score(a, b) == sw_score_reference(a, b), (a, b)


def test_word_tokens():
    a = "the quick brown fox jumps over the lazy dog".split()
    b = "a quick brown cat jumps over a lazy dog".split()
    got = sw_score(a, b)
    assert got == sw_score_reference(a, b)
    assert got >= 8          # long shared run dominates


def test_asymmetric_lengths():
    rng = np.random.RandomState(8)
    a = rng.randint(0, 4, 3).tolist()
    b = rng.randint(0, 4, 40).tolist()
    assert sw_score(a, b) == sw_score_reference(a, b)
    assert sw_score(b, a) == sw_score_reference(b, a)
