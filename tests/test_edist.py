"""Edit-distance unit vectors ported from the reference's own unit tests
(reference tests/run-unit:30-45)."""

import pytest

from dup_ocropy_ray.functions.edist import levenshtein, xlevenshtein


@pytest.mark.parametrize(
    "a,b,want",
    [
        ("a", "a", 0),
        ("", "", 0),
        ("a", "", 1),
        ("", "a", 1),
        ("aa", "aaaaaa", 4),
        ("aba", "bab", 2),
        ("kitten", "sitting", 3),
    ],
)
def test_levenshtein(a, b, want):
    assert levenshtein(a, b) == want


@pytest.mark.parametrize(
    "a,b,context,want",
    [
        ("exccpt", "except", 1, (1, [("ccp", "cep")])),
        ("exccpt", "except", 2, (1, [("xccpt", "xcept")])),
        ("exccpt", "except", 3, (1, [("exccpt ", "except ")])),
        ("exccpt", "except", 4, (1, [(" exccpt  ", " except  ")])),
        ("", "test", 1, (4, [])),
        ("aaaaaaaaaaa", "a", 1, (10, [("aaaaaaaaaaa ", "a__________ ")])),
        (
            "123 111 456",
            "132 111 444",
            1,
            (4, [("123_ ", "1_32 "), ("456 ", "444 ")]),
        ),
    ],
)
def test_xlevenshtein(a, b, context, want):
    assert xlevenshtein(a, b, context) == want


def test_xlevenshtein_equal_fastpath():
    assert xlevenshtein("same", "same", 1) == (0, [])


def test_levenshtein_many_matches_per_pair():
    """Batched DP == per-pair levenshtein on randomized ragged pairs,
    including empty strings and identical strings."""
    import numpy as np
    from dup_ocropy_ray.functions.edist import levenshtein, levenshtein_many

    rng = np.random.default_rng(42)
    alpha = "abcdeé Ωx"
    a_list, b_list = [], []
    for _ in range(300):
        la, lb = int(rng.integers(0, 30)), int(rng.integers(0, 30))
        a = "".join(rng.choice(list(alpha), la)) if la else ""
        b = "".join(rng.choice(list(alpha), lb)) if lb else ""
        if rng.random() < 0.1:
            b = a  # identical pair
        a_list.append(a)
        b_list.append(b)
    got = levenshtein_many(a_list, b_list)
    want = np.array([levenshtein(a, b) for a, b in zip(a_list, b_list)])
    assert np.array_equal(got, want)
    assert levenshtein_many([], []).shape == (0,)
    assert list(levenshtein_many(["", "ab"], ["xy", ""])) == [2, 2]
