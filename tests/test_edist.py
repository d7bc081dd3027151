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
