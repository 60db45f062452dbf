"""Golden tests for the java.util.Random port.

Expected values generated with a real JDK (java.util.Random, Double.toString,
Math.round) — see kgforge/javarandom.py docstring for the public algorithm.
"""

import pytest

from kgforge.javarandom import JavaRandom, java_double_str, java_math_round, jdiv


def test_next_double_seed_1234():
    r = JavaRandom(1234)
    got = [r.next_double() for _ in range(6)]
    assert got == [
        0.6465821602909256,
        0.9513577109193919,
        0.8575884598068334,
        0.45823330506267057,
        0.3359524025416939,
        0.20387478195313158,
    ]


def test_next_gaussian_seed_1234():
    r = JavaRandom(1234)
    got = [r.next_gaussian() for _ in range(6)]
    assert got == [
        0.14115907833078006,
        0.4346588858045114,
        1.1384720144986948,
        -0.13297468645923347,
        -0.6052515488113404,
        -1.0925502698112701,
    ]


def test_mixed_stream_seed_42():
    r = JavaRandom(42)
    got = []
    for _ in range(4):
        got.append(r.next_double())
        got.append(r.next_gaussian())
    assert got == [
        0.7275636800328681, 1.102744497787456,
        0.27707849007413665, -1.151236608168695,
        0.6655489517945736, 0.7712775326519722,
        0.2757480694417024, -0.25089675133752143,
    ]


@pytest.mark.parametrize(
    "x,s",
    [
        (64300.0, "64300.0"),
        (1.0e7, "1.0E7"),
        (0.001, "0.001"),
        (1.0e-4, "1.0E-4"),
        (24.46797674259983, "24.46797674259983"),
        (-0.0, "-0.0"),
        (0.0, "0.0"),
        (-109.12820500514862, "-109.12820500514862"),
        (9999999.5, "9999999.5"),
        (123456789.0, "1.23456789E8"),
        (42.0, "42.0"),
        (-1.5e-5, "-1.5E-5"),
    ],
)
def test_java_double_str(x, s):
    assert java_double_str(x) == s


def test_java_math_round():
    assert java_math_round(-2.5) == -2
    assert java_math_round(2.5) == 3
    assert java_math_round(-2.51) == -3


def test_jdiv_truncates_toward_zero():
    assert jdiv(-7, 2) == -3
    assert jdiv(7, 2) == 3
    assert jdiv(-8, 2) == -4
