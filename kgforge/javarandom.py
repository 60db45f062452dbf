"""Bit-exact re-implementation of ``java.util.Random`` (public LCG algorithm).

The reference engine seeds one ``new Random(seed)`` per randomized attribute
(reference: service/anonymizer/RandomizationNumeric.java:22,
RandomizationDate.java:29, RandomizationDateTime.java:26) and consumes draws
sequentially in ascending-value order, so matching its seeded golden fixtures
requires this exact generator.  The algorithm is public (JDK docs / JLS):
a 48-bit LCG with Marsaglia polar method for Gaussians.
"""

from __future__ import annotations

import math

_MULT = 0x5DEECE66D
_ADD = 0xB
_MASK = (1 << 48) - 1


class JavaRandom:
    """Drop-in for java.util.Random(seed): nextDouble / nextGaussian."""

    __slots__ = ("_seed", "_next_gaussian", "_have_gaussian")

    def __init__(self, seed: int) -> None:
        self._seed = (seed ^ _MULT) & _MASK
        self._next_gaussian = 0.0
        self._have_gaussian = False

    def _next(self, bits: int) -> int:
        self._seed = (self._seed * _MULT + _ADD) & _MASK
        return self._seed >> (48 - bits)

    def next_double(self) -> float:
        return ((self._next(26) << 27) + self._next(27)) * (2.0 ** -53)

    def next_gaussian(self) -> float:
        # Marsaglia polar method with cached spare, exactly as java.util.Random.
        if self._have_gaussian:
            self._have_gaussian = False
            return self._next_gaussian
        while True:
            v1 = 2.0 * self.next_double() - 1.0
            v2 = 2.0 * self.next_double() - 1.0
            s = v1 * v1 + v2 * v2
            if 0.0 < s < 1.0:
                break
        multiplier = math.sqrt(-2.0 * math.log(s) / s)
        self._next_gaussian = v2 * multiplier
        self._have_gaussian = True
        return v1 * multiplier


def java_math_round(x: float) -> int:
    """java.lang.Math.round(double): floor(x + 0.5) as a long."""
    if math.isnan(x):
        return 0
    return math.floor(x + 0.5)


def jdiv(a: int, b: int) -> int:
    """Java integer division: truncates toward zero (Python // floors)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def java_double_str(x: float) -> str:
    """java.lang.Double.toString for finite doubles (JDK 19+ shortest-digits).

    Java uses plain decimal for 1e-3 <= |x| < 1e7, otherwise normalized
    scientific notation like ``1.0E7`` / ``1.0E-4``; always >=1 digit on each
    side of the point.  Python's repr produces the same shortest digit string
    but with different formatting thresholds, so reformat here.
    """
    if x != x:
        return "NaN"
    if x == math.inf:
        return "Infinity"
    if x == -math.inf:
        return "-Infinity"
    neg = math.copysign(1.0, x) < 0
    ax = -x if neg else x
    sign = "-" if neg else ""
    if ax == 0.0:
        return sign + "0.0"
    # shortest round-trip digits + decimal exponent from repr
    r = repr(ax)
    if "e" in r or "E" in r:
        mant, exp = r.lower().split("e")
        exp = int(exp)
    else:
        mant, exp = r, 0
    digits = mant.replace(".", "").lstrip("0")
    point = mant.index(".") if "." in mant else len(mant)
    lead_zeros = len(mant[:point].lstrip("0")) - len(mant[:point])  # negative count
    # decimal exponent: position of first significant digit relative to point
    stripped = mant.lstrip("0").lstrip(".")
    first_sig_pos = next(i for i, c in enumerate(mant) if c not in "0.")
    dec_exp = (point - first_sig_pos - 1) if first_sig_pos < point else (point - first_sig_pos) + exp
    if first_sig_pos < point:
        dec_exp = point - first_sig_pos - 1 + exp
    digits = digits.rstrip("0") or "0"
    if 1e-3 <= ax < 1e7:
        # plain decimal
        if dec_exp >= 0:
            int_part = digits[: dec_exp + 1].ljust(dec_exp + 1, "0")
            frac_part = digits[dec_exp + 1 :] or "0"
        else:
            int_part = "0"
            frac_part = "0" * (-dec_exp - 1) + digits
        return f"{sign}{int_part}.{frac_part}"
    frac = digits[1:] or "0"
    return f"{sign}{digits[0]}.{frac}E{dec_exp}"
