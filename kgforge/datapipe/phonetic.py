"""Portable American Soundex for phonetic blocking.

Phonetic keys group "Robert"/"Rupert" or "Ashcraft"/"Ashcroft" into one
blocking bucket — the third classic blocking strategy next to sorted
neighborhoods and LSH, and the one census-style record linkage has used
since the 1930s.  Spark ships ``F.soundex``, but that JVM implementation
cannot be mirrored in the DuckDB oracle; this implementation builds the
SAME algorithm from portable primitives (``translate`` + a left fold
over the character list with a string-encoded state), so the key is a
pure function of the data in both engines.

Rules implemented (full standard, including the H/W subtlety): first
letter kept; consonants map to digit classes (B F P V → 1, C G J K Q S
X Z → 2, D T → 3, L → 4, M N → 5, R → 6); adjacent same codes collapse,
and codes separated only by H or W ALSO collapse (H/W are transparent),
while vowels break adjacency; pad/truncate to letter + 3 digits.

Everything is one codegen expression per row — no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# A..Z -> digit class; 0 = vowel-ish (breaks adjacency, emits nothing),
# 7 = H/W sentinel (transparent: neither emits nor breaks adjacency)
_CODES = {
    **{c: "1" for c in "BFPV"},
    **{c: "2" for c in "CGJKQSXZ"},
    **{c: "3" for c in "DT"},
    "L": "4",
    **{c: "5" for c in "MN"},
    "R": "6",
    **{c: "0" for c in "AEIOUY"},
    **{c: "7" for c in "HW"},
}
_ALPHA = "".join(sorted(_CODES))
_DIGITS = "".join(_CODES[c] for c in sorted(_CODES))


def soundex_key(col) -> "F.Column":
    """American Soundex of ``col`` as a column expression (null for
    strings with no A-Z letters)."""
    clean = F.regexp_replace(F.upper(col), "[^A-Z]", "")
    chars = F.split(clean, "")
    first = F.substring(clean, 1, 1)
    first_code = F.translate(first, _ALPHA, _DIGITS)
    # state string: position 1 = previous significant code, rest =
    # collected digits; H/W first letters seed prev '0'
    init = F.when(first_code == "7", F.lit("0")).otherwise(first_code)

    def step(acc, ch):
        code = F.translate(ch, _ALPHA, _DIGITS)
        prev = F.substring(acc, 1, 1)
        digits = F.substring(acc, 2, 3)
        return (
            F.when((ch == "") | (code == "7"), acc)
            .when(code == "0", F.concat(F.lit("0"), digits))
            .when(code == prev, acc)
            .otherwise(F.concat(code, digits, code))
        )

    folded = F.aggregate(
        F.slice(chars, 2, F.greatest(F.size(chars) - 1, F.lit(0))),
        init,
        step,
    )
    key = F.concat(
        first, F.rpad(F.substring(folded, 2, 3), 3, "0")
    )
    return F.when(F.length(clean) > 0, key)
