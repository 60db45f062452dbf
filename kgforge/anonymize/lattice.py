"""Full-domain generalization: Samarati/Incognito lattice search.

The reference generalizes one attribute at a time with data-derived
buckets (`ops.py:generalize`); the OTHER classic k-anonymity route —
Samarati 2001, LeFevre's Incognito 2005 — picks one generalization
LEVEL per quasi-identifier from a fixed hierarchy (exact → coarse →
suppressed) such that every equivalence class reaches size k, preferring
the least total generalization.  This module implements that search over
caller-supplied level expressions.

Determinism contract: candidates are probed in (level-sum, level-vector
lexicographic) order and the FIRST satisfying vector wins — a pure
function of the data and the hierarchy, mirrored exactly by the SQL
oracle (which scores every candidate and picks the same winner).

Scale shape: each probe is ONE map-side-combinable groupBy over the QI
expressions followed by a scalar min — no joins, no windows over the
data.  The lattice is tiny (product of hierarchy depths); the classic
optimization — Samarati's binary search on the level SUM, valid because
k-anonymity is monotone along the lattice — cuts probes to
O(log Σdepth · width) and drops in here unchanged if a hierarchy ever
gets deep.  Probing candidates serially is a DRIVER loop by design: each
candidate's verdict gates the next, and each probe is a full cluster job.
"""

from __future__ import annotations

from itertools import product
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lattice_order(depths: Sequence[int]) -> list[tuple[int, ...]]:
    """All level vectors, sorted by (sum, lexicographic) — the probe order."""
    vecs = list(product(*[range(d) for d in depths]))
    return sorted(vecs, key=lambda v: (sum(v), v))


def full_domain_generalize(
    df: DataFrame,
    hierarchies: Mapping[str, Sequence[Column]],
    k: int,
) -> tuple[dict[str, int], DataFrame]:
    """Find the minimal full-domain generalization of ``df`` under
    ``hierarchies`` (column name → list of level expressions, level 0 =
    finest) whose every QI group has ≥ k rows.

    Returns ``(levels, groups)``: the chosen level per column and the
    generalized group table (one ``<col>_g`` string column per QI plus
    ``n``).  Raises if even the coarsest vector fails."""
    names = list(hierarchies)
    depths = [len(hierarchies[c]) for c in names]
    for vec in lattice_order(depths):
        exprs = [
            hierarchies[c][lvl].cast("string").alias(f"{c}_g")
            for c, lvl in zip(names, vec)
        ]
        groups = df.select(*exprs).groupBy(
            *[f"{c}_g" for c in names]
        ).agg(F.count(F.lit(1)).alias("n"))
        min_n = groups.agg(F.min("n").alias("m")).collect()[0]["m"]
        if min_n is not None and min_n >= k:
            return dict(zip(names, vec)), groups
    raise ValueError(
        f"no full-domain generalization reaches k={k}; "
        "coarsest level still has a small group"
    )
