"""Deterministic random-walk corpus over the entity graph.

The node2vec/DeepWalk preprocessing step: from every node, ``n_walks``
uniform random walks of ``length`` steps over the undirected graph — the
walk corpus that downstream embedding trainers (skip-gram et al.) consume.
Instead of RNG state (non-reproducible across partitionings and engines),
each step is a pure HASH decision: at step ``s`` of walk ``w`` standing on
node ``c``, the next neighbor is

    index = H(code(c), w, s, seed) mod deg(c)

into c's neighbor list sorted by neighbor id, where ``code`` is the
portable polynomial char-fold (``kgforge.datapipe.dedup.poly_hash``) and H
a linear-congruential mix mod 2^31-1.  The walk corpus is therefore a pure
function of (edge set, n_walks, length, seed) — identical across runs,
partitionings, and engines, and exactly mirrorable in SQL.

Scale shape per step: the frontier joins the degree table (O(nodes)) to
compute its pick, then ONE equi-join on (node, rank) against the
rank-numbered adjacency — never an explode of a node's neighbor list, so a
celebrity node with 10^6 neighbors costs one lookup per visiting walk, not
10^6 candidate rows.  The per-node neighbor numbering window partitions by
node (bounded by max degree, never global).  Each frontier is eagerly
``localCheckpoint``-ed: plans stay flat and step s is computed once even
though it feeds both step s+1 and the output union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgforge.datapipe.dedup import poly_hash
from kgforge.kg.triangles import _canonical

_P = 2147483647  # 2^31 - 1: every mix term stays far below 2^63 (ANSI-safe)


def _py_code(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % _P
    return acc


def _py_walks(pairs, n_walks: int, length: int, seed: int) -> list[tuple]:
    """Plain-python mirror of the distributed recurrence (exact)."""
    nbrs: dict = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    adj = {v: sorted(s) for v, s in nbrs.items()}
    out = []
    for start in adj:
        for w in range(n_walks):
            cur = start
            out.append((start, w, 0, cur))
            for s in range(1, length + 1):
                h = (
                    _py_code(str(cur)) * 1000003 + w * 7777 + s * 131 + seed
                ) % _P
                cur = adj[cur][h % len(adj[cur])]
                out.append((start, w, s, cur))
    return sorted(out)


def random_walks(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_walks: int = 2,
    length: int = 3,
    seed: int = 7,
) -> DataFrame:
    """edges (src, dst) → (start, walk, step, node): ``n_walks`` hash-driven
    uniform walks of ``length`` steps from every node; step 0 is the start
    itself.  Deterministic — see module docstring."""
    und = _canonical(edges, src, dst).persist()
    adj = (
        und.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .unionByName(und.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .persist()
    )
    try:
        wn = Window.partitionBy("node").orderBy("nbr")
        adjn = adj.withColumn(
            "rn", F.row_number().over(wn).cast("long") - 1
        ).persist()
        deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg")).persist()
        try:
            state = (
                deg.select("node")
                .withColumn(
                    "walk", F.explode(F.sequence(F.lit(0), F.lit(n_walks - 1)))
                )
                .withColumn("walk", F.col("walk").cast("long"))
                .select(F.col("node").alias("start"), "walk",
                        F.col("node").alias("cur"))
                .localCheckpoint(eager=True)
            )
            frames = [
                state.select(
                    "start", "walk", F.lit(0).cast("long").alias("step"),
                    F.col("cur").alias("node"),
                )
            ]
            for s in range(1, length + 1):
                h = (
                    poly_hash(F.col("cur").cast("string")) * F.lit(1000003)
                    + F.col("walk") * F.lit(7777)
                    + F.lit(s * 131 + seed)
                ) % F.lit(_P)
                state = (
                    state.join(deg.withColumnRenamed("node", "cur"), "cur")
                    .withColumn("_pick", h % F.col("deg"))
                    .join(
                        adjn.select(
                            F.col("node").alias("cur"),
                            F.col("rn").alias("_pick"),
                            "nbr",
                        ),
                        ["cur", "_pick"],
                    )
                    .select("start", "walk", F.col("nbr").alias("cur"))
                    .localCheckpoint(eager=True)
                )
                frames.append(
                    state.select(
                        "start", "walk", F.lit(s).cast("long").alias("step"),
                        F.col("cur").alias("node"),
                    )
                )
            out = frames[0]
            for f in frames[1:]:
                out = out.unionByName(f)
            return out
        finally:
            adjn.unpersist()
            deg.unpersist()
    finally:
        und.unpersist()
        adj.unpersist()
