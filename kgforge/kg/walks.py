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


def _py_biased_walks(pairs, n_walks, length, seed, w_return, w_common, w_far):
    """Plain-python mirror of the biased (second-order) recurrence."""
    nbrs: dict = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    adj = {v: sorted(s) for v, s in nbrs.items()}
    out = []
    for start in adj:
        for w in range(n_walks):
            prev, cur = None, start
            out.append((start, w, 0, cur))
            for s in range(1, length + 1):
                h = (
                    _py_code(str(cur)) * 1000003 + w * 7777 + s * 131 + seed
                ) % _P
                if prev is None:
                    cur, prev = adj[cur][h % len(adj[cur])], cur
                else:
                    ws = [
                        w_return if x == prev
                        else w_common if x in nbrs[prev]
                        else w_far
                        for x in adj[cur]
                    ]
                    r = h % sum(ws)
                    acc = 0
                    for x, wt in zip(adj[cur], ws):
                        acc += wt
                        if r < acc:
                            cur, prev = x, cur
                            break
                out.append((start, w, s, cur))
    return sorted(out)


def biased_random_walks(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_walks: int = 2,
    length: int = 3,
    seed: int = 7,
    w_return: int = 1,
    w_common: int = 1,
    w_far: int = 1,
) -> DataFrame:
    """node2vec-style SECOND-ORDER walks (Grover & Leskovec 2016) with the
    1/p, 1, 1/q transition bias expressed as INTEGER class weights —
    ``w_return`` for stepping back to the previous node, ``w_common`` for a
    neighbor shared with it, ``w_far`` otherwise — so the weighted pick is
    exact modular arithmetic (``H mod Σw`` into the cumulative-weight
    ladder), never a float draw: the corpus is a pure function of (graph,
    params, seed), mirrorable in SQL.  (1, 1, 1) degenerates to the
    uniform first-order walk.

    Scale shape per step: the frontier joins the adjacency on the current
    node — this EXPANDS by deg(cur), the irreducible cost of second-order
    walks (the neighbor-class test needs cur's whole neighbor list; alias
    tables trade the same work for per-edge memory) — then one broadcast-
    size window per state (bounded by max degree) picks the successor.
    The common-neighbor class is one canonical-pair left join against the
    edge set.  Step 0→1 has no previous node and uses the uniform pick."""
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
                .select(
                    F.col("node").alias("start"), "walk",
                    F.col("node").alias("cur"),
                    F.col("node").alias("prev"),  # placeholder, unused at s=1
                )
                .localCheckpoint(eager=True)
            )
            frames = [
                state.select(
                    "start", "walk", F.lit(0).cast("long").alias("step"),
                    F.col("cur").alias("node"),
                )
            ]

            def step_hash(s):
                return (
                    poly_hash(F.col("cur").cast("string")) * F.lit(1000003)
                    + F.col("walk") * F.lit(7777)
                    + F.lit(s * 131 + seed)
                ) % F.lit(_P)

            # step 1: uniform (no previous node) — rank equi-join, no explode
            h = step_hash(1)
            state = (
                state.join(deg.withColumnRenamed("node", "cur"), "cur")
                .withColumn("_pick", h % F.col("deg"))
                .join(
                    adjn.select(
                        F.col("node").alias("cur"),
                        F.col("rn").alias("_pick"), "nbr",
                    ),
                    ["cur", "_pick"],
                )
                .select(
                    "start", "walk", F.col("cur").alias("prev"),
                    F.col("nbr").alias("cur"),
                )
                .localCheckpoint(eager=True)
            )
            frames.append(state.select(
                "start", "walk", F.lit(1).cast("long").alias("step"),
                F.col("cur").alias("node"),
            ))
            canon = und.select(
                F.col("a").alias("_ca"), F.col("b").alias("_cb"),
                F.lit(True).alias("_common"),
            )
            for s in range(2, length + 1):
                cand = state.join(
                    adjn.withColumnRenamed("node", "cur"), "cur"
                )
                cand = cand.join(
                    canon,
                    (F.least("prev", "nbr") == F.col("_ca"))
                    & (F.greatest("prev", "nbr") == F.col("_cb")),
                    "left",
                ).withColumn(
                    "_w",
                    F.when(F.col("nbr") == F.col("prev"), F.lit(w_return))
                    .when(F.coalesce("_common", F.lit(False)), F.lit(w_common))
                    .otherwise(F.lit(w_far))
                    .cast("long"),
                )
                key = ["start", "walk", "prev", "cur"]
                wtot = Window.partitionBy(*key)
                wcum = (
                    Window.partitionBy(*key)
                    .orderBy("rn")
                    .rowsBetween(Window.unboundedPreceding, Window.currentRow)
                )
                h = step_hash(s)
                state = (
                    cand.withColumn("_tot", F.sum("_w").over(wtot))
                    .withColumn("_cum", F.sum("_w").over(wcum))
                    .withColumn("_r", h % F.col("_tot"))
                    .filter(
                        (F.col("_r") >= F.col("_cum") - F.col("_w"))
                        & (F.col("_r") < F.col("_cum"))
                    )
                    .select(
                        "start", "walk", F.col("cur").alias("prev"),
                        F.col("nbr").alias("cur"),
                    )
                    .localCheckpoint(eager=True)
                )
                frames.append(state.select(
                    "start", "walk", F.lit(s).cast("long").alias("step"),
                    F.col("cur").alias("node"),
                ))
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
