"""Maximal independent set via deterministic Luby rounds.

Luby's classic distributed MIS (1986) — the primitive behind conflict-free
parallel scheduling over a graph (e.g. which entity clusters can be
rewritten simultaneously).  Each round every ACTIVE node draws a priority;
a node enters the MIS when its priority beats every active neighbor's
(vacuously true once all its neighbors are deactivated), then it and its
neighbors deactivate.  Expected O(log n) rounds.

Randomness is replaced by a round-salted portable hash (the same
determinism move as ``kgforge/kg/walks.py``): priority of node v in round
r is ``poly_hash(str(v) || ':' || r)``, ties broken by node id — so the
result is a pure function of the edge set, identical across engines and
partitionings, and an unrolled SQL mirror computes it exactly.

Scale shape per round: one groupBy(node) min-aggregate over active edges
(map-side combinable — hubs do not pin a reducer) + anti-joins that
deactivate the closed neighborhood, lineage truncated per round with an
eager ``localCheckpoint``.  Only driver traffic: the one-scalar
active-count convergence check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.datapipe.dedup import poly_hash
from kgforge.kg.triangles import _canonical


def _py_prio(v, r: int) -> int:
    acc = 0
    for ch in f"{v}:{r}":
        acc = (acc * 31 + ord(ch)) % 2147483647
    return acc


def _py_mis(pairs) -> dict:
    """Plain-python mirror: node → round it joined the MIS."""
    nbrs: dict = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    active = set(nbrs)
    out: dict = {}
    r = 1
    while active:
        joined = set()
        for v in active:
            pv = (_py_prio(v, r), str(v))
            if all(
                pv < (_py_prio(u, r), str(u))
                for u in nbrs[v]
                if u in active
            ):
                joined.add(v)
        for v in joined:
            out[v] = r
        active -= joined
        active -= {u for v in joined for u in nbrs[v]}
        r += 1
    return out


def maximal_independent_set(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 64,
) -> DataFrame:
    """edges (src, dst) → (node, round): a maximal independent set of the
    undirected graph with the Luby round each member joined in.
    Deterministic (round-salted hash priorities, id tie-break)."""
    und = _canonical(edges, src, dst)
    active_edges = und.localCheckpoint(eager=True)
    active_nodes = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    dt = dict(edges.dtypes)[src]
    mis = spark.createDataFrame([], schema=f"node {dt}, round int")
    for r in range(1, max_rounds + 1):
        if not active_nodes.limit(1).count():
            return mis
        prio = lambda c: poly_hash(  # noqa: E731 — round-salted priority
            F.concat(c.cast("string"), F.lit(f":{r}"))
        )
        adj = active_edges.select(
            F.col("a").alias("node"), F.col("b").alias("nbr")
        ).unionByName(
            active_edges.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
        )
        nbr_min = (
            adj.select(
                "node",
                F.struct(
                    prio(F.col("nbr")).alias("p"),
                    F.col("nbr").cast("string").alias("id"),
                ).alias("ns"),
            )
            .groupBy("node")
            .agg(F.min("ns").alias("m"))
        )
        winners = (
            active_nodes.join(nbr_min, "node", "left")
            .withColumn(
                "mine",
                F.struct(
                    prio(F.col("node")).alias("p"),
                    F.col("node").cast("string").alias("id"),
                ),
            )
            .filter(F.col("m").isNull() | (F.col("mine") < F.col("m")))
            .select("node")
            .localCheckpoint(eager=True)
        )
        mis = mis.unionByName(
            winners.withColumn("round", F.lit(r))
        ).localCheckpoint(eager=True)
        closed = winners.unionByName(
            adj.join(winners, "node").select(F.col("nbr").alias("node"))
        ).distinct()
        active_nodes = active_nodes.join(
            closed, "node", "left_anti"
        ).localCheckpoint(eager=True)
        active_edges = (
            active_edges.join(
                closed.select(F.col("node").alias("a")), "a", "left_anti"
            )
            .join(closed.select(F.col("node").alias("b")), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    raise ValueError(f"MIS did not converge in {max_rounds} rounds")
