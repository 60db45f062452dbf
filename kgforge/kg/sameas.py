"""owl:sameAs smushing — rewrite a triple table onto canonical entity ids.

The north-rule pipeline canonicalizes SURFACE FORMS before minting
entities (``kgforge/kg/lsh.py`` + ``kg/pipeline.py``); this operator is
the complementary graph-level step a Jena user performs when two already-
minted resources turn out to co-refer: assert ``owl:sameAs`` and let the
reasoner treat the cluster as one individual.  At engine scale that must
be a one-shot rewrite, not per-query reasoning, so ``smush_sameas``:

1. takes the (usually tiny relative to the graph) ``owl:sameAs`` edge
   slice and runs connected components over it — sameAs is symmetric and
   transitive, so a cluster is exactly a component
   (``kgforge/kg/components.py``, min-id labels → deterministic
   representatives);
2. rewrites every subject and every IRI object of the remaining triples
   through the cluster→representative map with two left joins (the map is
   broadcast when small — its size is the number of ALIASED entities, not
   the graph);
3. drops the now-internal sameAs statements and emits
   ``rep owl:sameAs member`` provenance triples (member ≠ rep) so the
   merge stays invertible, then dedups — co-referring descriptions
   collapsing onto one id is the point.

Literals and predicates are never rewritten (predicate co-reference is
``subPropertyOf`` territory — ``kgforge/kg/inference.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge.kg.components import connected_components

OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"

_BROADCAST_MAP_LIMIT = 2_000_000


def smush_sameas(
    triples: DataFrame,
    sameas_pred: str = OWL_SAMEAS,
    keep_provenance: bool = True,
    max_iter: int = 25,
) -> DataFrame:
    """Collapse owl:sameAs clusters onto their min-IRI representative and
    rewrite the whole triple table through the mapping.  Returns the
    canonical 5-column triple table, deduplicated."""
    cols = ["subj", "pred", "obj_value", "obj_dtype", "obj_is_iri"]
    is_sameas = (F.col("pred") == sameas_pred) & F.col("obj_is_iri")
    edges = triples.filter(is_sameas).select(
        F.col("subj").alias("a"), F.col("obj_value").alias("b")
    )
    labels = connected_components(edges, max_iter=max_iter)
    # only true aliases need rewriting; representatives map to themselves
    mapping = labels.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("_alias"), F.col("comp").alias("_rep")
    )
    n_alias = mapping.count()
    m = F.broadcast(mapping) if n_alias <= _BROADCAST_MAP_LIMIT else mapping

    rest = triples.filter(~is_sameas).select(*cols)
    rewritten = (
        rest.join(m, rest["subj"] == m["_alias"], "left")
        .select(
            F.coalesce("_rep", "subj").alias("subj"),
            "pred", "obj_value", "obj_dtype", "obj_is_iri",
        )
        .join(m, (F.col("obj_value") == m["_alias"]) & F.col("obj_is_iri"), "left")
        .select(
            "subj", "pred",
            F.coalesce("_rep", "obj_value").alias("obj_value"),
            "obj_dtype", "obj_is_iri",
        )
    )
    if keep_provenance:
        prov = mapping.select(
            F.col("_rep").alias("subj"),
            F.lit(sameas_pred).alias("pred"),
            F.col("_alias").alias("obj_value"),
            F.lit("iri").alias("obj_dtype"),
            F.lit(True).alias("obj_is_iri"),
        )
        rewritten = rewritten.unionByName(prov)
    return rewritten.distinct()
