"""Incremental KG maintenance: append crawl tranches without
re-detecting old pages.

Model: mentions are APPEND-ONLY per tranche (detection is per-document,
so a page's mentions never change once computed); every graph stage
downstream is recomputed from the accumulated mentions.  That split is
deliberate for 10^12-document scale:

- detection (the dominant cost, ~ms/doc of regex+model work) runs ONLY
  on the new tranche;
- triple extraction appends per tranche too (triples are per-document
  projections plus a within-document join);
- linking/canonicalization/nodes/edges recompute over the UNION, but
  their input is the accumulated mention set, and linking dedups to
  DISTINCT pseudo_keys first -- the entity vocabulary grows sublinearly
  in pages, so recanonicalization cost is bounded by distinct entities,
  not crawl size.  (True incremental connected components would need
  component-merge bookkeeping; recompute-from-edges is the simpler
  plan whose cost is O(entities), which is the right trade at
  entities << pages.)

Equivalence guarantee (pytest-gated): appending tranches T1 then T2
yields byte-identical nodes/edges/triples to one-shot processing of
T1 union T2 -- all hashing is content-derived, so the graph cannot
depend on arrival order.

Layout under `root` (all run_stage-managed, manifests + lineage):
    tranches/<tranche_id>/mentions/      per-tranche detection output
    tranches/<tranche_id>/triples/
    graph/03_match_edges ... graph/06_edges   recomputed per refresh
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from redactify_spark.plans.checkpoint import run_stage


def _union_stage_tables(spark: SparkSession, root: str,
                        sub: str) -> DataFrame:
    """Union all tranches' `sub` tables (parquet dirs under tranches/)."""
    base = os.path.join(root, "tranches")
    dirs = sorted(
        os.path.join(base, t, sub, "data")
        for t in os.listdir(base)
        if os.path.isdir(os.path.join(base, t, sub, "data")))
    return spark.read.parquet(*dirs)


def append_tranche(spark: SparkSession, root: str, tranche_id: str,
                   pages: DataFrame, id_col: str = "url") -> DataFrame:
    """Detect + extract triples for ONE new tranche (old tranches are
    untouched: their stage manifests short-circuit).  Returns the
    tranche's mentions table."""
    from redactify_spark.operators.detection import detect_mentions
    from redactify_spark.operators.triples import all_triples

    troot = os.path.join(root, "tranches", tranche_id)
    mentions = run_stage(spark, troot, "mentions",
                         lambda: detect_mentions(pages, id_col=id_col,
                                                 text_col="text"))
    run_stage(spark, troot, "triples",
              lambda: all_triples(mentions, id_col=id_col))
    return mentions


def refresh_graph(spark: SparkSession, root: str,
                  id_col: str = "url") -> dict[str, DataFrame]:
    """Recompute linking -> canonical map -> nodes/edges over ALL
    accumulated tranches' mentions.  Invalidate-and-rebuild semantics:
    the graph stages' checkpoints are replaced each refresh (they are
    functions of the accumulated mentions, cheap relative to
    detection)."""
    from redactify_spark.operators.components import canonical_map
    from redactify_spark.operators.graph import build_edges, build_nodes
    from redactify_spark.operators.linking import match_edges
    from redactify_spark.plans.checkpoint import invalidate

    mentions = _union_stage_tables(spark, root, "mentions")
    groot = os.path.join(root, "graph")
    for stage in ("03_match_edges", "04_canonical", "05_nodes", "06_edges"):
        invalidate(groot, stage)
    medges = run_stage(spark, groot, "03_match_edges",
                       lambda: match_edges(mentions))
    canon = run_stage(spark, groot, "04_canonical",
                      lambda: canonical_map(mentions, medges))
    nodes = run_stage(spark, groot, "05_nodes",
                      lambda: build_nodes(mentions, canon, id_col=id_col))
    edges = run_stage(spark, groot, "06_edges",
                      lambda: build_edges(mentions, canon, id_col=id_col))
    triples = _union_stage_tables(spark, root, "triples")
    return {"mentions": mentions, "triples": triples,
            "match_edges": medges, "canonical": canon,
            "nodes": nodes, "edges": edges}
