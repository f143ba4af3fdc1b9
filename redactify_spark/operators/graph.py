"""Graph materialization: canonicalized node + edge tables.

nodes(canon_id, type, surface_forms, n_mentions, n_docs)
edges(src, pred, dst, weight)   weight = #distinct supporting docs

Head-entity skew (the same org/email mentioned on a large fraction of
pages) is defused with a salted two-phase aggregation: partial counts
per (key, salt) fold the hot key's rows in parallel before the final
(narrow) merge -- the classic partial/final combine expressed in the
DataFrame API, with AQE skew-join as the backstop on the join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SALT = 16


def build_nodes(mentions: DataFrame, canon: DataFrame,
                id_col: str = "doc_id") -> DataFrame:
    m = mentions.join(canon, "pseudo_key")
    # two-phase agg: salt on the doc ref so one hot canon_id spreads over
    # N_SALT reducers in the partial phase
    partial = (m.withColumn("_salt", F.pmod(F.xxhash64(F.col(id_col)),
                                            F.lit(N_SALT)))
               .groupBy("canon_id", "entity_group", "_salt")
               .agg(F.collect_set("surface").alias("sf"),
                    F.count("*").alias("n"),
                    F.collect_set(F.col(id_col).cast("string")).alias("docs")))
    return (partial.groupBy("canon_id", F.col("entity_group").alias("type"))
            .agg(F.array_distinct(F.flatten(F.collect_list("sf")))
                 .alias("surface_forms"),
                 F.sum("n").alias("n_mentions"),
                 F.size(F.array_distinct(F.flatten(F.collect_list("docs"))))
                 .alias("n_docs")))


def build_edges(mentions: DataFrame, canon: DataFrame,
                id_col: str = "doc_id") -> DataFrame:
    """Canonicalized co-mention edges: (canon entity) -[has_contact]->
    (canon contact) weighted by distinct supporting documents."""
    from redactify_spark.operators.triples import contact_triples
    ct = contact_triples(mentions, id_col)
    canon_src = canon.withColumnRenamed("pseudo_key", "subj") \
                     .withColumnRenamed("canon_id", "src")
    canon_dst = canon.withColumnRenamed("pseudo_key", "obj") \
                     .withColumnRenamed("canon_id", "dst")
    # head-entity skew: countDistinct(prov_doc) grouped by (src,pred,dst)
    # would funnel a head entity's 10^11 provenance rows into one reducer.
    # Instead: distinct over the WIDER uniform key (the doc ref spreads
    # the shuffle evenly), then a count whose partial aggregation is
    # map-side combinable -- the hot key's final reducer only merges
    # per-partition counts.
    return (ct.join(canon_src, "subj").join(canon_dst, "obj")
            .select("src", "pred", "dst", "prov_doc").distinct()
            .groupBy("src", "pred", "dst")
            .agg(F.count("*").alias("weight")))


def materialize_graph(mentions: DataFrame, id_col: str = "doc_id",
                      link_threshold: float = 0.6):
    """Full downstream pipeline: linking -> components -> nodes/edges.

    Returns (nodes_df, edges_df, canon_df)."""
    from redactify_spark.operators.components import canonical_map
    from redactify_spark.operators.linking import match_edges
    # mentions feeds linking, canonical_map, nodes AND edges: persist so
    # the upstream detection UDTF is evaluated exactly once
    mentions = mentions.persist()
    medges = match_edges(mentions, threshold=link_threshold)
    canon = canonical_map(mentions, medges).localCheckpoint()
    return (build_nodes(mentions, canon, id_col),
            build_edges(mentions, canon, id_col),
            canon)
