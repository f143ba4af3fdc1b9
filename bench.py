"""Benchmark harness: headline KG pipeline + representative queries.

Prints ONE JSON line:
  {"metric": "kg_pipeline_sec", "value": N, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "triples_per_sec": ...,
   "docs_per_sec": ..., "conf": {...}}

Env:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  BENCH_DOC_MULT       pages per document row (default 8; detection is the
                       dominant cost, so volume scales the headline metric;
                       200 at sf0.1 = the 10^6-page scaling runs)
  BENCH_TRIALS         kg-job trials, best-of (default 3)
  BENCH_DAG_TRIALS     full-DAG trials, best-of (default 2; 1 for 10^6 runs)
  BENCH_QUERY_TRIALS   per-query runs; run 1 is the cold warm-up, 'queries'
                       reports best-of-warm, 'query_spread' the full spread
  BENCH_CORPUS_DAG / BENCH_ANALYTICS_DAG   set 0 to skip those DAGs
                       (analytics reads the fixed events table -- it does
                       not scale with BENCH_DOC_MULT)

Scaling evidence (BASELINE.md: throughput efficiency >= 0.8 from N to 4N):
  python bench.py --scaling      runs the SAME detection+triples job at
  local[8] then local[32] on identical input and reports throughput at
  both plus efficiency = tput32 / (4 * tput8).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DOC_MULT = int(os.environ.get("BENCH_DOC_MULT", "8"))
RESULT_PATH = os.environ.get(
    "BENCH_RESULT_PATH",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "bench_result.json"))


def emit(obj, mode: str = "") -> None:
    """Single result sink: write the machine-readable artifact first,
    then print the COMPACT JSON as the very last stdout line (console
    progress is disabled session-wide, so no \\r noise precedes it).
    Both halves exist because the driver's tail capture truncated the
    r4 spread-enriched line (BENCH_r04.json parsed:null).  Non-default
    modes (--scaling, --ann, ...) write a mode-suffixed artifact so a
    scaling run never clobbers the headline bench_result.json;
    BENCH_RESULT_PATH overrides the path outright."""
    line = json.dumps(obj, separators=(",", ":"))
    path = RESULT_PATH
    if mode and "BENCH_RESULT_PATH" not in os.environ:
        root, ext = os.path.splitext(path)
        path = f"{root}_{mode}{ext}"
    try:
        with open(path, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass
    sys.stdout.flush()
    print(line, flush=True)


def _mix64(a):
    """splitmix64 finalizer, vectorized over a numpy int array ->
    uniform floats in [-0.5, 0.5).  Full-avalanche so the noise of
    adjacent ids is uncorrelated (a linear hash makes same-cluster
    vectors differ by a near-constant offset, flooding the corpus with
    accidental near-dups).  Single definition shared by the distributed
    generator and the driver-side query replica -- they MUST stay in
    sync or recall measurements compare against nonexistent vectors."""
    import numpy as np
    x = a.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = x * np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(30)
        x = x * np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x = x * np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x / float(1 << 64) - 0.5


# Zipf-head skew injection (--skew mode): one head entity (the shared
# press contact) appears on 30% of pages, so every groupBy/join keyed by
# surface, canonical entity, or co-mention pair sees a single hot key.
# Uniform-corpus benches leave this off.
_HEAD_SENTENCE = (" Google announced the update from Mountain View and "
                  "press@google.com confirmed the statement.")


def _skewed(pid: int, text: str, skew: bool) -> str:
    return text + _HEAD_SENTENCE if skew and pid % 10 < 3 else text


def _pages(spark, sf_dir: str, mult: int, skew: bool = False):
    """Deterministic page corpus: every documents row expanded to `mult`
    synthetic pages (doc text as filler, PII injected per synthetic id)."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from redactify_spark.sources.pages import synth_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the source parquet is one small file -> one input partition; spread
    # the expensive detection stage across all cores explicitly
    par = spark.sparkContext.defaultParallelism * 2
    exp = docs.select(
        "doc_id", "text",
        F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep")) \
        .repartition(par)
    schema = T.StructType([T.StructField("page_id", T.LongType()),
                           T.StructField("text", T.StringType())])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = (pdf["doc_id"].astype("int64") * mult
                   + pdf["rep"].astype("int64"))
            yield pd.DataFrame({
                "page_id": ids,
                "text": [_skewed(int(i), synth_text(int(i), filler=t or ""),
                                 skew)
                         for i, t in zip(ids, pdf["text"])],
            })

    return exp.mapInPandas(gen, schema=schema)


def _synth_and_detect(spark, sf_dir: str, mult: int):
    """Fused page-synthesis + detection in ONE mapInPandas stage: a single
    python worker pass per partition (no Arrow round-trip between synth
    and detect)."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    par = spark.sparkContext.defaultParallelism * 2
    exp = docs.select(
        "doc_id", "text",
        F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep")) \
        .repartition(par)
    schema = T.StructType([
        T.StructField("page_id", T.LongType()),
        T.StructField("entity_group", T.StringType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("detector", T.StringType()),
        T.StructField("surface", T.StringType()),
        T.StructField("pseudo_key", T.StringType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from redactify_spark.detect import kernel
        from redactify_spark.operators.detection import _pseudo_key
        from redactify_spark.sources.pages import synth_text

        for pdf in batches:
            rec = {f.name: [] for f in schema.fields}
            ids = (pdf["doc_id"].astype("int64") * mult
                   + pdf["rep"].astype("int64"))
            for pid, filler in zip(ids, pdf["text"]):
                text = synth_text(int(pid), filler=filler or "")
                for m in kernel.detect_document(text):
                    surface = m.get("entity_text", "")
                    etype = m["entity_group"]
                    rec["page_id"].append(int(pid))
                    rec["entity_group"].append(etype)
                    rec["start"].append(m["start"])
                    rec["end"].append(m["end"])
                    rec["score"].append(float(m["score"]))
                    rec["detector"].append(m.get("detector", "unknown"))
                    rec["surface"].append(surface)
                    rec["pseudo_key"].append(_pseudo_key(surface, etype))
            yield pd.DataFrame(rec)

    return exp.mapInPandas(gen, schema=schema)


def run_kg_job(spark, sf_dir: str, mult: int, out_dir: str) -> dict:
    """The headline job: pages -> detection -> triples -> parquet write."""
    from redactify_spark.operators.triples import all_triples

    pages = _pages(spark, sf_dir, mult)
    n_docs = pages.count()  # materialization cost counted separately
    t0 = time.time()
    mentions = _synth_and_detect(spark, sf_dir, mult)
    # triples union has two consumers of mentions: persist so the
    # detection UDTF runs exactly once
    mentions = mentions.persist()
    mentions.count()
    triples = all_triples(mentions, id_col="page_id")
    triples.write.mode("overwrite").parquet(out_dir)
    elapsed = time.time() - t0
    mentions.unpersist()
    n_triples = spark.read.parquet(out_dir).count()
    return {"sec": elapsed, "n_docs": n_docs, "n_triples": n_triples,
            "docs_per_sec": round(n_docs / elapsed, 1),
            "triples_per_sec": round(n_triples / elapsed, 1)}


def run_full_dag(spark, sf_dir: str, mult: int, root: str,
                 skew: bool = False) -> dict:
    """End-to-end CHECKPOINTED KG pipeline: pages -> mentions -> triples
    -> link edges -> canonical map -> nodes/edges, every stage persisted
    through plans/checkpoint.run_stage (the resumable production DAG,
    not just the detect+triples headline)."""
    from redactify_spark.plans import checkpoint as CP

    # pages go through a disk-backed stage (not localCheckpoint): the
    # synthesized corpus must not sit pinned in executor memory skewing
    # every measurement that follows
    pages = CP.run_stage(spark, root, "00_pages",
                         lambda: _pages(spark, sf_dir, mult, skew))
    n_docs = pages.count()
    t0 = time.time()
    CP.kg_pipeline(spark, pages, root, id_col="page_id")
    # row counts come free from the stage manifests (recorded during
    # each stage's write via observe) -- no post-hoc count() jobs
    n_triples = CP.read_manifest(root, "02_triples")["row_count"]
    n_nodes = CP.read_manifest(root, "05_nodes")["row_count"]
    n_edges = CP.read_manifest(root, "06_edges")["row_count"]
    elapsed = time.time() - t0
    stage_walls = {
        s: CP.read_manifest(root, s)["wall_time_sec"]
        for s in ("01_mentions", "02_triples", "03_match_edges",
                  "04_canonical", "04b_canon_mentions", "05_nodes",
                  "06_edges", "07_salience")}
    return {"sec": round(elapsed, 3), "n_docs": n_docs,
            "n_triples": n_triples, "n_nodes": n_nodes, "n_edges": n_edges,
            "docs_per_sec": round(n_docs / elapsed, 1),
            "triples_per_sec": round(n_triples / elapsed, 1),
            "stage_sec": stage_walls}


# vocabulary for the unique-text corpus tail: common English words
# (stopword-dense so the quality gate passes); word ORDER is hashed per
# (doc, position), so replicas share unigrams but almost no 3-shingles
# -- they survive both exact and MinHash dedup by construction.
_SOUP_WORDS = (
    "the of and to in that it with for was on as at by from this be or "
    "an are not but had his her they we you all one their there when "
    "which will would what were been more can who its into than then "
    "some could them these other about out many time has look two how "
    "way see number people over did down only most after where before "
    "between under never always story market station train world summer "
    "friends family during long good best young seen lives happened "
    "everyone building process system record window result worker").split()


def _unique_corpus(spark, sf_dir: str, mult: int):
    """mult UNIQUE-text pseudo-recrawls per document: original text plus
    a per-replica hashed word-soup tail of comparable length.  Survives
    exact dedup (distinct bytes) AND near-dedup (Jaccard vs siblings
    ~1/3 < 0.7), so every later corpus stage carries the full volume --
    the recrawl-copies corpus measures the dedup stages; this one
    measures everything after them."""
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    par = spark.sparkContext.defaultParallelism * 2
    exp = docs.select(
        "doc_id", "lang", "source", "text",
        F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep")) \
        .repartition(par)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType())])
    nw = len(_SOUP_WORDS)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = (pdf["doc_id"].astype("int64") * mult
                   + pdf["rep"].astype("int64"))
            texts = []
            for rid, t in zip(ids, pdf["text"]):
                t = t or ""
                n = max(30, len(t.split()))
                grid = np.int64(rid) * np.int64(131071) + np.arange(n)
                idx = ((_mix64(grid) + 0.5) * nw).astype(np.int64) % nw
                texts.append(t + " " + " ".join(_SOUP_WORDS[i]
                                                for i in idx))
            yield pd.DataFrame({"doc_id": ids, "lang": pdf["lang"],
                                "source": pdf["source"], "text": texts})

    return exp.mapInPandas(gen, schema=schema)


def run_corpus_dag(spark, sf_dir: str, mult: int, root: str,
                   unique: bool = False) -> dict:
    """End-to-end checkpointed TRAINING-CORPUS pipeline (the second
    flagship DAG): exact dedup -> minhash near-dedup -> boilerplate
    removal -> quality gate -> split -> chunking.  Default input is the
    documents table replicated `mult`x with fresh ids (pure recrawl
    copies -- stage 1's job is to delete them, which is exactly what a
    dedup bench should measure); `unique=True` swaps in the
    all-distinct corpus from _unique_corpus so EVERY stage carries the
    volume (the corpus-scaling measurement)."""
    from pyspark.sql import functions as F

    from redactify_spark.plans import checkpoint as CP
    from redactify_spark.plans.corpus import corpus_pipeline

    if unique:
        docs = _unique_corpus(spark, sf_dir, mult)
    else:
        base = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # collision-free replica ids at ANY base size: doc_id*mult + i
        # (the same scheme as _pages), so keep-min-id dedup always
        # prefers copy 0
        copies = [base.select((F.col("doc_id") * mult + i).alias("doc_id"),
                              "lang", "source", "text")
                  for i in range(mult)]
        docs = copies[0]
        for c in copies[1:]:
            docs = docs.unionByName(c)
    docs = CP.run_stage(spark, root, "00_docs", lambda: docs)
    n_in = docs.count()
    t0 = time.time()
    corpus_pipeline(spark, docs, root,
                    gopher_kwargs={"min_words": 20,
                                   "max_dup_word_frac": 0.8},
                    # the all-distinct corpus is the at-scale run: use
                    # the zero-Python LSH engine (production path)
                    near_dup_engine="native" if unique else "python")
    n_chunks = CP.read_manifest(root, "06_chunks")["row_count"]
    n_kept = CP.read_manifest(root, "04_quality")["row_count"]
    elapsed = time.time() - t0
    stage_walls = {
        s: CP.read_manifest(root, s)["wall_time_sec"]
        for s in ("01_exact_dedup", "02_near_dedup", "03_boilerplate",
                  "04_quality", "05_split", "06_chunks")}
    return {"sec": round(elapsed, 3), "n_docs_in": n_in,
            "n_docs_kept": n_kept, "n_chunks": n_chunks,
            "docs_per_sec": round(n_in / elapsed, 1),
            "stage_sec": stage_walls}


def _synth_embeddings(spark, n: int, dim: int = 64, n_clusters: int = 256,
                      partitions: int = 64):
    """Deterministic clustered embedding corpus, generated DISTRIBUTED
    (spark.range -> mapInPandas, fully vectorized numpy per batch; no
    driver-side loop -- same scheme as synth_pages).  Most ids belong to
    a hash-assigned cluster (center + hash-noise, normalized) -- the ANN
    top-k workload.  Ids with id % 200 in {198, 199} form a DIVERSE
    background population (pure hash noise, no cluster), and each 199 is
    a tiny perturbation of its 198 -- planted near-dup pairs on diverse
    vectors, the realistic web-scale blocking case (perturbed copies in
    a heterogeneous corpus).  Tight-cluster near-identical pairs are
    deliberately NOT planted: those land in over-wide LSH buckets that
    the cap drops by design (counted by wide_embedding_bucket_count)."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    rng = spark.range(0, n, 1, partitions)

    mix64 = _mix64

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # cluster centers are tiny (n_clusters x dim): recomputed per
        # worker once, deterministic
        centers = np.vstack([
            np.random.RandomState(c).standard_normal(dim)
            for c in range(n_clusters)])
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            background = (ids % 200 >= 198)
            base = np.where(ids % 200 == 199, ids - 1, ids)
            cl = (base * 2654435761) % 2147483647 % n_clusters
            # deterministic per-(id,dim) uniform noise in [-0.5, 0.5)
            grid = base[:, None] * np.int64(dim) + np.arange(dim)[None, :]
            noise = mix64(grid)
            v = np.where(background[:, None], 0.0, centers[cl]) + noise
            dup = (ids != base)[:, None]
            grid2 = (ids[:, None] + np.int64(7 * n)) * np.int64(dim) \
                + np.arange(dim)[None, :]
            pert = mix64(grid2)
            v = v + np.where(dup, 0.02 * pert, 0.0)
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True),
                               1e-12)
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": [row.astype(np.float32).tolist() for row in v]})

    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType()))])
    return rng.mapInPandas(gen, schema=schema)


def _synth_query_vec(qid: int, dim: int = 64, n_clusters: int = 256):
    """Driver-side replica of _synth_embeddings' formula for one id --
    no table scan needed to obtain a query vector."""
    import numpy as np
    centers = np.vstack([np.random.RandomState(c).standard_normal(dim)
                         for c in range(n_clusters)])
    cl = (qid * 2654435761) % 2147483647 % n_clusters
    grid = np.int64(qid) * np.int64(dim) + np.arange(dim)
    noise = _mix64(grid)
    v = centers[cl] + noise
    return (v / max(float(np.linalg.norm(v)), 1e-12)).tolist()


def run_ann_bench(spark, n: int, dim: int = 64) -> dict:
    """ANN family at scale (VERDICT r2 #5): brute-force exact as ground
    truth, then sign-LSH (stored signature), IVF (stored cell), int8
    quantized, and embedding near-dup pairs -- walls + recall@10.  All
    paths distributed; the only collects are the k result rows and the
    bounded IVF centroid sample."""
    import numpy as np
    from pyspark.sql import functions as F

    from redactify_spark.operators import similarity as S
    from redactify_spark.operators.dedup import embedding_dup_pairs

    out = {"n": n, "dim": dim}
    root = tempfile.mkdtemp(prefix="annbench_")
    try:
        t0 = time.time()
        _synth_embeddings(spark, n, dim).write.mode("overwrite") \
            .parquet(f"{root}/base")
        base = spark.read.parquet(f"{root}/base")
        out["gen_write_sec"] = round(time.time() - t0, 2)

        # index build: stored signature + cell id, sorted by signature so
        # parquet row-group stats prune the probe scan
        n_planes = S.adaptive_planes(n)
        planes = S._hyperplanes(dim, n_planes)
        # data-dependent coarse quantizer: cells must align with the
        # data's cluster structure or probing misses neighbors
        # (fixed_centroids measured 0.5 recall@10 here vs 1.0).  The
        # centroid fit collects a bounded md5-ordered sample (<= 1.3k
        # rows); assignment stays fully distributed.
        cents = S.ivf_centroids(base, 64)
        t0 = time.time()
        (base
         .withColumn("sig", S.signature_expr(F.col("embedding"), planes))
         .withColumn("cell", S.cell_assign_expr(F.col("embedding"), cents))
         .repartitionByRange(64, "sig")
         .sortWithinPartitions("sig")
         .write.mode("overwrite").parquet(f"{root}/indexed"))
        indexed = spark.read.parquet(f"{root}/indexed")
        out["index_build_sec"] = round(time.time() - t0, 2)
        out["n_planes"] = n_planes

        q = _synth_query_vec(7, dim)

        t0 = time.time()
        exact = S.brute_force_topk(base, q, k=10).collect()
        out["brute_sec"] = round(time.time() - t0, 2)
        truth = {r.vec_id for r in exact}

        t0 = time.time()
        lsh = S.lsh_topk(indexed, q, k=10, dim=dim, n_planes=n_planes,
                         sig_col="sig").collect()
        out["lsh_sec"] = round(time.time() - t0, 2)
        out["lsh_recall@10"] = len(truth & {r.vec_id for r in lsh}) / 10

        t0 = time.time()
        ivf = S.ivf_topk(indexed, q, k=10, n_cells=64, n_probe=8,
                         centroids=cents, cell_col="cell").collect()
        out["ivf_sec"] = round(time.time() - t0, 2)
        out["ivf_recall@10"] = len(truth & {r.vec_id for r in ivf}) / 10

        t0 = time.time()
        qt = S.quantize_embeddings(base, persist=True)
        scale = max(abs(x) for x in q) / 127.0
        qq = [int(np.floor(x / scale + 0.5)) for x in q]
        quant = S.quantized_topk(qt, qq, k=10).collect()
        out["quantized_sec"] = round(time.time() - t0, 2)
        out["quantized_recall@10"] = \
            len(truth & {r.vec_id for r in quant}) / 10

        from redactify_spark.operators.dedup import (
            adaptive_emb_planes_per_band, wide_embedding_bucket_count)
        planted = len(range(199, n, 200))
        ppb = adaptive_emb_planes_per_band(n)
        out["dup_planes_per_band"] = ppb
        t0 = time.time()
        pairs = embedding_dup_pairs(base, threshold=0.98, dim=dim,
                                    planes_per_band=ppb)
        pairs = pairs.localCheckpoint(eager=False)
        found = pairs.count()
        # recall must count PLANTED pairs recovered (id_a=198 mod 200,
        # id_b=id_a+1), not everything above threshold -- accidental
        # near-dups would otherwise inflate it past 1.0
        planted_found = pairs.where(
            (F.col("id_b") == F.col("id_a") + 1)
            & (F.col("id_a") % 200 == 198)).count()
        out["dup_pairs_sec"] = round(time.time() - t0, 2)
        out["dup_pairs_found"] = found
        out["dup_pairs_planted"] = planted
        out["dup_pairs_planted_found"] = planted_found
        out["dup_pairs_recall"] = round(planted_found / planted, 4)
        # no silent caps: buckets the width cap dropped (tight-cluster
        # signature floods land here by design)
        out["dup_wide_buckets_dropped"] = \
            wide_embedding_bucket_count(base, dim=dim, planes_per_band=ppb)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def run_analytics_dag(spark, sf_dir: str, root: str) -> dict:
    """Third flagship DAG: checkpointed web-analytics pipeline over the
    events table (sessions -> conversions -> cohorts -> transitions ->
    rolling actives)."""
    from redactify_spark.plans import checkpoint as CP
    from redactify_spark.plans.analytics import analytics_pipeline

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = events.count()
    t0 = time.time()
    analytics_pipeline(spark, events, root)
    elapsed = time.time() - t0
    stages = ("01_sessions", "02_conversions", "03_cohorts",
              "04_transitions", "05_rolling")
    return {"sec": round(elapsed, 3), "n_events": n_events,
            "events_per_sec": round(n_events / elapsed, 1),
            "n_sessions": CP.read_manifest(root, "01_sessions")["row_count"],
            "n_conversions":
                CP.read_manifest(root, "02_conversions")["row_count"],
            "stage_sec": {s: CP.read_manifest(root, s)["wall_time_sec"]
                          for s in stages}}


def run_queries(spark, sf_dir: str) -> tuple[dict, dict]:
    """Per-query picks as WARM best-of-N (VERDICT r3 #1): the old single
    cold run archived 2x 'regressions' that were pure first-run plan
    compilation + page-cache noise on this shared box.  Each pick now
    runs $BENCH_QUERY_TRIALS times (default 3; run 1 is the cold
    warm-up); `queries` carries the best (warm) wall so round-over-round
    diffs are signal, and the second return value records the full
    cold/best/worst spread per pick."""
    import __spark_entry__ as E

    trials = max(2, int(os.environ.get("BENCH_QUERY_TRIALS", "3")))
    qs = E.queries()
    picks = ["q01_lineitem_agg", "q05_broadcast_dim_join", "q11_topk",
             "q15_ngram_jaccard", "q16_token_stats", "q20_time_window_agg",
             "q30_detect_mentions", "q31_triples", "q36_minhash_dedup",
             "q38_ann_topk", "q54_minhash_native", "q57_pagerank",
             # round-3 additions (additive: earlier keys stay comparable)
             "q80_bm25", "q96_association_rules", "q99_zorder_key",
             # round-5 additions: langid (post O(len^2) fix), graph
             # neighborhood family, web-link graph from real html
             "q104_langid_ngram", "q109_label_propagation",
             "q110_host_link_graph"]
    out, spread = {}, {}
    for name in picks:
        walls = []
        for _ in range(trials):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        warm = walls[1:]  # run 1 is the cold warm-up
        out[name] = min(warm)
        spread[name] = {"cold": walls[0], "best": min(warm),
                        "worst": max(warm), "runs": trials}
        _drop_cached_state(spark)
    return out, spread


def _drop_cached_state(spark) -> None:
    """Per-pick isolation: drop DF cache AND the localCheckpoint RDD
    blocks earlier picks left in the block manager.  Without this the
    residue of ~15 prior picks (stored-token barriers, signature
    tables) squeezes executor memory and a late iterative pick measures
    GC pressure, not itself -- q57 read 14.5 s in-harness vs 5.3 s
    isolated before this was added.  Nothing reuses a prior pick's
    frames, so unpersisting is safe."""
    try:
        spark.catalog.clearCache()
        jvm_rdds = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd in jvm_rdds.values():
            rdd.unpersist(False)
    except Exception:
        pass  # isolation is best-effort; the measurement still runs


def bench_once(master_cpus: int, mult: int, sf_dir: str,
               with_queries: bool, with_dag: bool | None = None) -> dict:
    """Best-of-N trials for the KG job (N = $BENCH_TRIALS, default 2):
    single-run numbers on this shared sandbox vary ~20%; best-of is the
    standard way to report capability rather than noise."""
    from redactify_spark.plans.session import build_session

    trials = int(os.environ.get("BENCH_TRIALS", "3"))
    spark = build_session(f"bench-{master_cpus}",
                          master=f"local[{master_cpus}]",
                          shuffle_partitions=master_cpus)
    out_dir = tempfile.mkdtemp(prefix="bench_triples_")
    dag_root = tempfile.mkdtemp(prefix="bench_kg_dag_")
    try:
        runs = [run_kg_job(spark, sf_dir, mult, out_dir)
                for _ in range(max(1, trials))]
        kg = min(runs, key=lambda r: r["sec"])
        kg["trials"] = len(runs)
        queries, query_spread = (run_queries(spark, sf_dir)
                                 if with_queries else ({}, {}))
        full_dag = {}
        if with_dag is None:
            with_dag = with_queries
        if with_dag:
            # best-of-N with fresh checkpoint roots (a reused root would
            # resume instantly and measure nothing).  BENCH_DAG_TRIALS=1
            # for the million-doc scaling runs (one pass is already the
            # signal there; a second doubles an hour-long wall).
            dag_trials = max(1, int(os.environ.get("BENCH_DAG_TRIALS",
                                                   "2")))
            dag_runs = []
            for i in range(dag_trials):
                root_i = os.path.join(dag_root, f"run{i}")
                dag_runs.append(run_full_dag(spark, sf_dir, mult, root_i))
                shutil.rmtree(root_i, ignore_errors=True)
            full_dag = min(dag_runs, key=lambda r: r["sec"])
            if os.environ.get("BENCH_CORPUS_DAG", "1") != "0":
                corpus_root = os.path.join(dag_root, "corpus")
                full_dag["corpus_dag"] = run_corpus_dag(
                    spark, sf_dir, mult, corpus_root)
                shutil.rmtree(corpus_root, ignore_errors=True)
            # the analytics DAG reads the fixed events table -- it does
            # not scale with BENCH_DOC_MULT, so scaling runs skip it
            if os.environ.get("BENCH_ANALYTICS_DAG", "1") != "0":
                ana_root = os.path.join(dag_root, "analytics")
                full_dag["analytics_dag"] = run_analytics_dag(
                    spark, sf_dir, ana_root)
                shutil.rmtree(ana_root, ignore_errors=True)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(dag_root, ignore_errors=True)
        spark.stop()
    return {"kg": kg, "queries": queries, "query_spread": query_spread,
            "full_dag": full_dag}


def main():
    if "--skew" in sys.argv:
        # Skew evidence (VERDICT r2 #4): same DAG, uniform corpus vs one
        # head entity on 30% of pages.  A stage whose wall blows up
        # superlinearly under the hot key would indicate un-handled skew
        # (the skewed corpus also carries ~20% more mentions, so walls
        # legitimately rise ~linearly with that volume).
        from redactify_spark.plans.session import build_session
        spark = build_session(f"bench-skew", master=f"local[{CPUS}]",
                              shuffle_partitions=CPUS)
        out = {}
        try:
            for label, sk in (("uniform", False), ("zipf_head30", True)):
                runs = []
                for i in range(2):
                    root = tempfile.mkdtemp(prefix=f"skew_{label}_{i}_")
                    runs.append(run_full_dag(spark, SF_DIR, DOC_MULT,
                                             root, skew=sk))
                    shutil.rmtree(root, ignore_errors=True)
                out[label] = min(runs, key=lambda r: r["sec"])
        finally:
            spark.stop()
        ratios = {
            s: round(out["zipf_head30"]["stage_sec"][s]
                     / max(out["uniform"]["stage_sec"][s], 1e-9), 2)
            for s in out["uniform"]["stage_sec"]}
        emit({
            "metric": "skew_stage_ratio_max",
            "value": max(ratios.values()), "unit": "ratio",
            "sf": SF_DIR, "queries": {},
            "detail": {"uniform": out["uniform"],
                       "zipf_head30": out["zipf_head30"],
                       "stage_wall_ratio_zipf_over_uniform": ratios}}, mode="skew")
        return

    if "--ann" in sys.argv:
        from redactify_spark.plans.session import build_session
        n = int(os.environ.get("ANN_N", "1000000"))
        spark = build_session("bench-ann", master=f"local[{CPUS}]",
                              shuffle_partitions=CPUS)
        try:
            r = run_ann_bench(spark, n)
        finally:
            spark.stop()
        emit({
            "metric": "ann_recall_min",
            "value": min(r["lsh_recall@10"], r["ivf_recall@10"],
                         r["quantized_recall@10"]),
            "unit": "ratio", "sf": n, "queries": {}, "detail": r}, mode="ann")
        return

    if "--corpus-scaling" in sys.argv:
        # Corpus-DAG scaling on the ALL-DISTINCT corpus (every stage
        # carries the volume; the default recrawl corpus deletes 99.6%
        # in stage 1 and leaves second-long fixed-overhead walls that
        # measure nothing).  Same uncontended-levels rationale as
        # --scaling.
        from redactify_spark.plans.session import build_session
        lo = int(os.environ.get("SCALING_LO", "2"))
        hi = int(os.environ.get("SCALING_HI", "8"))
        out = {}
        for cpus in (lo, hi):
            spark = build_session(f"bench-corpus-{cpus}",
                                  master=f"local[{cpus}]",
                                  shuffle_partitions=cpus)
            root = tempfile.mkdtemp(prefix=f"corpus_scale_{cpus}_")
            try:
                out[cpus] = run_corpus_dag(spark, SF_DIR, DOC_MULT, root,
                                           unique=True)
            finally:
                shutil.rmtree(root, ignore_errors=True)
                spark.stop()
        eff = out[hi]["docs_per_sec"] / ((hi / lo) * out[lo]["docs_per_sec"])
        emit({
            "metric": f"corpus_scaling_efficiency_{lo}_to_{hi}",
            "value": round(eff, 3), "unit": "ratio", "sf": SF_DIR,
            "queries": {},
            "detail": {f"local[{lo}]": out[lo], f"local[{hi}]": out[hi]}}, mode="corpus_scaling")
        return

    if "--recrawl-bench" in sys.argv:
        # Recrawl economics: apply snapshot T1 (N pages), then T2 with
        # ~10% churn (5% modified via text edit, 5% new urls, 5%
        # removed), and compare T2's append wall against the one-shot
        # cost of detecting T2's full live snapshot.  The claim under
        # test: detection cost follows the CHANGED pages (the 10^12
        # argument for plans/recrawl), with the ledger overhead
        # (signatures + delta + ownership) visible, not hidden.
        from pyspark.sql import functions as F
        from redactify_spark.plans import recrawl as R
        from redactify_spark.plans.session import build_session
        from redactify_spark.sources.pages import synth_pages
        n = int(os.environ.get("RECRAWL_PAGES", "200000"))
        spark = build_session(f"bench-recrawl-{CPUS}",
                              master=f"local[{CPUS}]",
                              shuffle_partitions=CPUS)
        root = tempfile.mkdtemp(prefix="bench_recrawl_")
        # a real recrawl reads a materialized crawl table, not a python
        # generator: land both snapshots in parquet first (untimed) so
        # the measured walls are ledger economics, not synth cost
        pq = tempfile.mkdtemp(prefix="bench_recrawl_pages_")
        synth_pages(spark, n, partitions=CPUS * 4) \
            .write.mode("overwrite").parquet(f"{pq}/t1")
        pages1 = spark.read.parquet(f"{pq}/t1")
        bucket = F.abs(F.xxhash64("url")) % 20
        (pages1.where(bucket != 3)                 # ~5% removed
         .withColumn("text",
                     F.when(bucket == 5,
                            F.concat("text", F.lit(" breaking update")))
                     .otherwise(F.col("text")))
         .unionByName(synth_pages(spark, n // 20, start=n,
                                  partitions=CPUS))
         .write.mode("overwrite").parquet(f"{pq}/t2"))
        pages2 = spark.read.parquet(f"{pq}/t2")

        t0 = time.time()
        s1 = R.append_snapshot(spark, root, "t1", pages1)
        t1_wall = round(time.time() - t0, 1)
        t0 = time.time()
        s2 = R.append_snapshot(spark, root, "t2", pages2)
        t2_wall = round(time.time() - t0, 1)
        # one-shot comparison: the naive full reprocess of snapshot T2
        # (detect + triples + persist -- the same deliverables the
        # append produces, minus the ledger)
        from redactify_spark.operators.detection import detect_mentions
        from redactify_spark.operators.triples import all_triples
        t0 = time.time()
        m = detect_mentions(pages2, id_col="url", text_col="text")
        m = m.persist()
        m.count()
        all_triples(m, id_col="url").write.mode("overwrite") \
            .parquet(f"{pq}/oneshot_triples")
        m.write.mode("overwrite").parquet(f"{pq}/oneshot_mentions")
        m.unpersist()
        oneshot_wall = round(time.time() - t0, 1)
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(pq, ignore_errors=True)
        emit({
            "metric": "recrawl_append_vs_oneshot_speedup",
            "value": round(oneshot_wall / t2_wall, 2), "unit": "x",
            "sf": SF_DIR, "queries": {},
            "detail": {
                "n_pages": n, "t1_append_sec": t1_wall,
                "t2_append_sec": t2_wall,
                "t2_detected_urls": s2["detected_urls"],
                "t2_delta": s2["delta"],
                "oneshot_full_reprocess_sec": oneshot_wall,
                "t1_detected_urls": s1["detected_urls"],
            }}, mode="recrawl")
        spark.stop()
        return

    if "--weblinks-scaling" in sys.argv:
        # Web-link-graph scaling: synth html -> href extraction -> host
        # graph -> weighted host PageRank, the SAME job at two
        # uncontended parallelism levels on identical input
        # (WEBLINKS_PAGES, default 10^6).  TWO stages timed separately,
        # because they scale for different reasons:
        #   extract: pages-sized Arrow scan + one combinable groupBy --
        #     the cost that grows with corpus size; THIS carries the
        #     efficiency bar (it is >99.99% of the work at 10^12 pages).
        #   graph tail: PageRank + checksums over the aggregated host
        #     graph, whose size is |hosts|^2-bounded (190 edges here,
        #     ~10^7 on the real web) and INDEPENDENT of page count --
        #     constant-wall job overhead at every parallelism level,
        #     the classic Amdahl tail a single box cannot amortize.
        # Host-graph + pagerank outputs are checksummed across levels
        # (identical-output evidence, same bar as the KG DAG).
        from pyspark.sql import functions as F
        from redactify_spark.operators import weblinks as W
        from redactify_spark.plans.session import build_session
        from redactify_spark.sources.pages import synth_pages
        n_pages = int(os.environ.get("WEBLINKS_PAGES", "1000000"))
        lo = int(os.environ.get("SCALING_LO", "2"))
        hi = int(os.environ.get("SCALING_HI", "8"))
        out = {}
        for cpus in (lo, hi):
            spark = build_session(f"bench-weblinks-{cpus}",
                                  master=f"local[{cpus}]",
                                  shuffle_partitions=cpus)
            t0 = time.time()
            links = W.extract_links(
                synth_pages(spark, n_pages, partitions=cpus * 4))
            hosts = W.host_graph(links).localCheckpoint()
            n_edges = hosts.count()
            t_extract = time.time() - t0
            t1 = time.time()
            pr = W.host_pagerank(hosts)
            sig = (hosts.agg(
                F.bit_xor(F.xxhash64("src_host", "dst_host", "n_links")))
                .collect()[0][0])
            pr_sig = (pr.select("host", F.round("rank", 6).alias("r"))
                      .agg(F.bit_xor(F.xxhash64("host", "r")))
                      .collect()[0][0])
            t_tail = time.time() - t1
            out[cpus] = {"sec": round(t_extract + t_tail, 1),
                         "extract_sec": round(t_extract, 1),
                         "graph_tail_sec": round(t_tail, 1),
                         "n_host_edges": n_edges,
                         "pages_per_sec": round(n_pages / t_extract, 1),
                         "hosts_sig": sig, "pagerank_sig": pr_sig}
            spark.stop()
        eff = out[hi]["pages_per_sec"] / ((hi / lo)
                                          * out[lo]["pages_per_sec"])
        total_eff = (out[lo]["sec"] / out[hi]["sec"]) / (hi / lo)
        emit({
            "metric": f"weblinks_scaling_efficiency_{lo}_to_{hi}",
            "value": round(eff, 3), "unit": "ratio", "sf": SF_DIR,
            "queries": {},
            "detail": {
                "n_pages": n_pages,
                "efficiency_basis": "extract stage (pages-sized work); "
                    "graph tail is page-count-independent job overhead",
                "total_wall_efficiency": round(total_eff, 3),
                f"local[{lo}]": out[lo], f"local[{hi}]": out[hi],
                "outputs_identical":
                    out[lo]["hosts_sig"] == out[hi]["hosts_sig"]
                    and out[lo]["pagerank_sig"] == out[hi]["pagerank_sig"],
            }}, mode="weblinks_scaling")
        return

    if "--scaling" in sys.argv:
        # N vs 4N cores, both UNCONTENDED on this 32-core box: a python-UDF
        # task occupies a JVM thread AND a python worker, so local[32]
        # oversubscribes 32 cores with ~64 runnable threads and
        # under-measures true 4x scaling (a cluster gives each executor
        # its own cores).  local[2] vs local[8] keeps both levels below
        # half the machine.  Override with SCALING_LO / SCALING_HI.
        lo = int(os.environ.get("SCALING_LO", "2"))
        hi = int(os.environ.get("SCALING_HI", "8"))
        with_dag = "--full-dag" in sys.argv
        r_lo = bench_once(lo, DOC_MULT, SF_DIR, with_queries=False,
                          with_dag=with_dag)
        r_hi = bench_once(hi, DOC_MULT, SF_DIR, with_queries=False,
                          with_dag=with_dag)
        tput_lo = r_lo["kg"]["docs_per_sec"]
        tput_hi = r_hi["kg"]["docs_per_sec"]
        eff = tput_hi / ((hi / lo) * tput_lo)
        detail = {
            f"local[{lo}]": r_lo["kg"], f"local[{hi}]": r_hi["kg"],
            "throughput_lo_docs_per_sec": tput_lo,
            "throughput_hi_docs_per_sec": tput_hi,
        }
        if with_dag:
            # scaling of the ENTIRE checkpointed pipeline (all 7 stages
            # incl. graph + salience), not just detect+triples
            dag_lo = r_lo["full_dag"]["docs_per_sec"]
            dag_hi = r_hi["full_dag"]["docs_per_sec"]
            detail["full_dag"] = {
                f"local[{lo}]": r_lo["full_dag"],
                f"local[{hi}]": r_hi["full_dag"],
                "efficiency": round(dag_hi / ((hi / lo) * dag_lo), 3),
            }
            if "corpus_dag" in r_lo["full_dag"]:
                c_lo = r_lo["full_dag"]["corpus_dag"]["docs_per_sec"]
                c_hi = r_hi["full_dag"]["corpus_dag"]["docs_per_sec"]
                detail["corpus_dag_efficiency"] = \
                    round(c_hi / ((hi / lo) * c_lo), 3)
        emit({
            "metric": f"scaling_efficiency_{lo}_to_{hi}",
            "value": round(eff, 3), "unit": "ratio", "sf": SF_DIR,
            "queries": {},
            "detail": detail}, mode="scaling")
        return

    res = bench_once(CPUS, DOC_MULT, SF_DIR, with_queries=True)
    kg = res["kg"]
    emit({
        "metric": "kg_pipeline_sec",
        "value": round(kg["sec"], 3),
        "unit": "sec",
        "queries": res["queries"],
        "query_spread": res["query_spread"],
        "sf": SF_DIR,
        "n_docs": kg["n_docs"],
        "n_triples": kg["n_triples"],
        "docs_per_sec": kg["docs_per_sec"],
        "triples_per_sec": kg["triples_per_sec"],
        "full_dag": res["full_dag"],
        "conf": {"cpus": CPUS, "doc_mult": DOC_MULT},
    })


if __name__ == "__main__":
    main()
