"""The checkpointed TRAINING-CORPUS pipeline -- the second flagship DAG
next to the KG build (plans/checkpoint.py::kg_pipeline).

raw documents -> exact dedup -> MinHash near-dedup -> boilerplate line
removal -> quality gate (heuristics + Gopher rules) -> deterministic
train/holdout split -> token-window chunking, every stage persisted
through run_stage (manifest + lineage + resume), so a 100-TB curation
job killed at any stage resumes from the last complete table.

Stage order rationale:
- exact dedup first: it is the cheapest volume reducer (one combinable
  shuffle) and shrinks every later stage;
- near-dedup before quality: quality scoring is per-doc work, no reason
  to score documents the near-dup pass will drop;
- boilerplate removal before quality: banner/footer lines distort the
  quality features they feed (symbol ratio, repetition);
- split before chunking: the holdout must be held out at DOCUMENT
  granularity (chunk-level splits leak overlapping windows of the same
  document across the boundary -- the classic eval-contamination bug).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from redactify_spark.plans.checkpoint import run_stage


def corpus_pipeline(spark: SparkSession, docs: DataFrame, root: str,
                    near_dup_threshold: float = 0.7,
                    min_quality: float = 0.5,
                    boiler_frac: float = 0.05,
                    holdout_pct: int = 10,
                    chunk_tokens: int = 256,
                    chunk_overlap: int = 32,
                    gopher_kwargs: dict | None = None,
                    exact_substring_n: int | None = None,
                    near_dup_engine: str = "python",
                    chunk_tokenizer: str = "ws",
                    bpe_merges_path: str | None = None
                    ) -> dict[str, DataFrame]:
    """docs(doc_id, text, ...) -> curated chunk table, checkpointed.

    `exact_substring_n` (e.g. 8) enables the optional exact-substring
    stage (02b): maximal repeated n-token spans spliced out of every
    surviving doc, first occurrence kept (Lee et al. 2022 -- document
    dedup removes repeated DOCUMENTS; this removes repeated SPANS that
    survive it, the memorization-relevant residue).

    `chunk_tokenizer="bpe"` makes stage 06 window over exact subword
    tokens; `bpe_merges_path` installs a user-supplied merges.txt (e.g.
    GPT-2's public file) as the runtime vocabulary -- the Spark kernels
    snapshot it into their closures, so executors follow (VERDICT r4
    #5).  Default stays the vendored deterministic trainer."""
    from redactify_spark.operators import curation as CU
    from redactify_spark.operators import dedup as D
    from redactify_spark.operators import textstats as X

    if bpe_merges_path:
        from redactify_spark.functions.bpe import use_merges_file
        use_merges_file(bpe_merges_path)

    exact = run_stage(spark, root, "01_exact_dedup",
                      lambda: D.dedup_exact(docs))
    near = run_stage(spark, root, "02_near_dedup",
                     lambda: D.dedup_minhash(exact,
                                             threshold=near_dup_threshold,
                                             engine=near_dup_engine))
    if exact_substring_n:
        near = run_stage(
            spark, root, "02b_exact_substring",
            lambda: D.remove_repeated_spans(near, n=exact_substring_n))

    def _boiler():
        n = near.count()
        cleaned = CU.remove_boilerplate_lines(near, n_docs=n,
                                              min_doc_frac=boiler_frac)
        # re-attach passthrough columns the reassembly dropped
        others = [c for c in near.columns if c not in ("text",)]
        return (near.select(*others)
                .join(cleaned.select("doc_id", "text", "n_lines_kept"),
                      "doc_id"))

    clean = run_stage(spark, root, "03_boilerplate", _boiler)

    def _quality():
        # Gopher-style rule thresholds are corpus-tuned in practice
        # (the published values target Common Crawl prose; a different
        # corpus passes its own bounds via gopher_kwargs)
        # pass through whatever columns the corpus actually has (a docs
        # table without 'lang' must not crash stage 04 mid-pipeline)
        extra = tuple(c for c in clean.columns if c != "doc_id")
        feats = X.quality_features(clean, passthrough=extra)
        rules = (X.gopher_rules(clean, **(gopher_kwargs or {}))
                 .select("doc_id", "gopher_pass"))
        return (feats.join(rules, "doc_id")
                .where((F.col("quality_score") >= min_quality)
                       & F.col("gopher_pass")))

    gated = run_stage(spark, root, "04_quality", _quality)
    split = run_stage(spark, root, "05_split",
                      lambda: CU.deterministic_split(gated, holdout_pct))

    def _chunks():
        train = split.where(F.col("split") == "train")
        return CU.chunk_documents(train, chunk_tokens=chunk_tokens,
                                  overlap=chunk_overlap,
                                  tokenizer=chunk_tokenizer)

    chunks = run_stage(spark, root, "06_chunks", _chunks)
    return {"exact": exact, "near": near, "clean": clean,
            "gated": gated, "split": split, "chunks": chunks}
