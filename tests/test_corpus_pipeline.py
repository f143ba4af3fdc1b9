"""End-to-end checkpointed training-corpus pipeline."""

import pytest
from pyspark.sql import functions as F

from redactify_spark.plans import checkpoint as CP
from redactify_spark.plans.corpus import corpus_pipeline


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "corpus_ckpt")


@pytest.fixture(scope="module")
def raw_docs(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # inject corpus-wide boilerplate + exact dups so every stage has work
    multi = base.select(
        "doc_id", "lang", "source",
        F.concat(F.lit("Subscribe to our newsletter\n"), F.col("text"),
                 F.lit("\nCopyright 2024 Example Corp")).alias("text"))
    dups = (multi.where("doc_id < 10")
            .select((F.col("doc_id") + 100000).alias("doc_id"),
                    "lang", "source", "text"))
    return multi.unionByName(dups).localCheckpoint()


def table_set(df):
    return {tuple(str(v) for v in r) for r in df.collect()}


def test_corpus_pipeline_semantics(spark, raw_docs, root):
    out = corpus_pipeline(
        spark, raw_docs, root,
        gopher_kwargs={"min_words": 20, "max_dup_word_frac": 0.8})

    # exact dups removed: the injected copies lose to their originals
    exact_ids = {r.doc_id for r in out["exact"].select("doc_id").collect()}
    assert not any(i >= 100000 for i in exact_ids)

    # boilerplate lines removed from every surviving doc
    texts = [r.text for r in out["clean"].select("text").collect()]
    assert texts and all("Subscribe to our newsletter" not in t
                         and "Copyright 2024" not in t for t in texts)

    # quality gate keeps only gopher-passing docs above the threshold
    gated = out["gated"]
    assert gated.where("quality_score < 0.5").count() == 0

    # split is document-granular and chunks come only from train docs
    split_of = {r.doc_id: r.split
                for r in out["split"].select("doc_id", "split").collect()}
    chunk_docs = {r.doc_id for r in
                  out["chunks"].select("doc_id").distinct().collect()}
    assert chunk_docs and all(split_of[d] == "train" for d in chunk_docs)
    assert out["chunks"].where("n_chunk_tokens > 256").count() == 0


def test_corpus_pipeline_kill_resume(spark, raw_docs, root):
    kw = {"min_words": 20, "max_dup_word_frac": 0.8}
    full = corpus_pipeline(spark, raw_docs, root, gopher_kwargs=kw)
    chunks_before = table_set(full["chunks"])
    h = CP.content_hash(full["chunks"])

    # crash after near-dedup: wipe downstream stages, resume
    for stage in ("03_boilerplate", "04_quality", "05_split", "06_chunks"):
        CP.invalidate(root, stage)
    resumed = corpus_pipeline(spark, raw_docs, root, gopher_kwargs=kw)
    assert table_set(resumed["chunks"]) == chunks_before
    assert CP.content_hash(resumed["chunks"]) == h
    for stage in ("01_exact_dedup", "02_near_dedup", "03_boilerplate",
                  "04_quality", "05_split", "06_chunks"):
        assert CP.stage_complete(root, stage)


def test_corpus_pipeline_exact_substring_stage(spark, raw_docs, root):
    """Optional stage 02b (exact_substring_n): a shared 12-token span
    planted across surviving docs is spliced out of every occurrence
    but the corpus-wide first; disabled runs have no 02b stage dir."""
    import os

    span = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed "
            "do eiusmod tempor")                  # 12 tokens
    docs = raw_docs.select(
        "doc_id", "lang", "source",
        F.concat("text", F.lit(" " + span)).alias("text"))
    out = corpus_pipeline(
        spark, docs, root, exact_substring_n=8,
        gopher_kwargs={"min_words": 20, "max_dup_word_frac": 0.8})
    assert os.path.isdir(os.path.join(root, "02b_exact_substring"))
    m = CP.read_manifest(root, "02b_exact_substring")
    assert m["status"] == "complete" and m["row_count"] > 0
    spliced = spark.read.parquet(
        os.path.join(root, "02b_exact_substring", "data"))
    # every doc but the first occurrence lost >= the 12 planted tokens
    n_kept_span = spliced.where(
        F.col("text").contains("eiusmod tempor")).count()
    assert n_kept_span <= 1
    assert spliced.where("n_tokens_removed >= 12").count() \
        >= spliced.count() - 1
