"""Corpus curation operators: the last mile of a training-data pipeline
(dedup -> quality gate -> split -> token-budget packing), all expressed
with native Spark SQL functions so whole-stage codegen applies and every
operator is DuckDB-oracle-checkable.

Scale notes:
- deterministic_split hashes the id (md5 prefix), so the split is stable
  across runs/partitionings and needs no stored assignment table;
- token_budget_pack needs a GLOBAL ordered cumulative sum, which a bare
  Window.orderBy would compute on a single partition (the classic
  scale-killer).  Instead it runs the two-phase prefix pattern: cumsum
  WITHIN each quality band (a partitioned window), plus a per-band
  prefix offset computed from the tiny band-totals table (broadcast
  join).  The global sort never happens; the widest shuffle is keyed by
  (band, id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def deterministic_split(docs: DataFrame, holdout_pct: int = 10,
                        id_col: str = "doc_id") -> DataFrame:
    """Add a stable 'split' column ('holdout' for ~holdout_pct% of rows,
    'train' otherwise) keyed on md5(id): reproducible across runs,
    partitionings and engines -- no RNG, no stored assignment table."""
    bucket = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4),
                     16, 10).cast("int") % 100)
    return docs.withColumn(
        "split", F.when(bucket < holdout_pct, F.lit("holdout"))
                  .otherwise(F.lit("train")))


def corpus_prep(docs: DataFrame, text_col: str = "text",
                min_quality: float = 0.6,
                passthrough: tuple[str, ...] = ()) -> DataFrame:
    """Exact-dedup (keep min doc_id per content hash) then quality-gate:
    the standard first pass of corpus curation, fully native."""
    from redactify_spark.operators.textstats import quality_features
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy("doc_id")
    deduped = (docs.withColumn("_rn", F.row_number().over(w))
               .where(F.col("_rn") == 1).drop("_rn"))
    return (quality_features(deduped, text_col, passthrough)
            .where(F.col("quality_score") >= min_quality))


def token_budget_pack(docs: DataFrame, budget: int,
                      quality_col: str = "quality_score",
                      token_col: str = "n_tokens",
                      id_col: str = "doc_id",
                      tokenizer: str | None = None,
                      text_col: str = "text") -> DataFrame:
    """Fill a token budget best-quality-first: keep documents in
    (quality desc, id asc) order while the running token total stays
    within `budget`.

    `tokenizer="bpe"` computes `token_col` itself with the vendored
    deterministic BPE (functions/bpe.py) -- tokenizer-EXACT budgets
    instead of the regex approximation; default None consumes the
    caller-provided count column unchanged.  Passing tokenizer="bpe"
    together with a docs column already named `token_col` raises --
    otherwise a caller's precomputed counts would be silently
    overwritten (ADVICE r4); point token_col at a fresh name (e.g. the
    default "n_tokens" when docs carries none, or "n_tokens_bpe").

    Two-phase global cumsum (no single-partition window):
      1. within-band cumsum: window partitioned by the quality band,
         ordered by id -- distributes across bands;
      2. band prefix: total tokens per band, cumulated over the tiny
         distinct-band table (driver-scale; broadcast back).
    Keep iff prefix + within-band cumsum <= budget."""
    if tokenizer == "bpe":
        if token_col in docs.columns:
            raise ValueError(
                f"token_budget_pack(tokenizer='bpe') would overwrite "
                f"existing column {token_col!r}; drop it or pass a fresh "
                f"token_col (e.g. 'n_tokens_bpe')")
        from redactify_spark.functions.bpe import with_bpe_token_counts
        docs = with_bpe_token_counts(docs, text_col=text_col,
                                     out_col=token_col)
    elif tokenizer is not None:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    w_in = (Window.partitionBy(quality_col).orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    with_cum = docs.withColumn("_cum_in",
                               F.sum(token_col).over(w_in).cast("long"))
    band_totals = (docs.groupBy(quality_col)
                   .agg(F.sum(token_col).cast("long").alias("_band_total")))
    # the band table is tiny (distinct quality scores); a window over it
    # is driver-scale and its result broadcasts back to the data
    w_band = (Window.orderBy(F.col(quality_col).desc())
              .rowsBetween(Window.unboundedPreceding, -1))
    prefixes = band_totals.withColumn(
        "_prefix", F.coalesce(F.sum("_band_total").over(w_band),
                              F.lit(0)).cast("long")).drop("_band_total")
    return (with_cum.join(F.broadcast(prefixes), quality_col)
            .withColumn("cum_tokens",
                        (F.col("_prefix") + F.col("_cum_in")).cast("long"))
            .where(F.col("cum_tokens") <= budget)
            .drop("_cum_in", "_prefix"))


def stratified_sample(docs: DataFrame, strata_col: str,
                      rates: dict[str, int], default_pct: int = 0,
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-stratum sampling: keep ~rates[stratum]% of each
    stratum's rows, keyed on md5(id) like deterministic_split -- stable
    across runs, partitionings and engines, no RNG state to distribute,
    and a row's fate never changes when other rows appear (so incremental
    reruns keep their samples).  The standard corpus-mixing primitive
    (e.g. downsample boilerplate-heavy domains, upweight rare languages
    by sampling others down).  Zero shuffles: a literal CASE lookup plus
    a hash filter, fully pushdown-friendly.

    The hash is purpose-prefixed ('strat:' || id): deterministic_split
    hashes the bare id, and sharing the bucket stream would CORRELATE
    the two primitives (a 10% holdout of a 50%-rate sample would come
    out 20%, or 100% of a 5%-rate stratum)."""
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.lit("strat:"), F.col(id_col).cast("string"))),
        1, 4), 16, 10).cast("int") % 100)
    rate = F.lit(default_pct)
    for stratum, pct in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(pct)) \
                .otherwise(rate)
    return docs.where(bucket < rate)


def chunk_documents(docs: DataFrame, chunk_tokens: int = 64,
                    overlap: int = 16, text_col: str = "text",
                    id_col: str = "doc_id",
                    tokenizer: str = "ws") -> DataFrame:
    """Split documents into fixed-token-count chunks with overlap (the
    LLM context-window prep step): chunk i covers tokens
    [i*stride, i*stride + chunk_tokens), stride = chunk_tokens - overlap.
    Emits (doc_id, chunk_idx, n_chunk_tokens, chunk_text); documents
    with zero tokens emit nothing.  Whitespace inside a chunk is
    normalized to single spaces (the join of the token slice).

    tokenizer="ws" (default) windows over whitespace tokens, fully
    native; tokenizer="bpe" windows over EXACT subword tokens from the
    vendored deterministic BPE (functions/bpe.py) -- same schema, chunk
    boundaries may fall mid-word, '</w>' sentinels keep reconstruction
    exact.

    Fully native (split -> sequence -> explode -> slice): embarrassingly
    parallel, no shuffle at all -- the chunk explosion happens inside the
    scan stage and output size is input size x (1 + overlap/stride)."""
    if tokenizer == "bpe":
        from redactify_spark.functions.bpe import bpe_chunk_documents
        return bpe_chunk_documents(docs, chunk_tokens=chunk_tokens,
                                   overlap=overlap, text_col=text_col,
                                   id_col=id_col)
    if tokenizer != "ws":
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    t = F.trim(F.col(text_col))
    toks = F.when(F.length(t) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(t, r"\s+"))
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(0, n - chunk_tokens) / stride).
    # Zero-token docs are filtered BEFORE the sequence: Spark's
    # sequence(0, -1) is a DESCENDING [0, -1], not empty.
    n_chunks = (1 + F.ceil((F.greatest(n - chunk_tokens, F.lit(0)))
                           / F.lit(stride)).cast("int"))
    chunks = (docs.where(F.length(t) > 0)
              .select(F.col(id_col).alias("doc_id"), toks.alias("_toks"),
                      F.explode(F.sequence(F.lit(0), n_chunks - 1))
                      .alias("chunk_idx")))
    sliced = F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1,
                     chunk_tokens)
    return chunks.select(
        "doc_id", F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(sliced).cast("long").alias("n_chunk_tokens"),
        F.array_join(sliced, " ").alias("chunk_text"))


def sample_per_group(df: DataFrame, group_col: str, k: int,
                     id_col: str = "doc_id", n_salt: int = 16) -> DataFrame:
    """Deterministic uniform k-sample per group: the k rows with the
    smallest md5(id) (a stable pseudo-random order) per group.  The
    eval-set / debugging primitive next to stratified_sample (that one
    keeps a RATE, this one a COUNT); reproducible across runs,
    partitionings and engines.

    Two-phase against hot groups: a single window over the raw group
    key would sort a 10^10-row group in one reducer.  Phase 1 keeps the
    k smallest per (group, salt-of-id) -- n_salt-way parallel; phase 2
    re-ranks the <= k*n_salt survivors per group (driver-scale per
    group).  The global k smallest always survive phase 1, so the
    result is identical to the naive single window."""
    h = F.md5(F.col(id_col).cast("string"))
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt))
    w1 = Window.partitionBy(group_col, salt).orderBy(h, id_col)
    survivors = (df.withColumn("_rk1", F.row_number().over(w1))
                 .where(F.col("_rk1") <= k).drop("_rk1"))
    w2 = Window.partitionBy(group_col).orderBy(h, id_col)
    return (survivors.withColumn("_rk", F.row_number().over(w2))
            .where(F.col("_rk") <= k).drop("_rk"))


def line_doc_frequencies(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """(line, n_docs): how many documents contain each exact line.
    Distinct over the uniform (line, doc) key first, then a map-side-
    combinable count -- no hot-line reducer."""
    lines = docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(F.split(F.col(text_col), "\n"))
                        .alias("line"))
    return (lines.dropDuplicates(["line", "doc_id"])
            .groupBy("line")
            .agg(F.count("*").cast("long").alias("n_docs")))


def remove_boilerplate_lines(docs: DataFrame, n_docs: int,
                             min_doc_frac: float = 0.05,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """CCNet/C4-style boilerplate removal: delete every line that
    appears in more than `min_doc_frac` of the corpus (cookie banners,
    nav text, footers), preserving the order of surviving lines.
    Documents whose every line is boilerplate are dropped.

    posexplode -> broadcast-sized anti-join against the boilerplate
    line set -> per-doc ordered reassembly (sort_array over (pos, line)
    structs -- inside the aggregation, no window).  `n_docs` is passed
    in (computed once upstream): no per-call count scan."""
    threshold = min_doc_frac * n_docs
    boiler = (line_doc_frequencies(docs, text_col, id_col)
              .where(F.col("n_docs") > threshold)
              .select("line"))
    pos_lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("pos", "line"))
    kept = pos_lines.join(boiler, "line", "left_anti")
    return (kept.groupBy("doc_id")
            .agg(F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"]),
                "\n").alias("text"),
                F.count("*").cast("long").alias("n_lines_kept")))


def weighted_sample_per_group(df: DataFrame, group_col: str, k: int,
                              weight_col: str, id_col: str = "doc_id",
                              n_salt: int = 16) -> DataFrame:
    """Deterministic weighted k-sample WITHOUT replacement per group
    (Efraimidis-Spirakis): selection probability proportional to
    `weight_col`.  Each row gets u ~ Uniform(0,1) derived from
    md5('ws:' || id) and sort key ln(u)/w (the monotone log transform
    of u^(1/w)); the k LARGEST keys per group win.  No RNG state --
    reproducible across runs, partitionings and engines; the 'ws:'
    prefix decorrelates from deterministic_split / stratified_sample.

    The quality-proportional corpus-mixing primitive (sample harder
    from high-quality strata without hard thresholds).  Rows with
    weight <= 0 are never selected.  Same salted two-phase top-k as
    sample_per_group: no hot group ever sorts on one reducer."""
    u = ((F.conv(F.substring(
        F.md5(F.concat(F.lit("ws:"), F.col(id_col).cast("string"))),
        1, 8), 16, 10).cast("double") + 0.5) / F.lit(float(1 << 32)))
    key = F.log(u) / F.col(weight_col)
    pos = df.where(F.col(weight_col) > 0).withColumn("_k", key)
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt))
    w1 = Window.partitionBy(group_col, salt).orderBy(
        F.col("_k").desc(), id_col)
    survivors = (pos.withColumn("_r1", F.row_number().over(w1))
                 .where(F.col("_r1") <= k).drop("_r1"))
    w2 = Window.partitionBy(group_col).orderBy(F.col("_k").desc(), id_col)
    return (survivors.withColumn("_r2", F.row_number().over(w2))
            .where(F.col("_r2") <= k).drop("_r2", "_k"))
