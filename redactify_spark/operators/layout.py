"""Data-layout optimization: Z-order (Morton) clustering for
multi-dimensional scan pruning.

Parquet/Iceberg scans prune files and row groups with per-column
min/max statistics.  Sorting by ONE column makes its stats tight but
leaves every other column's range corpus-wide per file; interleaving
the bits of several columns (the Morton curve) makes EVERY clustered
column's per-file range tight simultaneously, so a selective filter on
ANY of them skips most files.  This is Delta's OPTIMIZE ZORDER BY /
Iceberg's sort-order rewrite, expressed as a native column expression
plus a range-partitioned sorted write -- no engine extension needed.

Everything here is Catalyst-native (shiftright / bitwise and / shifts
folded into one expression; whole-stage codegen applies).  The
quantization bounds are passed in or computed once in a single
min/max aggregation (two scalars per column -- the n_docs/avgdl rule:
at scale read them from table stats instead).

Effectiveness is MEASURED, not asserted: `file_stats_report` reads
parquet footer min/max (metadata only) and `files_pruned_fraction`
computes how many files a box query can skip -- pytest pins z-order
>> linear sort on the off-sort dimension.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key_expr(cols: list[Column], bounds: list[tuple[float, float]],
                    bits: int = 12) -> Column:
    """Morton key: each column is quantized to `bits` levels over its
    [lo, hi] bounds, then the bit planes are interleaved (column i
    contributes bit b to output position b*len(cols)+i).  Ties/out-of-
    range values clamp to the edge cells; NULLs quantize to the LOW
    edge (cell 0) so the key is never NULL and null rows cluster at
    the curve origin instead of forming an implicit NULL partition.
    bits*len(cols) must fit a long (<= 62)."""
    n = len(cols)
    if bits * n > 62:
        raise ValueError(f"bits*cols = {bits * n} exceeds long range")
    levels = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for i, (c, (lo, hi)) in enumerate(zip(cols, bounds)):
        span = (hi - lo) or 1.0
        q = F.floor((c.cast("double") - F.lit(float(lo)))
                    / F.lit(float(span)) * levels + 0.5).cast("long")
        q = F.coalesce(
            F.greatest(F.lit(0), F.least(F.lit(levels), q)), F.lit(0))
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)),
                b * n + i)
    return key


def zorder_write(df: DataFrame, path: str, by: list[str],
                 bits: int = 12, n_files: int = 16,
                 bounds: list[tuple[float, float]] | None = None,
                 partitioner: str = "range") -> None:
    """Write df z-order-clustered on `by`: partition + sort by the
    Morton key, so each output file covers a compact hyper-rectangle of
    the clustered space.  `bounds` from table stats when known; else one
    min/max aggregation (two scalars per column).

    partitioner:
      * "range" (default): `repartitionByRange` on the key -- balanced
        file sizes under skew, but boundary SAMPLING adds a scan job and
        makes the exact file layout nondeterministic across sessions.
      * "fixed": fixed-width key buckets (floor(key * n_files /
        keyspace)), hash-repartitioned so each bucket lands whole in one
        task, written `partitionBy` bucket -> exactly one file per
        non-empty bucket, one contiguous key range per file, fully
        DETERMINISTIC and no sampling job.  Prefer for reproducible
        layouts / near-uniform keys; skewed keys give unbalanced files.
    """
    if bounds is None:
        aggs = []
        for c in by:
            aggs += [F.min(F.col(c).cast("double")),
                     F.max(F.col(c).cast("double"))]
        row = df.agg(*aggs).collect()[0]
        bounds = []
        for i, c in enumerate(by):
            lo, hi = row[2 * i], row[2 * i + 1]
            if lo is None or hi is None:
                raise ValueError(
                    f"zorder_write: column {c!r} is all-NULL; clustered "
                    "columns need at least one non-null value (NULL keys "
                    "would otherwise quantize to NULL and cluster "
                    "together silently)")
            bounds.append((float(lo), float(hi)))
    key = zorder_key_expr([F.col(c) for c in by], bounds, bits)
    if partitioner == "fixed":
        keyspace = 1 << (bits * len(by))
        bucket = F.least(
            F.lit(n_files - 1),
            F.floor(F.col("_zkey") * n_files / F.lit(keyspace)))
        (df.withColumn("_zkey", key)
           .withColumn("_zbucket", bucket)
           .repartition(n_files, "_zbucket")
           .sortWithinPartitions("_zbucket", "_zkey")
           .drop("_zkey")
           .write.mode("overwrite").partitionBy("_zbucket").parquet(path))
    elif partitioner == "range":
        (df.withColumn("_zkey", key)
           .repartitionByRange(n_files, "_zkey")
           .sortWithinPartitions("_zkey")
           .drop("_zkey")
           .write.mode("overwrite").parquet(path))
    else:
        raise ValueError(f"unknown partitioner {partitioner!r}")


def file_stats_report(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max of `cols` from parquet FOOTER metadata (no data
    scan) -- exactly the statistics a pruning scan consults."""
    import pyarrow.parquet as pq
    out = []
    for dp, _, fs in os.walk(path):
        for fname in sorted(fs):
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(dp, fname)).metadata
            lo = {c: None for c in cols}
            hi = {c: None for c in cols}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if (name in cols and col.statistics is not None
                            and col.statistics.has_min_max):
                        s = col.statistics
                        if lo[name] is None or s.min < lo[name]:
                            lo[name] = s.min
                        if hi[name] is None or s.max > hi[name]:
                            hi[name] = s.max
            out.append({"file": fname,
                        **{f"{c}_min": lo[c] for c in cols},
                        **{f"{c}_max": hi[c] for c in cols}})
    return out


def files_pruned_fraction(path: str, predicate: dict[str, tuple]) -> float:
    """Fraction of files a box query `{col: (lo, hi)}` can SKIP from
    footer stats alone (a file survives only if every predicate range
    intersects its [min, max])."""
    cols = list(predicate)
    stats = file_stats_report(path, cols)
    if not stats:
        return 0.0
    kept = 0
    for s in stats:
        # a file with missing stats for any predicate column cannot be
        # skipped -- conservatively keep it (standard pruning semantics)
        hit = all(
            s[f"{c}_min"] is None or s[f"{c}_max"] is None
            or not (s[f"{c}_max"] < lo or s[f"{c}_min"] > hi)
            for c, (lo, hi) in predicate.items())
        kept += hit
    return 1.0 - kept / len(stats)
