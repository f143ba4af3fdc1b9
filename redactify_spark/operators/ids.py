"""Deterministic sequential ID assignment at scale.

The incremental pipelines (plans/incremental*.py) require doc_ids that
are ARRIVAL-ORDERED and stable -- but Spark's built-in id generators
don't give that: `monotonically_increasing_id` encodes the partition
id (different layout -> different ids), and `row_number()` over an
unpartitioned window funnels the corpus through ONE task.

`assign_sequential_ids` is the standard two-phase fix (the DataFrame
spelling of RDD.zipWithIndex):

  1. range-partition by the (unique) order column -- partition p holds
     a contiguous slice of the global order;
  2. count rows per partition (map-side, tiny result) and prefix-sum
     the counts into per-partition offsets on the driver (bounded by
     the partition count, not the data);
  3. one mapInPandas pass adds offset + local position.

Total cost: one range shuffle + one metadata-sized aggregation + one
narrow pass.  Ids are 0..n-1 in exact order-column order, independent
of input partitioning (pytest-pinned), so reruns and resumes mint
identical ids.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_sequential_ids(df: DataFrame, order_col: str,
                          id_col: str = "seq_id",
                          start: int = 0,
                          partitions: int | None = None) -> DataFrame:
    """Add `id_col` = start, start+1, ... in `order_col` order.
    `order_col` values must be unique (ties would make the order -- and
    therefore the ids -- ambiguous); `start` supports incremental
    minting (pass max existing id + 1)."""
    spark = df.sparkSession
    n_parts = partitions or spark.sparkContext.defaultParallelism
    ranged = (df.repartitionByRange(n_parts, F.col(order_col))
              .sortWithinPartitions(order_col))
    ranged = ranged.localCheckpoint(eager=False)

    counts = (ranged
              .groupBy(F.spark_partition_id().alias("_pid"))
              .agg(F.count("*").alias("_n"))
              .collect())
    offsets = {}
    acc = start
    for row in sorted(counts, key=lambda r: r._pid):
        offsets[row._pid] = acc
        acc += row._n

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(id_col, T.LongType())])

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one mapInPandas over the SAME checkpointed partitioning the
        # counts were taken from; TaskContext gives the partition id
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        pos = offsets.get(pid, 0)
        for pdf in batches:
            pdf = pdf.copy()
            pdf[id_col] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield pdf

    return ranged.mapInPandas(add_ids, schema=out_schema)
