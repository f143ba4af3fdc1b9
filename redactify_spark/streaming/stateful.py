"""Custom stateful streaming operator: incremental entity registry.

For a continuous crawl, downstream KG stages want each canonical entity
key emitted exactly ONCE (first sighting) plus a running mention count.
That is a cross-micro-batch stateful dedup -- not expressible with
watermark+window aggregation in append mode -- so it uses
``applyInPandasWithState`` (the custom-stateful-operator escape hatch):
state per pseudo_key group = (first_seen ts, total mentions); a group
emits a row only on its first sighting.

Scale: state is partitioned by pseudo_key (the md5 pseudonym), so the
state store shards evenly -- no hot key can concentrate state because
each key holds O(1) bytes.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

REGISTRY_OUTPUT = T.StructType([
    T.StructField("pseudo_key", T.StringType()),
    T.StructField("entity_group", T.StringType()),
    T.StructField("surface", T.StringType()),
    T.StructField("n_mentions_at_first_emit", T.LongType()),
])
_STATE = T.StructType([
    T.StructField("emitted", T.BooleanType()),
    T.StructField("n_mentions", T.LongType()),
])


def _register(key: Tuple[str],
              pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    emitted, n = state.get if state.exists else (False, 0)
    first_row = None
    for pdf in pdfs:
        n += len(pdf)
        if first_row is None and len(pdf):
            first_row = pdf.iloc[0]
    state.update((True, n))
    if not emitted and first_row is not None:
        yield pd.DataFrame({
            "pseudo_key": [key[0]],
            "entity_group": [first_row["entity_group"]],
            "surface": [first_row["surface"]],
            "n_mentions_at_first_emit": [n],
        })


def entity_registry_stream(mentions_stream: DataFrame) -> DataFrame:
    """mentions stream -> first-sighting-only entity registry stream.

    Exactly-once emission per pseudo_key across ALL micro-batches."""
    return (mentions_stream
            .groupBy("pseudo_key")
            .applyInPandasWithState(
                _register,
                outputStructType=REGISTRY_OUTPUT,
                stateStructType=_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
