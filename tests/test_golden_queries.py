"""Exact-golden gates for every remaining rows-only driver query.

These pipeline queries run Python-kernel stages (detection, MinHash
banding, SimHash hashing, linking, components) that no ANSI-SQL oracle
can mirror, so the driver records them rows-only.  Here each one is
pinned VALUE-exactly at sf0.001: md5 of the column-name-sorted,
row-sorted stringified table.  Partition-invariance was verified by
regenerating at a different master/shuffle-partition config before
pinning.

If a kernel/operator change moves a hash, verify the new output against
the reference semantics by hand, then regenerate (see the generator
snippet in the git history of this file).
"""

import hashlib

import pytest

GOLDEN = {
    "q30_detect_mentions": ("b96d602d35603aef758660f34b35b585", 9),
    "q31_triples": ("6d58f9e949feefdda2d3ce97951dcbc0", 9),
    "q33_link_edges": ("4c8ae2c7633dd55f11a3713c86947d17", 37),
    "q34_components": ("bc7cefdcbcd7e4566309babf51d67fa3", 50),
    "q35_graph_nodes": ("8575ce00485f3564ccc01a51a7d01fae", 50),
    "q36_minhash_dedup": ("9f012236c53c95b667844384c52f4833", 28),
    "q37_simhash_pairs": ("6a9baae649b9200db6a6ff724f33eebe", 488),
    "q68_kcore": ("4c0f46dff50aa24fcf720a1b00a843ca", 193),
    "q73_mention_contexts": ("514456e4f89696ee3c4fa6d8bfa7d3a8", 2176),
    "q105_bpe_chunks": ("dd6aec3cac58098a5f4f90c8c39e1845", 1011),
}


def table_md5(df):
    cols = sorted(df.columns)
    rows = sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())
    return hashlib.md5(repr(rows).encode()).hexdigest(), len(rows)


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_rows_only_query_golden(spark, name):
    import __spark_entry__ as entry
    df = entry.queries()[name](spark, "/root/testdata/sf0.001")
    assert table_md5(df) == GOLDEN[name], name
