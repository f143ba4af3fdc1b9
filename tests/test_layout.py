"""Z-order clustering: Morton key correctness + measured pruning gain."""

import pytest
from pyspark.sql import functions as F

from redactify_spark.operators import layout as L


def _morton_py(xs, bits, n):
    key = 0
    for i, q in enumerate(xs):
        for b in range(bits):
            key |= ((q >> b) & 1) << (b * n + i)
    return key


def test_zorder_key_matches_python_reference(spark):
    rows = [(i, float(i % 16), float((i * 7) % 16)) for i in range(64)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {r.id: r.k for r in df.select(
        "id", L.zorder_key_expr([F.col("x"), F.col("y")],
                                [(0.0, 15.0), (0.0, 15.0)],
                                bits=4).alias("k")).collect()}
    for i, x, y in rows:
        assert got[i] == _morton_py([int(x), int(y)], 4, 2), (i, x, y)


def test_zorder_key_bit_budget_guard(spark):
    with pytest.raises(ValueError, match="long range"):
        L.zorder_key_expr([F.lit(1)] * 8, [(0, 1)] * 8, bits=8)


def test_zorder_pruning_beats_linear_sort(spark, tmp_path):
    """Box query on (x, y): z-order layout lets footer stats skip most
    files on BOTH dimensions; x-sorted layout prunes only on x."""
    n = 20000
    df = (spark.range(n)
          .select("id",
                  (F.pmod(F.xxhash64("id"), 1000) / 10.0).alias("x"),
                  (F.pmod(F.xxhash64("id", F.lit(1)), 1000) / 10.0)
                  .alias("y")))
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    # "fixed" partitioner: deterministic file layout (no range-boundary
    # sampling), so the pruning fractions below are stable regardless of
    # shared-session shuffle/partition state (r4 flake fix).
    L.zorder_write(df, zpath, ["x", "y"], bits=10, n_files=16,
                   partitioner="fixed")
    # linear baseline == 1-d z-order (quantized sort on x), same writer
    L.zorder_write(df, lpath, ["x"], bits=10, n_files=16,
                   partitioner="fixed")

    # layout must not change content
    assert (spark.read.parquet(zpath).count()
            == spark.read.parquet(lpath).count() == n)

    box = {"x": (10.0, 20.0), "y": (10.0, 20.0)}     # ~1% of the space
    z_pruned = L.files_pruned_fraction(zpath, box)
    l_pruned = L.files_pruned_fraction(lpath, box)
    # linear sort prunes on x only (~9/10 of files); z-order prunes on
    # both axes and must beat it
    assert z_pruned > l_pruned, (z_pruned, l_pruned)
    assert z_pruned >= 0.75, z_pruned

    # query on the OFF-sort dimension alone: linear layout prunes ~nothing
    ybox = {"y": (10.0, 20.0)}
    assert L.files_pruned_fraction(lpath, ybox) <= 0.2
    assert L.files_pruned_fraction(zpath, ybox) \
        > L.files_pruned_fraction(lpath, ybox)
