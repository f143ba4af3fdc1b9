"""Checkpoint/resume: byte-equal outputs after kill/resume at stage
boundaries (BASELINE.md resumability gate)."""

import json
import os
import shutil

import pytest

from redactify_spark.plans import checkpoint as CP
from redactify_spark.sources.pages import synth_pages


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "ckpt")


def table_set(df, cols=None):
    cols = cols or df.columns
    return {tuple(str(v) for v in r) for r in df.select(*cols).collect()}


def test_run_stage_writes_manifest(spark, root):
    df = CP.run_stage(spark, root, "s1",
                      lambda: spark.range(100).withColumnRenamed("id", "x"))
    assert df.count() == 100
    m = CP.read_manifest(root, "s1")
    assert m["status"] == "complete" and m["row_count"] == 100
    assert m["content_hash"] != 0
    assert sum(m["partitions"].values()) == 100


def test_resume_skips_builder(spark, root):
    calls = []

    def builder():
        calls.append(1)
        return spark.range(10).withColumnRenamed("id", "x")

    CP.run_stage(spark, root, "s1", builder)
    CP.run_stage(spark, root, "s1", builder)
    assert len(calls) == 1  # second run resumed from checkpoint


def test_invalidate_forces_recompute(spark, root):
    calls = []

    def builder():
        calls.append(1)
        return spark.range(10).withColumnRenamed("id", "x")

    CP.run_stage(spark, root, "s1", builder)
    CP.invalidate(root, "s1")
    CP.run_stage(spark, root, "s1", builder)
    assert len(calls) == 2


def test_kill_resume_equivalence(spark, root):
    """Run the full pipeline; then simulate a crash after stage 2 (wipe
    stages 3+), resume, and require identical final tables."""
    pages = synth_pages(spark, 48, partitions=4).localCheckpoint()

    full = CP.kg_pipeline(spark, pages, root, id_col="url")
    nodes_before = table_set(full["nodes"])
    edges_before = table_set(full["edges"])
    h_nodes = CP.content_hash(full["nodes"])

    salience_before = table_set(full["salience"])

    # crash after 02_triples: drop downstream checkpoints
    for stage in ("03_match_edges", "04_canonical", "04b_canon_mentions",
                  "05_nodes", "06_edges", "07_salience"):
        CP.invalidate(root, stage)

    resumed = CP.kg_pipeline(spark, pages, root, id_col="url")
    assert table_set(resumed["nodes"]) == nodes_before
    assert table_set(resumed["edges"]) == edges_before
    assert table_set(resumed["salience"]) == salience_before
    assert CP.content_hash(resumed["nodes"]) == h_nodes

    # manifests intact for all stages
    for stage in ("01_mentions", "02_triples", "03_match_edges",
                  "04_canonical", "04b_canon_mentions", "05_nodes",
                  "06_edges", "07_salience"):
        assert CP.stage_complete(root, stage)

    # salience semantics: co-mentioned entities rise above the PageRank
    # base term; never-co-mentioned nodes sit exactly at it
    sal = {r.canon_id: r.salience for r in resumed["salience"].collect()}
    edge_nodes = {r.src for r in resumed["edges"].collect()} | \
                 {r.dst for r in resumed["edges"].collect()}
    assert sal, "salience table empty"
    for cid, s in sal.items():
        if cid not in edge_nodes:
            assert s == 0.15


def test_content_hash_partition_invariant(spark):
    df = spark.range(1000).withColumnRenamed("id", "x")
    assert CP.content_hash(df.repartition(2)) == \
        CP.content_hash(df.repartition(16))


def test_pipeline_report_covers_all_stages(spark, root):
    pages = synth_pages(spark, 24, partitions=2).localCheckpoint()
    CP.kg_pipeline(spark, pages, root, id_col="url")
    rep = CP.pipeline_report(spark, root)
    stages = {r.stage for r in rep.collect()}
    assert {"01_mentions", "02_triples", "03_match_edges", "04_canonical",
            "04b_canon_mentions", "05_nodes", "06_edges",
            "07_salience"} <= stages
    rows = rep.collect()
    assert all(r.row_count >= 0 and r.wall_time_sec > 0
               and r.n_partitions >= 1 for r in rows)


def test_audit_pipeline_tool(spark, tmp_path):
    """The audit CLI verifies intact stages and flags a tampered one."""
    import json
    import os
    import subprocess
    import sys

    from redactify_spark.plans import checkpoint as CP

    root = str(tmp_path / "audit_root")
    CP.run_stage(spark, root, "s1",
                 lambda: spark.range(100).selectExpr("id", "id * 2 AS v"))
    CP.run_stage(spark, root, "s2",
                 lambda: spark.range(10).selectExpr("id"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, f"{repo}/tools/audit_pipeline.py", root,
           "--master", "local[2]"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.count("OK") == 2

    # tamper with a manifest: audit must fail loudly
    mp = os.path.join(root, "s2", "_manifest.json")
    m = json.load(open(mp))
    m["row_count"] += 1
    json.dump(m, open(mp, "w"))
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert r2.returncode == 1
    assert "FAIL  s2" in r2.stdout and "OK    s1" in r2.stdout


def test_audit_lineage_keys_match_manifest_on_partitioned_layout(
        spark, tmp_path):
    """ADVICE r4: stage_manifest_stats / partition_counts must key
    per-file lineage by the same RELATIVE path as the manifest's footer
    counts, so a partitionBy (subdir) layout with colliding part-00000
    basenames stays comparable file-by-file."""
    from redactify_spark.plans import checkpoint as CP

    path = str(tmp_path / "ptable")
    (spark.range(200)
     .selectExpr("id", "id % 3 AS part")
     .repartition(1)
     .write.partitionBy("part").parquet(path))

    footer = CP._parquet_footer_counts(path)
    stats = CP.stage_manifest_stats(spark, path)
    counts = CP.partition_counts(spark, path)
    # three subdirs, one file each -> basenames WOULD collide; relative
    # keys must not
    assert len(footer) == 3
    assert set(stats["partitions"]) == set(footer)
    assert counts == footer
    assert stats["partitions"] == footer
    assert stats["row_count"] == 200
