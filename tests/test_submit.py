"""spark-submit --py-files deployment smoke (the north-rule run mode)."""

import json
import os
import shutil
import subprocess
import sys


def test_spark_submit_pyfiles(tmp_path):
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    assert os.path.exists(spark_submit), "spark-submit not found"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = str(tmp_path / "redactify_spark.zip")
    subprocess.run([sys.executable, f"{repo}/tools/make_pyfiles_zip.py",
                    zip_path], check=True, capture_output=True)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source
    out_dir = str(tmp_path / "kg_out")
    wh = str(tmp_path / "warehouse")
    r = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zip_path,
         f"{repo}/tools/submit_job.py", "--synth", "60",
         "--output", out_dir, "--bucketed-warehouse", wh],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=420)
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["n_pages"] == 60
    assert summary["n_triples"] > 0 and summary["n_nodes"] > 0
    assert os.path.exists(f"{out_dir}/nodes")
    assert summary["bucketed_tables"] == ["kg_nodes", "kg_salience"]

    # SECOND process: read the CLI-written production tables back.  The
    # canon_id equi-join of the two same-bucketed tables must plan with
    # NO Exchange (the shuffle was paid at write time), and a pred
    # filter on the partitioned triples table must prune at the scan
    # (PartitionFilters) -- the Iceberg storage-partitioned-join shape,
    # exercised end to end through spark-submit.
    verifier = f"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
spark = (SparkSession.builder.master("local[2]").appName("kg-read")
         .config("spark.sql.warehouse.dir", {wh!r} + "/wh")
         .config("spark.hadoop.javax.jdo.option.ConnectionURL",
                 "jdbc:derby:;databaseName=" + {wh!r} + "/metastore_db;create=true")
         .enableHiveSupport().getOrCreate())
from redactify_spark.operators.bucketing import bucketed_join, plan_has_exchange
j = bucketed_join(spark, "kg_nodes", "kg_salience", "canon_id")
tri = spark.read.parquet({out_dir!r} + "/triples_by_pred")
pred = tri.select("pred").first()[0]
filtered = tri.where(F.col("pred") == pred)
import contextlib, io
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    filtered.explain("formatted")
plan = buf.getvalue()
print(json.dumps({{
    "join_rows": j.count(),
    "join_has_exchange": plan_has_exchange(j),
    "partition_filter_pushed": "PartitionFilters: [isnotnull(pred" in plan,
    "filtered_rows": filtered.count(),
}}))
spark.stop()
"""
    env2 = dict(os.environ)
    r2 = subprocess.run([sys.executable, "-c", verifier],
                        capture_output=True, text=True, env=env2,
                        cwd=str(tmp_path), timeout=240)
    assert r2.returncode == 0, r2.stderr[-3000:]
    check = json.loads(r2.stdout.strip().splitlines()[-1])
    assert check["join_rows"] == summary["n_nodes"]
    assert check["join_has_exchange"] is False, check
    assert check["partition_filter_pushed"] is True, check
    assert 0 < check["filtered_rows"] < summary["n_triples"]


def test_spark_submit_archives_model_env(tmp_path):
    """Weights-distribution dry run (r3 #6): the model env ships via
    spark-submit --archives env.tar.gz#environment; every python worker
    resolves it through SparkFiles, imports transformers from the
    archive (the interpreter itself has none -- proven by the negative
    control), and the kernel's lazy loader warms once per worker with a
    recorded load_sec.  Swap the stub archive for a conda-pack of the
    real env and this is the production rollout (OPERATIONS.md)."""
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = str(tmp_path / "redactify_spark.zip")
    subprocess.run([sys.executable, f"{repo}/tools/make_pyfiles_zip.py",
                    zip_path], check=True, capture_output=True)
    arch = str(tmp_path / "ner_env_stub.tar.gz")
    subprocess.run([sys.executable, f"{repo}/tools/make_env_archive.py",
                    arch], check=True, capture_output=True)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)

    def run(extra):
        out_dir = str(tmp_path / f"kg_out_{len(extra)}")
        r = subprocess.run(
            [spark_submit, "--master", "local[2]", "--py-files", zip_path,
             *extra, f"{repo}/tools/submit_job.py", "--synth", "12",
             "--warmup", "2", "--output", out_dir],
            capture_output=True, text=True, env=env, cwd=str(tmp_path),
            timeout=420)
        assert r.returncode == 0, r.stderr[-3000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    # with the archive: stub transformers found + backend warmed
    s = run(["--archives", f"{arch}#environment"])
    warm = s["warmup"]
    assert len(warm) == 2
    for w in warm:
        assert w["archive_found"] is True
        assert w["transformers_version"] == "0.0-stub"
        assert w["backend_loaded"] is True
        assert w["load_sec"] >= 0.0
        assert w["error"] is None
    assert s["n_triples"] > 0

    # negative control, no archive: import fails, gazetteer stays active
    s2 = run([])
    for w in s2["warmup"]:
        assert w["archive_found"] is False
        assert w["transformers_version"] is None
        assert w["backend_loaded"] is False
        # ADVICE r4: the failure is diagnosable from the probe row
        assert w["error"] and "transformers" in w["error"]
