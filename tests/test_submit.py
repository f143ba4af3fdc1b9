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
    r = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", zip_path,
         f"{repo}/tools/submit_job.py", "--synth", "60",
         "--output", out_dir],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=420)
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["n_pages"] == 60
    assert summary["n_triples"] > 0 and summary["n_nodes"] > 0
    assert os.path.exists(f"{out_dir}/nodes")
