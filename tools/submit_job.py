"""KG pipeline job for spark-submit (the production entry point).

Usage (cluster):
  spark-submit --py-files redactify_spark.zip tools/submit_job.py \
      --input db.pages --output /warehouse/kg --checkpoint /warehouse/ckpt

Usage (sandbox smoke, run by tests/test_submit.py):
  spark-submit --master local[4] --py-files /tmp/redactify_spark.zip \
      tools/submit_job.py --synth 100 --output /tmp/kg_out

The job builds the full checkpointed pipeline (mentions -> triples ->
linking -> canonicalization -> nodes/edges) and prints a one-line JSON
summary.  `--py-files` is the only distribution mechanism used: the
script itself imports redactify_spark from the shipped zip.
"""

from __future__ import annotations

import argparse
import json
import sys


def run_model_warmup(spark, n_probes: int, env_subdir: str) -> list[dict]:
    """Per-executor model warmup (VERDICT r3 #6): each python worker
    resolves the --archives env via SparkFiles, puts it on sys.path,
    imports transformers, and runs the kernel's lazy per-worker loader
    exactly once -- the timing hook a real weights rollout needs (cold
    load_sec per worker, then ~0 on the cached second call).  Returns
    one row per probe; distinct pids show how many workers warmed."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("host", T.StringType()),
        T.StructField("pid", T.LongType()),
        T.StructField("archive_found", T.BooleanType()),
        T.StructField("transformers_version", T.StringType()),
        T.StructField("backend_loaded", T.BooleanType()),
        T.StructField("load_sec", T.DoubleType()),
        T.StructField("cached_second_call_sec", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ])

    def warm(batches):
        import os
        import socket
        import sys
        import time

        import pandas as pd
        from pyspark import SparkFiles

        root = os.path.join(SparkFiles.getRootDirectory(), env_subdir)
        found = os.path.isdir(root)
        if found and root not in sys.path:
            sys.path.insert(0, root)
        t0 = time.time()
        err, ver = None, None
        try:
            import transformers
            ver = getattr(transformers, "__version__", "?")
            from redactify_spark.detect import kernel
            ok = bool(kernel.try_load_hf_backend())
            sec = time.time() - t0
            t1 = time.time()
            kernel.try_load_hf_backend()  # warm path: archive
            # resolved + modules imported; weights page-cached
            sec2 = time.time() - t1
        except Exception as e:  # noqa: BLE001 -- a bad archive must
            # produce a diagnosable probe row (backend_loaded=False +
            # error string), not fail the whole warmup job (ADVICE r4)
            ok = False
            sec, sec2 = time.time() - t0, 0.0
            err = f"{type(e).__name__}: {e}"
        for pdf in batches:
            n = len(pdf)
            yield pd.DataFrame({
                "host": [socket.gethostname()] * n,
                "pid": [os.getpid()] * n,
                "archive_found": [found] * n,
                "transformers_version": [ver] * n,
                "backend_loaded": [ok] * n,
                "load_sec": [round(sec, 4)] * n,
                "cached_second_call_sec": [round(sec2, 4)] * n,
                "error": [err] * n,
            })

    rows = (spark.range(n_probes).repartition(n_probes)
            .mapInPandas(warm, schema=schema).collect())
    return [r.asDict() for r in rows]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages table path (url,warc_ts,html,text,lang)")
    ap.add_argument("--synth", type=int, default=0,
                    help="synthesize N pages instead of reading --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--master", default=None)
    ap.add_argument("--dedup-urls", action="store_true",
                    help="canonical-URL recrawl dedup before detection "
                         "(keep newest snapshot per canonical url)")
    ap.add_argument("--bucketed-warehouse", default=None,
                    help="ALSO publish nodes/salience as bucketed managed "
                         "tables (kg_nodes, kg_salience; bucketed by "
                         "canon_id) and triples partitioned by pred, in a "
                         "persistent hive/derby warehouse at this path -- "
                         "the production sink shape: downstream equi-joins "
                         "on canon_id read co-partitioned buckets with no "
                         "Exchange, pred filters prune partitions at the "
                         "scan.  (With an Iceberg runtime this is "
                         "writeTo(...).partitionedBy(bucket(n, col)); see "
                         "sources/io.write_table.)")
    ap.add_argument("--warmup", type=int, default=0,
                    help="N per-worker model-warmup probes before the "
                         "pipeline: each python worker resolves the "
                         "--archives model env (SparkFiles), imports "
                         "transformers, runs the kernel's lazy loader "
                         "ONCE, and reports (host, pid, load_sec) -- "
                         "the weights-distribution dry run (see "
                         "tools/make_env_archive.py + OPERATIONS.md)")
    ap.add_argument("--env-subdir", default="environment",
                    help="the #alias the archive was attached under "
                         "(--archives env.tar.gz#environment)")
    ap.add_argument("--bpe-merges", default=None,
                    help="merges.txt installing a runtime BPE vocabulary "
                         "(e.g. GPT-2's public file) for every BPE-backed "
                         "operator in this job; the driver loads it and "
                         "Spark kernels snapshot it into their closures, "
                         "so plain driver-local paths work -- no --files "
                         "needed.  Default: the vendored deterministic "
                         "trainer (functions/bpe.py)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    builder = SparkSession.builder.appName("redactify-kg")
    if args.master:
        builder = builder.master(args.master)
    builder = (builder
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.sql.execution.arrow.pyspark.enabled", "true"))
    if args.bucketed_warehouse:
        wh = args.bucketed_warehouse.rstrip("/")
        builder = (builder
                   .config("spark.sql.warehouse.dir", f"{wh}/wh")
                   # derby path pinned via the JDO url (settable after the
                   # driver JVM is up, unlike derby.system.home), so a
                   # second process pointing here sees the same catalog
                   .config("spark.hadoop.javax.jdo.option.ConnectionURL",
                           f"jdbc:derby:;databaseName={wh}/metastore_db;"
                           f"create=true")
                   .enableHiveSupport())
    spark = builder.getOrCreate()

    if args.bpe_merges:
        from redactify_spark.functions.bpe import use_merges_file
        n_merges = use_merges_file(args.bpe_merges)
        print(f"bpe: installed {n_merges} merges from {args.bpe_merges}")

    warmup_rows = []
    if args.warmup:
        warmup_rows = run_model_warmup(spark, args.warmup,
                                       args.env_subdir)

    from redactify_spark.plans.checkpoint import kg_pipeline
    from redactify_spark.sources.pages import extract_text_column, synth_pages

    if args.synth:
        pages = synth_pages(spark, args.synth)
    else:
        pages = spark.read.parquet(args.input)
    if args.dedup_urls:
        from redactify_spark.operators.urls import dedup_pages_by_url
        pages = dedup_pages_by_url(pages).drop("canonical_url")
    pages = extract_text_column(pages).localCheckpoint()

    ckpt = args.checkpoint or (args.output.rstrip("/") + "_ckpt")
    out = kg_pipeline(spark, pages, ckpt, id_col="url")
    out["nodes"].write.mode("overwrite").parquet(args.output + "/nodes")
    out["edges"].write.mode("overwrite").parquet(args.output + "/edges")
    out["triples"].write.mode("overwrite").parquet(args.output + "/triples")
    out["salience"].write.mode("overwrite").parquet(
        args.output + "/salience")

    summary = {
        "n_pages": pages.count(),
        "n_mentions": out["mentions"].count(),
        "n_triples": out["triples"].count(),
        "n_nodes": out["nodes"].count(),
        "n_edges": out["edges"].count(),
    }
    if args.bucketed_warehouse:
        from redactify_spark.operators.bucketing import write_bucketed
        from redactify_spark.sources.io import write_table
        write_bucketed(out["nodes"], "kg_nodes", "canon_id", n_buckets=8)
        write_bucketed(out["salience"], "kg_salience", "canon_id",
                       n_buckets=8)
        write_table(out["triples"], args.output + "/triples_by_pred",
                    partition_col="pred")
        summary["bucketed_tables"] = ["kg_nodes", "kg_salience"]
    if warmup_rows:
        summary["warmup"] = warmup_rows
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
