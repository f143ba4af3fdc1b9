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
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    builder = SparkSession.builder.appName("redactify-kg")
    if args.master:
        builder = builder.master(args.master)
    spark = (builder
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())

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
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
