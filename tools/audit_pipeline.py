"""Audit a pipeline checkpoint root: recompute every stage's row count
and content hash FROM STORAGE and compare against its manifest (the
integrity check from OPERATIONS.md §5).

Usage:
    python tools/audit_pipeline.py <checkpoint_root> [--master local[8]]

Exit code 0 when every complete stage verifies; 1 on any mismatch or
unreadable stage.  Prints one line per stage:

    OK    01_mentions   rows=290000  hash=695340896204120977
    FAIL  02_triples    manifest rows=467140 != storage rows=467139
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from redactify_spark.plans.checkpoint import stage_manifest_stats
    from redactify_spark.plans.session import build_session

    spark = build_session("audit", master=args.master)
    failures = 0
    manifests = sorted(glob.glob(
        os.path.join(args.root, "**", "_manifest.json"), recursive=True))
    if not manifests:
        print(f"no stage manifests under {args.root}")
        return 1
    for mp in manifests:
        stage_dir = os.path.dirname(mp)
        rel = os.path.relpath(stage_dir, args.root)
        with open(mp) as f:
            m = json.load(f)
        if m.get("status") != "complete":
            print(f"SKIP  {rel}  status={m.get('status')!r}")
            continue
        try:
            s = stage_manifest_stats(spark, os.path.join(stage_dir, "data"))
        except Exception as ex:  # unreadable table IS an audit failure
            print(f"FAIL  {rel}  unreadable: {type(ex).__name__}: {ex}")
            failures += 1
            continue
        problems = []
        if s["row_count"] != m.get("row_count"):
            problems.append(f"manifest rows={m.get('row_count')} "
                            f"!= storage rows={s['row_count']}")
        if s["content_hash"] != m.get("content_hash"):
            problems.append(f"manifest hash={m.get('content_hash')} "
                            f"!= storage hash={s['content_hash']}")
        if problems:
            print(f"FAIL  {rel}  " + "; ".join(problems))
            failures += 1
        else:
            print(f"OK    {rel}  rows={s['row_count']}  "
                  f"hash={s['content_hash']}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
