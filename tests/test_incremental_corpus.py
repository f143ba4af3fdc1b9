"""Incremental corpus dedup: tranche-by-tranche == one-shot (byte-equal
kept set), including the rejected-doc chain case."""

import pytest
from pyspark.sql import functions as F

from redactify_spark.operators import dedup as D
from redactify_spark.plans import incremental_corpus as IC


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "inc_corpus")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy dog near the river bank"
OTHER = "completely different content about spark joins and shuffle plans"


def test_incremental_equals_oneshot(spark, root):
    t1 = [(0, BASE), (1, OTHER)]
    t2 = [(10, BASE),                                   # dup of 0
          (11, BASE.replace("lazy", "sleepy")),         # near-dup of 0
          (12, "der hund und die katze sind in der stadt heute")]
    t3 = [(20, OTHER), (21, BASE),                      # dups of 1, 0
          (22, "le chat et le chien sont dans la ville aujourd hui")]

    tranches = [("t1", t1), ("t2", t2), ("t3", t3)]
    seen = []
    for tid, rows in tranches:
        seen += rows
        all_docs = _docs(spark, seen)
        IC.dedup_tranche(spark, root, tid, _docs(spark, rows), all_docs,
                         threshold=0.5)
    kept_inc = {r.doc_id
                for r in IC.current_kept(spark, root,
                                         _docs(spark, seen)).collect()}
    kept_oneshot = {r.doc_id
                    for r in D.dedup_minhash(_docs(spark, seen),
                                             threshold=0.5).collect()}
    assert kept_inc == kept_oneshot
    assert 0 in kept_inc and 10 not in kept_inc and 21 not in kept_inc


def test_incremental_rejected_chain_case(spark, root):
    """A doc similar only to a previously-REJECTED doc still drops
    (its edge reaches the rejected doc's cluster) -- the case that
    breaks compare-against-accepted-only schemes."""
    # 0 and 1: near-dups (1 rejected). 10: near-dup of 1's variant text,
    # still within threshold of 1 but (by construction) also of 0's
    # cluster via the 1-edge.
    v1 = BASE.replace("lazy", "sleepy")
    v2 = BASE.replace("lazy", "sleepy").replace("quick", "rapid")
    IC.dedup_tranche(spark, root, "t1", _docs(spark, [(0, BASE), (1, v1)]),
                     _docs(spark, [(0, BASE), (1, v1)]), threshold=0.5)
    seen = [(0, BASE), (1, v1), (10, v2)]
    IC.dedup_tranche(spark, root, "t2", _docs(spark, [(10, v2)]),
                     _docs(spark, seen), threshold=0.5)
    kept = {r.doc_id
            for r in IC.current_kept(spark, root,
                                     _docs(spark, seen)).collect()}
    oneshot = {r.doc_id
               for r in D.dedup_minhash(_docs(spark, seen),
                                        threshold=0.5).collect()}
    assert kept == oneshot == {0}


def test_incremental_tranches_resume_from_manifests(spark, root):
    """Re-running a tranche is a manifest no-op (detection-of-dups never
    repeats); a NEW tranche only bands its own docs."""
    t1 = _docs(spark, [(0, BASE), (1, OTHER)])
    IC.dedup_tranche(spark, root, "t1", t1, t1, threshold=0.5)
    from redactify_spark.plans import checkpoint as CP
    import os
    m1 = CP.read_manifest(os.path.join(root, "tranches", "t1"), "bands")
    IC.dedup_tranche(spark, root, "t1", t1, t1, threshold=0.5)  # resume
    m2 = CP.read_manifest(os.path.join(root, "tranches", "t1"), "bands")
    assert m1 == m2
