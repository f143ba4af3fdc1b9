"""Build the model-environment archive for spark-submit --archives
(VERDICT r3 #6: the weights-distribution dry run).

On a real cluster the archive is the conda-packed inference env::

    conda create -n ner python=3.11 transformers torch
    conda pack -n ner -o ner_env.tar.gz
    spark-submit --archives ner_env.tar.gz#environment ...

This sandbox has no network, so the archive built here contains a
DETERMINISTIC transformers stub with the same import surface the
kernel's three loaders use (`from transformers import pipeline`) -- the
zip+extract+sys.path wiring, per-worker lazy load, and warmup timing
hooks are all REAL and exercised end to end through spark-submit; only
the model weights are fake.  Swapping this archive for the conda-pack
one is the entire difference on a cluster.
"""

from __future__ import annotations

import os
import sys
import tarfile
import tempfile

STUB_INIT = '''\
"""Deterministic stand-in for the HuggingFace transformers package,
shipped to executors via spark-submit --archives (see
tools/make_env_archive.py).  Import surface matches what
redactify_spark.detect.kernel's loaders use: `pipeline(task, model=...,
aggregation_strategy=..., device=...)` returning a callable that maps
str -> list[span dict] and list[str] -> list[list[span dict]]."""

import re

__version__ = "0.0-stub"
STUB = True

_NAME_RE = re.compile(r"\\b[A-Z][a-z]+ [A-Z][a-z]+\\b")


class _StubPipeline:
    def __init__(self, task, model):
        self.task = task
        self.model = model

    def _one(self, text):
        return [{
            "entity_group": "PER",
            "start": m.start(), "end": m.end(),
            "score": 0.61803,
            "word": m.group(0),
        } for m in _NAME_RE.finditer(text or "")]

    def __call__(self, inputs, batch_size=None, **kw):
        if isinstance(inputs, str):
            return self._one(inputs)
        return [self._one(t) for t in inputs]


def pipeline(task, model=None, aggregation_strategy=None, device=None,
             **kw):
    return _StubPipeline(task, model)
'''


def make_archive(out_path: str) -> str:
    tmp = tempfile.mkdtemp(prefix="env_archive_")
    pkg = os.path.join(tmp, "transformers")
    os.makedirs(pkg, exist_ok=True)
    with open(os.path.join(pkg, "__init__.py"), "w") as f:
        f.write(STUB_INIT)
    with tarfile.open(out_path, "w:gz") as tar:
        # archive ROOT holds the package: extracted at <dest>/transformers
        tar.add(pkg, arcname="transformers")
    return out_path


if __name__ == "__main__":
    print(make_archive(sys.argv[1] if len(sys.argv) > 1
                       else "/tmp/ner_env_stub.tar.gz"))
