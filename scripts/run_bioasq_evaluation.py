#!/usr/bin/env python
"""Thin BioASQ evaluation wrapper (parity with the reference's
``evaluation/run_bioasq_evaluation.py:16-51``): defaults top_k=10,
fusion=rrf, reranker=simple, rerank_top_n=50."""

import subprocess
import sys
from pathlib import Path

if __name__ == "__main__":
    script = Path(__file__).resolve().parent / "evaluate.py"
    sys.exit(subprocess.call(
        [sys.executable, str(script), "--datasets", "bioasq",
         "--fusion_method", "rrf", "--reranker", "simple",
         "--rerank_top_n", "50", *sys.argv[1:]]))
