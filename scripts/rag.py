#!/usr/bin/env python
"""Full RAG CLI: retrieval + optional LLM generation.

Flag parity with the reference ``scripts/rag.py`` (``:241-321``): all query
flags plus --use_llm/--model_type/--model_name/--api_key/--temperature/
--max_tokens/--generator_kwargs/--verbose. Without --use_llm the
TemplateGenerator produces an LLM-free answer (reference ``:177-187``).
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from domain_rag_system_tpu.utils.jaxtools import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from domain_rag_system_tpu.generation import AnswerGenerator, TemplateGenerator  # noqa: E402

from query import add_query_flags, build_pipeline  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--query", required=True)
    ap.add_argument("--output", default=None)
    add_query_flags(ap)
    ap.add_argument("--use_llm", action="store_true")
    ap.add_argument("--model_type", default="openai",
                    choices=["openai", "anthropic", "huggingface", "local"])
    ap.add_argument("--model_name", default=None)
    ap.add_argument("--api_key", default=None)
    ap.add_argument("--temperature", type=float, default=0.7)
    ap.add_argument("--max_tokens", type=int, default=500)
    ap.add_argument("--generator_kwargs", type=json.loads, default={})
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    pipeline = build_pipeline(args)
    t0 = time.time()
    retrieval = pipeline.query(
        args.query,
        top_k=args.top_k,
        fusion_method=args.fusion_method,
        vector_weight=args.vector_weight,
        bm25_weight=args.bm25_weight,
        filters=args.filters,
        rerank_top_n=args.rerank_top_n,
    )

    if args.use_llm:
        generator = AnswerGenerator(
            model_type=args.model_type,
            model_name=args.model_name,
            api_key=args.api_key,
            temperature=args.temperature,
            max_tokens=args.max_tokens,
            **args.generator_kwargs,
        )
    else:
        generator = TemplateGenerator()

    answer = generator.generate(args.query, retrieval["results"])
    elapsed = time.time() - t0

    print(f"\nQuery: {args.query}")
    print(f"\nAnswer:\n{answer['answer']}")
    print(f"\nSources: {answer['sources']}")
    print(f"\nTotal time: {elapsed:.2f}s")
    if args.verbose:
        print("\nRetrieved contexts:")
        for i, r in enumerate(retrieval["results"], 1):
            print(f"[{i}] {r['chunk_id']}: {r['text'][:120]}")

    if args.output:
        payload = {
            "query": args.query,
            "retrieval": retrieval,
            "answer": answer,
            "elapsed_s": elapsed,
        }
        with open(args.output, "w", encoding="utf-8") as f:
            json.dump(payload, f, indent=2, ensure_ascii=False)
        print(f"\nSaved to {args.output}")


if __name__ == "__main__":
    main()
