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

from query import add_query_flags, build_pipeline, query_kwargs_from_args  # noqa: E402


def make_generator(args):
    if getattr(args, "generator", None) == "extractive":
        from domain_rag_system_tpu.generation import ExtractiveGenerator

        return ExtractiveGenerator()
    if args.use_llm:
        return AnswerGenerator(
            model_type=args.model_type,
            model_name=args.model_name,
            api_key=args.api_key,
            temperature=args.temperature,
            max_tokens=args.max_tokens,
            **args.generator_kwargs,
        )
    return TemplateGenerator()


def run_answer_evaluation(args) -> None:
    """retrieve → generate → answer-aware metrics over a query set
    (reference flow: ``evaluation/evaluator.py:24-144``), written as one
    committed artifact."""
    from domain_rag_system_tpu.config import RetrievalConfig
    from domain_rag_system_tpu.evaluation.evaluator import evaluate_answers
    from domain_rag_system_tpu.evaluation.runners import load_queries
    from domain_rag_system_tpu.serving import build_pipeline as build_serving

    cfg = getattr(RetrievalConfig, getattr(args, "profile", None) or "tuned")()
    pipeline, info = build_serving(
        cfg, corpus_kwargs={"pubmed_path": args.eval_corpus})
    queries = load_queries(args.evaluate)
    generator = make_generator(args)

    answers, retrieved_texts = {}, {}
    kwargs = cfg.query_kwargs()
    t0 = time.time()
    for start in range(0, len(queries), cfg.batch_size):
        batch = queries[start:start + cfg.batch_size]
        outs = pipeline.query_batch([q["body"] for q in batch], **kwargs)
        for q, out in zip(batch, outs):
            gen = generator.generate(q["body"], out["results"],
                                     structured=out.get("structured"),
                                     question_type=q.get("type", "summary"))
            answers[q["id"]] = gen["answer"]
            retrieved_texts[q["id"]] = [r["text"] for r in out["results"]]
    elapsed = time.time() - t0

    summary = evaluate_answers(queries, answers, retrieved_texts)
    summary["generator"] = type(generator).__name__
    summary["retrieval_config"] = info["config"]
    summary["n_queries"] = len(queries)
    summary["wall_time_s"] = round(elapsed, 2)
    out = Path(args.eval_output)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=1, ensure_ascii=False)
    print(f"answer evaluation -> {out}")
    for t, m in summary["by_type"].items():
        line = " ".join(f"{k}={v:.3f}" for k, v in sorted(m.items())
                        if isinstance(v, float))
        print(f"  {t}: {line}")
    if "support_coverage" in summary:
        print(f"  support_coverage={summary['support_coverage']:.3f}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--query", default=None)
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
    ap.add_argument("--generator", default=None,
                    choices=["template", "extractive"],
                    help="LLM-free generator kind (default: template)")
    ap.add_argument("--evaluate", default=None, metavar="QUERIES_JSON",
                    help="run retrieve->generate->answer-metrics over a "
                         "query set instead of a single --query")
    ap.add_argument("--eval_corpus",
                    default="data/recovered/BioASQ/corpus_subset.json")
    ap.add_argument("--eval_output", default="results/answer_eval.json")
    ap.add_argument("--profile", default=None,
                    choices=["tuned", "quality_small", "tuned_at_scale",
                             "quality_at_scale", "quality_max_at_scale"],
                    help="retrieval operating point for --evaluate "
                         "(default: tuned)")
    args = ap.parse_args()

    if args.evaluate:
        run_answer_evaluation(args)
        return
    if not args.query:
        ap.error("--query or --evaluate is required")

    pipeline = build_pipeline(args)
    t0 = time.time()
    retrieval = pipeline.query(
        args.query, filters=args.filters, **query_kwargs_from_args(args))

    generator = make_generator(args)
    answer = generator.generate(args.query, retrieval["results"],
                                structured=retrieval.get("structured"))
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
