"""Comprehensive evaluation report: JSON + Markdown + baseline deltas.

Parity with the reference's ``generate_report`` flow
(``evaluation/comprehensive_evaluation.py:1147-1245`` and the markdown
writer at ``:1247-1624``): aggregate the per-dataset results, compare
against the reference's stored baseline artifacts (FAISS for
BioASQ/OpenFDA, Qdrant for Kaggle), and emit
``comprehensive_evaluation.json`` + ``comprehensive_evaluation_report.md``.

Also reproduces the reference's resume behavior: existing per-dataset result
files are reused instead of recomputed (``:758-770``).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, List, Optional

from domain_rag_system_tpu.evaluation.metrics import mean_metrics
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)

REFERENCE_RESULTS = Path("/root/reference/results")

#: Reference baseline artifacts per dataset (see BASELINE.md).
_BASELINE_FILES = {
    "bioasq": "bioasq_faiss_test_results.json",
    "openfda": "openfda_faiss_test_results.json",
    "kaggle": "qdrant_test_results.json",
}


def baseline_overall(dataset: str, reference_results: Path = REFERENCE_RESULTS) -> Optional[Dict]:
    """Mean metrics of the stored reference baseline for ``dataset``."""
    fname = _BASELINE_FILES.get(dataset)
    if not fname:
        return None
    path = reference_results / fname
    if not path.exists():
        return None
    with open(path, "r", encoding="utf-8") as f:
        data = json.load(f)
    if dataset == "kaggle":
        overall = dict(data.get("overall", {}))
        overall["avg_query_time"] = (
            sum(q.get("query_time", 0.0) for q in data.get("per_query", []))
            / max(len(data.get("per_query", [])), 1)
        )
        return overall
    per_query = [q["metrics"] for q in data.values() if isinstance(q, dict) and "metrics" in q]
    overall = mean_metrics(per_query)
    times = [q.get("query_time") for q in data.values()
             if isinstance(q, dict) and q.get("query_time") is not None]
    if times:
        overall["avg_query_time"] = sum(times) / len(times)
    return overall


def compare_with_baseline(ours: Dict, baseline: Optional[Dict]) -> Dict:
    if not baseline:
        return {"available": False}
    deltas = {}
    for key in ("precision", "recall", "f1", "mrr", "hit@k", "avg_query_time"):
        if key in ours and key in baseline:
            deltas[key] = {
                "ours": ours[key],
                "baseline": baseline[key],
                "delta": ours[key] - baseline[key],
            }
    if "avg_query_time" in ours and baseline.get("avg_query_time"):
        deltas["speedup"] = baseline["avg_query_time"] / max(ours["avg_query_time"], 1e-9)
    return {"available": True, "metrics": deltas}


#: Same-corpus, same-hardware dense-only control artifacts per dataset
#: (produced by ``baselines/jax_flat_baseline.py`` on the recovered
#: corpora). Unlike the reference baselines (different corpus snapshots,
#: different hardware), these rows are directly comparable.
CONTROL_CSVS = {
    "bioasq": "jax_flat_baseline_summary.csv",
    "openfda": "openfda_control_summary.csv",
    "kaggle": "kaggle_control_summary.csv",
}


def control_overall(dataset: str, results_dir) -> Optional[Dict]:
    """The "overall" row of the dataset's same-corpus control CSV."""
    name = CONTROL_CSVS.get(dataset)
    if not name:
        return None
    path = Path(results_dir) / name
    if not path.exists():
        return None
    import csv

    with open(path, newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f):
            if row.get("group") == "overall":
                return {k: float(v) for k, v in row.items()
                        if k not in ("group",) and v not in ("", None)}
    return None


def generate_report(
    dataset_results: Dict[str, Dict],
    output_dir,
    reference_results: Path = REFERENCE_RESULTS,
    environment: Optional[Dict] = None,
) -> Dict:
    """Aggregate per-dataset results into the comprehensive report files."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    report: Dict = {
        "evaluation_summary": {
            "date": time.strftime("%Y-%m-%d %H:%M:%S"),
            "datasets": sorted(dataset_results),
            "environment": environment or {},
        },
        "baseline_comparison": {},
    }
    for name, results in dataset_results.items():
        report[name] = {
            "dataset": results.get("dataset", name),
            "config": results.get("config", {}),
            "overall": results["overall"],
            "by_type": results.get("by_type", {}),
        }
        if results.get("cached"):
            # Section reused from an earlier run's file — possibly a
            # different config/checkpoint than this report's environment
            # block (scripts/evaluate.py reuse paths set the marker).
            report[name]["cached"] = True
            report[name]["cached_from"] = results.get("cached_from", "")
        report["baseline_comparison"][name] = compare_with_baseline(
            results["overall"], baseline_overall(name, reference_results)
        )
        control = control_overall(name, out)
        if control:
            report[name]["same_corpus_control"] = control

    # Held-out tuning protocol (scripts/cv_tune.py): when a CV artifact
    # exists, surface its out-of-fold numbers next to the in-sample ones —
    # the honest estimate for "tuned system on unseen queries".
    for cv_name, key in (("cv_tune.json", "out_of_fold"),
                         ("cv_tune_at_scale.json", "out_of_fold_at_scale")):
        cv_path = out / cv_name
        if cv_path.exists():
            with open(cv_path, encoding="utf-8") as f:
                cv = json.load(f)
            report.setdefault("bioasq", {})[key] = {
                **cv.get("out_of_fold", {}),
                "protocol": cv.get("metric_protocol", {}),
                "n_chunks": cv.get("n_chunks"),
            }

    json_path = out / "comprehensive_evaluation.json"
    with open(json_path, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2, ensure_ascii=False)

    md_path = out / "comprehensive_evaluation_report.md"
    md_path.write_text(render_markdown(report), encoding="utf-8")
    log.info("wrote %s and %s", json_path, md_path)
    return report


def _fmt(value) -> str:
    if isinstance(value, float):
        return f"{value:.4f}"
    return str(value)


def render_markdown(report: Dict) -> str:
    lines: List[str] = [
        "# Comprehensive Evaluation Report",
        "",
        f"Date: {report['evaluation_summary']['date']}",
        f"Datasets: {', '.join(report['evaluation_summary']['datasets'])}",
    ]
    env = report["evaluation_summary"].get("environment") or {}
    if env:
        lines.append("Environment: " + ", ".join(f"{k}={v}" for k, v in env.items()))
    lines.append("")

    for name in report["evaluation_summary"]["datasets"]:
        section = report.get(name)
        if not section:
            continue
        overall = section["overall"]
        lines += [f"## {section['dataset']}", ""]
        cfg = section.get("config", {})
        if cfg:
            lines += ["Config: " + ", ".join(f"{k}={v}" for k, v in cfg.items()), ""]
        lines += ["| metric | value |", "|---|---|"]
        for key in sorted(overall):
            lines.append(f"| {key} | {_fmt(overall[key])} |")
        lines.append("")

        if section.get("by_type"):
            lines += ["### By question type", ""]
            metric_keys = ["precision", "recall", "f1", "mrr", "recall@5", "ndcg@10"]
            lines.append("| type | n | " + " | ".join(metric_keys) + " |")
            lines.append("|---" * (len(metric_keys) + 2) + "|")
            for qtype, agg in section["by_type"].items():
                row = [qtype, str(agg.get("total_queries", ""))]
                row += [_fmt(agg.get(m, "")) for m in metric_keys]
                lines.append("| " + " | ".join(row) + " |")
            lines.append("")

        control = report[name].get("same_corpus_control")
        if control:
            lines += ["### vs same-corpus dense control "
                      "(`baselines/jax_flat_baseline.py`, same hardware)", "",
                      "| metric | ours | control | delta |", "|---|---|---|---|"]
            ours = report[name]["overall"]
            for key in ("precision", "recall", "f1", "mrr", "hit@1",
                        "recall@5", "ndcg@10"):
                if key in ours and key in control:
                    lines.append(
                        f"| {key} | {_fmt(ours[key])} | {_fmt(control[key])} "
                        f"| {ours[key] - control[key]:+.4f} |")
            lines.append("")

        cmp_section = report["baseline_comparison"].get(name, {})
        if cmp_section.get("available"):
            lines += ["### vs reference baseline", "",
                      "| metric | ours | baseline | delta |", "|---|---|---|---|"]
            for key, d in cmp_section["metrics"].items():
                if key == "speedup":
                    continue
                lines.append(
                    f"| {key} | {_fmt(d['ours'])} | {_fmt(d['baseline'])} | "
                    f"{d['delta']:+.4f} |"
                )
            if "speedup" in cmp_section["metrics"]:
                lines.append(
                    f"\n**Speedup vs baseline: "
                    f"{cmp_section['metrics']['speedup']:.1f}×**")
            lines.append("")

    lines += [
        "---",
        "",
        "Corpus provenance: evaluation corpora are recovered from reference",
        "artifacts (see `domain_rag_system_tpu/etl/recover.py`); BioASQ covers",
        "~92% of ground-truth docs, so absolute recall is comparable but not",
        "identical to the reference's full-corpus runs.",
        "",
    ]
    return "\n".join(lines)
