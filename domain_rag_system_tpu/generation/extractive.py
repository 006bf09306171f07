"""LLM-free extractive answer generation.

The reference's only offline generator is ``TemplateGenerator`` — raw
concatenation of three 200-char context previews
(``src/generation/generator.py:259-291``), which scores near zero on
answer-aware metrics. This generator stays fully offline but actually
*answers*: sentences are ranked by idf-weighted query-term overlap, and
question types get dedicated decoding:

  * summary/factoid/list → top-scoring sentences (extractive summary);
  * yesno → polarity vote over negation cues in the best sentences;
  * factoid/list additionally surface matched list items where the
    supporting sentence enumerates candidates.

Pure host-side text work — generation is not a TPU-bound stage here; the
value is a meaningfully scored ``results/answer_eval.json`` without a
network LLM.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from typing import Any, Dict, List

from domain_rag_system_tpu.generation.generator import BaseGenerator
from domain_rag_system_tpu.preprocessing.sentence_split import split_sentences

_WORD = re.compile(r"[A-Za-z][A-Za-z0-9-]+")
_NEGATION = re.compile(
    r"\b(no|not|never|neither|cannot|don't|doesn't|didn't|without|lack(?:s|ing)?|"
    r"absence|absent|fail(?:s|ed)? to|unlikely|insufficient)\b", re.IGNORECASE)

_STOP = set("the a an and or of in on for with to from by is are was were be been "
            "this that it its as at what which who how does do can may".split())


def _tokens(text: str) -> List[str]:
    return [w.lower() for w in _WORD.findall(text) if w.lower() not in _STOP]


class ExtractiveGenerator(BaseGenerator):
    """Query-focused extractive answering over retrieved chunks."""

    def __init__(self, max_sentences: int = 3, max_contexts: int = 10):
        self.max_sentences = max_sentences
        self.max_contexts = max_contexts

    # ------------------------------------------------------------- scoring

    def _ranked_sentences(self, query: str, contexts: List[Dict]):
        """→ [(score, sentence, chunk_id)] best-first."""
        q_terms = set(_tokens(query))
        if not q_terms:
            return []
        sentences = []
        df: Counter = Counter()
        for ctx in contexts[: self.max_contexts]:
            for s in split_sentences(ctx.get("text", "") or ""):
                toks = set(_tokens(s))
                if not toks:
                    continue
                sentences.append((s, toks, ctx.get("chunk_id", "")))
                df.update(toks)
        n = max(len(sentences), 1)
        scored = []
        for s, toks, cid in sentences:
            overlap = q_terms & toks
            if not overlap:
                continue
            score = sum(math.log(1 + n / df[t]) for t in overlap)
            score /= math.sqrt(len(toks))  # dampen long sentences
            scored.append((score, s, cid))
        scored.sort(key=lambda x: -x[0])
        return scored

    # ------------------------------------------------------------ decoding

    def generate(self, query: str, contexts: List[Dict],
                 question_type: str = "summary", structured: Dict = None,
                 **kwargs) -> Dict[str, Any]:
        """``structured`` is the retrieval output's parsed-intent block
        (``RetrievalPipeline`` attaches it when structured parsing fired).
        Option-seeking intent — attribute hard filters or best-rated
        ranking — switches to an OPTIONS answer: the qualifying drugs are
        enumerated by name (with ratings when the ranking was
        rating-ordered), which is the answer the reference's
        attribute-keyed queries actually want (its LLM prompt asks the
        model to synthesize exactly this from the contexts,
        ``src/generation/generator.py:109-149``; offline we read it from
        the retrieved metadata directly)."""
        _ATTR_KEYS = ("pregnancy_category_raw", "rx_otc", "drug_classes",
                      "active_ingredients")
        if structured and contexts and (
                structured.get("rank_by_rating")
                or any(k in (structured.get("hard") or {})
                       for k in _ATTR_KEYS)
                or any(k in (structured.get("soft") or {})
                       for k in ("drug_classes", "active_ingredients"))):
            seen: Dict[str, Dict] = {}
            for ctx in contexts:
                m = ctx.get("metadata", {})
                name = m.get("drug_name") or m.get("generic_name")
                if name and name not in seen:
                    seen[name] = m
            if seen:
                parts = []
                for name, m in seen.items():
                    rating = m.get("rating")
                    if structured.get("rank_by_rating") and isinstance(
                            rating, (int, float)):
                        parts.append(f"{name} (rated {rating}/10)")
                    else:
                        parts.append(name)
                answer = "Options: " + ", ".join(parts) + "."
                return {
                    "answer": answer,
                    "sources": list(dict.fromkeys(
                        c.get("chunk_id", "") for c in contexts)),
                    "metadata": {
                        "model_type": "extractive",
                        "question_type": "options",
                        "num_contexts": len(contexts),
                        "num_options": len(seen),
                    },
                }
        ranked = self._ranked_sentences(query, contexts)
        if not ranked:
            return {
                "answer": "No relevant information found for this query.",
                "sources": [],
                "metadata": {"model_type": "extractive", "num_contexts": 0},
            }
        top = ranked[: self.max_sentences]
        sources = list(dict.fromkeys(cid for _, _, cid in top))

        if question_type == "yesno":
            # polarity vote: negation cues in the best-supported sentences
            neg = sum(1 for _, s, _ in top if _NEGATION.search(s))
            answer = "no" if neg > len(top) / 2 else "yes"
        elif question_type in ("factoid", "list"):
            best = top[0][1]
            answer = best.strip()
            # surface enumerations when present in the supporting sentence
            m = re.search(r":\s*(.+)$", best)
            if question_type == "list" and m:
                answer = m.group(1).strip()
        else:  # summary
            answer = " ".join(s.strip() for _, s, _ in top)

        return {
            "answer": answer,
            "sources": sources,
            "metadata": {
                "model_type": "extractive",
                "question_type": question_type,
                "num_contexts": len(contexts),
                "support_scores": [round(sc, 3) for sc, _, _ in top],
            },
        }
