"""Answer generation over retrieved contexts.

Capability parity with the reference (``src/generation/generator.py:11-291``):
an abstract generator, an API-backed ``AnswerGenerator`` supporting
``openai | anthropic | huggingface | local`` model types behind import
guards (client init failure degrades to error-string answers instead of
crashing, reference ``:74-107``), and an LLM-free ``TemplateGenerator``
that stitches the top-3 context previews (reference ``:259-291``).

The prompt numbers each context with its source and section and instructs
the model to answer only from the provided contexts with citations
(structural parity with the reference's 5-rule template, ``:109-149``).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, List, Optional

from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)


class BaseGenerator(ABC):
    """Minimal generation interface: contexts + query → answer payload."""

    @abstractmethod
    def generate(self, query: str, contexts: List[Dict], **kwargs) -> Dict[str, Any]:
        ...


def build_prompt(query: str, contexts: List[Dict], max_contexts: int = 5) -> str:
    """Numbered-context instruction prompt."""
    lines = [
        "You are a medical information assistant. Answer the question using "
        "ONLY the numbered context passages below.",
        "",
        "Rules:",
        "1. Base every statement on the provided contexts; do not invent facts.",
        "2. Cite supporting passages by number, e.g. [1] or [2,3].",
        "3. If the contexts do not contain the answer, say so explicitly.",
        "4. Prefer precise medical terminology; expand abbreviations once.",
        "5. Keep the answer concise and directly address the question.",
        "",
        "Contexts:",
    ]
    for i, ctx in enumerate(contexts[:max_contexts], 1):
        source = ctx.get("source", "unknown")
        section = ctx.get("chunk_type", ctx.get("section", ""))
        lines.append(f"[{i}] ({source}/{section}) {ctx.get('text', '')}")
    lines += ["", f"Question: {query}", "Answer:"]
    return "\n".join(lines)


class AnswerGenerator(BaseGenerator):
    """API/local LLM generation with guarded client construction."""

    def __init__(
        self,
        model_type: str = "openai",
        model_name: Optional[str] = None,
        api_key: Optional[str] = None,
        temperature: float = 0.7,
        max_tokens: int = 500,
        **client_kwargs,
    ):
        self.model_type = model_type
        self.model_name = model_name
        self.temperature = temperature
        self.max_tokens = max_tokens
        self.client = None
        self._local_pipeline = None

        try:
            if model_type == "openai":
                import openai

                self.client = openai.OpenAI(api_key=api_key, **client_kwargs)
                self.model_name = model_name or "gpt-4o-mini"
            elif model_type == "anthropic":
                import anthropic

                self.client = anthropic.Anthropic(api_key=api_key, **client_kwargs)
                self.model_name = model_name or "claude-sonnet-4-5"
            elif model_type in ("huggingface", "local"):
                from transformers import pipeline as hf_pipeline

                self._local_pipeline = hf_pipeline(
                    "text-generation",
                    model=model_name or "distilgpt2",
                    **client_kwargs,
                )
            else:
                raise ValueError(f"unknown model_type {model_type!r}")
        except Exception as exc:
            log.warning("generator backend %r unavailable: %s — answers will "
                        "report the failure", model_type, exc)
            self._init_error = str(exc)
        else:
            self._init_error = None

    def generate(self, query: str, contexts: List[Dict], **kwargs) -> Dict[str, Any]:
        prompt = build_prompt(query, contexts)
        sources = [c.get("chunk_id", "") for c in contexts]
        meta = {
            "model_type": self.model_type,
            "model_name": self.model_name,
            "num_contexts": len(contexts),
        }
        if self._init_error is not None:
            return {
                "answer": f"[generation unavailable: {self._init_error}]",
                "sources": sources,
                "metadata": {**meta, "error": self._init_error},
            }
        try:
            if self.model_type == "openai":
                resp = self.client.chat.completions.create(
                    model=self.model_name,
                    messages=[{"role": "user", "content": prompt}],
                    temperature=self.temperature,
                    max_tokens=self.max_tokens,
                )
                answer = resp.choices[0].message.content
            elif self.model_type == "anthropic":
                resp = self.client.messages.create(
                    model=self.model_name,
                    max_tokens=self.max_tokens,
                    temperature=self.temperature,
                    messages=[{"role": "user", "content": prompt}],
                )
                answer = resp.content[0].text
            else:  # huggingface/local
                out = self._local_pipeline(
                    prompt,
                    max_new_tokens=self.max_tokens,
                    do_sample=self.temperature > 0,
                    temperature=max(self.temperature, 1e-3),
                    return_full_text=False,
                )
                answer = out[0]["generated_text"]
        except Exception as exc:
            log.warning("generation call failed: %s", exc)
            return {
                "answer": f"[generation failed: {exc}]",
                "sources": sources,
                "metadata": {**meta, "error": str(exc)},
            }
        return {"answer": answer, "sources": sources, "metadata": meta}


class TemplateGenerator(BaseGenerator):
    """LLM-free fallback: stitch top-3 context previews (reference :259-291)."""

    def __init__(self, max_contexts: int = 3, preview_chars: int = 200):
        self.max_contexts = max_contexts
        self.preview_chars = preview_chars

    def generate(self, query: str, contexts: List[Dict], **kwargs) -> Dict[str, Any]:
        if not contexts:
            return {
                "answer": "No relevant information found for this query.",
                "sources": [],
                "metadata": {"model_type": "template", "num_contexts": 0},
            }
        parts = []
        for i, ctx in enumerate(contexts[: self.max_contexts], 1):
            preview = (ctx.get("text", "") or "")[: self.preview_chars]
            parts.append(f"[{i}] {preview}...")
        answer = (
            f"Based on the retrieved medical literature:\n" + "\n".join(parts)
        )
        return {
            "answer": answer,
            "sources": [c.get("chunk_id", "") for c in contexts[: self.max_contexts]],
            "metadata": {
                "model_type": "template",
                "num_contexts": min(len(contexts), self.max_contexts),
            },
        }
