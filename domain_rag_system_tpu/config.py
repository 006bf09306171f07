"""Unified run configuration.

The reference scatters its knobs across four argparse CLIs plus hardcoded
constants (RRF k=60, over-fetch 2×, BM25 k1/b — SURVEY.md §5.6). Round-1's
bench and evaluate scripts drifted the same way (bench weighted 0.2/0.8 vs
evaluate rrf 0.5/0.5 — VERDICT.md item 10). This dataclass is the single
source of truth: bench.py, scripts/evaluate.py and scripts/scale_bench.py
all consume it, so headline numbers are always produced by ONE recorded
configuration.

``RetrievalConfig.tuned()`` is the committed operating point, selected on
the BioASQ-200 eval (see PERFORMANCE.md for the sweep evidence).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, Optional


@dataclasses.dataclass
class RetrievalConfig:
    """Every knob that affects retrieval quality or speed."""

    # query-time
    top_k: int = 10
    fusion_method: str = "weighted"       # "rrf" | "weighted"
    vector_weight: float = 0.5
    bm25_weight: float = 0.5
    prf_terms: int = 0                    # RM3 expansion terms (0 = off)
    prf_docs: int = 10
    prf_alpha: float = 0.6
    group_by_doc: bool = False            # top_k counts distinct documents
    evidence_alpha: float = 0.0           # doc evidence aggregation: doc score
                                          # = best chunk + alpha*sum(next 2)
    fetch_mult: int = 4                   # doc-grouping over-fetch depth:
                                          # fused chunk pool = top_k*fetch_mult
                                          # before grouping to distinct docs
    evidence_chunks: int = 2              # chunks beyond the best that count
                                          # toward a doc's evidence score
    bm25_type_boost: float = 1.0          # BM25F-style field prior: title
                                          # chunks' BM25 scores x boost
                                          # (1.0 = off, bit-identical program)
    reranker: str = "none"                # "none" | "simple" | "crossencoder"
    rerank_top_n: int = 50
    cross_checkpoint: Optional[str] = None  # trained CE for "crossencoder"
    rerank_blend: float = 0.0             # 0 = pure rerank scores; >0 mixes
                                          # the fusion ranking back in
    rerank_head_m: int = 0                # >0: head-only doc reorder — the
                                          # CE permutes ONLY the top-m
                                          # grouped docs, so recall@k
                                          # (k>=m) is invariant by
                                          # construction (round-4 CE mode)
    structured_queries: bool = False      # parse attribute intent (pregnancy-
                                          # safe/OTC/class/condition/best-
                                          # rated) into per-query metadata
                                          # masks + boosts (preprocessing/
                                          # structured.py); inert on corpora
                                          # without the metadata
    structured_modes: Optional[Dict] = None  # family→"hard"|"soft"|"off"
                                          # overrides (None = CV defaults)
    structured_boost_dense: float = 0.25  # additive cosine margin on soft-
                                          # boosted rows (traced scalar)
    structured_boost_sparse: float = 0.6  # BM25 ×(1+x) on soft-boosted rows
    topk_approx: bool = False             # TPU approx_max_k candidate top-k
                                          # (hardware PartialReduce, 14x
                                          # faster DEVICE-side than the
                                          # exact sort at [50, 92k] k=80).
                                          # OFF: measured end-to-end on the
                                          # tunneled chip it buys nothing
                                          # (transport-bound) and costs
                                          # recall@5 0.560->0.548
                                          # (results/topk_approx_eval.json);
                                          # for local-chip serving only
    annotate_queries: bool = False        # entity/medical-term annotation on
                                          # the batch path (observability
                                          # only — retrieval inputs are
                                          # unaffected; ~70% of preprocess
                                          # cost at mined-table sizes, so
                                          # serving profiles skip it; the
                                          # single-query CLI always
                                          # annotates)
    batch_size: int = 50                  # serving batch

    # index-time
    bm25_k1: float = 1.5                  # reference defaults (bm25_indexer.py:29)
    bm25_b: float = 0.75
    encoder_checkpoint: Optional[str] = None  # None = lexical-hash embedder
    encoder_stack: Optional[tuple] = None # ((checkpoint, weight), ...) —
                                          # stacked multi-encoder dense arm:
                                          # index rows are concat_i(w_i·e_i),
                                          # dense score = Σ w_i²·cos_i
                                          # (overrides encoder_checkpoint)
    embedding_dim: int = 2048             # hash embedder dim
    dense_dtype: str = "float32"          # "float32" | "bfloat16" | "int8"
    mine_terms: bool = False              # corpus-mined abbreviations + drug map
    normalize_index: bool = False         # canonicalize chunk text (brand →
                                          # "generic (Brand)") at BM25 index
                                          # time, symmetric with query-side
                                          # normalization
    bm25_band: int = 0                    # dense-band size: top-K df terms
                                          # score via an [N, K] MXU matmul
                                          # instead of the doc-major gather
                                          # (0 = off; rebuilt indexes only —
                                          # bundle-loaded indexes keep the
                                          # gather path)

    @classmethod
    def reference_parity(cls) -> "RetrievalConfig":
        """The reference system's own defaults (rrf, k1=1.5/b=0.75,
        ``run_bioasq_evaluation.py:23-31``) — for parity comparisons."""
        return cls(fusion_method="rrf", reranker="simple",
                   annotate_queries=True)

    @classmethod
    def tuned(cls) -> "RetrievalConfig":
        """The committed operating point (BioASQ-200, one v5e chip):
        BM25 k1=0.9/b=0.5 (512-char chunks saturate tf quickly and need
        less length normalization), RM3 PRF with 15 terms, doc-level MaxP
        grouping, the semantically-trained dense arm at weight 0.1, and a
        bf16 dense index (at 91k chunks the fused program runs 3.3× faster
        with bf16/int8 corpus rows than f32 — identical ranking quality;
        PERFORMANCE.md)."""
        ckpt = Path(__file__).resolve().parent.parent / "checkpoints" / "medrag-sem"
        return cls(
            fusion_method="weighted",
            vector_weight=0.1,
            bm25_weight=0.9,
            prf_terms=15,
            prf_docs=20,      # RM3 feedback depth: 20 docs beats 10 on every
                              # metric (nDCG/MRR/hit@1) at equal recall@5
            group_by_doc=True,
            evidence_alpha=0.8,   # doc = best chunk + 0.8*sum(next 2): multi-
                                  # chunk evidence beats MaxP on r@5/nDCG/MRR
            bm25_k1=0.9,
            bm25_b=0.5,
            fetch_mult=6,     # doc-grouping pool = top_k*6: 4/5 CV folds
                              # select 6 over the default 4 on the small
                              # corpus too (out-of-fold r@5 0.5699 vs
                              # 0.5543 — results/cv_tune_fetch_mult_small
                              # .json); on-chip confirm r@5 0.5729 /
                              # recall 0.7322 vs 0.5699 / 0.7277 at equal
                              # q/s (results/small_fm{4,6}_confirm.json)
            encoder_checkpoint=str(ckpt) if ckpt.exists() else None,
            dense_dtype="auto",   # f32 under ~16k rows, bf16 at scale
            mine_terms=True,
            bm25_band=1024,   # top-1024 df terms via MXU matmul: halves the
                              # BM25-bound device program at 91k chunks
                              # (retrieve 29.3 -> 14.6 ms/batch, quality
                              # bit-identical — results/scale_bench_band1024.json)
        )

    @classmethod
    def tuned_at_scale(cls) -> "RetrievalConfig":
        """The production-scale (91,853-chunk) operating point.

        Identical to :meth:`tuned` except BM25 k1/b return to the standard
        1.5/0.75: the 0.9/0.5 point was tuned on the 3.5k-chunk corpus,
        where saturated term frequency needs less length normalization; at
        26x the index size the compressed IDF range makes standard
        normalization win again. Selected by 5-fold CV at scale — every
        fold chose k1=1.5 (``results/cv_tune_at_scale.json``: in-sample
        recall@5 0.5318 / nDCG@10 0.7922 vs 0.5227 / 0.7809 for the
        small-corpus point; out-of-fold 0.5247 / 0.7828).

        The fused candidate pool is also deeper (fetch_mult 8, evidence
        over 3 extra chunks): at 26x the index size distractor chunks
        dilute the pool, so doc grouping needs top_k*8 fused chunks to
        surface the same distinct relevant docs — recall@5 0.5318 →
        0.5375 / MRR 0.8423 → 0.8479 on chip at equal nDCG, 4/5 CV folds
        selecting fetch_mult=8 (``results/cv_tune_fetch_mult{,_deep}.json``,
        ``results/scale_bench_fm8.json``). The 6L/384 MLM-init encoder is
        the quality-leaning alternative (+0.005 nDCG/MRR, −0.006 r@5,
        ~2x device cost — ``results/scale_bench_6l_fm8.json``); the 4L
        semantic encoder stays for throughput."""
        cfg = cls.tuned()
        cfg.bm25_k1 = 1.5
        cfg.bm25_b = 0.75
        cfg.fetch_mult = 8
        cfg.evidence_chunks = 3
        return cfg

    @classmethod
    def quality_at_scale(cls) -> "RetrievalConfig":
        """The quality-leaning production-scale profile: the STACKED dense
        arm — contrastive 4L/256 ``medrag-sem`` + MLM+ICT-pretrained
        6L/384 ``medrag-pre-6l`` + MLM+ICT-pretrained 4L/256
        ``medrag-pre``, equal weights — at vector_weight 0.2 on top of
        :meth:`tuned_at_scale`. The index stores
        ``concat(e_sem, e_6l, e_pre)`` rows so the three-encoder ensemble
        is still ONE [N, 896] matmul (models/stacked_embedder.py).

        Selected by greedy 5-fold-CV forward selection at 91,853 chunks
        (each arm swept against the previously adopted stack; out-of-fold
        recall@5 / nDCG@10 at each step):

            medrag-sem alone            0.5365 / 0.7925
            + medrag-pre-6l             0.5522 / 0.8130  (unanimous, vw 0.2)
            + medrag-pre                0.5599 / 0.8156  (unanimous, vw 0.2)
            + medrag-pre-6l-b (seed 7)  0.5611 / 0.8208  (4/5 folds, vw 0.25)

        (``results/stack_sweep_at_scale.json``, ``stack3_pre_at_scale
        .json``, ``stack4_pre6lb_at_scale.json``.) Rejected arms:
        ``medrag-kw`` (weaker than pre as third arm, 0.5519/0.8140) and
        the kw 4th arm (recall@5 regression); a joint weight grid found
        only a noisy plateau around equal weights
        (``stack3_{kw,joint}_at_scale.json``). Decorrelated training
        recipes' (and seeds') errors partially cancel, with shrinking
        marginal gains (+0.021 → +0.003 nDCG per arm); earlier single-6L
        grids (``results/cv_tune_6l_*.json``) are superseded.

        THIS profile stops at three arms — the measured Pareto point
        (1,414 q/s, no throughput cost vs one encoder). The CV-winning
        4-arm point ships as :meth:`quality_max_at_scale`: +0.010 nDCG
        for ~26% q/s (``results/scale_bench_stack{3,4}.json``)."""
        cfg = cls.tuned_at_scale()
        cfg.encoder_checkpoint = None
        cfg.encoder_stack = cls._stack(
            "medrag-sem", "medrag-pre-6l", "medrag-pre")
        cfg.vector_weight = 0.2
        cfg.bm25_weight = 0.8
        return cfg

    @classmethod
    def quality_max_at_scale(cls) -> "RetrievalConfig":
        """The quality-MAX production-scale profile: the 4-arm stack
        (``quality_at_scale``'s three encoders + the 8L/768 wide
        long-pretrain encoder ``medrag-pre-8lw`` at weight ratio 4) at
        vector_weight 0.35.

        ``medrag-pre-8lw`` (6k MLM + 3k ICT steps at hidden 768, then
        contrastive fine-tune) is the strongest single dense arm —
        dense-only recall@5 **0.4778** / nDCG@10 0.7625 / MRR 0.8348
        (``results/encoder_campaign_pre8lw.json``), clearing the 0.45 bar
        VERDICT round-2 item 1 set with room. In the stack the ratio-4 /
        vw-0.35 point is the 5-fold majority — CV out-of-fold recall@5
        **0.5704** / nDCG@10 **0.8381**
        (``results/stack4_pre8lw{,_ext}_at_scale.json``). A 5-arm probe
        keeping the superseded 8L/512 arm as well is a wash (0.5632 /
        0.8400 — ``stack5_pre8lw_at_scale.json``), so the swap ships.
        Costs throughput vs the 3-stack profile (the [N, 1664] matmul +
        the 8L/768 forward exceed the grouped-sync overlap budget). Pick
        this when ranking quality outranks serving cost. Earlier 4-arm
        points (``medrag-pre-8l`` ratio 2: 0.5622/0.8291,
        ``stack4_pre8l_at_scale.json``; seed-7 6L sibling: nDCG 0.8253,
        ``stack4_pre6lb_at_scale.json``) are superseded."""
        cfg = cls.quality_at_scale()
        cfg.encoder_stack = cls._stack(
            "medrag-sem", "medrag-pre-6l", "medrag-pre",
            ("medrag-pre-8lw", 2.0))
        cfg.vector_weight = 0.35
        cfg.bm25_weight = 0.65
        return cfg

    @classmethod
    def quality_small(cls) -> "RetrievalConfig":
        """The quality-leaning SMALL-corpus profile: :meth:`tuned` with the
        4-arm encoder stack at vector_weight 0.1. The earlier 2-stack small
        sweep was a wash (``results/stack_sweep_small.json``), but with the
        full stack the CV flips: 4/5 folds select ratio=1.0 / vw=0.1 —
        in-sample recall@5 0.5746 / nDCG@10 0.8440 / MRR 0.882 vs the
        tuned single-encoder point's 0.5716 / 0.8377 / 0.8786, out-of-fold
        nDCG 0.8441 vs 0.833 at equal recall@5
        (``results/stack4_small.json``). ``tuned()`` remains the committed
        headline (single encoder, fastest small-corpus point)."""
        cfg = cls.tuned()
        cfg.encoder_checkpoint = None
        cfg.encoder_stack = cls._stack(
            "medrag-sem", "medrag-pre-6l", "medrag-pre", "medrag-pre-6l-b")
        cfg.vector_weight = 0.1
        cfg.bm25_weight = 0.9
        return cfg

    @staticmethod
    def _stack(*names) -> tuple:
        """((checkpoint_path, weight), ...) for repo checkpoints, verified
        present — an explicitly requested stacked profile must fail
        loudly, not degrade. Entries are names (weight 1.0) or
        (name, weight) pairs."""
        root = Path(__file__).resolve().parent.parent / "checkpoints"
        entries = [(n, 1.0) if isinstance(n, str) else (n[0], float(n[1]))
                   for n in names]
        paths = [(root / n, w) for n, w in entries]
        missing = [str(p) for p, _ in paths if not p.exists()]
        if missing:
            raise FileNotFoundError(
                f"stacked profile needs encoder checkpoints {missing} — "
                f"train them with scripts/pretrain_encoder.py + "
                f"scripts/train_encoder.py or use tuned_at_scale()")
        return tuple((str(p), w) for p, w in paths)

    @classmethod
    def kaggle_tuned(cls) -> "RetrievalConfig":
        """The CV-selected kaggle operating point (5-fold over the hard
        eval): vector_weight 0.3 / PRF OFF unanimous on every query-set
        shape (RM3 expands into the near-duplicate shadow vocabulary on
        this corpus — ``results/cv_tune_kaggle.json``); fetch_mult 6 and
        evidence_alpha 0.5 on a fold plateau. Round 5 adds STRUCTURED
        QUERY PARSING, CV-selected on the 455-query shape
        (``results/cv_tune_structured.json``, re-confirmed after the
        section-intent and rating-tie-break additions): every fold chose
        structured=True with the default modes (pregnancy/OTC hard
        filters, class/condition/section soft boosts), 4/5 folds the
        0.25/0.6 boosts — out-of-fold recall@5 0.9110 / nDCG@10 0.9085
        (round 4: 0.8652 / 0.8555). Shipped in-sample 0.944 / 0.950 /
        MRR 0.972 vs the 0.692 / 0.668 control. Index-side brand↔generic
        canonicalization stays on (cross-name query types rank at nDCG
        ~0.49 without it — ``results/kaggle_ablation_no_normalize.json``)."""
        cfg = cls.tuned()
        cfg.normalize_index = True
        cfg.top_k = 5
        cfg.vector_weight, cfg.bm25_weight = 0.3, 0.7
        cfg.prf_terms = 0
        cfg.evidence_alpha = 0.5
        cfg.fetch_mult = 6
        cfg.structured_queries = True
        cfg.structured_boost_sparse = 1.5  # unanimous folds with the
                                           # drug-name family active
        return cfg

    @classmethod
    def openfda_tuned(cls) -> "RetrievalConfig":
        """The CV-selected OpenFDA operating point (5-fold over the round-5
        hard eval — recovered labels + 5-per-record verbatim-section
        shadows + 600 in-domain decoys, 105 rule-generated queries;
        ``results/cv_tune_openfda.json``): every fold chose vector_weight
        0.2 / PRF OFF (RM3 expands into the shadows' duplicated section
        vocabulary, same failure mode as kaggle), evidence_alpha 0.0
        (MaxP — near-duplicate decoy chunks make multi-chunk evidence a
        liability on this corpus), and STRUCTURED QUERIES ON — the
        ingredient intent family compiles "which products contain X" into
        exact ``active_ingredients`` metadata filters (parsed from the
        label text at load time, ``data_loader.load_openfda``), lifting
        the ingredient type 0.690 → 0.931 recall@5. Out-of-fold recall@5
        0.9659 / nDCG@10 0.9795 (unanimous folds) vs the doc-level dense
        control's 0.8270 / 0.8128."""
        cfg = cls.tuned()
        cfg.vector_weight, cfg.bm25_weight = 0.2, 0.8
        cfg.prf_terms = 0
        cfg.evidence_alpha = 0.0
        cfg.structured_queries = True
        return cfg

    @classmethod
    def head_precision(cls) -> "RetrievalConfig":
        """The cross-encoder head-precision profile (PERFORMANCE.md
        "Reranking findings"): trades throughput (~83 q/s) and a little
        recall@5 for the best head — measured MRR 0.8994 / hit@1 0.87 on
        BioASQ-200 vs the tuned config's 0.8838 / 0.85. For interfaces
        where only the first answer matters."""
        cfg = cls.tuned()
        ce = Path(__file__).resolve().parent.parent / "checkpoints" / "medrag-cross4"
        if not ce.exists():
            # an explicitly requested profile must not silently degrade to
            # tuned behavior (cf. load_index's missing-checkpoint policy)
            raise FileNotFoundError(
                f"head_precision profile needs the trained cross-encoder at "
                f"{ce} — restore the checkpoint or use the tuned profile")
        cfg.reranker = "crossencoder"
        cfg.cross_checkpoint = str(ce)
        cfg.rerank_top_n = 20
        cfg.rerank_blend = 0.5
        return cfg

    # ---------------------------------------------------------- conversions

    def query_kwargs(self) -> Dict:
        """kwargs for ``RetrievalPipeline.query_batch`` /
        ``evaluation.runners.run_retrieval_evaluation``."""
        return dict(
            top_k=self.top_k,
            fusion_method=self.fusion_method,
            vector_weight=self.vector_weight,
            bm25_weight=self.bm25_weight,
            prf_terms=self.prf_terms,
            prf_docs=self.prf_docs,
            prf_alpha=self.prf_alpha,
            group_by_doc=self.group_by_doc,
            evidence_alpha=self.evidence_alpha,
            evidence_chunks=self.evidence_chunks,
            fetch_mult=self.fetch_mult,
            bm25_type_boost=self.bm25_type_boost,
            rerank_top_n=self.rerank_top_n,
            structured=self.structured_queries,
            structured_modes=self.structured_modes,
            structured_boost_dense=self.structured_boost_dense,
            structured_boost_sparse=self.structured_boost_sparse,
            annotate_queries=self.annotate_queries,
            topk_approx=self.topk_approx,
        )

    def to_dict(self) -> Dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict) -> "RetrievalConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})

    def save(self, path) -> None:
        Path(path).write_text(json.dumps(self.to_dict(), indent=1))

    @classmethod
    def load(cls, path) -> "RetrievalConfig":
        return cls.from_dict(json.loads(Path(path).read_text()))

    def apply_overrides(self, args) -> "RetrievalConfig":
        """Overlay argparse-style attributes that are not None."""
        out = dataclasses.replace(self)
        for f in dataclasses.fields(self):
            v = getattr(args, f.name, None)
            if v is not None:
                setattr(out, f.name, v)
        return out
