"""TPU-native BM25 scoring.

The reference scores BM25 on the host with ``rank_bm25.BM25Okapi.get_scores``
— an O(N) numpy pass over the full corpus per query
(``src/indexing/bm25_indexer.py:127-128``). Here BM25 runs on device with a
layout chosen for the TPU's vector unit instead of a CPU posting-list walk:

**Doc-major padded term matrix.** Chunks are short (≤512 chars → ≤~100 unique
terms), so each document's sparse term vector fits a fixed-width row:

  * ``doc_terms``   int32 [N, D]  — term ids per doc, ``-1`` padded;
  * ``doc_contrib`` f32   [N, D]  — the *precomputed* per-(term, doc) BM25
    contribution ``idf(t) · tf(t,d)(k1+1) / (tf + k1(1-b+b·dl/avgdl))``.

A query is ≤L term ids with multiplicities. Scoring is then an exact dense
computation — no gather, no scatter, static shapes, trivially shardable by
rows:

  ``score[n] = Σ_d contrib[n,d] · W[terms[n,d]]``

where W is a per-query dense vocab-weight table (scatter of the query's
term multiplicities) — two fused ops (gather + einsum) per row block; see
``bm25_scores``. The row width D auto-sizes to the corpus's max unique-term
count (measured p99=34/max=85 at 91k chunks), so no work is spent on
padding slots. Per-(term,doc) contributions are precomputed at build time,
which is exactly the factorization BM25 allows: query tokens only
contribute multiplicity weights.

IDF parity: ``build_okapi_arrays`` reproduces the Okapi BM25 variant used by
the reference's ``rank_bm25`` dependency, including its non-standard
negative-IDF flooring (idf < 0 → ``eps ·  mean(idf)`` with eps = 0.25), so
score-based rankings match the reference bit-for-bit modulo float order.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)

#: Default fixed widths (static shapes under jit).
MAX_DOC_TERMS = 128
MAX_QUERY_TERMS = 64

#: rank_bm25's negative-IDF epsilon (BM25Okapi(epsilon=0.25)).
OKAPI_EPSILON = 0.25

def build_okapi_arrays(
    tokenized_corpus: Sequence[List[int]],
    vocab_size: int,
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = OKAPI_EPSILON,
    max_doc_terms: int = MAX_DOC_TERMS,
    alive: "np.ndarray | None" = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Dict[str, float]]:
    """Precompute the doc-major BM25 arrays from an id-encoded corpus.

    Args:
      tokenized_corpus: per-doc lists of term ids (with multiplicity).
      vocab_size: number of distinct terms.
      k1, b: BM25 parameters (reference defaults 1.5 / 0.75,
        ``bm25_indexer.py:29``).
      epsilon: negative-IDF floor factor (rank_bm25 semantics).
      max_doc_terms: row-width CAP. The actual width is the corpus's
        maximum unique-term count rounded up to a multiple of 8 (exact,
        measured p99=34/max=85 at 91k chunks vs the old fixed 128 — the
        BM25 gather cost is ∝ width, so auto-sizing cuts ~30% of the
        scoring work for free); docs beyond the cap keep their
        highest-contribution terms (logged — rare for ≤512-char chunks).

    Returns:
      (doc_terms [N, D] int32, doc_contrib [N, D] f32, idf [V] f32, stats)
    """
    # ``alive`` (tombstone support): dead rows keep their position (index
    # alignment with the chunk list) but are excluded from N/df/avgdl and
    # carry no terms. Callers pass dead docs as empty token lists.
    if alive is None:
        alive = np.ones(len(tokenized_corpus), dtype=bool)
    n_docs = int(alive.sum())
    doc_lens = np.array([len(doc) for doc in tokenized_corpus], dtype=np.float64)
    avgdl = float(doc_lens[alive].mean()) if n_docs else 0.0

    # Document frequency per term (alive docs only).
    df = np.zeros(vocab_size, dtype=np.int64)
    for i, doc in enumerate(tokenized_corpus):
        if not alive[i]:
            continue
        for tid in set(doc):
            df[tid] += 1

    # Okapi IDF with rank_bm25's epsilon floor: the mean is taken over the
    # raw idf values of *observed* terms (df > 0), negatives included.
    observed = df > 0
    raw_idf = np.zeros(vocab_size, dtype=np.float64)
    raw_idf[observed] = np.log(n_docs - df[observed] + 0.5) - np.log(df[observed] + 0.5)
    average_idf = raw_idf[observed].mean() if observed.any() else 0.0
    idf = raw_idf.copy()
    negative = observed & (raw_idf < 0)
    idf[negative] = epsilon * average_idf
    if negative.any():
        log.info("floored %d negative-IDF terms to eps*avg_idf=%.4f",
                 int(negative.sum()), epsilon * average_idf)

    n_rows = len(tokenized_corpus)  # includes tombstoned rows (alignment)
    widest = max((len(set(doc)) for i, doc in enumerate(tokenized_corpus)
                  if alive[i]), default=1)
    fitted = min(max_doc_terms, -(-max(widest, 1) // 8) * 8)
    if fitted < max_doc_terms:
        log.info("doc-term width auto-sized to %d (corpus max unique %d, "
                 "cap %d)", fitted, widest, max_doc_terms)
    max_doc_terms = fitted
    doc_terms = np.full((n_rows, max_doc_terms), -1, dtype=np.int32)
    doc_contrib = np.zeros((n_rows, max_doc_terms), dtype=np.float32)
    overflow = 0
    for i, doc in enumerate(tokenized_corpus):
        if not doc or not alive[i]:
            continue
        tids, tfs = np.unique(np.asarray(doc, dtype=np.int64), return_counts=True)
        denom_norm = k1 * (1.0 - b + b * doc_lens[i] / avgdl)
        contrib = idf[tids] * (tfs * (k1 + 1.0)) / (tfs + denom_norm)
        if len(tids) > max_doc_terms:
            overflow += 1
            keep = np.argsort(contrib)[::-1][:max_doc_terms]
            tids, contrib = tids[keep], contrib[keep]
        doc_terms[i, : len(tids)] = tids
        doc_contrib[i, : len(tids)] = contrib

    if overflow:
        log.warning(
            "%d/%d docs exceeded max_doc_terms=%d — lowest-contribution terms "
            "dropped (raise max_doc_terms for exactness)",
            overflow, n_rows, max_doc_terms,
        )

    stats = {
        "n_docs": float(n_docs),
        "avgdl": avgdl,
        "average_idf": float(average_idf),
        "overflow_docs": float(overflow),
        "k1": k1,
        "b": b,
        "epsilon": epsilon,
    }
    return doc_terms, doc_contrib, idf.astype(np.float32), stats


def encode_query_terms(
    term_counts: Dict[int, int],
    max_query_terms: int = MAX_QUERY_TERMS,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack a term-id→multiplicity map into fixed-width (ids, weights).

    Queries with more than ``max_query_terms`` unique in-vocab terms keep the
    highest-multiplicity ones (queries are sentences; this effectively never
    truncates).
    """
    ids = np.full(max_query_terms, -2, dtype=np.int32)  # -2 never matches -1 pads
    weights = np.zeros(max_query_terms, dtype=np.float32)
    items = sorted(term_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:max_query_terms]
    for i, (tid, count) in enumerate(items):
        ids[i] = tid
        weights[i] = count
    return ids, weights


def _block_rows(n_rows: int, batch: int, doc_width: int) -> int:
    """Row-block size keeping the [B, block, D] gather ≈ ≤64 MB f32."""
    budget = (1 << 24) // max(batch * doc_width, 1)
    block = max(256, min(n_rows, budget))
    return -(-block // 256) * 256 if block < n_rows else n_rows


@functools.partial(jax.jit, static_argnames=("vocab_size",))
def bm25_scores(
    doc_terms: jax.Array,      # [N, D] int32, -1 padded
    doc_contrib: jax.Array,    # [N, D] f32
    query_ids: jax.Array,      # [L] or [B, L] int32, negative = padding
    query_weights: jax.Array,  # [L] or [B, L] f32
    vocab_size: int = 0,       # 0 → derive a safe bound from doc_terms width
) -> jax.Array:
    """Exact BM25 scores for one query or a batch. Returns [N] or [B, N].

    Formulation: scatter the query's (term id → multiplicity weight) pairs
    into a dense per-query vocab table W [B, V+1] (sentinel slot V holds
    padding), then score docs by gathering W at each doc's term ids and
    dotting with the precomputed contributions:

        score[b, n] = Σ_d contrib[n, d] · W[b, terms[n, d]]

    Two fused ops (gather + einsum) per row block instead of a length-L
    scan — O(L) faster to compile and the gather table (a few MB) lives in
    VMEM. Row blocks bound the [B, block, D] gather temp.
    """
    single = query_ids.ndim == 1
    q_ids = jnp.atleast_2d(query_ids)          # [B, L]
    q_w = jnp.atleast_2d(query_weights)        # [B, L]
    b = q_ids.shape[0]
    n, d = doc_terms.shape
    v = int(vocab_size) if vocab_size else 1 << 20

    # NOTE(negative result): a batch-local vocabulary remap (shrink the
    # [B, V+1] table to [B, B·L+1] via a per-batch term-id lookup so it
    # fits VMEM at production vocab sizes) measured 3× SLOWER at 91k
    # chunks/107k terms (111 ms vs 34 ms): XLA already vectorizes this
    # gather over the batch dim, and the extra [N, D] scalar remap gather
    # dominates. Keep the direct table.
    rows = jnp.arange(b)[:, None]
    safe_q = jnp.where(q_ids >= 0, jnp.minimum(q_ids, v - 1), v)
    safe_terms = jnp.where(doc_terms >= 0, jnp.minimum(doc_terms, v - 1), v)
    table = jnp.zeros((b, v + 1), jnp.float32).at[rows, safe_q].add(
        jnp.where(q_ids >= 0, q_w, 0.0))

    block = _block_rows(n, b, d)
    if block >= n:
        gathered = table[:, safe_terms]                     # [B, N, D]
        scores = jnp.einsum("bnd,nd->bn", gathered, doc_contrib)
    else:
        n_pad = -(-n // block) * block
        terms_p = jnp.pad(safe_terms, ((0, n_pad - n), (0, 0)),
                          constant_values=v)
        contrib_p = jnp.pad(doc_contrib, ((0, n_pad - n), (0, 0)))
        terms_b = terms_p.reshape(n_pad // block, block, d)
        contrib_b = contrib_p.reshape(n_pad // block, block, d)

        def score_block(args):
            t_blk, c_blk = args
            return jnp.einsum("bnd,nd->bn", table[:, t_blk], c_blk)

        blocks = jax.lax.map(score_block, (terms_b, contrib_b))  # [nb, B, block]
        scores = jnp.transpose(blocks, (1, 0, 2)).reshape(b, n_pad)[:, :n]
    return scores[0] if single else scores


@functools.partial(jax.jit, static_argnames=("vocab_size",))
def bm25_scores_vocab_major(
    doc_terms: jax.Array,      # [N, D] int32, -1 padded
    doc_contrib: jax.Array,    # [N, D] f32
    query_ids: jax.Array,      # [L] or [B, L] int32, negative = padding
    query_weights: jax.Array,  # [L] or [B, L] f32
    vocab_size: int = 0,
) -> jax.Array:
    """Exact BM25 via a VOCAB-MAJOR weight table — layout experiment.

    ``bm25_scores`` gathers from a [B, V+1] table: element (b, n, d) reads
    address ``b·V + terms[n,d]`` — for one (n, d) the B reads are V apart,
    so every 4-byte lookup lands on its own HBM access. Transposing the
    table to [V+1, B] makes the B weights for one term CONTIGUOUS: the doc
    gather becomes an embedding-style axis-0 row gather (the layout TPU
    gathers are optimized for), reading B·4 bytes per touched term.

        score[b, n] = Σ_d contrib[n, d] · T[terms[n, d], b]

    Row blocks bound the [block, D, B] gather temp. Bit-equal to
    ``bm25_scores`` (same arithmetic, different access order).
    """
    single = query_ids.ndim == 1
    q_ids = jnp.atleast_2d(query_ids)          # [B, L]
    q_w = jnp.atleast_2d(query_weights)        # [B, L]
    b = q_ids.shape[0]
    n, d = doc_terms.shape
    v = int(vocab_size) if vocab_size else 1 << 20

    cols = jnp.arange(b)[None, :] * jnp.ones_like(q_ids[:, :1])  # [B, 1]→bcast
    cols = jnp.broadcast_to(jnp.arange(b)[:, None], q_ids.shape)
    safe_q = jnp.where(q_ids >= 0, jnp.minimum(q_ids, v - 1), v)
    safe_terms = jnp.where(doc_terms >= 0, jnp.minimum(doc_terms, v - 1), v)
    table = jnp.zeros((v + 1, b), jnp.float32).at[safe_q, cols].add(
        jnp.where(q_ids >= 0, q_w, 0.0))

    block = _block_rows(n, b, d)
    if block >= n:
        gathered = table[safe_terms]                        # [N, D, B]
        scores = jnp.einsum("ndb,nd->bn", gathered, doc_contrib)
    else:
        n_pad = -(-n // block) * block
        terms_p = jnp.pad(safe_terms, ((0, n_pad - n), (0, 0)),
                          constant_values=v)
        contrib_p = jnp.pad(doc_contrib, ((0, n_pad - n), (0, 0)))
        terms_b = terms_p.reshape(n_pad // block, block, d)
        contrib_b = contrib_p.reshape(n_pad // block, block, d)

        def score_block(args):
            t_blk, c_blk = args
            return jnp.einsum("ndb,nd->bn", table[t_blk], c_blk)

        blocks = jax.lax.map(score_block, (terms_b, contrib_b))
        scores = jnp.transpose(blocks, (1, 0, 2)).reshape(b, n_pad)[:, :n]
    return scores[0] if single else scores


def build_dense_band(
    doc_terms: np.ndarray,     # [N, D] int32, -1 padded
    doc_contrib: np.ndarray,   # [N, D] f32
    vocab_size: int,
    k_band: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, float]:
    """Partition scoring work into a DENSE BAND + sparse rest.

    High-df terms dominate the touched (term, doc) slots (natural-language
    df is Zipfian), but each costs a 4-byte random gather in the doc-major
    formulation. Giving the top ``k_band`` df terms a dense ``[N, K]``
    contribution matrix turns their work into ONE MXU matmul
    (``band @ q_dense.T`` — thousands of times cheaper per slot) and
    leaves only rare terms in the gather path, whose rows re-pack much
    narrower. Exact: every (term, doc) contribution is scored exactly
    once, on exactly one side.

    Returns (band_mat [N, K] f32, slot_of [V+1] int32 (-1 = not banded),
    rest_terms [N, D'], rest_contrib [N, D'], slot_coverage).
    """
    terms = np.asarray(doc_terms)
    contrib = np.asarray(doc_contrib)
    n, d = terms.shape
    df = np.bincount(terms[terms >= 0], minlength=vocab_size)
    k_band = min(k_band, int((df > 0).sum()))
    band_terms = np.argsort(df)[::-1][:k_band]
    slot_of = np.full(vocab_size + 1, -1, np.int32)
    slot_of[band_terms] = np.arange(k_band, dtype=np.int32)

    band_mat = np.zeros((n, k_band), np.float32)
    in_band = (terms >= 0) & (slot_of[np.maximum(terms, 0)] >= 0)
    rows, cols = np.nonzero(in_band)
    # add.at: duplicate (doc, term) slots accumulate exactly like the
    # gather path does (corpus rows are unique-term by construction, but
    # exactness must not depend on that)
    np.add.at(band_mat, (rows, slot_of[terms[rows, cols]]),
              contrib[rows, cols])

    touched = int((terms >= 0).sum())
    coverage = float(in_band.sum()) / max(touched, 1)

    keep = (terms >= 0) & ~in_band
    widths = keep.sum(axis=1)
    new_d = max(8, -(-int(widths.max(initial=1)) // 8) * 8)
    rest_terms = np.full((n, new_d), -1, np.int32)
    rest_contrib = np.zeros((n, new_d), np.float32)
    for i in np.nonzero(widths)[0]:
        sel = np.nonzero(keep[i])[0]
        rest_terms[i, : len(sel)] = terms[i, sel]
        rest_contrib[i, : len(sel)] = contrib[i, sel]
    log.info("BM25 dense band: K=%d covers %.1f%% of slots; rest width %d "
             "(was %d)", k_band, coverage * 100, new_d, d)
    return band_mat, slot_of, rest_terms, rest_contrib, coverage


def banded_query_split(slot_of: jax.Array, q_ids: jax.Array,
                       q_w: jax.Array, k_band: int):
    """Device-side query split: (dense [B, K] weight matrix for the band,
    sparse weights with banded terms zeroed). Works on PRF-expanded ids
    too — the split happens inside the fused program."""
    v = slot_of.shape[0] - 1
    slots = slot_of[jnp.clip(q_ids, 0, v)]
    in_band = (q_ids >= 0) & (slots >= 0)
    b = q_ids.shape[0]
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], q_ids.shape)
    q_dense = jnp.zeros((b, k_band), jnp.float32).at[
        rows, jnp.maximum(slots, 0)].add(jnp.where(in_band, q_w, 0.0))
    q_w_rest = jnp.where(in_band, 0.0, q_w)
    return q_dense, q_w_rest


def band_scores(band_mat: jax.Array, q_dense: jax.Array) -> jax.Array:
    """[N, K] band contributions × [B, K] query weights → [B, N] via MXU.

    Precision HIGHEST: the TPU default decomposes f32 matmuls to one bf16
    pass (~3 decimal digits) — measured 0.008 absolute error on BM25
    scores, enough to flip near-tie rankings vs the exact gather path.
    The f32-exact passes cost ~6x MXU time, still negligible next to the
    gathers this band replaces."""
    return jax.lax.dot_general(
        band_mat, q_dense, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).T


def split_overflow(
    doc_terms: np.ndarray,
    doc_contrib: np.ndarray,
    base_width: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Split the doc-major arrays into a narrow base + sparse overflow.

    The auto-sized width fits the corpus MAXIMUM unique-term count, but the
    distribution is heavily skewed (p99=34 vs max=85 at 91k chunks), so
    ~60% of the base gather slots are sentinel padding. Splitting into
    ``[N, Db]`` (Db ≈ p99, covers ≥99% of rows completely) plus overflow
    tails ``[M, D-Db]`` for the few wide rows cuts the gather work nearly
    in half while staying exact: terms are packed from column 0, so row
    ``i``'s tail columns hold exactly its terms beyond ``Db``.

    Returns (base_terms [N, Db], base_contrib [N, Db], ovf_rows [M],
    ovf_terms [M, Do], ovf_contrib [M, Do]).
    """
    terms = np.asarray(doc_terms)
    contrib = np.asarray(doc_contrib)
    n, d = terms.shape
    widths = (terms >= 0).sum(axis=1)
    if not base_width:
        # p99 width. A pure slot-count minimizer picks narrower (32 at 91k)
        # but measured SLOWER (547 vs 640 q/s): overflow rows cost more
        # than base slots (separate gather/einsum + [B, M] scatter-add),
        # so keeping ≥99% of rows entirely in the base wins.
        p99 = int(np.percentile(widths, 99)) if n else 1
        base_width = max(8, -(-max(p99, 1) // 8) * 8)
    base_width = min(base_width, d)
    ovf_rows = np.nonzero(widths > base_width)[0].astype(np.int32)
    base_terms = np.ascontiguousarray(terms[:, :base_width])
    base_contrib = np.ascontiguousarray(contrib[:, :base_width])
    do = d - base_width
    if do == 0 or len(ovf_rows) == 0:
        return (base_terms, base_contrib, np.zeros(0, np.int32),
                np.full((0, 8), -1, np.int32), np.zeros((0, 8), np.float32))
    ovf_terms = np.ascontiguousarray(terms[ovf_rows, base_width:])
    ovf_contrib = np.ascontiguousarray(contrib[ovf_rows, base_width:])
    log.info("BM25 split: base width %d (%d/%d rows overflow, tail %d)",
             base_width, len(ovf_rows), n, do)
    return base_terms, base_contrib, ovf_rows, ovf_terms, ovf_contrib


@functools.partial(jax.jit, static_argnames=("vocab_size",))
def bm25_scores_split(
    base_terms: jax.Array,     # [N, Db]
    base_contrib: jax.Array,   # [N, Db]
    ovf_rows: jax.Array,       # [M] int32 row indices into N
    ovf_terms: jax.Array,      # [M, Do]
    ovf_contrib: jax.Array,    # [M, Do]
    query_ids: jax.Array,
    query_weights: jax.Array,
    vocab_size: int = 0,
) -> jax.Array:
    """Exact BM25 over split arrays: base einsum + overflow scatter-add.

    Bit-equal to ``bm25_scores`` on the unsplit arrays (the split is a
    pure column partition of each row's term set; addition order per score
    changes only by the final add, tested to 1e-6)."""
    scores = bm25_scores(base_terms, base_contrib, query_ids, query_weights,
                         vocab_size)
    single = scores.ndim == 1
    s2 = jnp.atleast_2d(scores)
    if ovf_terms.shape[0]:
        ovf = jnp.atleast_2d(
            bm25_scores(ovf_terms, ovf_contrib, query_ids, query_weights,
                        vocab_size))                       # [B, M]
        s2 = s2.at[:, ovf_rows].add(ovf)
    return s2[0] if single else s2
