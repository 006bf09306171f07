"""Index persistence: a directory bundle of arrays + JSON.

The reference persists its sparse index by pickling the entire object graph
(``src/indexing/bm25_indexer.py:165-200``) and relies on Qdrant's on-disk
collection for the dense side, with ``index_metadata.json`` as the manifest
(``scripts/build_index.py:77-90``). Pickle is a code-execution hazard and a
version trap; here a bundle is plain, inspectable data:

    <dir>/manifest.json   — versions, model info, bm25 params, counts
    <dir>/chunks.jsonl    — one chunk dict per line (reference jsonl schema)
    <dir>/dense.npz       — embeddings [N, d] (+ embedder state arrays)
    <dir>/bm25.npz        — doc_terms, doc_contrib, idf
    <dir>/vocab.json      — BM25 term list (id = position)

``load_index`` reattaches a fully-functional :class:`HybridIndex` without
re-encoding anything — the moral equivalent of ``query.py``'s
``load_hybrid_indexer`` (``scripts/query.py:31-89``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from domain_rag_system_tpu import __version__
from domain_rag_system_tpu.indexing import BM25Index, DenseIndex, FilterSet, HybridIndex
from domain_rag_system_tpu.models import LexicalHashEmbedder, MedicalEmbedder
from domain_rag_system_tpu.preprocessing.documents import Chunk
from domain_rag_system_tpu.tokenization import Vocabulary
from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)

MANIFEST_NAME = "manifest.json"


@dataclass
class IndexBundle:
    """Paths + manifest of a saved index directory."""

    root: Path
    manifest: Dict

    @classmethod
    def open(cls, root) -> "IndexBundle":
        root = Path(root)
        with open(root / MANIFEST_NAME, "r", encoding="utf-8") as f:
            return cls(root=root, manifest=json.load(f))


def _alive_mask(hybrid: HybridIndex) -> Optional[np.ndarray]:
    """[n_chunks] bool — False for tombstoned chunks; None if all alive."""
    n = len(hybrid.chunks)
    alive = np.ones(n, dtype=bool)
    dense = hybrid.dense_index
    if dense is not None and getattr(dense, "_valid", None) is not None \
            and dense._valid.size >= n:
        alive &= dense._valid[:n].astype(bool)
    bm25 = hybrid.bm25_index
    if bm25 is not None:
        bm = bm25.alive_mask()
        if bm is not None and bm.size >= n:
            alive &= bm[:n]
    return None if bool(alive.all()) else alive


def save_index(hybrid: HybridIndex, out_dir, extra_manifest: Optional[Dict] = None) -> Path:
    """Write a compacted snapshot: tombstoned chunks are DROPPED (their
    rows removed from the dense and BM25 arrays), so a loaded bundle can
    never resurrect deleted chunks. Round-1 saved raw rows and lost the
    validity masks on load."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    alive = _alive_mask(hybrid)
    chunks = (hybrid.chunks if alive is None
              else [c for i, c in enumerate(hybrid.chunks) if alive[i]])

    with open(out / "chunks.jsonl", "w", encoding="utf-8") as f:
        for chunk in chunks:
            f.write(json.dumps(chunk.to_dict(), ensure_ascii=False) + "\n")

    manifest: Dict = {
        "framework_version": __version__,
        "num_chunks": len(chunks),
        "has_dense": hybrid.dense_index is not None,
        "has_bm25": hybrid.bm25_index is not None,
    }

    def compact(rows: np.ndarray) -> np.ndarray:
        return rows if alive is None else rows[alive[: len(rows)]]

    dense = hybrid.dense_index
    if dense is not None and dense.embeddings is not None:
        if dense.quantize:
            arrays = {
                "embeddings_int8": compact(
                    np.asarray(dense.embeddings)[: dense.n_chunks]),
                "row_scale": compact(
                    np.asarray(dense.row_scale)[: dense.n_chunks]),
            }
        else:
            arrays = {
                "embeddings": compact(np.asarray(
                    dense.embeddings, dtype=np.float32)[: dense.n_chunks]),
            }
        embedder_state = {}
        impl = getattr(dense.embedder, "_impl", dense.embedder)
        if hasattr(impl, "state_arrays"):
            embedder_state = {f"embedder_{k}": v for k, v in impl.state_arrays().items()}
        np.savez_compressed(out / "dense.npz", **arrays, **embedder_state)
        manifest["dense"] = {
            "embedding_dim": int(dense.embeddings.shape[1]),
            "distance": dense.distance,
            "collection_name": dense.collection_name,
            "row_block": dense.row_block,
            "quantized": dense.quantize,
            "embedder": dense.embedder.get_model_info(),
        }
        # Learned encoders can't be serialized into the bundle the way the
        # hash embedder's state arrays can — record the checkpoint path so
        # load_index restores the SAME query-time encoder (queries embedded
        # by a different encoder would be scored against incompatible
        # corpus vectors).
        ckpt = getattr(dense.embedder, "checkpoint_path", None)
        if ckpt and not embedder_state:
            manifest["dense"]["encoder_checkpoint"] = str(ckpt)
        # Stacked multi-encoder indexes record the full (checkpoint, weight)
        # stack — load_index must rebuild the SAME concatenated query
        # encoder or dense scores are garbage.
        stack = getattr(dense.embedder, "stack", None)
        if stack and not embedder_state:
            manifest["dense"]["encoder_stack"] = [
                [str(p), float(w)] for p, w in stack]

    bm25 = hybrid.bm25_index
    if bm25 is not None and bm25.doc_terms is not None:
        n = len(hybrid.chunks)
        np.savez_compressed(
            out / "bm25.npz",
            doc_terms=compact(np.asarray(bm25.doc_terms)[:n]),
            doc_contrib=compact(np.asarray(bm25.doc_contrib)[:n]),
            idf=bm25.idf,
        )
        with open(out / "vocab.json", "w", encoding="utf-8") as f:
            json.dump(bm25.vocab.id_to_term, f, ensure_ascii=False)
        manifest["bm25"] = {
            "k1": bm25.k1, "b": bm25.b,
            "vocab_size": len(bm25.vocab),
            "max_doc_terms": bm25.max_doc_terms,
            "max_query_terms": bm25.max_query_terms,
            "stats": bm25.stats,
        }

    if extra_manifest:
        manifest.update(extra_manifest)
    with open(out / MANIFEST_NAME, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2, ensure_ascii=False)
    log.info("saved index bundle to %s (%d chunks)", out, len(hybrid.chunks))
    return out


def load_index(bundle_dir) -> HybridIndex:
    from pathlib import Path as _Path

    if not (_Path(bundle_dir) / MANIFEST_NAME).exists():
        raise FileNotFoundError(
            f"no index bundle at {bundle_dir!r} (missing {MANIFEST_NAME}) — "
            f"build one first: python scripts/preprocess_data.py && "
            f"python scripts/build_index.py")
    bundle = IndexBundle.open(bundle_dir)
    root, manifest = bundle.root, bundle.manifest

    chunks = []
    with open(root / "chunks.jsonl", "r", encoding="utf-8") as f:
        for line in f:
            chunks.append(Chunk.from_dict(json.loads(line)))

    dense_index = None
    if manifest.get("has_dense") and (root / "dense.npz").exists():
        data = np.load(root / "dense.npz", allow_pickle=False)
        emb_state = {k.removeprefix("embedder_"): data[k]
                     for k in data.files if k.startswith("embedder_")}
        ckpt = manifest["dense"].get("encoder_checkpoint")
        stack = manifest["dense"].get("encoder_stack")
        if emb_state:
            embedder = MedicalEmbedder(dim=int(emb_state["meta"][0]))
            embedder._impl = LexicalHashEmbedder.from_state_arrays(emb_state)
        elif stack:
            # Stacked bundle: every sub-encoder checkpoint must exist.
            missing = [p for p, _ in stack if not Path(p).exists()]
            if missing:
                raise FileNotFoundError(
                    f"index bundle was built with a stacked encoder whose "
                    f"checkpoints {missing} no longer exist — restore them "
                    f"or rebuild the index")
            embedder = MedicalEmbedder(backend="stacked",
                                       stack=[(p, w) for p, w in stack],
                                       batch_size=128)
            if embedder.backend_name != "StackedBertEmbedder":
                # the facade degrades to lexical-hash on load failure —
                # for a bundle that is a silent mismatch; fail loudly
                raise RuntimeError(
                    "stacked encoder reconstruction failed for bundle "
                    f"{bundle_dir!r} — see log for the degradation cause")
        elif ckpt:
            # Bundle was built with a learned encoder: queries MUST be
            # embedded by the same checkpoint or dense scores are garbage.
            # Fail loudly rather than degrade to a mismatched embedder.
            if not Path(ckpt).exists():
                raise FileNotFoundError(
                    f"index bundle was built with encoder checkpoint "
                    f"{ckpt!r}, which no longer exists — restore it or "
                    f"rebuild the index")
            embedder = MedicalEmbedder(backend="bert", checkpoint_path=ckpt,
                                       batch_size=128)
        else:
            embedder = MedicalEmbedder()
        dcfg = manifest["dense"]
        dense_index = DenseIndex(
            embedder,
            collection_name=dcfg.get("collection_name", "medical_rag"),
            distance=dcfg.get("distance", "cosine"),
            row_block=dcfg.get("row_block", 1024),
            dtype="int8" if dcfg.get("quantized") else "float32",
        )
        if dcfg.get("quantized"):
            # reload the quantized rows directly (dequantize for the
            # precomputed path; index_chunks re-quantizes losslessly since
            # values are exact multiples of the scales)
            dequant = (data["embeddings_int8"].astype(np.float32)
                       * data["row_scale"][:, None])
            dense_index.index_chunks(chunks, precomputed=dequant)
        else:
            dense_index.index_chunks(chunks, precomputed=data["embeddings"])

    bm25_index = None
    if manifest.get("has_bm25") and (root / "bm25.npz").exists():
        data = np.load(root / "bm25.npz", allow_pickle=False)
        bcfg = manifest["bm25"]
        bm25_index = BM25Index(
            k1=bcfg.get("k1", 1.5), b=bcfg.get("b", 0.75),
            max_doc_terms=bcfg.get("max_doc_terms", 128),
            max_query_terms=bcfg.get("max_query_terms", 64),
        )
        with open(root / "vocab.json", "r", encoding="utf-8") as f:
            bm25_index.vocab = Vocabulary(json.load(f))
        bm25_index.chunks = chunks
        bm25_index.doc_terms = jnp.asarray(data["doc_terms"])
        bm25_index.doc_contrib = jnp.asarray(data["doc_contrib"])
        bm25_index.idf = data["idf"]
        bm25_index.stats = bcfg.get("stats", {})
        bm25_index._filters = FilterSet(chunks)

    hybrid = HybridIndex(dense_index=dense_index, bm25_index=bm25_index)
    hybrid.chunks = chunks
    log.info("loaded index bundle from %s (%d chunks)", root, len(chunks))
    return hybrid


def snapshot_index(hybrid: HybridIndex) -> HybridIndex:
    """Cheap consistent snapshot for saving without blocking the serving
    lock: index mutations REPLACE the device arrays (never modify them in
    place), so shallow-copying the wrappers plus the mutable host masks
    and chunk lists yields a stable view; ``save_index`` on the snapshot
    can then run outside the lock while queries continue."""
    import copy

    snap = copy.copy(hybrid)
    snap.chunks = list(hybrid.chunks)
    if hybrid.dense_index is not None:
        d = copy.copy(hybrid.dense_index)
        d.chunks = list(d.chunks)
        if getattr(d, "_valid", None) is not None:
            d._valid = d._valid.copy()
        snap.dense_index = d
    if hybrid.bm25_index is not None:
        b = copy.copy(hybrid.bm25_index)
        b.chunks = list(b.chunks)
        if b._alive.size:
            b._alive = b._alive.copy()
        snap.bm25_index = b
    return snap
