"""ctypes bindings for the native host runtime (native/drs_native.cpp).

Loads ``libdrsnative.so``, building it on demand with g++ when missing.
Every entry point degrades to the pure-Python implementation when the
toolchain or library is unavailable, so the framework never hard-depends on
the native component.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libdrsnative.so"
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


_SOURCES = ("drs_native.cpp", "drs_http.cpp")


def _build() -> bool:
    def compile_srcs(srcs) -> bool:
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 "-o", str(_SO_PATH)] + [str(s) for s in srcs],
                check=True, capture_output=True, timeout=120,
            )
            log.info("built native library → %s",
                     ", ".join(s.name for s in srcs))
            return True
        except Exception as exc:
            log.warning("native build failed for %s: %s",
                        [s.name for s in srcs], exc)
            return False

    srcs = [_NATIVE_DIR / s for s in _SOURCES if (_NATIVE_DIR / s).exists()]
    if not srcs:
        return False
    marker = _SO_PATH.with_suffix(".so.partial")
    if compile_srcs(srcs):
        marker.unlink(missing_ok=True)
        return True
    # the HTTP front needs Linux epoll/eventfd; if it won't compile here,
    # fall back to the tokenizer-only library rather than losing ALL
    # native acceleration (native_http detects the missing symbols). The
    # marker makes _stale() retry the FULL build next process start, so a
    # transient g++ failure can't lock the degraded library in forever.
    core = [s for s in srcs if s.name == "drs_native.cpp"]
    if core and len(core) < len(srcs) and compile_srcs(core):
        marker.touch()
        return True
    return False


def _stale() -> bool:
    """True when the library is missing, older than any of its sources,
    or a partial (tokenizer-only fallback) build that should be retried."""
    if not _SO_PATH.exists():
        return True
    if _SO_PATH.with_suffix(".so.partial").exists():
        return True
    lib_mtime = _SO_PATH.stat().st_mtime
    return any((_NATIVE_DIR / s).exists()
               and (_NATIVE_DIR / s).stat().st_mtime > lib_mtime
               for s in _SOURCES)


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if _stale() and not _build() and not _SO_PATH.exists():
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
        lib.drs_corpus_tokenize.restype = ctypes.c_void_p
        lib.drs_corpus_tokenize.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_char_p]
        lib.drs_vocab_size.restype = ctypes.c_int64
        lib.drs_vocab_size.argtypes = [ctypes.c_void_p]
        lib.drs_vocab_bytes.restype = ctypes.c_int64
        lib.drs_vocab_bytes.argtypes = [ctypes.c_void_p]
        lib.drs_copy_vocab.restype = None
        lib.drs_copy_vocab.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.drs_total_tokens.restype = ctypes.c_int64
        lib.drs_total_tokens.argtypes = [ctypes.c_void_p]
        lib.drs_copy_tokens.restype = None
        lib.drs_copy_tokens.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64)]
        lib.drs_free.restype = None
        lib.drs_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as exc:
        log.warning("native library unusable: %s", exc)
        _lib_failed = True
    return _lib


def tokenize_corpus_native(
    texts: List[str],
    preserved: Optional[List[str]] = None,
) -> Optional[Tuple[List[str], List[np.ndarray]]]:
    """Native corpus tokenization → (sorted vocab, per-doc term-id arrays).

    Returns None when the native library is unavailable (callers fall back
    to the Python tokenizer).
    """
    lib = get_lib()
    if lib is None:
        return None

    encoded = [t.encode("utf-8") for t in texts]
    buf = b"".join(encoded)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum([len(e) for e in encoded], out=offsets[1:])
    preserved_blob = "\n".join(preserved or []).encode("utf-8")

    handle = lib.drs_corpus_tokenize(
        buf, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(texts), preserved_blob)
    if not handle:
        return None
    try:
        vocab_bytes = lib.drs_vocab_bytes(handle)
        vocab_buf = ctypes.create_string_buffer(int(vocab_bytes))
        lib.drs_copy_vocab(handle, vocab_buf)
        vocab = vocab_buf.raw.decode("utf-8").split("\n")[:-1]

        total = lib.drs_total_tokens(handle)
        ids = np.zeros(int(total), dtype=np.int32)
        doc_offsets = np.zeros(len(texts) + 1, dtype=np.int64)
        lib.drs_copy_tokens(
            handle, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            doc_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        docs = [ids[doc_offsets[i]:doc_offsets[i + 1]]
                for i in range(len(texts))]
        return vocab, docs
    finally:
        lib.drs_free(handle)


class NativeWordPiece:
    """C++ greedy WordPiece encoder (drs_wordpiece_* entry points).

    Construction fails (returns None from :func:`make_native_wordpiece`) when
    the native library is unavailable; parity with the Python tokenizer is
    asserted by tests over the recovered corpora.
    """

    def __init__(self, lib: ctypes.CDLL, vocab: List[str]):
        self._lib = lib
        blob = "\n".join(vocab).encode("utf-8")
        self._handle = lib.drs_wordpiece_create(blob)

    def encode_batch(self, texts: List[str], max_length: int):
        encoded = [t.encode("utf-8") for t in texts]
        buf = b"".join(encoded)
        offsets = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum([len(e) for e in encoded], out=offsets[1:])
        ids = np.zeros((len(texts), max_length), dtype=np.int32)
        mask = np.zeros((len(texts), max_length), dtype=np.int32)
        self._lib.drs_wordpiece_encode(
            self._handle, buf,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(texts), max_length,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        types = np.zeros_like(ids)
        return ids, mask, types

    def __del__(self):
        try:
            self._lib.drs_wordpiece_free(self._handle)
        except Exception:
            pass


def make_native_wordpiece(vocab: List[str]) -> "NativeWordPiece | None":
    lib = get_lib()
    if lib is None:
        return None
    try:
        lib.drs_wordpiece_create.restype = ctypes.c_void_p
        lib.drs_wordpiece_create.argtypes = [ctypes.c_char_p]
        lib.drs_wordpiece_encode.restype = None
        lib.drs_wordpiece_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.drs_wordpiece_free.restype = None
        lib.drs_wordpiece_free.argtypes = [ctypes.c_void_p]
        return NativeWordPiece(lib, vocab)
    except Exception as exc:
        log.warning("native wordpiece unavailable: %s", exc)
        return None
