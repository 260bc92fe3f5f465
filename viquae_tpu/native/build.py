"""Build + load the native components (ctypes over g++-compiled .so).

Compilation happens lazily at first use and is cached next to the source
(mtime-checked). Set VIQUAE_NO_NATIVE=1 to force the pure-Python paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

_HERE = Path(__file__).parent
_CACHE: dict = {}


def _compile(source: Path, out: Path):
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", str(source), "-o", str(out),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load(name: str) -> Optional[ctypes.CDLL]:
    if os.environ.get("VIQUAE_NO_NATIVE"):
        return None
    if name in _CACHE:
        return _CACHE[name]
    source = _HERE / f"{name}.cpp"
    out = _HERE / f"_{name}.so"
    try:
        if not out.exists() or out.stat().st_mtime < source.stat().st_mtime:
            _compile(source, out)
        lib = ctypes.CDLL(str(out))
    except (subprocess.CalledProcessError, OSError):
        lib = None
    _CACHE[name] = lib
    return lib


def load_answer_span_matcher():
    """ctypes handle to match_batch, or None (fallback to numpy)."""
    lib = _load("answer_spans")
    if lib is None:
        return None
    import numpy as np
    from numpy.ctypeslib import ndpointer

    fn = lib.match_batch
    fn.restype = None
    fn.argtypes = [
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # input_ids
        ctypes.c_int64, ctypes.c_int64,               # n_rows, seq_len
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # answer_tokens
        ndpointer(np.int64, flags="C_CONTIGUOUS"),    # answer_offsets
        ndpointer(np.int64, flags="C_CONTIGUOUS"),    # row_answer_offsets
        ctypes.c_int32,                               # max_n
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # out_starts
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # out_ends
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # out_counts
    ]
    return fn


def load_bm25_scorer():
    """ctypes handle to bm25_score_batch, or None (fallback to numpy)."""
    lib = _load("bm25_scorer")
    if lib is None:
        return None
    import numpy as np
    from numpy.ctypeslib import ndpointer

    fn = lib.bm25_score_batch
    fn.restype = None
    fn.argtypes = [
        ndpointer(np.int64, flags="C_CONTIGUOUS"),    # offsets
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # docs
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # tfs
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # idf
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # norm
        ctypes.c_int64,                               # n_docs
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # query_terms
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # query_tfs
        ndpointer(np.int64, flags="C_CONTIGUOUS"),    # query_offsets
        ctypes.c_int64,                               # n_queries
        ctypes.c_int32,                               # k
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # out_scores
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # out_indices
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # out_counts
    ]
    return fn


def load_bm25_maxscore():
    """ctypes handle to bm25_maxscore_batch (term-upper-bound pruning,
    rank-safe exact top-k), or None (fallback to the TAAT scorer)."""
    lib = _load("bm25_scorer")
    if lib is None or not hasattr(lib, "bm25_maxscore_batch"):
        return None
    import numpy as np
    from numpy.ctypeslib import ndpointer

    fn = lib.bm25_maxscore_batch
    fn.restype = None
    fn.argtypes = [
        ndpointer(np.int64, flags="C_CONTIGUOUS"),    # offsets
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # docs
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # tfs
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # idf
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # norm
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # term_ub
        ctypes.c_int64,                               # n_docs
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # query_terms
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # query_tfs
        ndpointer(np.int64, flags="C_CONTIGUOUS"),    # query_offsets
        ctypes.c_int64,                               # n_queries
        ctypes.c_int32,                               # k
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # out_scores
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # out_indices
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # out_counts
    ]
    return fn


def load_bm25_maxscore_mt():
    """ctypes handle to bm25_maxscore_batch_mt (the MaxScore driver over a
    std::thread pool, strided query assignment), or None."""
    lib = _load("bm25_scorer")
    if lib is None or not hasattr(lib, "bm25_maxscore_batch_mt"):
        return None
    import numpy as np
    from numpy.ctypeslib import ndpointer

    fn = lib.bm25_maxscore_batch_mt
    fn.restype = None
    fn.argtypes = [
        ndpointer(np.int64, flags="C_CONTIGUOUS"),    # offsets
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # docs
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # tfs
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # idf
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # norm
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # term_ub
        ctypes.c_int64,                               # n_docs
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # query_terms
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # query_tfs
        ndpointer(np.int64, flags="C_CONTIGUOUS"),    # query_offsets
        ctypes.c_int64,                               # n_queries
        ctypes.c_int32,                               # k
        ndpointer(np.float32, flags="C_CONTIGUOUS"),  # out_scores
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # out_indices
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # out_counts
        ctypes.c_int32,                               # n_threads
    ]
    return fn


def load_packer():
    """ctypes handle to pack_sequences, or None (fallback to numpy)."""
    lib = _load("packer")
    if lib is None:
        return None
    import numpy as np
    from numpy.ctypeslib import ndpointer

    fn = lib.pack_sequences
    fn.restype = ctypes.c_int64
    fn.argtypes = [
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # tokens (concat)
        ndpointer(np.int64, flags="C_CONTIGUOUS"),    # offsets (n+1)
        ctypes.c_int64,                               # n_seqs
        ctypes.c_int64,                               # row_len
        ctypes.c_int64,                               # max_rows
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # input_ids
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # segment_ids
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # position_ids
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # cls_rows
        ndpointer(np.int32, flags="C_CONTIGUOUS"),    # cls_cols
        ndpointer(np.int64, flags="C_CONTIGUOUS"),    # rows_used_out
    ]
    return fn
