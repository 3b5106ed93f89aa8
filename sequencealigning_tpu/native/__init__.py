"""Native (C) runtime components with pure-Python fallbacks.

The shared library is built on demand from seqalign_native.c (cc -O3, with
an -O2 fallback) and loaded via ctypes; if the toolchain or build fails,
callers transparently
fall back to the Python implementations (io.fasta / ops.traceback), which
are semantically identical (tests assert equality).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "seqalign_native.c")
_LIB = os.path.join(_HERE, f"libseqalign_native-{sys.implementation.cache_tag}.so")

_lib = None
_tried = False


def _build() -> Optional[str]:
    # -O3 vectorizes the WFA wavefront loops (the source multi-versions the
    # hot function across ISAs via target_clones, so the binary stays
    # portable); fall back to -O2 for toolchains where -O3 fails.
    for cc in ("cc", "gcc", "clang"):
        for opt in ("-O3", "-O2"):
            try:
                subprocess.run(
                    [cc, opt, "-shared", "-fPIC", "-pthread", "-o", _LIB, _SRC],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                return _LIB
            except (OSError, subprocess.SubprocessError):
                continue
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    stale = os.path.exists(_LIB) and (
        os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    )
    path = _LIB if os.path.exists(_LIB) and not stale else _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.fasta_scan.restype = ctypes.c_long
    lib.fasta_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_long),
        ctypes.c_long,
    ]
    lib.wfa_compat_align.restype = ctypes.c_long
    lib.wfa_compat_align.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_long,
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.fast4_first_path_batch.restype = None
    lib.fast4_first_path_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int), ctypes.c_long,
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_long),
        ctypes.c_int,
    ]
    lib.gotoh_first_path.restype = ctypes.c_long
    lib.gotoh_first_path.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_long,
    ]
    lib.banded_fast4_first_path.restype = ctypes.c_long
    lib.banded_fast4_first_path.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_long,
    ]
    lib.banded_diag_fast4_first_path.restype = ctypes.c_long
    lib.banded_diag_fast4_first_path.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_long,
    ]
    lib.wfa_textbook_traceback.restype = ctypes.c_long
    lib.wfa_textbook_traceback.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
    ]
    lib.astar_align_native.restype = ctypes.c_long
    lib.astar_align_native.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_int, ctypes.c_long,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.astar_align_batch.restype = None
    lib.astar_align_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_long),
        ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_int, ctypes.c_long,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
    ]
    lib.walk_decode_batch.restype = None
    lib.walk_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ctypes.c_long,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.c_int,
    ]
    lib.wfa_textbook_align_batch.restype = None
    lib.wfa_textbook_align_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_long),
        ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_long, ctypes.c_long,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def fasta_scan_native(contents: bytes):
    """Native FASTA scan.  Returns (records, err_chars) where records is a
    list of (seq_bytes, name_bytes) -- the throwaway record already dropped
    -- or None if the native library is unavailable or capacity exceeded."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(contents)
    max_recs = contents.count(b">") + 2
    seq_buf = np.empty(n + 1, np.uint8)
    name_buf = np.empty(n + 2, np.uint8)
    seq_off = np.empty(max_recs + 1, np.int64)
    name_off = np.empty(max_recs + 1, np.int64)
    err_buf = np.empty(n + 1, np.uint8)
    n_err = ctypes.c_long(0)
    n_rec = lib.fasta_scan(
        contents, n,
        seq_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        seq_off.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        name_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        name_off.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        err_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(n_err),
        max_recs,
    )
    if n_rec < 0:
        return None
    seqs = seq_buf.tobytes()
    names = name_buf.tobytes()
    records = []
    for i in range(1, n_rec):  # drop the throwaway record 0
        records.append(
            (
                seqs[seq_off[i] : seq_off[i + 1]],
                names[name_off[i] : name_off[i + 1]],
            )
        )
    errs = [chr(c) for c in err_buf[: n_err.value]]
    return records, errs


def gotoh_first_path_native(
    dirs_b: np.ndarray,
    finals_b: np.ndarray,
    n1: int,
    n2: int,
    compat: bool = True,
    d_offset: int = 0,
) -> Optional[str]:
    """Native first-co-optimal-path walk.  Returns the op string
    ('M'/'I'/'D' per column, forward order), None if native unavailable,
    or raises AlignmentError on a reference-panic boundary."""
    from sequencealigning_tpu.errors import AlignmentError

    lib = get_lib()
    if lib is None:
        return None
    dirs_b = np.ascontiguousarray(dirs_b, dtype=np.uint32)
    d4, p = dirs_b.shape
    cap = n1 + n2 + 2
    out = ctypes.create_string_buffer(cap)
    r = lib.gotoh_first_path(
        dirs_b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        d4, p, d_offset, n1, n2, 1 if compat else 0,
        int(finals_b[0]), int(finals_b[1]), int(finals_b[2]),
        out, cap,
    )
    if r == -1:
        raise AlignmentError(
            "reference would panic: boundary-chain traceback"
        )
    if r < 0:
        return None
    return out.raw[:r].decode("ascii")


_WFA_ERRORS = {
    -1: "WFA did not converge within max_steps",
    -2: "WFA provably never converges on this pair (the reference binary "
        "would hang: greedy extension overshoots the len-1 convergence "
        "cell, wfa.rs:127-139 vs :189)",
    -3: "empty sequence: the reference never converges (usize wrap)",
    -5: "reference would panic: slice start > end",
    -6: "reference would panic: slice out of range",
    -7: "WFA traceback did not terminate",
}


def wfa_compat_align_native(
    seq1: bytes,
    seq2: bytes,
    penalties,
    pruning,
    max_steps: int,
):
    """Native compat-WFA (fill + rec_tr traceback).  Returns
    (score, aligned_seq1, aligned_seq2), None if the library is
    unavailable, or raises AlignmentError exactly like the Python oracle."""
    from sequencealigning_tpu.errors import AlignmentError

    lib = get_lib()
    if lib is None:
        return None
    n1, n2 = len(seq1), len(seq2)
    cap = n1 + n2 + 16
    a1 = ctypes.create_string_buffer(cap)
    a2 = ctypes.create_string_buffer(cap)
    lens = (ctypes.c_long * 2)()
    s1 = np.frombuffer(seq1, np.uint8)
    s2 = np.frombuffer(seq2, np.uint8)
    r = lib.wfa_compat_align(
        s1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n1,
        s2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n2,
        penalties.mismatch, penalties.gap_open, penalties.gap_extend,
        pruning.min_length, pruning.max_diff, max_steps,
        a1, a2, lens,
    )
    if r < 0:
        if r == -4:
            return None  # allocation/capacity problem: use the Python path
        raise AlignmentError(_WFA_ERRORS.get(int(r), f"native error {r}"))
    return (
        int(r),
        a1.raw[: lens[0]].decode("latin-1"),
        a2.raw[: lens[1]].decode("latin-1"),
    )


def fast4_first_path_batch_native(
    dirs: np.ndarray,
    finals: np.ndarray,
    rows: np.ndarray,
    d_offs: np.ndarray,
    n1s: np.ndarray,
    n2s: np.ndarray,
    n_threads: int = 8,
):
    """Threaded native first-path walks over a (T8, R, P) fast4 dirs
    tensor.  Returns a list of forward op strings ('M'/'I'/'D'), None per
    pair on walker failure, or None overall if the library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    dirs = np.ascontiguousarray(dirs, dtype=np.uint32)
    t8, r, p = dirs.shape
    b_total = len(rows)
    n1s = np.ascontiguousarray(n1s, np.int64)
    n2s = np.ascontiguousarray(n2s, np.int64)
    rows = np.ascontiguousarray(rows, np.int64)
    d_offs = np.ascontiguousarray(d_offs, np.int64)
    finals = np.ascontiguousarray(finals, np.int32)
    out_cap = int(n1s.max() + n2s.max() + 8) if b_total else 8
    outs = ctypes.create_string_buffer(b_total * out_cap)
    lens = np.zeros(b_total, np.int64)
    lib.fast4_first_path_batch(
        dirs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), r, p,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        d_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n1s.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n2s.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        finals.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), b_total,
        outs, out_cap,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n_threads,
    )
    raw = outs.raw
    results = []
    for b in range(b_total):
        n = int(lens[b])
        if n < 0:
            results.append(None)
        else:
            results.append(raw[b * out_cap : b * out_cap + n].decode("ascii"))
    return results


def banded_fast4_first_path_native(
    dirs: np.ndarray,
    b: int,
    k_lo: int,
    n1: int,
    n2: int,
    finals_b,
):
    """Native first-path walk over an (X8, B, K) banded fast4 dirs tensor.
    Returns the forward op string ('M'/'I'/'D'), or None if unavailable /
    the walker failed."""
    lib = get_lib()
    if lib is None:
        return None
    dirs = np.ascontiguousarray(dirs, dtype=np.uint32)
    _, b_dim, k_dim = dirs.shape
    cap = n1 + n2 + 8
    out = ctypes.create_string_buffer(cap)
    n = lib.banded_fast4_first_path(
        dirs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        b_dim, k_dim, b, k_lo, n1, n2,
        int(finals_b[0]), int(finals_b[1]), int(finals_b[2]),
        out, cap,
    )
    if n < 0:
        return None
    return out.raw[:n].decode("ascii")


def banded_diag_fast4_first_path_native(
    dirs: np.ndarray,
    b: int,
    k_lo_even: int,
    n1: int,
    n2: int,
    finals_b,
):
    """Native first-path walk over an (Aw, B, L) wavefront-packed fast4
    dirs tensor (ops.nw_banded_diag layout).  Returns the forward op
    string, or None if unavailable / the walker failed."""
    lib = get_lib()
    if lib is None:
        return None
    dirs = np.ascontiguousarray(dirs, dtype=np.uint32)
    w_dim, b_dim, k_dim = dirs.shape
    cap = n1 + n2 + 8
    out = ctypes.create_string_buffer(cap)
    n = lib.banded_diag_fast4_first_path(
        dirs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        w_dim, b_dim, k_dim, b, k_lo_even, n1, n2,
        int(finals_b[0]), int(finals_b[1]), int(finals_b[2]),
        out, cap,
    )
    if n < 0:
        return None
    return out.raw[:n].decode("ascii")


def wfa_textbook_align_batch_native(
    pairs,
    penalties,
    s_max: int = 1 << 40,
    budget: int = 1 << 30,
    n_threads: Optional[int] = None,
):
    """Threaded exact textbook-WFA fill + traceback on the host (no band).

    Returns a list with one entry per pair: (penalty, aligned_seq1,
    aligned_seq2), or None for a pair the engine declined (memory budget /
    s_max) -- the caller falls back per pair.  Returns None overall if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    B = len(pairs)
    buf1 = b"".join(p[0] for p in pairs)
    buf2 = b"".join(p[1] for p in pairs)
    off1 = np.zeros(B + 1, np.int64)
    off2 = np.zeros(B + 1, np.int64)
    np.cumsum([len(p[0]) for p in pairs], out=off1[1:])
    np.cumsum([len(p[1]) for p in pairs], out=off2[1:])
    cap = int(
        max((len(p[0]) + len(p[1]) for p in pairs), default=0) + 8
    )
    a1s = ctypes.create_string_buffer(max(1, B * cap))
    a2s = ctypes.create_string_buffer(max(1, B * cap))
    pens = np.zeros(B, np.int64)
    lens = np.zeros(B, np.int64)
    if n_threads is None:
        n_threads = min(32, os.cpu_count() or 8)
    # The C budget is PER PAIR and up to min(n_threads, B) pairs fill
    # concurrently; divide so the aggregate transient stays ~`budget`.
    per_pair_budget = max(1 << 22, budget // max(1, min(n_threads, B)))
    u8 = lambda b: ctypes.cast(ctypes.c_char_p(b), ctypes.POINTER(ctypes.c_uint8))
    lib.wfa_textbook_align_batch(
        u8(buf1), off1.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        u8(buf2), off2.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        B,
        penalties.mismatch, penalties.gap_open, penalties.gap_extend,
        s_max, per_pair_budget,
        a1s, a2s, cap,
        pens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n_threads,
    )
    r1 = a1s.raw
    r2 = a2s.raw
    out = []
    for b in range(B):
        if pens[b] < 0:
            out.append(None)
        else:
            n = int(lens[b])
            out.append(
                (
                    int(pens[b]),
                    r1[b * cap : b * cap + n].decode("latin-1"),
                    r2[b * cap : b * cap + n].decode("latin-1"),
                )
            )
    return out


def wfa_textbook_traceback_native(
    hist: np.ndarray,
    b: int,
    k_lo: int,
    score: int,
    seq1: bytes,
    seq2: bytes,
    penalties,
    stride: int = 1,
):
    """Native textbook-WFA alignment reconstruction from the (S, 3, B, K)
    int16 offset log (row j = score j * stride, the penalty-lattice step).
    Returns (aligned_seq1, aligned_seq2) or None if unavailable / the
    walker failed."""
    lib = get_lib()
    if lib is None:
        return None
    hist = np.ascontiguousarray(hist, np.int16)
    S, _, B, K = hist.shape
    n1, n2 = len(seq1), len(seq2)
    cap = n1 + n2 + 8
    a1 = ctypes.create_string_buffer(cap)
    a2 = ctypes.create_string_buffer(cap)
    s1 = np.frombuffer(seq1, np.uint8)
    s2 = np.frombuffer(seq2, np.uint8)
    u8p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n = lib.wfa_textbook_traceback(
        hist.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        S, B, K, b, k_lo, score, stride,
        u8p(s1) if n1 else ctypes.cast(ctypes.c_char_p(b""),
                                       ctypes.POINTER(ctypes.c_uint8)),
        n1,
        u8p(s2) if n2 else ctypes.cast(ctypes.c_char_p(b""),
                                       ctypes.POINTER(ctypes.c_uint8)),
        n2,
        penalties.mismatch, penalties.gap_open, penalties.gap_extend,
        a1, a2, cap,
    )
    if n < 0:
        return None
    return a1.raw[:n].decode("latin-1"), a2.raw[:n].decode("latin-1")


def walk_decode_batch_native(
    packed: np.ndarray,
    s1p: np.ndarray,
    s2p: np.ndarray,
    n1s: np.ndarray,
    n2s: np.ndarray,
    n_threads: int = 8,
):
    """Threaded decode of the device traceback walker's packed 2-bit op
    codes (ops.traceback_device) straight to aligned string pairs.
    Returns a list of (aligned1, aligned2) with None per inconsistent
    pair, or None overall if the library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, np.uint32)
    s1p = np.ascontiguousarray(s1p, np.uint8)
    s2p = np.ascontiguousarray(s2p, np.uint8)
    n1s = np.ascontiguousarray(n1s, np.int64)
    n2s = np.ascontiguousarray(n2s, np.int64)
    b_total, t16 = packed.shape
    cap = int(n1s.max() + n2s.max() + 8) if b_total else 8
    out1 = ctypes.create_string_buffer(b_total * cap)
    out2 = ctypes.create_string_buffer(b_total * cap)
    lens = np.zeros(b_total, np.int64)
    lib.walk_decode_batch(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), t16,
        s1p.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), s1p.shape[1],
        s2p.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), s2p.shape[1],
        n1s.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n2s.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        b_total, out1, out2, cap,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), n_threads,
    )
    r1, r2 = out1.raw, out2.raw
    results = []
    for b in range(b_total):
        n = int(lens[b])
        if n < 0:
            results.append(None)
        else:
            results.append(
                (
                    r1[b * cap : b * cap + n].decode("latin-1"),
                    r2[b * cap : b * cap + n].decode("latin-1"),
                )
            )
    return results


def astar_align_native(
    seq1: bytes,
    seq2: bytes,
    match: int,
    mismatch: int,
    gap_open: int,
    gap_extend: int,
    epsilon: float,
    semi_global: bool = False,
    max_expansions: int = 5_000_000,
):
    """Native weighted-A* search, bit-identical to ops.oracle_astar
    (incl. Rust BinaryHeap pop order).  Returns (score, aligned1,
    aligned2), raises AlignmentError with the oracle's message on
    non-convergence / expansion cap, or returns None if the library is
    missing (caller falls back to the Python oracle)."""
    lib = get_lib()
    if lib is None:
        return None
    from sequencealigning_tpu.errors import AlignmentError

    n1, n2 = len(seq1), len(seq2)
    if n1 == 0 or n2 == 0:
        raise AlignmentError(
            "One of the provided sequences was empty. Alignment is skipped"
        )
    cap = n1 + n2 + 8
    out1 = ctypes.create_string_buffer(cap)
    out2 = ctypes.create_string_buffer(cap)
    out_len = ctypes.c_long(0)
    out_score = ctypes.c_int32(0)
    s1 = np.frombuffer(seq1, np.uint8)
    s2 = np.frombuffer(seq2, np.uint8)
    rc = lib.astar_align_native(
        s1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n1,
        s2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n2,
        match, mismatch, gap_open, gap_extend,
        float(epsilon), int(bool(semi_global)), max_expansions,
        out1, out2, cap,
        ctypes.byref(out_len), ctypes.byref(out_score),
    )
    if rc == -1:
        raise AlignmentError("Alignment did not converge")
    if rc == -2:
        raise AlignmentError("A* exceeded max_expansions")
    if rc < 0:
        return None  # allocation failure: fall back to the Python oracle
    n = out_len.value
    return (
        int(out_score.value),
        out1.raw[:n].decode("latin-1"),
        out2.raw[:n].decode("latin-1"),
    )


def astar_align_batch_native(
    seqs1,
    seqs2,
    match: int,
    mismatch: int,
    gap_open: int,
    gap_extend: int,
    epsilon: float,
    semi_global: bool = False,
    max_expansions: int = 5_000_000,
    n_threads: int = 8,
):
    """Threaded batch of native weighted-A* searches (per-pair isolation
    like the reference driver's pair loop).  Returns a list per pair:
    (score, aligned1, aligned2), or the oracle's AlignmentError message
    string on a search failure; or None overall if the library is
    missing."""
    lib = get_lib()
    if lib is None:
        return None
    b_total = len(seqs1)
    off1 = np.zeros(b_total + 1, np.int64)
    off2 = np.zeros(b_total + 1, np.int64)
    for b in range(b_total):
        off1[b + 1] = off1[b] + len(seqs1[b])
        off2[b + 1] = off2[b] + len(seqs2[b])
    buf1 = np.frombuffer(b"".join(seqs1), np.uint8) if off1[-1] else np.zeros(1, np.uint8)
    buf2 = np.frombuffer(b"".join(seqs2), np.uint8) if off2[-1] else np.zeros(1, np.uint8)
    lens1 = np.diff(off1)
    lens2 = np.diff(off2)
    cap = int((lens1.max() if b_total else 0) + (lens2.max() if b_total else 0) + 8)
    out1 = ctypes.create_string_buffer(b_total * cap)
    out2 = ctypes.create_string_buffer(b_total * cap)
    lens = np.zeros(b_total, np.int64)
    scores = np.zeros(b_total, np.int32)
    lib.astar_align_batch(
        buf1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        off1.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        buf2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        off2.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        b_total, match, mismatch, gap_open, gap_extend,
        float(epsilon), int(bool(semi_global)), max_expansions,
        out1, out2, cap,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    r1, r2 = out1.raw, out2.raw
    results = []
    for b in range(b_total):
        n = int(lens[b])
        if n == -1:
            results.append("Alignment did not converge")
        elif n == -2:
            results.append("A* exceeded max_expansions")
        elif n == -4:
            results.append(
                "One of the provided sequences was empty. "
                "Alignment is skipped"
            )
        elif n < 0:
            results.append(None)  # allocation failure: caller falls back
        else:
            results.append(
                (
                    int(scores[b]),
                    r1[b * cap : b * cap + n].decode("latin-1"),
                    r2[b * cap : b * cap + n].decode("latin-1"),
                )
            )
    return results
