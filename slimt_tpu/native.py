"""ctypes loader for the native host library (native/slimt_host.cpp).

Builds on demand with the in-tree Makefile (g++); all callers fall
back to the pure-Python implementations when the toolchain or library
is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libslimt_host.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-s", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        lib.slimt_vocab_create.restype = ctypes.c_void_p
        lib.slimt_vocab_create.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_uint32,
            ctypes.c_uint32,
        ]
        lib.slimt_vocab_destroy.argtypes = [ctypes.c_void_p]
        lib.slimt_vocab_encode.restype = ctypes.c_int
        lib.slimt_vocab_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
        ]
        # Pointer args typed c_void_p so callers can pass the raw
        # ndarray.ctypes.data integer (no per-call data_as cast).
        lib.slimt_vocab_decode.restype = ctypes.c_int
        lib.slimt_vocab_decode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.slimt_vocab_encode_batch.restype = ctypes.c_int64
        lib.slimt_vocab_encode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.slimt_vocab_decode_batch.restype = ctypes.c_int
        lib.slimt_vocab_decode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.slimt_hash_words.restype = ctypes.c_uint64
        lib.slimt_hash_words.argtypes = [
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32), ctypes.c_int
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def hash_words(seed: int, words: Sequence[int]) -> Optional[int]:
    lib = _load()
    if lib is None:
        return None
    arr = np.asarray(list(words), dtype=np.uint32)
    return int(
        lib.slimt_hash_words(
            ctypes.c_uint64(seed),
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(arr),
        )
    )


class NativeVocab:
    """Native unigram segmenter over a piece table."""

    def __init__(self, pieces, unk_id: int, normalizer):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        blob = b"".join(p.piece.encode("utf-8") for p in pieces)
        # Worst-case per-token surface bytes for decode buffers: the
        # longest piece, or " ⁇ " (5 bytes) for unknowns.
        self._max_surface = max(
            [5] + [len(p.piece.encode("utf-8")) for p in pieces]
        )
        offsets = np.zeros(len(pieces) + 1, np.uint32)
        np.cumsum(
            [len(p.piece.encode("utf-8")) for p in pieces], out=offsets[1:]
        )
        scores = np.asarray([p.score for p in pieces], np.float32)
        types = np.asarray([p.type for p in pieces], np.uint8)
        self._handle = ctypes.c_void_p(
            lib.slimt_vocab_create(
                blob,
                offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                types.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                len(pieces),
                unk_id,
            )
        )
        self._norm = normalizer

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.slimt_vocab_destroy(handle)

    def encode(self, line: str) -> Tuple[List[int], List[Tuple[int, int]]]:
        data = line.encode("utf-8")
        cap = 2 * len(data) + 8
        ids = np.empty(cap, np.uint32)
        begin = np.empty(cap, np.uint32)
        end = np.empty(cap, np.uint32)
        count = self._lib.slimt_vocab_encode(
            self._handle, data, len(data),
            int(self._norm.add_dummy_prefix),
            int(self._norm.escape_whitespaces),
            int(self._norm.remove_extra_whitespaces),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            begin.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            end.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            cap,
        )
        if count < 0:
            raise RuntimeError("encode capacity exceeded")
        return (
            ids[:count].tolist(),
            list(zip(begin[:count].tolist(), end[:count].tolist())),
        )

    def encode_batch_begins(
        self, lines: Sequence[str], n_threads: int = 0
    ) -> List[Tuple[List[int], List[int], int]]:
        """Segment many lines in ONE multithreaded library call,
        returning (ids, tiled token begins, final end) per line — the
        Vocabulary.encode_batch_begins contract. The C++ side spreads
        sentences across threads (the ctypes call releases the GIL) and
        writes flat arrays; the only per-line Python work is slicing
        two pre-converted lists."""
        n = len(lines)
        if n == 0:
            return []
        if n_threads <= 0:
            n_threads = min(4, os.cpu_count() or 1)
        datas = [line.encode("utf-8") for line in lines]
        blob = b"".join(datas)
        offsets = np.zeros(n + 1, np.uint64)
        np.cumsum([len(d) for d in datas], out=offsets[1:])
        cap = len(blob) + n
        ids = np.empty(max(cap, 1), np.uint32)
        begins = np.empty(max(cap, 1), np.uint32)
        counts = np.empty(n, np.uint32)
        ends = np.empty(n, np.uint32)
        norm = self._norm
        total = self._lib.slimt_vocab_encode_batch(
            self._handle,
            blob,
            offsets.ctypes.data,
            n,
            int(norm.add_dummy_prefix),
            int(norm.escape_whitespaces),
            int(norm.remove_extra_whitespaces),
            n_threads,
            ids.ctypes.data,
            begins.ctypes.data,
            counts.ctypes.data,
            ends.ctypes.data,
        )
        if total < 0:
            raise RuntimeError("encode capacity exceeded")
        ids_list = ids[:total].tolist()
        begins_list = begins[:total].tolist()
        counts_list = counts.tolist()
        ends_list = ends.tolist()
        out = []
        pos = 0
        for count, end in zip(counts_list, ends_list):
            hi = pos + count
            out.append((ids_list[pos:hi], begins_list[pos:hi], end))
            pos = hi
        return out

    def decode(
        self, words: Sequence[int]
    ) -> Tuple[str, List[Tuple[int, int]]]:
        n = len(words)
        # ascontiguousarray: the raw base pointer goes to C++, so a
        # strided ndarray view must be compacted first.
        ids = np.ascontiguousarray(words, np.uint32)
        cap = self._max_surface * n + 1024
        text = ctypes.create_string_buffer(cap)
        begin = np.empty(max(n, 1), np.uint32)
        end = np.empty(max(n, 1), np.uint32)
        length = self._lib.slimt_vocab_decode(
            self._handle,
            ids.ctypes.data,
            n,
            text,
            cap,
            begin.ctypes.data,
            end.ctypes.data,
        )
        if length < 0:
            raise RuntimeError("decode capacity exceeded")
        return (
            text.raw[:length].decode("utf-8", errors="replace"),
            list(zip(begin[:n].tolist(), end[:n].tolist())),
        )

    def decode_batch(
        self, segments: Sequence[Sequence[int]]
    ) -> List[Tuple[bytes, List[int]]]:
        """Decode many id sequences in ONE library call (one per
        device batch instead of one per sentence). Returns per
        sequence its UTF-8 text bytes plus per-token end offsets into
        them (token i spans [end[i-1], end[i]), tokens contiguous from
        0 — the decode_one contract in native/slimt_host.cpp)."""
        import itertools

        n_seqs = len(segments)
        if n_seqs == 0:
            return []
        lengths = [len(s) for s in segments]
        seq_offsets = np.zeros(n_seqs + 1, np.uint32)
        np.cumsum(lengths, out=seq_offsets[1:])
        total = int(seq_offsets[-1])
        ids = np.fromiter(
            itertools.chain.from_iterable(segments), np.uint32, total
        )
        cap = self._max_surface * total + 1024
        text = ctypes.create_string_buffer(cap)
        ends = np.empty(max(total, 1), np.uint32)
        text_offsets = np.empty(n_seqs + 1, np.uint32)
        length = self._lib.slimt_vocab_decode_batch(
            self._handle,
            ids.ctypes.data,
            seq_offsets.ctypes.data,
            n_seqs,
            text,
            cap,
            ends.ctypes.data,
            text_offsets.ctypes.data,
        )
        if length < 0:
            raise RuntimeError("decode capacity exceeded")
        raw = text.raw
        to = text_offsets.tolist()
        so = seq_offsets.tolist()
        ends_list = ends.tolist()
        return [
            (raw[to[i] : to[i + 1]], ends_list[so[i] : so[i + 1]])
            for i in range(n_seqs)
        ]
