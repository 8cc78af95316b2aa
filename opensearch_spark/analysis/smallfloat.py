"""Lucene SmallFloat byte4 norm quantization (public algorithm, re-derived).

BM25's per-doc length ``dl`` is not stored exactly: Lucene's
``BM25Similarity.computeNorm`` encodes the token count into ONE byte via
``SmallFloat.intToByte4`` and decodes it at score time through a 256-entry
table (``byte4ToInt``). Rank-identical scoring therefore REQUIRES pushing
doc lengths through the same int -> byte4 -> int round trip (SURVEY.md
§1.5; reference wiring ``lucene/similarity/LegacyBM25Similarity.java``).

The byte4 format (public Lucene semantics): values 0..NUM_FREE_VALUES-1 are
stored exactly; larger values v are stored as a 4-bit-mantissa / shift
"mini float" of (v - NUM_FREE_VALUES):

    int4(x) : x < 8           -> x                        (subnormal, exact)
              x >= 8          -> keep top 4 bits of x; encoded =
                                 (top3 | (shift+1)<<3) where shift =
                                 bitlen(x) - 4  (truncates low bits)

    NUM_FREE_VALUES = 255 - int4(2^31 - 1) = 255 - 231 = 24

Quantization is monotonic non-decreasing and rounds DOWN (q(v) <= v),
exact for v <= 39.
"""

from __future__ import annotations

import numpy as np


def _long_to_int4(x: int) -> int:
    if x < 0:
        raise ValueError("negative")
    nbits = x.bit_length()
    if nbits < 4:
        return x
    shift = nbits - 4
    encoded = (x >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def _int4_to_long(e: int) -> int:
    bits = e & 0x07
    shift = (e >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = _long_to_int4(2**31 - 1)          # 231
NUM_FREE_VALUES = 255 - _MAX_INT4             # 24


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int into one unsigned byte (0..255)."""
    if i < 0:
        raise ValueError("negative")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + _long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode an unsigned byte (0..255) back to the quantized int."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + _int4_to_long(b - NUM_FREE_VALUES)


# 256-entry decode table, index = stored byte (Lucene's LENGTH_TABLE analog)
LENGTH_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)


def length_table() -> np.ndarray:
    return LENGTH_TABLE


def quantize_length(dl: int) -> int:
    """dl -> quantized dl (the value BM25 actually sees)."""
    return byte4_to_int(int_to_byte4(dl))


def int_to_byte4_np(arr: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 over an int64 array (for norm packing)."""
    arr = np.asarray(arr, dtype=np.int64)
    out = np.empty(arr.shape, dtype=np.uint8)
    small = arr < NUM_FREE_VALUES
    out[small] = arr[small].astype(np.uint8)
    big = ~small
    if big.any():
        x = arr[big] - NUM_FREE_VALUES
        nbits = np.zeros_like(x)
        nz = x > 0
        nbits[nz] = np.floor(np.log2(x[nz].astype(np.float64))).astype(np.int64) + 1
        # float log2 can be off by one at exact powers near 2^53 — not
        # reachable for doc lengths, but clamp defensively
        sub = nbits < 4
        enc = np.empty_like(x)
        enc[sub] = x[sub]
        shift = np.maximum(nbits - 4, 0)
        top = (x >> shift) & 0x07
        norm = ~sub
        enc[norm] = top[norm] | ((shift[norm] + 1) << 3)
        out[big] = (NUM_FREE_VALUES + enc).astype(np.uint8)
    return out


def decode_norms_np(norm_bytes: np.ndarray) -> np.ndarray:
    """Vectorized byte4ToInt: uint8 array of stored norms -> int64 dl."""
    return LENGTH_TABLE[np.asarray(norm_bytes, dtype=np.uint8)]


def quantize_breakpoints(max_value: int = 1 << 22) -> list[int]:
    """Sorted distinct representable quantized values <= max_value.

    Used to generate the oracle-SQL lookup CTE: quantized(dl) = the largest
    representable value <= dl.
    """
    vals = sorted({byte4_to_int(b) for b in range(256)})
    return [v for v in vals if v <= max_value]
