"""Posting-block codecs — numpy-vectorized byte packing (no per-row
Python, per BASELINE.json input_hint).

Block layout (SURVEY.md §2.1 `postings` table): docIDs are stored as
deltas (first docID absolute, then gaps) varint-encoded; term
frequencies are Elias-gamma encoded (tf >= 1 always, and tf is tiny
under Zipf — gamma beats varint's 1-byte floor). Both codecs
round-trip property-tested in tests/test_codec.py.

Varint: LEB128 (7 data bits/byte, MSB = continuation) — the format
used by Lucene/protobuf (public knowledge).
Elias-gamma: value x>=1 encoded as floor(log2 x) zero bits, then the
N+1-bit binary representation of x, MSB first.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # 64 bits / 7


# ---------------------------------------------------------------------------
# varint (LEB128)
# ---------------------------------------------------------------------------
def encode_varint(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint64 array."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value: ceil(bitlength/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(1)
    nbytes = np.maximum(1, (nbits + 6) // 7)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    # position of byte 0 of each value
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    rem = v.copy()
    for b in range(_MAX_VARINT_BYTES):
        alive = nbytes > b
        if not alive.any():
            break
        idx = starts[alive] + b
        byte = (rem[alive] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[alive] > b + 1).astype(np.uint8) << 7
        out[idx] = byte | cont
        rem[alive] = rem[alive] >> np.uint64(7)
    return out.tobytes()


def decode_varint(buf: bytes) -> np.ndarray:
    """Vectorized LEB128 decode -> uint64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (raw & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.concatenate(([0], ends[:-1] + 1))
    n = ends.size
    out = np.zeros(n, dtype=np.uint64)
    lengths = ends - starts + 1
    maxlen = int(lengths.max())
    for b in range(maxlen):
        alive = lengths > b
        idx = starts[alive] + b
        out[alive] |= (raw[idx] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * b)
    return out


# ---------------------------------------------------------------------------
# Elias-gamma
# ---------------------------------------------------------------------------
def encode_gamma(values: np.ndarray) -> bytes:
    """Vectorized Elias-gamma encode of a uint64 array (all values >= 1).

    Builds the full bit array with numpy scatter ops: each value x
    contributes 2*N+1 bits (N = floor(log2 x)): N zeros, then the
    N+1 binary digits of x MSB-first (leading digit always 1).
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if (v < 1).any():
        raise ValueError("Elias-gamma requires values >= 1")
    nbits_val = (np.uint64(64) - _clz64(v)).astype(np.int64)  # bitlength
    nlead = nbits_val - 1  # N zeros
    code_len = 2 * nlead + 1
    starts = np.concatenate(([0], np.cumsum(code_len)[:-1]))
    total_bits = int(code_len.sum())
    bits = np.zeros(total_bits, dtype=np.uint8)
    # binary part begins at starts + nlead; digit j (0 = MSB) of the
    # (nlead+1)-digit representation lands at starts + nlead + j
    maxdigits = int(nbits_val.max())
    for j in range(maxdigits):
        # j-th digit from MSB exists when nbits_val > j
        alive = nbits_val > j
        shift = (nbits_val[alive] - 1 - j).astype(np.uint64)
        digit = ((v[alive] >> shift) & np.uint64(1)).astype(np.uint8)
        pos = starts[alive] + nlead[alive] + j
        bits[pos] = digit
    return np.packbits(bits).tobytes()


def decode_gamma(buf: bytes, count: int) -> np.ndarray:
    """Decode `count` Elias-gamma values. Semi-vectorized: one numpy
    pass builds the bit array; the cursor walk batches via the
    positions of 1-bits (each code word's unary part ends at a 1)."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8)).astype(np.int64)
    out = np.empty(count, dtype=np.uint64)
    pos = 0
    ones = np.flatnonzero(bits)  # candidate unary terminators
    one_i = 0
    weights = np.int64(1) << np.arange(63, -1, -1, dtype=np.int64)
    for i in range(count):
        # first 1 at or after pos ends the unary run
        while ones[one_i] < pos:
            one_i += 1
        first_one = int(ones[one_i])
        n = first_one - pos  # number of leading zeros
        seg = bits[first_one : first_one + n + 1]
        out[i] = np.uint64(seg @ weights[64 - seg.size :])
        pos = first_one + n + 1
    return out


def _clz64(v: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64, exact, via binary-search shifts
    (float log2 is off-by-one just below powers of two, e.g. 2^51-4)."""
    v = v.astype(np.uint64).copy()
    out = np.zeros(v.shape, dtype=np.uint64)
    zero = v == 0
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v < (np.uint64(1) << np.uint64(64 - shift))
        out[mask] += np.uint64(shift)
        v[mask] = v[mask] << np.uint64(shift)
    out[zero] = np.uint64(64)
    return out


# ---------------------------------------------------------------------------
# Block encode/decode: (sorted doc_ids, tfs) <-> (bytes, bytes)
# ---------------------------------------------------------------------------
def encode_block(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """doc_ids strictly increasing int64; tfs >= 1. Returns
    (delta-varint docids bytes, gamma tf bytes)."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    deltas = np.empty(d.shape, dtype=np.uint64)
    deltas[0] = np.uint64(d[0])
    if d.size > 1:
        gaps = np.diff(d)
        if (gaps <= 0).any():
            raise ValueError("doc_ids must be strictly increasing")
        deltas[1:] = gaps.astype(np.uint64)
    return encode_varint(deltas), encode_gamma(np.asarray(tfs, dtype=np.uint64))


def decode_block(doc_bytes: bytes, tf_bytes: bytes, count: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_block -> (int64 doc_ids, int64 tfs)."""
    deltas = decode_varint(doc_bytes)
    assert deltas.size == count, f"expected {count} docids, got {deltas.size}"
    doc_ids = np.cumsum(deltas.astype(np.int64))
    tfs = decode_gamma(tf_bytes, count).astype(np.int64)
    return doc_ids, tfs
