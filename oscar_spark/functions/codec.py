"""Vectorized varint / delta posting-block codec (numpy, no per-row Python).

The in-payload codec is ours by mandate (BASELINE.json: "docID-delta +
varint/PForDelta block compression"); Parquet only stores the opaque
binary column.  Mirrors the role of oscar's ItemIndex codecs
(rlede/varint: reference/oscar-create/sampleConfig.json:12-16, RLEStream &
zig-zag varint payload writers at
reference/oscar-create/CellTextCompleter.cpp:227-243) without copying any
of their layouts.

Payload layout of a posting block (see build/indexer.py):
    varint stream of 3*n values:
        [0:n)    doc-id deltas (first value = first_doc - range_base)
        [n:2n)   term frequencies (tf)
        [2n:3n)  document lengths (dl, in tokens)
n (doc_count) lives in the block's metadata columns, not the payload.

Both encode and decode are O(max_bytes_per_value) numpy passes — at most
10 vector ops over the whole stream, never a Python loop over values.
"""

from __future__ import annotations

import numpy as np

_SEVEN = np.uint64(7)
_MASK7 = np.uint64(0x7F)
_MAX_VARINT_BYTES = 10  # 64 bits / 7


def varint_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints as a LEB128 varint stream."""
    arr = np.ascontiguousarray(values, dtype=np.uint64)
    n = arr.shape[0]
    if n == 0:
        return b""
    # byte length of each value: 1 + floor(bitlen/7) for bitlen > 0
    nbytes = np.ones(n, dtype=np.int64)
    shifted = arr >> _SEVEN
    while shifted.any():
        nbytes += shifted > 0
        shifted = shifted >> _SEVEN
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    total = int(offsets[-1] + nbytes[-1])
    out = np.zeros(total, dtype=np.uint8)
    for j in range(_MAX_VARINT_BYTES):
        mask = nbytes > j
        if not mask.any():
            break
        vals = (arr[mask] >> np.uint64(7 * j)) & _MASK7
        cont = ((nbytes[mask] > j + 1).astype(np.uint8)) << 7
        out[offsets[mask] + j] = vals.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode a LEB128 varint stream into a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(ends.shape[0], dtype=np.uint64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        vals[mask] |= (b[starts[mask] + j] & _MASK7).astype(np.uint64) << np.uint64(7 * j)
    return vals


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                 range_base: int) -> bytes:
    """Delta-encode sorted doc_ids and pack (deltas, tfs, dls) as one stream."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    deltas = np.empty_like(doc_ids)
    deltas[0] = doc_ids[0] - range_base
    np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    if (deltas[1:] <= 0).any():
        raise ValueError("doc_ids must be strictly increasing within a block")
    stream = np.concatenate([
        deltas.astype(np.uint64),
        np.ascontiguousarray(tfs, dtype=np.uint64),
        np.ascontiguousarray(dls, dtype=np.uint64),
    ])
    return varint_encode(stream)


def decode_block(payload: bytes, doc_count: int, range_base: int):
    """Inverse of encode_block → (doc_ids:int64, tfs:int64, dls:int64)."""
    stream = varint_decode(payload)
    if stream.shape[0] != 3 * doc_count:
        raise ValueError(
            f"corrupt block: {stream.shape[0]} values for doc_count={doc_count}")
    deltas = stream[:doc_count].astype(np.int64)
    doc_ids = np.cumsum(deltas) + range_base
    tfs = stream[doc_count:2 * doc_count].astype(np.int64)
    dls = stream[2 * doc_count:].astype(np.int64)
    return doc_ids, tfs, dls
