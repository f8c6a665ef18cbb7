"""Posting-list codec: delta + varint compression with block-max metadata.

The index's on-disk unit is one row per (term, shard): docIDs are
delta-encoded then varint-packed; term frequencies varint-packed; every
``block_size`` (default 128) postings a block-metadata struct records

    (last_doc, max_tf, min_dlq, doc_end, tf_end)

where ``doc_end``/``tf_end`` are end byte-offsets into the two buffers so
blocks decode independently (delta base = previous block's ``last_doc``),
and ``(max_tf, min_dlq)`` give a sound per-block BM25 upper bound:
tf/(tf+k1·(1−b+b·dlq/avgdl)) is increasing in tf and decreasing in dlq.

This mirrors the role of the reference's block-max boundaries
(``query/HybridScoreBlockBoundaryPropagator.java:25-90``, Lucene impacts)
re-expressed as a columnar format; everything here is numpy-vectorized —
no per-row Python in any Spark path (BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

#: On-disk format version for the whole postings layout (byte codec +
#: block-metadata columns + directory shape). Bumped on any incompatible
#: codec change; writers stamp it into ``stats.json`` and per-shard
#: manifest entries, readers refuse a mismatched index instead of
#: silently decoding stale shards — the BWC analog of the reference's
#: restart/rolling-upgrade suites (``qa/``, ``build.gradle:325-446``).
FORMAT_VERSION = 1


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized: one pass per byte position)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nb = np.ones(v.size, dtype=np.int64)
    for k in range(1, 10):
        nb += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    starts = np.zeros(v.size, dtype=np.int64)
    starts[1:] = np.cumsum(nb)[:-1]
    buf = np.zeros(int(nb.sum()), dtype=np.uint8)
    rem = v.copy()
    active = np.ones(v.size, dtype=bool)
    j = 0
    while active.any():
        idx = np.nonzero(active)[0]
        byte = (rem[idx] & np.uint64(0x7F)).astype(np.uint8)
        more = rem[idx] >> np.uint64(7)
        cont = more > 0
        buf[starts[idx] + j] = byte | (cont.astype(np.uint8) << 7)
        rem[idx] = more
        active[idx] = cont
        j += 1
    return buf.tobytes()


def varint_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array (vectorized scatter-accumulate)."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else np.asarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    cont = (b & 0x80) > 0
    is_start = np.empty(b.size, dtype=bool)
    is_start[0] = True
    is_start[1:] = ~cont[:-1]
    vidx = np.cumsum(is_start) - 1
    starts = np.nonzero(is_start)[0]
    shift = ((np.arange(b.size) - starts[vidx]) * 7).astype(np.uint64)
    vals = np.zeros(starts.size, dtype=np.uint64)
    np.add.at(vals, vidx, (b & np.uint8(0x7F)).astype(np.uint64) << shift)
    return vals


def encode_posting_list(
    docids: np.ndarray,
    tfs: np.ndarray,
    dlqs: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> tuple[bytes, bytes, list[tuple[int, int, int, int, int]]]:
    """(sorted docIDs, tfs, per-doc quantized lengths) →
    (doc_bytes, tf_bytes, blocks[(last_doc, max_tf, min_dlq, doc_end, tf_end)]).

    Delta encoding restarts at each block boundary (base = previous block's
    last_doc; first block's base = 0, i.e. the first value is stored raw).
    """
    docids = np.asarray(docids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dlqs = np.asarray(dlqs, dtype=np.int64)
    n = docids.size
    doc_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    blocks: list[tuple[int, int, int, int, int]] = []
    doc_off = 0
    tf_off = 0
    prev_last = 0
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        d = docids[s:e]
        deltas = np.empty(e - s, dtype=np.uint64)
        deltas[0] = np.uint64(d[0] - prev_last)
        if e - s > 1:
            deltas[1:] = np.diff(d).astype(np.uint64)
        db = varint_encode(deltas)
        tb = varint_encode(tfs[s:e].astype(np.uint64))
        doc_off += len(db)
        tf_off += len(tb)
        doc_parts.append(db)
        tf_parts.append(tb)
        blocks.append(
            (int(d[-1]), int(tfs[s:e].max()), int(dlqs[s:e].min()), doc_off, tf_off)
        )
        prev_last = int(d[-1])
    return b"".join(doc_parts), b"".join(tf_parts), blocks


def decode_posting_list(
    doc_bytes: bytes,
    tf_bytes: bytes,
    blocks: list,
    block_mask: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode (optionally only the blocks selected by ``block_mask``) →
    (docIDs int64, tfs int64). Blocks decode independently via offsets."""
    if not blocks:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    last = np.array([b[0] for b in blocks], dtype=np.int64)
    doc_end = np.array([b[3] for b in blocks], dtype=np.int64)
    tf_end = np.array([b[4] for b in blocks], dtype=np.int64)
    doc_start = np.concatenate(([0], doc_end[:-1]))
    tf_start = np.concatenate(([0], tf_end[:-1]))
    bases = np.concatenate(([0], last[:-1]))
    sel = range(len(blocks)) if block_mask is None else np.nonzero(block_mask)[0]
    out_d: list[np.ndarray] = []
    out_t: list[np.ndarray] = []
    dview = memoryview(doc_bytes)
    tview = memoryview(tf_bytes)
    for i in sel:
        deltas = varint_decode(dview[doc_start[i]:doc_end[i]]).astype(np.int64)
        deltas[0] += bases[i]
        out_d.append(np.cumsum(deltas))
        out_t.append(varint_decode(tview[tf_start[i]:tf_end[i]]).astype(np.int64))
    if not out_d:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    return np.concatenate(out_d), np.concatenate(out_t)
