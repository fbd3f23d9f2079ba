"""Delta + variable-byte posting-list codec and block-max metadata (numpy).

The reference's inverted index lives inside Lucene (prebuilt robust04 opened at
``final-project/src/bm25_retrieval.py:28-42``); its postings are delta-encoded,
block-compressed (docid, tf) lists with per-block impact metadata (public
Lucene segment format). This module is our own engine's codec:

* varbyte: 7 data bits per byte, **high bit set on the LAST byte** of each
  value (pinned convention), little-endian 7-bit groups.
* posting payload per (term, docid-range chunk):
  ``[u32 n][u32 len_gaps][u32 len_tfs][u32 len_dls] gaps tfs dls`` where
  ``gaps`` are docid deltas (first gap = docid - range_start), all varbyte.
  Doc lengths ride inline with the postings so BM25 scoring never shuffles
  document-length data (BASELINE.json north_star).
* block-max metadata: for each block of ``BLOCK`` postings, ``(last_docid,
  max_tf, min_dl)``. Since BM25's per-term score is monotonically increasing
  in tf and decreasing in dl, ``score(max_tf, min_dl)`` is a valid per-block
  upper bound for ANY (k1, b) — k1/b stay query-time parameters exactly as in
  the reference (``set_bm25`` at ``src/bm25_retrieval.py:70,118``).

Everything is vectorized numpy; no per-element Python in encode/decode.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128
_HDR = np.dtype("<u4")


def vb_encode(values: np.ndarray) -> np.ndarray:
    """Vectorized varbyte encode of a uint64 array -> uint8 array."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    # bytes needed per value: 1 + number of 128**k thresholds passed
    nb = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nb += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    ends = np.cumsum(nb)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    starts = ends - nb
    max_nb = int(nb.max())
    for j in range(max_nb):
        mask = nb > j
        pos = starts[mask] + j
        chunk = (v[mask] >> np.uint64(7 * j)).astype(np.uint64) & np.uint64(0x7F)
        out[pos] = chunk.astype(np.uint8)
    # set terminator (high) bit on last byte of each value
    out[ends - 1] |= 0x80
    return out


def vb_decode(buf: np.ndarray) -> np.ndarray:
    """Vectorized varbyte decode of a uint8 array -> uint64 array."""
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(b & 0x80)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(starts, ends - starts + 1)
    shifted = (b.astype(np.uint64) & np.uint64(0x7F)) << (7 * pos).astype(np.uint64)
    return np.add.reduceat(shifted, starts)


def encode_postings(docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                    range_start: int = 0) -> bytes:
    """Sorted docids + parallel tf/dl arrays -> compressed payload bytes."""
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    n = docids.size
    if n == 0:
        return np.zeros(4, dtype=_HDR).tobytes()
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = docids[0] - range_start
    gaps[1:] = np.diff(docids).astype(np.uint64)
    g = vb_encode(gaps)
    t = vb_encode(np.asarray(tfs, dtype=np.uint64))
    d = vb_encode(np.asarray(dls, dtype=np.uint64))
    hdr = np.array([n, g.size, t.size, d.size], dtype=_HDR)
    return hdr.tobytes() + g.tobytes() + t.tobytes() + d.tobytes()


def decode_postings(payload: bytes, range_start: int = 0
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """payload -> (docids int64, tfs int64, dls int64)."""
    hdr = np.frombuffer(payload, dtype=_HDR, count=4)
    n, lg, lt, ld = (int(x) for x in hdr)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    off = 16
    raw = np.frombuffer(payload, dtype=np.uint8)
    gaps = vb_decode(raw[off:off + lg])
    tfs = vb_decode(raw[off + lg:off + lg + lt])
    dls = vb_decode(raw[off + lg + lt:off + lg + lt + ld])
    docids = np.cumsum(gaps.astype(np.int64))
    docids += range_start
    return docids, tfs.astype(np.int64), dls.astype(np.int64)


def block_max_meta(docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                   block: int = BLOCK
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-block (last_docid, max_tf, min_dl) arrays for BMW pruning."""
    n = docids.size
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    starts = np.arange(0, n, block, dtype=np.int64)
    ends = np.minimum(starts + block, n) - 1
    last_docid = np.asarray(docids, dtype=np.int64)[ends]
    max_tf = np.maximum.reduceat(np.asarray(tfs, dtype=np.int64), starts)
    min_dl = np.minimum.reduceat(np.asarray(dls, dtype=np.int64), starts)
    return last_docid, max_tf, min_dl


def bm25_idf(df: np.ndarray | float, n_docs: float) -> np.ndarray | float:
    """Lucene >=8 BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_tf_norm(tf, dl, k1: float, b: float, avgdl: float):
    """tf / (tf + k1*(1 - b + b*dl/avgdl)); Lucene >=8 drops the (k1+1)
    numerator — rank-preserving (SURVEY.md R5)."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def vb_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nb = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nb += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    return nb


def block_offsets(docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                  range_start: int = 0, block: int = BLOCK
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-block byte offsets (n_blocks+1 entries) into the gaps/tfs/dls
    streams of an `encode_postings` payload — the skip data that makes
    block-max WAND able to decode only surviving blocks."""
    n = np.asarray(docids).size
    if n == 0:
        z = np.zeros(1, dtype=np.int64)
        return z, z.copy(), z.copy()
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = docids[0] - range_start
    gaps[1:] = np.diff(docids).astype(np.uint64)
    marks = np.arange(0, n + block, block, dtype=np.int64)
    marks[-1] = min(int(marks[-1]), n)
    marks = np.unique(marks)

    def offs(vals):
        cum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(vb_lengths(vals), out=cum[1:])
        return cum[marks]

    return offs(gaps), offs(np.asarray(tfs, dtype=np.uint64)), \
        offs(np.asarray(dls, dtype=np.uint64))


def decode_block(payload: bytes, b: int, goff, toff, doff,
                 prev_last_docid: int
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode exactly one block of an `encode_postings` payload.

    ``prev_last_docid`` is block b-1's last docid (or the chunk's
    range_start for b=0) — gap deltas chain across block boundaries.
    """
    hdr = np.frombuffer(payload, dtype=_HDR, count=4)
    _, lg, lt, _ = (int(x) for x in hdr)
    raw = np.frombuffer(payload, dtype=np.uint8)
    g0, t0, d0 = 16, 16 + lg, 16 + lg + lt
    gaps = vb_decode(raw[g0 + int(goff[b]):g0 + int(goff[b + 1])])
    tfs = vb_decode(raw[t0 + int(toff[b]):t0 + int(toff[b + 1])])
    dls = vb_decode(raw[d0 + int(doff[b]):d0 + int(doff[b + 1])])
    docids = np.cumsum(gaps.astype(np.int64)) + prev_last_docid
    return docids, tfs.astype(np.int64), dls.astype(np.int64)
