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


def _vb_nbytes(v: np.ndarray, vmax: int) -> tuple[np.ndarray, int]:
    """Per-value encoded byte counts. Adaptive: one comparison pass per
    EXTRA byte actually present (the old fixed 9-pass loop dominated the
    encode wall — memory-bound, and postings streams are 1-2 bytes/value)."""
    nb = np.ones(v.shape, dtype=np.int64)
    k = 1
    while vmax >= (1 << (7 * k)):
        nb += v >= (np.uint64(1) << np.uint64(7 * k))
        k += 1
    return nb, k


def vb_encode(values: np.ndarray) -> np.ndarray:
    """Vectorized varbyte encode of a uint64 array -> uint8 array."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    vmax = int(v.max())
    if vmax < 0x80:
        # single-byte fast path (tf streams, dense-term gap streams): value
        # and terminator bit in ONE pass
        return v.astype(np.uint8) | np.uint8(0x80)
    nb, max_nb = _vb_nbytes(v, vmax)
    ends = np.cumsum(nb)
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    starts = ends - nb
    # byte 0 exists for every value — write unmasked
    out[starts] = (v & np.uint64(0x7F)).astype(np.uint8)
    for j in range(1, max_nb):
        mask = nb > j
        pos = starts[mask] + j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        out[pos] = chunk.astype(np.uint8)
    # set terminator (high) bit on last byte of each value
    out[ends - 1] |= 0x80
    return out


def vb_decode(buf: np.ndarray) -> np.ndarray:
    """Vectorized varbyte decode of a uint8 array -> uint64 array."""
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    if int(b.min()) >= 0x80:
        # every byte is a terminator -> all values single-byte
        return (b & np.uint8(0x7F)).astype(np.uint64)
    ends = np.flatnonzero(b & 0x80)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts
    out = (b[starts] & np.uint8(0x7F)).astype(np.uint64)
    # per-byte-position gather: max-length passes over n_values (vs the old
    # repeat/arange/reduceat form's ~5 passes over ALL bytes)
    for j in range(1, int(lens.max()) + 1):
        sel = lens >= j
        out[sel] |= ((b[starts[sel] + j] & np.uint8(0x7F)).astype(np.uint64)
                     << np.uint64(7 * j))
    return out


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
    if v.size == 0:
        return np.empty(0, dtype=np.int64)
    nb, _ = _vb_nbytes(v, int(v.max()))
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


def _encode_stream(v: np.ndarray, marks: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Encode one uint64 stream and return (bytes, byte-offsets at marks).
    Shares the per-value length computation between the payload bytes and
    the block skip offsets (encode_postings + block_offsets separately
    recomputed lengths — 2x the memory traffic of the fused form)."""
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    vmax = int(v.max())
    if vmax < 0x80:
        # single-byte fast path: offsets are the mark positions themselves
        return v.astype(np.uint8) | np.uint8(0x80), marks.astype(np.int64)
    nb, max_nb = _vb_nbytes(v, vmax)
    ends = np.cumsum(nb)
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    starts = ends - nb
    out[starts] = (v & np.uint64(0x7F)).astype(np.uint8)
    for j in range(1, max_nb):
        mask = nb > j
        pos = starts[mask] + j
        out[pos] = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
                    ).astype(np.uint8)
    out[ends - 1] |= 0x80
    offs = np.empty(marks.size, dtype=np.int64)
    offs[0] = 0
    offs[1:] = ends[marks[1:] - 1]
    return out, offs


def encode_chunk(docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                 range_start: int = 0, block: int = BLOCK):
    """Fused chunk encode: payload + block-max metadata + block skip offsets
    in ONE pass over the postings (the build/compact hot kernel — the
    separate encode_postings/block_max_meta/block_offsets calls each
    re-derived gaps/lengths, ~2x the memory traffic, which is what stops
    scaling when 4N workers share one memory bus).

    Returns (payload bytes, block_last int64[], block_max_tf int64[],
    block_min_dl int64[], goff int64[], toff int64[], doff int64[]).
    """
    docids = np.ascontiguousarray(docids, dtype=np.int64)
    n = docids.size
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        z1 = np.zeros(1, dtype=np.int64)
        return (np.zeros(4, dtype=_HDR).tobytes(), z, z.copy(), z.copy(),
                z1, z1.copy(), z1.copy())
    tfs64 = np.asarray(tfs, dtype=np.uint64)
    dls64 = np.asarray(dls, dtype=np.uint64)
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = docids[0] - range_start
    gaps[1:] = np.diff(docids).astype(np.uint64)
    marks = np.arange(0, n + block, block, dtype=np.int64)
    marks[-1] = min(int(marks[-1]), n)
    marks = np.unique(marks)
    g, goff = _encode_stream(gaps, marks)
    t, toff = _encode_stream(tfs64, marks)
    d, doff = _encode_stream(dls64, marks)
    hdr = np.array([n, g.size, t.size, d.size], dtype=_HDR)
    payload = b"".join((hdr.tobytes(), g.tobytes(), t.tobytes(), d.tobytes()))
    block_ends = marks[1:] - 1
    block_last = docids[block_ends]
    block_max_tf = np.maximum.reduceat(tfs64.astype(np.int64), marks[:-1])
    block_min_dl = np.minimum.reduceat(dls64.astype(np.int64), marks[:-1])
    return payload, block_last, block_max_tf, block_min_dl, goff, toff, doff


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
