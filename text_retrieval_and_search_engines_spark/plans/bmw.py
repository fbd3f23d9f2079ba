"""Block-Max WAND top-k pruning kernel (Ding & Suel 2011; SURVEY R6).

The reference's top-k retrieval is Lucene's BlockMax-WAND inside
``searcher.search`` (``final-project/src/bm25_retrieval.py:75,125``). This is
our engine's own pruning kernel, restructured for vectorized execution:
*segment-at-a-time* instead of doc-at-a-time.

Per (qid, docid-range) group:
1. Per-(term, block) score upper bound ub = w * idf * tfnorm(max_tf, min_dl)
   — valid for any (k1, b) by monotonicity.
2. The union of all terms' block boundaries partitions the docid range into
   SEGMENTS on which every term's covering block (hence its bound) is
   constant. segment_ub = sum of covering-block bounds.
3. Visit segments in descending segment_ub. For each, decode ONLY the blocks
   intersecting it (per-block byte offsets = skip data), score its docs
   exactly, and maintain the running top-k threshold theta. Stop as soon as
   segment_ub < theta — every remaining doc is provably below the k-th score.
   The stop is STRICT (<, not <=) so docs that tie theta exactly still get
   scored and the (score DESC, docid ASC) tie-break stays exact.

Exactness: scored docs accumulate per-term contributions in lexicographic
term order with the same float64 operand order as the exhaustive kernel and
the Python oracle, so results are rank-identical AND bit-identical — verified
by a hypothesis property test (BMW == exhaustive on random corpora).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import codec


def bmw_topk(pdf: pd.DataFrame, range_start: int, range_size: int,
             n_docs: float, avgdl: float, k1: float, b: float, k: int,
             mode: str = "or") -> tuple[np.ndarray, np.ndarray]:
    """One (qid, range) group -> (docids, scores) of the local top-k.

    `pdf` columns: term, weight, df, n_qterms, payload, block_last,
    block_max_tf, block_min_dl, goff, toff, doff.
    """
    order = np.argsort(pdf["term"].to_numpy(), kind="stable")
    rows = (pdf.iloc[list(order)].to_dict("records")
            if len(pdf) else [])
    return bmw_topk_rows(rows, range_start, n_docs, avgdl, k1, b, k, mode)


def bmw_topk_rows(rows: list[dict], range_start: int,
                  n_docs: float, avgdl: float, k1: float, b: float, k: int,
                  mode: str = "or") -> tuple[np.ndarray, np.ndarray]:
    """Core BMW kernel over row dicts ALREADY in lexicographic term order
    (the mapInArrow query path sorts by (qid, range_id, term) in-task, so
    no per-group argsort is needed there)."""
    terms = []
    for r in rows:
        bl = np.asarray(r["block_last"], dtype=np.int64)
        if bl.size == 0:
            continue
        w = float(r["weight"])
        df = float(r["df"])
        idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        btf = np.asarray(r["block_max_tf"], dtype=np.int64)
        bdl = np.asarray(r["block_min_dl"], dtype=np.int64)
        ub = w * (idf * codec.bm25_tf_norm(btf, bdl, k1, b, avgdl))
        terms.append({
            "w": w, "idf": idf, "bl": bl, "ub": ub,
            "payload": r["payload"],
            "goff": r["goff"], "toff": r["toff"], "doff": r["doff"],
            "cache": {},
        })
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    n_required = int(rows[0]["n_qterms"]) if mode == "and" else 0

    # --- segment grid: union of block-last boundaries -----------------------
    edges = np.unique(np.concatenate([t["bl"] for t in terms]))
    # segment s covers (lo_s, hi_s] with lo = previous edge (or range start-1)
    n_seg = edges.size
    seg_ub = np.zeros(n_seg, dtype=np.float64)
    seg_block = np.empty((len(terms), n_seg), dtype=np.int64)
    for ti, t in enumerate(terms):
        blk = np.searchsorted(t["bl"], edges, side="left")
        covered = blk < t["bl"].size
        seg_block[ti] = np.where(covered, blk, -1)
        seg_ub += np.where(covered, t["ub"][np.minimum(blk, t["ub"].size - 1)],
                           0.0)

    visit = np.argsort(-seg_ub, kind="stable")

    def decode(t, blk):
        got = t["cache"].get(blk)
        if got is None:
            prev = int(t["bl"][blk - 1]) if blk > 0 else range_start
            d, tf, dl = codec.decode_block(
                t["payload"], blk, t["goff"], t["toff"], t["doff"], prev)
            s = t["w"] * (t["idf"] * codec.bm25_tf_norm(tf, dl, k1, b, avgdl))
            got = (d, s)
            t["cache"][blk] = got
        return got

    top_d = np.empty(0, dtype=np.int64)
    top_s = np.empty(0, dtype=np.float64)
    theta = -np.inf
    lo_edges = np.concatenate(([range_start - 1], edges[:-1]))

    for s_idx in visit:
        if top_d.size >= k and seg_ub[s_idx] < theta:
            break
        lo, hi = int(lo_edges[s_idx]), int(edges[s_idx])
        parts_d, parts_s, parts_c = [], [], []
        for ti, t in enumerate(terms):
            blk = int(seg_block[ti][s_idx])
            if blk < 0:
                continue
            d, sc = decode(t, blk)
            m = (d > lo) & (d <= hi)
            if m.any():
                parts_d.append(d[m])
                parts_s.append(sc[m])
        if not parts_d:
            continue
        alld = np.concatenate(parts_d)
        alls = np.concatenate(parts_s)
        uniq = np.unique(alld)
        acc = np.zeros(uniq.size, dtype=np.float64)
        hits = np.zeros(uniq.size, dtype=np.int64)
        idx = np.searchsorted(uniq, alld)
        # term-major order => identical per-doc accumulation order as the
        # exhaustive kernel and the oracle
        np.add.at(acc, idx, alls)
        np.add.at(hits, idx, 1)
        if mode == "and":
            keep = hits == n_required
            uniq, acc = uniq[keep], acc[keep]
        if uniq.size == 0:
            continue
        top_d = np.concatenate([top_d, uniq])
        top_s = np.concatenate([top_s, acc])
        if top_d.size >= k:
            theta = np.partition(-top_s, k - 1)[k - 1] * -1.0
            if top_d.size > 4 * k:
                # trim, keeping EVERY candidate scoring >= theta so exact
                # (score DESC, docid ASC) ties survive to the final sort
                keep = top_s >= theta
                top_d, top_s = top_d[keep], top_s[keep]

    sel = np.lexsort((top_d, -top_s))[:k]
    return top_d[sel], top_s[sel]
