"""Single-node pure-Python/numpy BM25 + RM3 oracle.

This is the "reference implementation" the pytest suite compares the Spark
engine against (BASELINE.json north_rule: rank-identical top-k docIDs and BM25
scores). It shares the EXACT tokenizer/extractor functions with the engine
(functions/text.py), computes exact df/cf/dl/avgdl (the reference's Lucene
index stores dl lossily — we pin exact dl on both sides, SURVEY.md §1.2), and
scores with the Lucene >=8 BM25 used by the reference via Pyserini
(``set_bm25(k1=0.9, b=0.4)``, ``final-project/src/bm25_retrieval.py:70,118``;
defaults ``src/config.py:53-55``):

    idf  = ln(1 + (N - df + 0.5)/(df + 0.5))
    s(t,d) = idf(t) * tf / (tf + k1*(1 - b + b*dl/avgdl))
    score(q,d) = sum over query terms (disjunctive OR), scaled by query tf.

Determinism contract (SURVEY.md §2.5): summation per doc iterates query terms
in LEXICOGRAPHIC order; final ranking orders by (score DESC, docid ASC).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..functions.text import term_freqs, tokenize

K1_DEFAULT = 0.9   # reference src/config.py:53-55
B_DEFAULT = 0.4


@dataclass
class OracleIndex:
    """Exact in-memory inverted index over (docid:int, text:str) pairs."""

    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {docid: tf}
    doclens: dict[int, int] = field(default_factory=dict)
    doc_tokens: dict[int, list[str]] = field(default_factory=dict)
    n_docs: int = 0
    avgdl: float = 0.0

    @classmethod
    def build(cls, docs: list[tuple[int, str]]) -> "OracleIndex":
        idx = cls()
        total = 0
        for docid, text in docs:
            toks = tokenize(text)
            idx.doc_tokens[docid] = toks
            idx.doclens[docid] = len(toks)
            total += len(toks)
            for term, tf in term_freqs(toks).items():
                idx.postings.setdefault(term, {})[docid] = tf
        idx.n_docs = len(docs)
        idx.avgdl = (total / idx.n_docs) if idx.n_docs else 0.0
        return idx

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def cf(self, term: str) -> int:
        return sum(self.postings.get(term, {}).values())

    def idf(self, term: str) -> float:
        df = self.df(term)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    # ------------------------------------------------------------------ BM25
    def search(self, query: str, k: int = 1000, k1: float = K1_DEFAULT,
               b: float = B_DEFAULT, mode: str = "or",
               term_weights: dict[str, float] | None = None
               ) -> list[tuple[int, float]]:
        """Top-k (docid, score), tie-break (score DESC, docid ASC).

        `mode="and"` = conjunctive posting-list intersection (SURVEY R7).
        `term_weights` (stemmed term -> weight) overrides the query text —
        the RM3 second-pass shape (weights multiply per-term contributions).
        """
        if term_weights is None:
            qtoks = tokenize(query)
            weights = {t: float(w) for t, w in term_freqs(qtoks).items()}
        else:
            weights = {t: float(w) for t, w in term_weights.items()}
        terms = sorted(t for t in weights if t in self.postings)
        if not terms:
            return []
        scores: dict[int, float] = {}
        seen_count: dict[int, int] = {}
        for t in terms:  # lexicographic order => pinned summation order
            idf = self.idf(t)
            for docid, tf in self.postings[t].items():
                dl = self.doclens[docid]
                # association pinned as idf*(tf/denom) then w*(...) — the
                # Spark kernel computes the identical float64 operand order
                s = idf * (tf / (tf + k1 * (1.0 - b + b * dl / self.avgdl)))
                scores[docid] = scores.get(docid, 0.0) + weights[t] * s
                seen_count[docid] = seen_count.get(docid, 0) + 1
        if mode == "and":
            need = len(terms)
            scores = {d: s for d, s in scores.items() if seen_count[d] == need}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    # ------------------------------------------------------------------- RM3
    def rm3_expand(self, query: str, fb_docs: int = 10, fb_terms: int = 10,
                   original_query_weight: float = 0.5, k1: float = K1_DEFAULT,
                   b: float = B_DEFAULT) -> dict[str, float]:
        """RM3 relevance model (reference defaults fb_docs=10, fb_terms=10,
        original_query_weight=0.5 — ``src/bm25_retrieval.py:119-123``).

        P(w|R) = sum_D P(w|D) * P(D), P(D) = score_D / sum(scores);
        keep top fb_terms by (weight DESC, term ASC — pinned lexicographic
        tie-break, SURVEY.md §7 note 4); interpolate
        lambda*P(w|Q) + (1-lambda)*P(w|R).
        """
        first = self.search(query, k=fb_docs, k1=k1, b=b)
        qtf = term_freqs(tokenize(query))
        qlen = sum(qtf.values())
        pq = {t: tf / qlen for t, tf in qtf.items()} if qlen else {}
        if not first:
            return pq
        total_score = sum(s for _, s in first)
        pr: dict[str, float] = {}
        for docid, s in first:
            pdw = s / total_score if total_score > 0 else 1.0 / len(first)
            toks = self.doc_tokens[docid]
            dl = len(toks)
            if dl == 0:
                continue
            for term, tf in term_freqs(toks).items():
                pr[term] = pr.get(term, 0.0) + pdw * (tf / dl)
        top = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
        fb = dict(top)
        lam = original_query_weight
        out: dict[str, float] = {}
        for t in sorted(set(pq) | set(fb)):
            out[t] = lam * pq.get(t, 0.0) + (1.0 - lam) * fb.get(t, 0.0)
        return out

    def search_rm3(self, query: str, k: int = 1000, fb_docs: int = 10,
                   fb_terms: int = 10, original_query_weight: float = 0.5,
                   k1: float = K1_DEFAULT, b: float = B_DEFAULT
                   ) -> list[tuple[int, float]]:
        w = self.rm3_expand(query, fb_docs, fb_terms, original_query_weight, k1, b)
        return self.search(query, k=k, k1=k1, b=b, term_weights=w)
