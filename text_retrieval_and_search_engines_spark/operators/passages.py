"""Document chunking + context extraction (SURVEY §2.2 T1-T4).

Reference: ``final-project/src/document_processor.py`` —
* T1 context extraction (:23-57): first meaningful line — skip blanks, lines
  < 10 chars, lines that are only ``<tag>`` markup; truncate at the first
  sentence end in chars (20, 150]; hard-cap 150.
* T2 recursive character chunking (:60-126): LangChain
  RecursiveCharacterTextSplitter semantics — chunk_size 256 chars, overlap
  64, separator priority ["\\n\\n", "\\n", ". ", "? ", "! ", "; ", ", ",
  " ", ""] (reference ``src/config.py:80-89``). Re-implemented from the
  published algorithm (split on the first separator present, greedily merge
  pieces up to chunk_size with overlap carry-over).
* T3 context prepend (:114-117): ``"[{context}] {chunk}"`` unless the chunk
  already starts with context[:30].
* T4 batch chunk + flatten (:129-205): docids -> (docid, passage_idx, text)
  — the doc->indices map dissolves into columns via explode.

All custom logic runs in one Arrow kernel per doc batch; the flatten is a
JVM-side posexplode.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_SIZE = 256        # reference src/config.py:80-89
CHUNK_OVERLAP = 64
SEPARATORS = ["\n\n", "\n", ". ", "? ", "! ", "; ", ", ", " ", ""]

_TAG_ONLY = re.compile(r"^\s*(<[^>]*>\s*)+$")
_SENT_END = re.compile(r"[.!?]")


def extract_context(text: str) -> str:
    """T1: first meaningful line, truncated at a sentence end in (20,150]."""
    for line in text.split("\n"):
        s = line.strip()
        if not s or len(s) < 10 or _TAG_ONLY.match(s):
            continue
        if len(s) <= 150:
            return s
        cut = None
        for m in _SENT_END.finditer(s, 20, 150):
            cut = m.end()
            break
        return s[:cut] if cut else s[:150]
    return ""


def _split_recursive(text: str, seps: list[str], size: int) -> list[str]:
    """Split on the first separator present; recurse on oversized pieces."""
    if len(text) <= size:
        return [text]
    for i, sep in enumerate(seps):
        if sep == "":
            return [text[j:j + size] for j in range(0, len(text), size)]
        if sep in text:
            parts = text.split(sep)
            out: list[str] = []
            for p_idx, p in enumerate(parts):
                piece = p + (sep if p_idx < len(parts) - 1 else "")
                if len(piece) > size:
                    out.extend(_split_recursive(piece, seps[i + 1:], size))
                else:
                    out.append(piece)
            return out
    return [text]


def chunk_text(text: str, size: int = CHUNK_SIZE,
               overlap: int = CHUNK_OVERLAP) -> list[str]:
    """T2: RecursiveCharacterTextSplitter semantics — greedy merge of atomic
    pieces up to `size` chars with `overlap` chars carried between chunks."""
    text = text.strip()
    if not text:
        return []
    pieces = _split_recursive(text, SEPARATORS, size)
    chunks: list[str] = []
    cur = ""
    for piece in pieces:
        if cur and len(cur) + len(piece) > size:
            chunks.append(cur.strip())
            # carry overlap tail into the next chunk — dropped when it would
            # push the merged chunk past `size` (merges never exceed size)
            cur = cur[max(0, len(cur) - overlap):] if overlap else ""
            if len(cur) + len(piece) > size:
                cur = ""
        cur += piece
    if cur.strip():
        chunks.append(cur.strip())
    return [c for c in chunks if c]


def prepend_context(context: str, chunk: str) -> str:
    """T3: '[{context}] {chunk}' unless chunk already starts with
    context[:30] (reference document_processor.py:114-117)."""
    if context and not chunk.startswith(context[:30]):
        return f"[{context}] {chunk}"
    return chunk


def make_passages(docs: DataFrame, id_col: str = "docid",
                  text_col: str = "text", size: int = CHUNK_SIZE,
                  overlap: int = CHUNK_OVERLAP,
                  with_context: bool = True) -> DataFrame:
    """T4: docs -> passages(docid, passage_idx, context, text).

    Arrow kernel produces per-doc chunk arrays; JVM posexplode flattens.
    """

    def kernel(iterator):
        for pdf in iterator:
            ids, ctxs, chunk_lists = [], [], []
            for docid, text in zip(pdf[id_col], pdf[text_col]):
                t = "" if text is None else str(text)
                ctx = extract_context(t) if with_context else ""
                chunks = chunk_text(t, size, overlap)
                if with_context:
                    chunks = [prepend_context(ctx, c) for c in chunks]
                ids.append(docid)
                ctxs.append(ctx)
                chunk_lists.append(chunks)
            yield pd.DataFrame(
                {"docid": ids, "context": ctxs, "chunks": chunk_lists})

    per_doc = docs.select(F.col(id_col).alias(id_col),
                          F.col(text_col).alias(text_col)).mapInPandas(
        kernel, schema="docid string, context string, chunks array<string>")
    return per_doc.select(
        "docid", "context",
        F.posexplode("chunks").alias("passage_idx", "text"))
