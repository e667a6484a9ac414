"""Text-analysis operators for training-data pipelines, over a
``documents(doc_id, text, lang, ...)`` table: token counting, quality
scoring, language identification, and document fingerprinting.

All are stateless ``map_batches`` stages; the per-batch functions are
vectorized with pyarrow.compute where the kernel exists and fall back to
tight Python loops only for the n-gram language profiles (compiled once
at module import).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from ..textnorm import ascii_words, normalize_ws


def _ws_token_counts(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count per row (0 for empty/whitespace-only),
    matching DuckDB ``len(regexp_split_to_array(trim(text), '\\s+'))``
    except that the empty string yields 0, not 1."""
    trimmed = pc.utf8_trim_whitespace(texts)
    split = pc.split_pattern_regex(trimmed, r"\s+")
    n = pc.list_value_length(split)
    empty = pc.equal(pc.utf8_length(trimmed), 0)
    return pc.if_else(empty, pa.scalar(0, pa.int64()), pc.cast(n, pa.int64()))


def token_counts(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    return pa.table({id_col: batch[id_col], "n_tokens": _ws_token_counts(batch[text_col])})


_PUNCT_RE = r"[^.,;:!?]"
_STOPWORDS = frozenset(
    "the a an and or of to in on for with is are was were be been it this "
    "that as at by from but not they he she we you i his her its their".split()
)


def quality_scores(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Per-document quality features: length, punctuation density,
    stopword ratio, mean word length. The first two are SQL-checkable;
    all four feed a simple keep/drop quality gate."""
    texts = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(texts), pa.int64())
    punct = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(texts, _PUNCT_RE, "")), pa.int64()
    )
    n_tokens = _ws_token_counts(texts)
    punct_ratio = pc.if_else(
        pc.greater(n_chars, 0),
        pc.divide(pc.cast(punct, pa.float64()), pc.cast(n_chars, pa.float64())),
        pa.scalar(0.0),
    )
    # stopword ratio needs tokenized comparison — plain loop over small lists
    stop_ratios = []
    for t in texts.to_pylist():
        words = ascii_words((t or "").lower())
        stop_ratios.append(sum(1 for w in words if w in _STOPWORDS) / len(words) if words else 0.0)
    mean_wlen = pc.if_else(
        pc.greater(n_tokens, 0),
        pc.divide(
            pc.cast(pc.subtract(n_chars, n_tokens), pa.float64()),
            pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64()),
        ),
        pa.scalar(0.0),
    )
    return pa.table(
        {
            id_col: batch[id_col],
            "n_chars_text": n_chars,
            "n_tokens": n_tokens,
            "punct_ratio": punct_ratio,
            "stopword_ratio": pa.array(stop_ratios, pa.float64()),
            "mean_word_len": mean_wlen,
        }
    )


# language-ID: tiny per-language stopword profiles (n-gram heuristic —
# deliberately closed-world over the corpus languages; unknown → 'en')
_LANG_PROFILES = {
    "en": "the and of to in is was for with that this are on as at it by".split(),
    "de": "der die das und ist war für mit den dem ein eine nicht auf im zu".split(),
    "fr": "le la les et est était pour avec que dans un une des du au sur".split(),
    "es": "el la los las y es era para con que en un una del al se por".split(),
}
_LANG_SETS = {lang: frozenset(ws) for lang, ws in _LANG_PROFILES.items()}


def lang_id_text(text: str) -> str:
    words = ascii_words(text.lower())
    if not words:
        return "und"
    best, best_hits = "en", -1
    for lang, ws in _LANG_SETS.items():
        hits = sum(1 for w in words if w in ws)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


def lang_id(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    preds = [lang_id_text(t or "") for t in batch[text_col].to_pylist()]
    return pa.table({id_col: batch[id_col], "lang_pred": pa.array(preds, pa.string())})


# PII scrubbing: RE2-class patterns shared verbatim with the DuckDB
# oracle (both engines are RE2-semantics, leftmost non-overlapping), so
# redacted text and match counts are byte-identical. Counts are taken on
# the ORIGINAL text per pattern; redaction applies the replacements in
# this fixed order.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+?\d[\d\-]{7,14}\d", "[PHONE]"),
)


def scrub_pii(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Redact emails / IPv4s / phone-like digit runs. Fully vectorized
    (pyarrow.compute regex kernels); output (doc_id, clean_text,
    n_email, n_ip, n_phone) is SQL-checkable bit-for-bit."""
    texts = batch[text_col]
    cols: dict[str, object] = {id_col: batch[id_col]}
    clean = texts
    counts = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = pc.cast(pc.count_substring_regex(texts, pat), pa.int64())
        clean = pc.replace_substring_regex(clean, pat, repl)
    cols["clean_text"] = clean
    cols.update(counts)
    return pa.table(cols)


def fingerprints(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """md5 of whitespace-normalized lowercased text — the exact-dedup
    key, and SQL-checkable (md5(lower(regexp_replace(...)))."""
    out = []
    for t in batch[text_col].to_pylist():
        norm = normalize_ws(t)
        out.append(hashlib.md5(norm.encode("utf-8")).hexdigest())
    return pa.table({id_col: batch[id_col], "fingerprint": pa.array(out, pa.string())})


def repetition_scores(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3) -> pa.Table:
    """Gopher-style repetition quality signal: the fraction of word
    n-grams that are repeats, ``rep = 1 − distinct/total`` per document
    (0 meaning no repetition). Docs with fewer than ``n`` tokens emit
    no row (no n-grams — the SQL mirror drops them the same way).
    Output: (doc_id, n_ngrams, n_distinct, rep6). Stateless map-only
    batch kernel — compose with ``map_batches``; no shuffle.
    """
    ids, totals, dists = [], [], []
    for did, t in zip(batch[id_col].to_pylist(),
                      batch[text_col].to_pylist()):
        ws = ascii_words((t or "").lower())
        total = len(ws) - n + 1
        if total <= 0:
            continue
        grams = {" ".join(ws[i:i + n]) for i in range(total)}
        ids.append(did)
        totals.append(total)
        dists.append(len(grams))
    tot = pa.array(totals, pa.int64())
    dist = pa.array(dists, pa.int64())
    rep = pc.round(
        pa.array(1.0 - (pc.cast(dist, pa.float64()).to_numpy(
            zero_copy_only=False)
            / pc.cast(tot, pa.float64()).to_numpy(zero_copy_only=False))
            if ids else [], pa.float64()),
        ndigits=6, round_mode="half_towards_infinity")
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "n_ngrams": tot,
        "n_distinct": dist,
        "rep6": rep,
    })


def chunk_documents(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id", size: int = 16,
                    stride: int = 8) -> pa.Table:
    """RAG-style document chunking: overlapping ``size``-token windows
    every ``stride`` tokens (last partial window kept iff it adds
    tokens past the previous chunk). Stateless flat-map batch kernel —
    compose with ``map_batches``; chunk rows stay with their input
    block, no shuffle. Output: (doc_id, chunk_no 1.., n_tokens, chunk).

    Chunk starts are ``0, stride, 2·stride, …``; a start is emitted iff
    it is the first OR the previous chunk did not already reach the end
    of the document (``(start − stride) + size < len(ws)``) — so the
    final token is always covered exactly once past the overlap, with
    no fully-redundant tail chunks. Mirrored exactly by the SQL
    list-slice oracle; docs with no tokens emit nothing.
    """
    ids, chunk_nos, n_toks, chunks = [], [], [], []
    for did, t in zip(batch[id_col].to_pylist(),
                      batch[text_col].to_pylist()):
        ws = ascii_words((t or "").lower())
        cno = 0
        for start in range(0, len(ws), stride):
            if start > 0 and (start - stride) + size >= len(ws):
                break  # previous chunk already covered the doc end
            window = ws[start:start + size]
            cno += 1
            ids.append(did)
            chunk_nos.append(cno)
            n_toks.append(len(window))
            chunks.append(" ".join(window))
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "chunk_no": pa.array(chunk_nos, pa.int64()),
        "n_tokens": pa.array(n_toks, pa.int64()),
        "chunk": pa.array(chunks, pa.string()),
    })
