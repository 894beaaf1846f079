"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All are vectorized ``map_batches`` stages over the driver `documents` table
(doc_id, text, lang, source, n_chars) or any table with a text column.
These generalize the reference's per-page token statistics
(backend/crawler/scraper.py:264-288) into reusable operators.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.simhash import token_hash64_cached

TOKEN_RE = r"[a-z0-9']+"
# BPE-ish word/number/punct splitter (public GPT-2-style pattern, simplified)
BPE_ISH_RE = re.compile(r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]+")

# tiny per-language marker profiles (public-knowledge function words)
LANG_MARKERS: dict[str, frozenset] = {
    "en": frozenset("the and of to in is for with on that this are was".split()),
    "de": frozenset("der die das und ist nicht ein eine mit für von zu den".split()),
    "es": frozenset("el la los las es una con por para que del como más".split()),
    "fr": frozenset("le la les et est une des dans pour que qui pas sur".split()),
}
STOPWORDS_EN = LANG_MARKERS["en"]


def tokens_of(text: str) -> list[str]:
    return re.findall(TOKEN_RE, text.lower())


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc token counts: whitespace tokens + BPE-ish pieces."""
    texts = batch[text_col].to_pylist()
    ws = pa.array([len(t.split()) for t in texts], type=pa.int64())
    bpe = pa.array([len(BPE_ISH_RE.findall(t)) for t in texts], type=pa.int64())
    regex = pa.array([len(tokens_of(t)) for t in texts], type=pa.int64())
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_ws_tokens": ws,
        "n_bpe_tokens": bpe,
        "n_tokens": regex,
    })


def explode_token_counts_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial (token, n) counts — pre-aggregation before the
    global groupby (the combiner pattern, SURVEY.md §2.5 A3)."""
    counts: dict[str, int] = {}
    for t in batch[text_col].to_pylist():
        for tok in tokens_of(t):
            counts[tok] = counts.get(tok, 0) + 1
    return pa.table({
        "token": list(counts.keys()),
        "n": pa.array(list(counts.values()), type=pa.int64()),
    })


def language_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Marker-word + CJK-ratio language heuristic → pred_lang column."""
    preds = []
    for t in batch[text_col].to_pylist():
        cjk = sum(1 for ch in t[:400] if "一" <= ch <= "鿿")
        if cjk > max(4, len(t[:400]) * 0.05):
            preds.append("zh")
            continue
        toks = tokens_of(t)
        scores = {
            lang: sum(1 for tok in toks if tok in markers)
            for lang, markers in LANG_MARKERS.items()
        }
        best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
        preds.append(best[0] if best[1] > 0 else "unknown")
    return batch.append_column("pred_lang", pa.array(preds, type=pa.string()))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Composite quality features: length, punctuation ratio, stopword ratio,
    mean word length, plus a [0,1] score."""
    n_chars, punct_ratio, stop_ratio, mean_wlen, score = [], [], [], [], []
    for t in batch[text_col].to_pylist():
        toks = tokens_of(t)
        n = len(t)
        punct = sum(1 for ch in t if not ch.isalnum() and not ch.isspace())
        stop = sum(1 for tok in toks if tok in STOPWORDS_EN)
        pr = punct / n if n else 0.0
        sr = stop / len(toks) if toks else 0.0
        mw = sum(map(len, toks)) / len(toks) if toks else 0.0
        n_chars.append(n)
        punct_ratio.append(round(pr, 4))
        stop_ratio.append(round(sr, 4))
        mean_wlen.append(round(mw, 4))
        s = 1.0
        if n < 100:
            s *= n / 100.0
        if pr > 0.2:
            s *= 0.5
        if not 2.0 <= mw <= 12.0:
            s *= 0.5
        score.append(round(s, 4))
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pa.array(n_chars, type=pa.int64()),
        "punct_ratio": pa.array(punct_ratio, type=pa.float64()),
        "stop_ratio": pa.array(stop_ratio, type=pa.float64()),
        "mean_word_len": pa.array(mean_wlen, type=pa.float64()),
        "quality": pa.array(score, type=pa.float64()),
    })


_JS_LINE_RE = re.compile(r"\bjavascript\b")
_WORD_RE = re.compile(r"\S+")
_TERMINALS = (".", "!", "?", '"')


def c4_line_filter_batch(batch: pa.Table, text_col: str = "text",
                         id_col: str = "doc_id",
                         min_words: int = 3,
                         min_lines: int = 3) -> pa.Table:
    """C4 cleaning heuristics (Raffel et al., "Exploring the Limits of
    Transfer Learning with a Unified Text-to-Text Transformer", JMLR'20
    §2.2), line rules vectorized over the exploded line table:

    - doc dropped outright if it contains ``lorem ipsum`` (case-folded)
      or a ``{``;
    - a line survives iff it ends in a terminal punctuation mark
      (``. ! ? "``), has >= ``min_words`` whitespace words, and does not
      contain the word ``javascript``;
    - the doc survives iff >= ``min_lines`` lines remain (C4 uses five
      sentences; this operator's knob defaults to 3 lines — documented
      deviation, sentences ≈ lines here).

    Pure map stage — no shuffle: explode, mask, re-aggregate inside the
    batch.  Output rows (surviving docs only): (doc_id, clean_text,
    n_lines)."""
    txt = batch[text_col].combine_chunks()
    low = pc.utf8_lower(txt)
    doc_bad = pc.or_(
        pc.match_substring(low, "lorem ipsum"),
        pc.match_substring(txt, "{"),
    ).to_numpy(zero_copy_only=False)

    parts = pc.split_pattern(txt, pattern="\n")
    flat = pc.list_flatten(parts)
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)

    ends_ok = np.zeros(len(flat), dtype=bool)
    for t in _TERMINALS:
        ends_ok |= pc.ends_with(flat, pattern=t).to_numpy(
            zero_copy_only=False)
    n_words = pc.count_substring_regex(
        flat, pattern=_WORD_RE.pattern).to_numpy(zero_copy_only=False)
    has_js = pc.match_substring_regex(
        pc.utf8_lower(flat), pattern=_JS_LINE_RE.pattern).to_numpy(
        zero_copy_only=False)
    keep = ends_ok & (n_words >= min_words) & ~has_js & ~doc_bad[parent]

    kept_parent = parent[keep]
    per_doc = np.bincount(kept_parent, minlength=len(batch))
    doc_keep = (per_doc >= min_lines) & ~doc_bad
    if not doc_keep.any():
        return pa.table({
            id_col: pa.array([], type=pa.int64()),
            "clean_text": pa.array([], type=pa.string()),
            "n_lines": pa.array([], type=pa.int64()),
        })
    kept_lines = pd.Series(flat.filter(pa.array(keep)).to_pylist())
    joined = kept_lines.groupby(kept_parent).agg("\n".join)
    doc_idx = np.flatnonzero(doc_keep)
    ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_idx]
    return pa.table({
        id_col: pa.array(ids, type=pa.int64()),
        "clean_text": pa.array(joined.reindex(doc_idx).values,
                               type=pa.string()),
        "n_lines": pa.array(per_doc[doc_idx], type=pa.int64()),
    })


def strip_repeated_lines_batch(batch: pa.Table, text_col: str = "text",
                               id_col: str = "doc_id") -> pa.Table:
    """In-document repetition removal: drop every line that exactly
    repeats an earlier line of the SAME document, keeping first
    occurrences in order (the within-page half of RefinedWeb/CCNet line
    dedup — boilerplate nav bars, cookie banners and footers repeat
    inside a page long before they repeat across the corpus; the
    corpus-wide half is ``stages/dedup.line_dedup``, which needs an
    exchange — this one is a pure map, no shuffle at all).

    Output, one row per input doc: (doc_id, clean_text, n_removed)."""
    txt = batch[text_col].combine_chunks()
    parts = pc.split_pattern(txt, pattern="\n")
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    df = pd.DataFrame({
        "parent": parent,
        "line": pc.list_flatten(parts).to_pylist(),
    })
    dup = df.duplicated(subset=["parent", "line"]).to_numpy()
    kept = df[~dup].groupby("parent", sort=True)["line"].agg("\n".join)
    removed = np.bincount(parent[dup], minlength=len(batch))
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    return pa.table({
        id_col: pa.array(ids, type=pa.int64()),
        "clean_text": pa.array(
            kept.reindex(range(len(batch)), fill_value="").values,
            type=pa.string()),
        "n_removed": pa.array(removed, type=pa.int64()),
    })


def gopher_repetition_batch(batch: pa.Table, text_col: str = "text",
                            id_col: str = "doc_id",
                            line_tokens: int = 10) -> pa.Table:
    """Gopher-style repetition quality signals (Rae et al. 2021, table A1),
    per document, as INTEGER basis points (× 10,000, floor-divided) so the
    driver's value-hash comparison is dtype-exact like quality_stop_ratio:

    - ``dup_line_bp``: fraction of constructed ``line_tokens``-token lines
      that repeat an earlier line of the SAME document,
    - ``top_2gram_bp``: occurrences of the most frequent word 2-gram over
      all 2-gram occurrences,
    - ``dup_5gram_bp``: 5-gram occurrences that repeat an earlier one
      (1 − distinct/total).

    Pure map over the corpus — stream-safe at any scale."""
    from collections import Counter

    ids = batch[id_col].to_pylist()
    d_line, t2, d5 = [], [], []
    for t in batch[text_col].to_pylist():
        toks = tokens_of(t)
        n = len(toks)
        n_lines = max(1, (n + line_tokens - 1) // line_tokens)
        lines = [" ".join(toks[i * line_tokens:(i + 1) * line_tokens])
                 for i in range(n_lines)]
        d_line.append(10000 * (n_lines - len(set(lines))) // n_lines)
        tot2 = n - 1 if n >= 2 else 0
        if tot2:
            top2 = max(Counter(zip(toks, toks[1:])).values())
            t2.append(10000 * top2 // tot2)
        else:
            t2.append(0)
        tot5 = n - 4 if n >= 5 else 0
        if tot5:
            distinct = len({tuple(toks[i:i + 5]) for i in range(tot5)})
            d5.append(10000 * (tot5 - distinct) // tot5)
        else:
            d5.append(0)
    return pa.table({
        id_col: pa.array(ids, type=pa.int64()),
        "dup_line_bp": pa.array(d_line, type=pa.int64()),
        "top_2gram_bp": pa.array(t2, type=pa.int64()),
        "dup_5gram_bp": pa.array(d5, type=pa.int64()),
    })


_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_BULLET_PREFIXES = ("- ", "* ", "• ")
_ELLIPSIS_SUFFIXES = ("...", "…")


def gopher_quality_batch(batch: pa.Table, text_col: str = "text",
                         id_col: str = "doc_id",
                         min_words: int = 50,
                         max_words: int = 100_000) -> pa.Table:
    """Gopher quality-filter signals (Rae et al. 2021, table A1) — the
    non-repetition half, complementing ``gopher_repetition_batch``.  One
    row per doc, every column an int64 count (plus the final bool), and
    every rule a pure INTEGER comparison — no division anywhere, so the
    result is byte-comparable against a SQL oracle:

    - ``n_words`` / ``n_word_chars``: whitespace words and their total
      chars; word-count window = ``min_words <= n_words <= max_words``,
      mean-word-length window 3..10 = ``3*n_words <= n_word_chars <=
      10*n_words``;
    - ``n_symbols``: '#' + ellipsis occurrences; symbol-to-word ratio
      <= 0.1 = ``10*n_symbols <= n_words``;
    - ``n_bullet_lines`` <= 90% of ``n_lines``; ``n_ellipsis_lines``
      <= 30% of ``n_lines``;
    - ``n_alpha_words`` (words containing a letter) >= 80% of words;
    - ``n_stop_hits``: distinct hits among 8 required stop words, >= 2.

    ``gopher_pass`` is the conjunction.  Pure map — stream-safe."""
    ids = batch[id_col].to_pylist()
    nw, nwc, nsym, nl, nbul, nell, nalpha, nstop, ok = (
        [], [], [], [], [], [], [], [], [])
    alpha_re = re.compile(r"[A-Za-z]")
    for t in batch[text_col].to_pylist():
        t = t or ""
        words = t.split()
        w = len(words)
        wc = sum(map(len, words))
        sym = t.count("#") + sum(t.count(e) for e in _ELLIPSIS_SUFFIXES)
        lines = t.split("\n")
        n_lines = len(lines)
        bul = sum(1 for ln in lines if ln.startswith(_BULLET_PREFIXES))
        ell = sum(1 for ln in lines if ln.endswith(_ELLIPSIS_SUFFIXES))
        alpha = sum(1 for word in words if alpha_re.search(word))
        toks = set(tokens_of(t))
        stop = sum(1 for s in _GOPHER_STOPS if s in toks)
        nw.append(w)
        nwc.append(wc)
        nsym.append(sym)
        nl.append(n_lines)
        nbul.append(bul)
        nell.append(ell)
        nalpha.append(alpha)
        nstop.append(stop)
        ok.append(
            min_words <= w <= max_words
            and 3 * w <= wc <= 10 * w
            and 10 * sym <= w
            and 10 * bul <= 9 * n_lines
            and 10 * ell <= 3 * n_lines
            and 5 * alpha >= 4 * w
            and stop >= 2)
    i64 = lambda v: pa.array(v, type=pa.int64())  # noqa: E731
    return pa.table({
        id_col: pa.array(ids, type=pa.int64()),
        "n_words": i64(nw), "n_word_chars": i64(nwc),
        "n_symbols": i64(nsym), "n_lines": i64(nl),
        "n_bullet_lines": i64(nbul), "n_ellipsis_lines": i64(nell),
        "n_alpha_words": i64(nalpha), "n_stop_hits": i64(nstop),
        "gopher_pass": pa.array(ok, type=pa.bool_()),
    })


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      window: int = 8) -> pa.Table:
    """Rolling-hash (Rabin-Karp over token hashes) document fingerprint:
    min/max over the window hashes + the full-stream hash — a winnowing-style
    content signature (Schleimer et al., SIGMOD'03)."""
    fps_min, fps_full = [], []
    B = np.uint64(1099511628211)
    for t in batch[text_col].to_pylist():
        hs = np.fromiter((token_hash64_cached(tok) for tok in tokens_of(t)),
                         dtype=np.uint64)
        n = len(hs)
        if n == 0:
            fps_min.append(0)
            fps_full.append(0)
            continue
        w = min(window, n)
        with np.errstate(over="ignore"):
            # rolling window hashes, vectorized over window positions
            acc = np.zeros(n - w + 1, dtype=np.uint64)
            for j in range(w):
                acc = acc * B + hs[j: n - w + 1 + j]
            # full-stream hash Σ hs[i]·B^(n-1-i) mod 2^64: same value as the
            # sequential Horner loop, via wrapped cumprod powers
            pows = np.ones(n, dtype=np.uint64)
            if n > 1:
                np.cumprod(np.full(n - 1, B, dtype=np.uint64),
                           out=pows[1:])
            full = np.uint64((hs * pows[::-1]).sum())
        fps_min.append(int(acc.min()))
        fps_full.append(int(full))
    return pa.table({
        "doc_id": batch["doc_id"],
        "fp_min": pa.array(fps_min, type=pa.uint64()),
        "fp_full": pa.array(fps_full, type=pa.uint64()),
    })
