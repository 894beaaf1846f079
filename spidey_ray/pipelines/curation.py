"""End-to-end training-data curation: the composed pipeline that the
per-operator stages exist for (the C4 / Gopher / CCNet / RefinedWeb /
FineWeb recipe shape):

    line dedup → C4 line/doc cleaning → Gopher repetition gate
      → LM quality gate → MinHash near-dedup → data-mix rebalance

Composition rules (what makes this 100 TB-shaped rather than a script):

- every per-doc step is ONE fused ``map_batches`` stage that carries the
  metadata columns through — no join is ever used to re-attach ``lang``
  / ``source`` to a filtered row;
- the only small-side state (the backoff LM) is trained by distributed
  count aggregation on a slice of the CURRENT survivors and broadcast
  once via ``ray.put`` — scoring and gating happen inline in the same
  batch pass, so the corpus-sized score table never exists;
- the only exchanges are the ones the semantics force: MinHash banding
  (fat-bucketed, capped — ``stages/dedup.py``) and the tiny per-group
  count pass of the mix rebalance.

Each constituent operator keeps its own DuckDB oracle (c4_line_filter,
strip_repeated_lines, gopher_repetition, lm_perplexity, domain_mix,
minhash path pytest-verified); the composition is checked by a pytest
that plants one victim per gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..stages.dedup import minhash_dedup
from ..stages.lm import (build_backoff_model, ngram_count_rows,
                         score_logprob_micro)
from ..stages.sampling import mix_to_proportions
from ..stages.textstats import (c4_line_filter_batch,
                                gopher_repetition_batch,
                                strip_repeated_lines_batch, tokens_of)


def _take_meta(src: pa.Table, out: pa.Table, meta_cols: list[str],
               id_col: str) -> pa.Table:
    """Re-attach ``meta_cols`` to ``out`` (a same-batch row subset of
    ``src``) by positional lookup — an in-batch gather, never a join."""
    if not meta_cols:
        return out
    idx = {d: i for i, d in enumerate(src[id_col].to_pylist())}
    take = pa.array([idx[d] for d in out[id_col].to_pylist()],
                    type=pa.int64())
    for c in meta_cols:
        out = out.append_column(c, src[c].take(take))
    return out


def curate(docs: "ray.data.Dataset", *,
           text_col: str = "text", id_col: str = "doc_id",
           meta_cols: list[str] | None = None,
           c4_min_lines: int = 3,
           max_dup_line_bp: int = 5000,
           max_top_2gram_bp: int = 2500,
           lm_train_mod: int = 10,
           lm_min_micro_per_token: int = -6_000_000,
           minhash_threshold: float = 0.8,
           mix_key: str | None = None,
           mix_shares: dict | None = None) -> "ray.data.Dataset":
    """The composed curation pipeline; returns the surviving corpus with
    ``text`` holding the CLEANED text and ``meta_cols`` carried through.

    Gates, in order (each a documented operator with its own tests):

    1. in-document repeated-line removal (``strip_repeated_lines_batch``);
    2. C4 §2.2 line rules + doc cuts (``c4_line_filter_batch``,
       ``min_lines=c4_min_lines``);
    3. Gopher repetition gate: drop docs with ``dup_line_bp`` >
       ``max_dup_line_bp`` or ``top_2gram_bp`` > ``max_top_2gram_bp``;
    4. LM quality gate: stupid-backoff trigram LM trained on the
       ``id % lm_train_mod == 0`` slice of the CURRENT survivors, drop
       docs scoring under ``lm_min_micro_per_token`` micro-log10 per
       position (and docs too short to score);
    5. MinHash-LSH near-dedup at ``minhash_threshold``;
    6. optional mix rebalance to ``mix_shares`` over ``mix_key``.
    """
    meta = list(meta_cols or [])

    def clean(batch: pa.Table) -> pa.Table:
        # 1. in-doc line dedup (keeps every row, rewrites text)
        s = strip_repeated_lines_batch(batch, text_col=text_col,
                                       id_col=id_col)
        s = _take_meta(batch, s, meta, id_col).drop_columns(["n_removed"])
        s = s.rename_columns(
            [text_col if c == "clean_text" else c for c in s.column_names])
        # 2. C4 line/doc rules (drops rows, rewrites text)
        c = c4_line_filter_batch(s, text_col=text_col, id_col=id_col,
                                 min_lines=c4_min_lines)
        c = _take_meta(s, c, meta, id_col).drop_columns(["n_lines"])
        c = c.rename_columns(
            [text_col if col == "clean_text" else col
             for col in c.column_names])
        # 3. Gopher repetition gate (drops rows, text unchanged)
        g = gopher_repetition_batch(c, text_col=text_col)
        keep = (
            (g["dup_line_bp"].to_numpy() <= max_dup_line_bp)
            & (g["top_2gram_bp"].to_numpy() <= max_top_2gram_bp))
        return c.filter(pa.array(keep))

    cleaned = docs.map_batches(clean, batch_format="pyarrow")

    # 4. LM gate: train on a slice of the survivors (distributed counts),
    # broadcast the pruned model, score + gate inline.  The slice filter
    # is applied at the SOURCE, before clean(): every gate so far is
    # per-document and deterministic, so survivors-of-slice ==
    # slice-of-survivors — identical training corpus, but the training
    # pass cleans 1/lm_train_mod of the data instead of all of it
    # (clean() is otherwise re-executed in full because this lazy
    # dataset is consumed twice).
    def train_slice(t: pa.Table) -> pa.Table:
        d = t[id_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(d % lm_train_mod == 0))

    model = build_backoff_model(ngram_count_rows(
        docs.map_batches(train_slice, batch_format="pyarrow")
            .map_batches(clean, batch_format="pyarrow"),
        text_col=text_col))
    model_ref = ray.put(model)

    def lm_gate(batch: pa.Table) -> pa.Table:
        mdl = ray.get(model_ref)
        keep = np.zeros(len(batch), dtype=bool)
        for i, txt in enumerate(batch[text_col].to_pylist()):
            n, tot = score_logprob_micro(tokens_of(txt or ""), mdl)
            keep[i] = n > 0 and tot >= lm_min_micro_per_token * n
        return batch.filter(pa.array(keep))

    gated = cleaned.map_batches(lm_gate, batch_format="pyarrow")

    # 5. near-dedup, 6. mix
    deduped = minhash_dedup(gated, threshold=minhash_threshold,
                            text_col=text_col)
    if mix_key and mix_shares:
        return mix_to_proportions(deduped, mix_key, id_col, mix_shares)
    return deduped
