"""PII scrubbing — the redaction pass an LLM training-data pipeline runs
between quality filtering and tokenization (the C4/RefinedWeb pipelines
strip emails/phones/IPs the same way).

Pure vectorized map: every pattern is applied with Arrow's RE2 kernels
(``replace_substring_regex`` / ``count_substring_regex``) inside one
``map_batches`` — no shuffle, no state, no Python loop over rows, so the
stage streams at 100 TB exactly like any other map.  DuckDB's regex engine
is RE2 as well, which is what makes the full value-hash SQL oracle for
this operator possible (same pattern string → same matches).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# (name, RE2 pattern, replacement) — applied in order; email first so its
# dotted host can't be half-eaten by the IP rule
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{4,6}", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_scrub_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact PII in ``text_col``; appends the scrubbed text plus one
    ``n_<kind>`` count column per pattern."""
    col = batch[text_col]
    counts = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(col, pat), pa.int64())
        col = pc.replace_substring_regex(col, pat, repl)
    out = batch.drop_columns([text_col]).append_column(text_col, col)
    for cname, arr in counts.items():
        out = out.append_column(cname, arr)
    return out


def pii_scrub(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    return ds.map_batches(
        pii_scrub_batch, fn_kwargs={"text_col": text_col},
        batch_format="pyarrow")
