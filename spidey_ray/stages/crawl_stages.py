"""Distributed crawl stages: fetch+parse and outlink checking.

Both are ``map_batches`` callable classes (actor pools): construction-time
state (compiled regexes, web config) is built once per actor
(SURVEY.md §2.3 T8), per-batch work is record-parallel.  The fetch stage is
an actor pool because a real fetcher holds an HTTP session and politeness
must never be retried blindly (SURVEY.md §4 "fetch is non-idempotent") —
``max_retries=0`` semantics are inherited from the driver calling it exactly
once per admitted URL per round.

Reference behavior covered here:
- download + parse + tokenize + footprint (scraper.py:429-443 inside
  extract_next_links; response decode utils/download.py:7-21),
- outlink canonicalization + pure checks: sort_by_query (scraper.py:496-510),
  is_valid (:620-631), blacklist regexes (:558-568), repeating-path trap
  predicate + pattern derivation (:581-609).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions import urltools
from ..pipelines.crawl_logic import check_outlink, parse_fetch
from ..sources import synthetic_web as sw
from ..state.politeness import CrawlSettings

SPAN_TYPE = pa.list_(
    pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("offset", pa.int32())]
    )
)

PARSED_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),          # canonical index within the round
        ("url", pa.string()),
        ("final_url", pa.string()),
        ("status", pa.int32()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("parent_url", pa.string()),
        ("empty", pa.bool_()),
        ("tag_count", pa.int32()),
        ("is_sitemap", pa.bool_()),
        ("n_tokens", pa.int64()),
        ("simhash", pa.uint64()),
        ("title", pa.string()),
        ("content_len", pa.int64()),
        ("links", pa.list_(pa.string())),
        ("spans", SPAN_TYPE),
        ("tokens", pa.list_(pa.string())),
    ]
)

# the compact column set shipped to the driver's sequential gate machine
RECORD_COLUMNS = [
    "seq", "url", "final_url", "status", "host", "depth", "parent_url",
    "empty", "tag_count", "is_sitemap", "n_tokens", "simhash", "title",
    "content_len",
]


class FetchParseStage:
    """url/depth/parent rows → full parsed rows (PARSED_SCHEMA).

    Used as a TASK stage (plain callable via ``fetch_parse_batch``) in the
    synthetic-web engine: construction state is trivial (a dataclass), so
    stateless tasks beat an actor pool — no per-round pool startup, and Ray
    reuses worker processes across rounds.  A real HTTP fetcher (session
    reuse, connection pools) would flip this to ``map_batches(Cls,
    concurrency=N)`` — the call site only changes the callable.
    """

    def __init__(self, web_cfg: dict):
        self.cfg = sw.WebConfig(**web_cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name in PARSED_SCHEMA.names}
        for seq, url, depth, parent in zip(
            batch["seq"].to_pylist(), batch["url"].to_pylist(),
            batch["depth"].to_pylist(), batch["parent_url"].to_pylist(),
        ):
            page = sw.fetch(self.cfg, url)
            rec, spans, tokens = parse_fetch(
                url, page.final_url, page.status, page.content, depth, parent)
            out["seq"].append(seq)
            out["url"].append(rec.url)
            out["final_url"].append(rec.final_url)
            out["status"].append(rec.status)
            out["host"].append(rec.host)
            out["depth"].append(rec.depth)
            out["parent_url"].append(rec.parent_url)
            out["empty"].append(rec.empty)
            out["tag_count"].append(rec.tag_count)
            out["is_sitemap"].append(rec.is_sitemap)
            out["n_tokens"].append(rec.n_tokens)
            out["simhash"].append(rec.simhash)
            out["title"].append(rec.title)
            out["content_len"].append(len(page.content))
            out["links"].append(rec.links)
            out["spans"].append(spans)
            out["tokens"].append(tokens)
        return pa.Table.from_pydict(out, schema=PARSED_SCHEMA)


_STAGE_CACHE: dict = {}


def fetch_parse_batch(batch: pa.Table, web_cfg: dict) -> pa.Table:
    """Task-stage wrapper with a per-worker-process stage cache."""
    key = ("fp", tuple(sorted(web_cfg.items())))
    stage = _STAGE_CACHE.get(key)
    if stage is None:
        stage = _STAGE_CACHE[key] = FetchParseStage(web_cfg)
    return stage(batch)


def link_check_batch(batch: pa.Table, blacklist_patterns: list[str],
                     settings) -> pa.Table:
    key = ("lc", tuple(blacklist_patterns), settings.netloc_regex,
           settings.path_repeat_threshold)
    stage = _STAGE_CACHE.get(key)
    if stage is None:
        _STAGE_CACHE.clear()  # blacklist changes per round; don't accumulate
        stage = _STAGE_CACHE[key] = LinkCheckStage(blacklist_patterns, settings)
    return stage(batch)


CANDIDATE_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("link_idx", pa.int64()),
        ("row_kind", pa.string()),     # 'cand' | 'trap'
        ("sorted_url", pa.string()),
        ("orig_link", pa.string()),
        ("norm_url", pa.string()),     # normalize(sorted_url) — frontier form
        ("url_hash", pa.binary()),     # SHA-1 of the normalized canonical URL
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("parent_url", pa.string()),
        ("pattern", pa.string()),
        ("reason", pa.string()),
        ("temporary", pa.bool_()),
    ]
)


class LinkCheckStage:
    """Parsed rows (expand-approved) → candidate outlink rows + trap-pattern
    emissions, tagged with (seq, link_idx) so the driver can re-impose the
    canonical emission order of the serial semantics."""

    def __init__(self, blacklist_patterns: list[str], settings: CrawlSettings):
        from ..pipelines.crawl_logic import CompiledBlacklist

        self._is_blacklisted = CompiledBlacklist(blacklist_patterns)
        self.pattern = settings.netloc_pattern()
        self.threshold = settings.path_repeat_threshold

    def _is_valid(self, u: str) -> bool:
        return urltools.is_valid(u, self.pattern)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name in CANDIDATE_SCHEMA.names}

        def emit(seq, link_idx, row_kind, sorted_url="", orig="", host="",
                 depth=0, parent="", pattern="", reason="", temporary=False):
            norm = urltools.normalize(sorted_url) if sorted_url else ""
            out["seq"].append(seq)
            out["link_idx"].append(link_idx)
            out["row_kind"].append(row_kind)
            out["sorted_url"].append(sorted_url)
            out["orig_link"].append(orig)
            out["norm_url"].append(norm)
            out["url_hash"].append(urltools.url_hash(norm) if norm else b"")
            out["host"].append(host)
            out["depth"].append(depth)
            out["parent_url"].append(parent)
            out["pattern"].append(pattern)
            out["reason"].append(reason)
            out["temporary"].append(temporary)

        for seq, url, depth, links in zip(
            batch["seq"].to_pylist(), batch["url"].to_pylist(),
            batch["depth"].to_pylist(), batch["links"].to_pylist(),
        ):
            for li, link in enumerate(links):
                sortedq = urltools.sort_by_query(link)
                ok, pats = check_outlink(
                    sortedq, self._is_valid, self._is_blacklisted, self.threshold)
                for p in pats:
                    emit(seq, li, "trap", pattern=p.pattern, reason=p.reason,
                         temporary=p.temporary)
                if ok:
                    emit(seq, li, "cand", sorted_url=sortedq, orig=link,
                         host=urltools.url_host(sortedq), depth=depth + 1,
                         parent=url)
        return pa.Table.from_pydict(out, schema=CANDIDATE_SCHEMA)
