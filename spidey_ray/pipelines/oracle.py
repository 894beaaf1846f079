"""Serial reference-faithful oracle: the canonical round semantics executed
with plain Python state (SURVEY.md §5.1).

Produces golden outputs — fetch order, final URL-seen set, per-host counts,
span sequences, blacklist, metrics — that the distributed Ray engine
(pipelines/crawl.py) must reproduce bit-for-bit.  Both sides share the same
pure modules (functions/, state/robots.py, state/politeness.py admit_round,
pipelines/crawl_logic.py), so the oracle pins the SEMANTICS while the engine
is free to distribute the execution.

Note on counting (SURVEY.md §7.5): countUrl increments only hosts already
present in host state (scraper.py:116-119 silently ignores unknown hosts);
with round-phased execution a host created during round K's link phase does
not receive counts from round K's gate phase.  Oracle and engine share this
round-phase convention.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions import urltools
from ..state.politeness import CrawlSettings, HostState, admit_round, process_robots
from ..sources import synthetic_web as sw
from .crawl_logic import (
    BlacklistState,
    GateState,
    check_outlink,
    parse_fetch,
)
from . import crawl_logic


@dataclass
class FrontierRow:
    url: str
    url_hash: bytes
    host: str
    depth: int
    parent_url: str
    status: str       # pending | fetched | cancelled
    round_added: int
    round_fetched: int = -1


@dataclass
class CrawlResult:
    fetch_log: list[str] = field(default_factory=list)
    rows: dict[bytes, FrontierRow] = field(default_factory=dict)
    gate: GateState = field(default_factory=GateState)
    blacklist: BlacklistState = field(default_factory=BlacklistState)
    hosts: dict[str, HostState] = field(default_factory=dict)
    token_counts: dict[str, int] = field(default_factory=dict)
    longest: list[tuple[int, str]] = field(default_factory=list)  # true top-10
    documents: dict[str, list[dict]] = field(default_factory=dict)
    titles: dict[str, str] = field(default_factory=dict)
    rounds: int = 0

    @property
    def seen_hashes(self) -> set[bytes]:
        return {h for h, r in self.rows.items() if r.status != "cancelled"}

    def host_counts(self) -> dict[str, int]:
        return {h: s.n_urls for h, s in self.hosts.items()}

    def top_tokens(self, k: int = 50) -> list[tuple[str, int]]:
        return sorted(self.token_counts.items(), key=lambda x: (-x[1], x[0]))[:k]


def _update_longest(longest: list[tuple[int, str]], n: int, url: str) -> None:
    """True top-10 by (n_tokens desc, url asc) — clean semantics for the
    reference's buggy slot insertion (scraper.py:274-280, SURVEY.md §7.5.8)."""
    longest.append((n, url))
    longest.sort(key=lambda x: (-x[0], x[1]))
    del longest[10:]


def crawl_serial(
    web_cfg: sw.WebConfig,
    settings: CrawlSettings | None = None,
    max_rounds: int | None = None,
) -> CrawlResult:
    settings = settings or CrawlSettings()
    res = CrawlResult()
    pattern = settings.netloc_pattern()

    def is_valid(u: str) -> bool:
        return urltools.is_valid(u, pattern)

    def fetch(u: str) -> tuple[str, int, str]:
        page = sw.fetch(web_cfg, u)
        return page.final_url, page.status, page.content

    def add_row(url: str, depth: int, parent: str, round_k: int) -> None:
        url = urltools.normalize(url)
        h = urltools.url_hash(url)
        if h in res.rows and res.rows[h].status != "cancelled":
            return
        res.rows[h] = FrontierRow(
            url=url, url_hash=h, host=urltools.url_host(url), depth=depth,
            parent_url=parent, status="pending", round_added=round_k,
        )

    for url in web_cfg.seeds():
        add_row(url, 0, "", 0)

    limit = max_rounds if max_rounds is not None else settings.max_rounds
    for round_k in range(limit):
        pending = [r for r in res.rows.values() if r.status == "pending"]
        if not pending:
            break
        res.rounds = round_k + 1

        # ---- admission (canonical order + per-host politeness budget) ----
        pending.sort(key=lambda r: crawl_logic.candidate_sort_key(r.depth, r.url))
        clocks = {r.host: res.hosts[r.host].clock for r in pending if r.host in res.hosts}
        delays = {
            r.host: (res.hosts[r.host].delay(settings) if r.host in res.hosts
                     else settings.politeness)
            for r in pending
        }
        admitted_idx, new_clocks = admit_round(
            [(r.url, r.host) for r in pending], clocks, delays,
            round_k, settings.round_window,
        )
        for host, clock in new_clocks.items():
            if host in res.hosts:
                res.hosts[host].clock = clock
            else:
                hs = HostState(host=host)
                hs.clock = clock
                res.hosts[host] = hs
        admitted = [pending[i] for i in admitted_idx]

        # ---- fetch + parse (distributed in the engine) ----
        records = []
        for row in admitted:
            final_url, status, content = fetch(row.url)
            rec, spans, tokens = parse_fetch(
                row.url, final_url, status, content, row.depth, row.parent_url)
            records.append((rec, spans, tokens))
            res.fetch_log.append(row.url)
            row.status = "fetched"
            row.round_fetched = round_k

        # ---- gate phase (canonical order, sequential state machine) ----
        is_blacklisted = res.blacklist.matcher()
        new_patterns: list[crawl_logic.NewPattern] = []
        decisions = []
        for rec, spans, tokens in records:
            d = crawl_logic.apply_gates(rec, res.gate, is_blacklisted, is_valid, settings)
            decisions.append(d)
            new_patterns.extend(d.new_patterns)
            if d.tokenized:
                for t in tokens:
                    res.token_counts[t] = res.token_counts.get(t, 0) + 1
                _update_longest(res.longest, rec.n_tokens, rec.url)
            if d.passed:
                res.documents[rec.url] = spans
                res.titles[rec.url] = rec.title
            if d.count_host is not None and d.count_host in res.hosts \
                    and res.hosts[d.count_host].robots_processed:
                res.hosts[d.count_host].n_urls += 1

        # ---- link expansion: pure checks (distributed in the engine) ----
        candidates = []  # (sorted_url, orig_link, host, depth, parent)
        for (rec, _spans, _tokens), d in zip(records, decisions):
            if not d.expand_links:
                continue
            for link in rec.links:
                sortedq = urltools.sort_by_query(link)
                ok, pats = check_outlink(
                    sortedq, is_valid, is_blacklisted, settings.path_repeat_threshold)
                new_patterns.extend(pats)
                if ok:
                    candidates.append(
                        (sortedq, link, urltools.url_host(sortedq), rec.depth + 1, rec.url))

        # ---- robots gate (host-shard actors in the engine) ----
        candidates.sort(key=lambda c: (c[0], c[1], c[4]))
        by_host: dict[str, list[tuple]] = {}
        for c in candidates:
            by_host.setdefault(c[2], []).append(c)

        def allurlchecks(u: str) -> bool:
            if not is_valid(u) or is_blacklisted(u):
                return False
            return not urltools.trap_patterns(u, settings.path_repeat_threshold)[0]

        additions = []       # (url, depth, parent)
        for host in sorted(by_host):
            rows = by_host[host]
            if host not in res.hosts:
                res.hosts[host] = HostState(host=host)
            hs = res.hosts[host]
            if not hs.robots_processed:
                unchecked, checked = process_robots(
                    hs, rows[0][0], fetch, settings, is_valid, allurlchecks)
                for u in unchecked + checked:
                    additions.append((u, rows[0][3], ""))
            for sorted_url, orig, _h, depth, parent in rows:
                if hs.can_fetch(orig, settings):
                    additions.append((sorted_url, depth, parent))

        # ---- frontier additions: first-seen-wins in canonical order ----
        additions.sort(key=lambda a: (a[0], a[2]))
        for url, depth, parent in additions:
            add_row(url, depth, parent, round_k + 1)

        # ---- round boundary: blacklist growth + cancel (frontier.py:80-92) --
        import re

        for p in new_patterns:
            res.blacklist.add(p.pattern, p.reason, p.temporary)
            if p.cancel:
                cregex = re.compile(p.pattern)
                for h, row in list(res.rows.items()):
                    if row.status == "pending" and cregex.match(row.url):
                        row.status = "cancelled"

    return res
