"""Canonical crawl semantics shared by the serial oracle and the Ray engine.

The reference's crawl is a single-threaded loop with order-dependent global
state (backend/crawler/scraper.py:383-492; SURVEY.md §7.5.2).  The rebuild
defines a deterministic ROUND-BASED canonicalization of those semantics:

- round K admits pending frontier rows in canonical (depth, url) order under
  the per-host politeness budget (state/politeness.py:admit_round),
- the per-page gate machine below then runs over the round's fetched pages in
  that same canonical order, reproducing extract_next_links' control flow
  (validity/redirect checks scraper.py:413-426, query-trap :447-448,
  low-value :451-456, parent-similarity :460-467, previous-page similarity
  :471-477, sitemap bypass :434/:481-482, unique/count side effects
  :484-487),
- blacklist growth is round-synchronized (SURVEY.md §7.5.3): patterns
  discovered during round K (bad responses, low-value, traps, query traps)
  are applied at the K→K+1 boundary — cancelling matching pending rows and
  deleting their hashes from the seen set, the reference's ``cancel_urls``
  semantics (frontier.py:80-92) — and gate/link checks inside round K use
  the blacklist as of the round's start,
- outlink additions are deduplicated first-seen-wins by canonical SHA-1 url
  hash in (url, parent_url) sort order (frontier.py:60-66 semantics).

Divergences from the reference, chosen deliberately and documented:
- ``parent_url`` is the actual linking page (the reference's prevURL map
  records the last processed outlink of the page due to the loop-variable
  bug at scraper.py:391-392),
- top-10 longest pages is a true top-k ((n_tokens desc, url asc)); the
  reference's slot-overwrite insertion at scraper.py:276-280 is not,
- simhash uses a stable 64-bit token hash (functions/simhash.py) instead of
  Python's per-process salted ``hash()``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlparse

from ..functions import simhash as sh
from ..functions import urltools
from ..functions.htmlspans import parse_document, spans_to_pylist
from ..functions.tokenize import crawl_tokenize, word_frequencies
from ..state.politeness import CrawlSettings

QUERY_TRAP_COUNTER_THRESHOLD = 3   # scraper.py:520
SIM_CRAWL = 0.875                  # scraper.py:465,475
SIM_QUERY = 0.85                   # scraper.py:537


@dataclass
class PageRecord:
    """Compact per-fetch record: everything the sequential gate machine needs
    (no content/spans — those stay in the distributed stage)."""
    url: str
    final_url: str
    status: int
    host: str
    depth: int
    parent_url: str
    empty: bool = False
    tag_count: int = 0
    is_sitemap: bool = False
    n_tokens: int = 0
    simhash: int = 0
    title: str = ""
    links: list[str] = field(default_factory=list)


def parse_fetch(
    url: str, final_url: str, status: int, content: str,
    depth: int, parent_url: str,
) -> tuple[PageRecord, list[dict], list[str]]:
    """Fetch → (record, spans, crawl_tokens). Pure; runs distributed in the
    engine and inline in the oracle."""
    rec = PageRecord(
        url=url, final_url=final_url, status=status,
        host=urltools.url_host(url), depth=depth, parent_url=parent_url,
        empty=(status != 200 or not content),
    )
    if rec.empty:
        return rec, [], []

    doc = parse_document(content, final_url)
    rec.tag_count = doc.tag_count
    rec.is_sitemap = doc.is_sitemap
    rec.title = doc.title
    # within-page outlink set-dedup order: first occurrence wins
    # (scraper.py:490 builds a set; we keep deterministic document order)
    seen_links = set()
    for link in doc.links:
        if link not in seen_links:
            seen_links.add(link)
            rec.links.append(link)

    tokens: list[str] = []
    if not rec.is_sitemap:
        # scraper.py:441: raw content for .txt paths / tagless docs,
        # visible text otherwise
        path = urlparse(url).path
        text = content if (path.endswith(".txt") or rec.tag_count == 0) else doc.visible_text
        tokens = crawl_tokenize(text)
        rec.n_tokens = len(tokens)
        rec.simhash, _ = sh.simhash_from_tokens(tokens)

    return rec, spans_to_pylist(doc.spans), tokens


def is_low_value(tag_count: int, token_count: int) -> bool:
    """scraper.py:294-303."""
    if tag_count > 3:
        return token_count / tag_count < 0.5 and token_count < 150
    return token_count < 150


_LITERAL_RE = re.compile(r"\^(.*?)(\??)\$$", re.DOTALL)


class CompiledBlacklist:
    """Matcher over blacklist patterns with the same semantics as
    ``any(re.match(p, url))`` but O(1) for the dominant exact-URL patterns
    (scraper.py:364-367 emits ``^<re.escape(url)>/?$`` shapes — at crawl
    scale these are thousands of entries and a per-link regex scan is the
    reference's real bottleneck).  Wildcard patterns (traps, query traps)
    compile into one alternation regex."""

    def __init__(self, patterns: list[str]):
        self.exact: set[str] = set()
        wild: list[str] = []
        for p in patterns:
            m = _LITERAL_RE.fullmatch(p)
            lit = None
            if m:
                candidate = re.sub(r"\\(.)", r"\1", m.group(1))
                if "^" + re.escape(candidate) + m.group(2) + "$" == p:
                    lit = candidate
            if lit is not None:
                self.exact.add(lit)
                if m.group(2):  # trailing '?' makes the final char optional
                    self.exact.add(lit[:-1])
            else:
                wild.append(p)
        self.rx = re.compile("|".join(f"(?:{p})" for p in wild)) if wild else None

    def __call__(self, url: str) -> bool:
        if url in self.exact:
            return True
        return bool(self.rx and self.rx.match(url))


@dataclass
class BlacklistState:
    """Permanent + temporary regex blacklists (scraper.py:37-38, 556-568)."""
    permanent: dict[str, str] = field(default_factory=dict)   # pattern -> reason
    temp: set[str] = field(default_factory=set)
    version: int = 0               # bumped on every add; keys matcher cache
    _matcher_cache: tuple | None = field(default=None, repr=False)

    def matcher(self) -> CompiledBlacklist:
        # compile-per-call was ~75 ms/round of pure driver serial time at
        # crawl-scale pattern counts; the pattern set only changes on add()
        c = self._matcher_cache
        if c is None or c[0] != self.version:
            c = (self.version, CompiledBlacklist(self.patterns()))
            self._matcher_cache = c
        return c[1]

    def patterns(self) -> list[str]:
        return list(self.permanent) + sorted(self.temp)

    def add(self, pattern: str, reason: str, temporary: bool) -> None:
        self.version += 1
        if temporary:
            self.temp.add(pattern)
        else:
            if reason == "repeating path trap":
                # a broader trap pattern subsumes earlier ones (scraper.py:592-599)
                prefix = pattern[:-2]
                self.permanent = {
                    p: r for p, r in self.permanent.items()
                    if not (r == "repeating path trap" and p.startswith(prefix))
                }
            self.permanent[pattern] = reason


@dataclass
class NewPattern:
    pattern: str
    reason: str
    temporary: bool
    # cancel_frontier: only trap + query-trap patterns cancel pending rows
    # (scraper.py:370-377 cancel_frontier flag, :602, :613-617); the exact-URL
    # "bad url"/"low info value" patterns do not (scraper.py:364-367).
    cancel: bool = False


@dataclass
class GateState:
    """Order-dependent crawl state (scraper.py:35-44 globals)."""
    page_footprints: dict[str, tuple[int, int]] = field(default_factory=dict)
    previouspage: str | None = None
    query_dict: dict[str, list] = field(default_factory=dict)  # key -> [[h,n], counter]
    unique_url_count: int = 0


@dataclass
class GateDecision:
    url: str
    expand_links: bool
    passed: bool                       # counted as unique (scraper.py:484-485)
    count_host: str | None
    new_patterns: list[NewPattern]
    tokenized: bool = False            # reached the tokenizer (scraper.py:441-443)


def apply_gates(
    rec: PageRecord,
    state: GateState,
    is_blacklisted,
    is_valid,
    settings: CrawlSettings,
) -> GateDecision:
    """The extract_next_links control flow over one canonical-ordered record.
    Mutates ``state`` exactly as the reference mutates its globals."""
    out = GateDecision(rec.url, False, False, None, [])

    # invalid response → blacklist both URLs (scraper.py:413-417)
    if rec.empty:
        out.new_patterns.append(
            NewPattern(urltools.blacklist_url_pattern(rec.url), "bad url", False))
        if rec.final_url != rec.url:
            out.new_patterns.append(
                NewPattern(urltools.blacklist_url_pattern(rec.final_url), "bad url", False))
        return out

    # redirect to a blacklisted/invalid target (scraper.py:420-422)
    if rec.final_url != rec.url and (
        is_blacklisted(rec.final_url) or not is_valid(rec.final_url)
    ):
        out.new_patterns.append(
            NewPattern(urltools.blacklist_url_pattern(rec.url), "bad url", False))
        return out

    # redirect to a trap (scraper.py:425-426); trap emits its patterns
    if rec.final_url != rec.url:
        trapped, perm, temps = urltools.trap_patterns(
            rec.final_url, settings.path_repeat_threshold)
        if trapped:
            out.new_patterns.append(
                NewPattern(perm, "repeating path trap", False, cancel=True))
            out.new_patterns.extend(
                NewPattern(t, "trap", True, cancel=True) for t in temps)
            return out

    if not rec.is_sitemap:
        out.tokenized = True
        footprint = (rec.simhash, rec.n_tokens)

        # query-trap state machine (scraper.py:447-448, 519-553)
        if "?" in rec.url:
            parsed = urlparse(rec.url)
            key = parsed.netloc + parsed.path
            if key in state.query_dict:
                stored_fp, counter = state.query_dict[key]
                if sh.bit_similarity(footprint[0], stored_fp[0]) > SIM_QUERY:
                    if counter >= QUERY_TRAP_COUNTER_THRESHOLD - 1:
                        out.new_patterns.append(
                            NewPattern(urltools.query_trap_pattern(rec.url),
                                       "query trap", True, cancel=True))
                        del state.query_dict[key]
                    else:
                        state.query_dict[key] = [footprint, counter + 1]
                    return out
                state.query_dict[key] = [footprint, counter // 2]
            else:
                state.query_dict[key] = [footprint, 0]

        # low-value (scraper.py:451-456)
        if is_low_value(rec.tag_count, rec.n_tokens):
            out.new_patterns.append(
                NewPattern(urltools.blacklist_url_pattern(rec.url), "low info value", False))
            if rec.final_url != rec.url:
                out.new_patterns.append(
                    NewPattern(urltools.blacklist_url_pattern(rec.final_url), "low info value", False))
            return out

        # parent similarity (scraper.py:460-467)
        prev = rec.parent_url or None
        if prev is not None and ("?" not in rec.url or "?" not in prev) \
                and prev in state.page_footprints:
            pfp = state.page_footprints[prev]
            if sh.footprints_similar(footprint[0], footprint[1], pfp[0], pfp[1],
                                     SIM_CRAWL, SIM_CRAWL):
                return out

        # previous-page similarity — the size-1 sliding window over crawl
        # order (scraper.py:471-477)
        pp = state.previouspage
        if pp is not None and pp != prev \
                and ("?" not in rec.url or "?" not in pp) \
                and pp in state.page_footprints:
            pfp = state.page_footprints[pp]
            if sh.footprints_similar(footprint[0], footprint[1], pfp[0], pfp[1],
                                     SIM_CRAWL, SIM_CRAWL):
                return out

        state.previouspage = rec.url
        state.page_footprints[rec.url] = footprint
    else:
        state.previouspage = None  # scraper.py:481-482

    state.unique_url_count += 1
    out.passed = True
    out.count_host = rec.host      # countUrl(url), scraper.py:487
    out.expand_links = True
    return out


def candidate_sort_key(depth: int, url: str) -> tuple:
    """Canonical within-round processing order (SURVEY.md §7.5.2)."""
    return (depth, url)


def check_outlink(
    sorted_url: str, is_valid, is_blacklisted, threshold: int
) -> tuple[bool, list[NewPattern]]:
    """Pure part of allurlchecks (scraper.py:357-358): validity, round-start
    blacklist, trap predicate. Returns (passes, trap patterns emitted)."""
    if not is_valid(sorted_url):
        return False, []
    if is_blacklisted(sorted_url):
        return False, []
    trapped, perm, temps = urltools.trap_patterns(sorted_url, threshold)
    if trapped:
        pats = [NewPattern(perm, "repeating path trap", False, cancel=True)]
        pats.extend(NewPattern(t, "trap", True, cancel=True) for t in temps)
        return False, pats
    return True, []
