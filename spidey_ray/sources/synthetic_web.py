"""Deterministic synthetic web: the fetcher backing store for tests + bench.

The reference crawls a live cache server (backend/crawler/utils/download.py:7-21);
this sandbox has no network, so the "web" is a pure function
``(config, url) -> page`` seeded by ``config.seed`` — identical in every
process, so the serial oracle and distributed fetcher actors see the same web
without broadcasting any page payloads.  Covers the fixture families of
FIXTURES.md §A2/§A3: robots precedence + crawl-delay, txt/xml sitemaps,
repeating-path traps (scraper.py:581-609 shape), query traps
(notes.txt:106-131 shape), near-duplicate clusters, low-value pages,
redirects, non-200s and raw .txt docs.

Host features cycle with ``host_index % 16`` so every feature exists at any
host count:
  0 robots Allow-over-Disallow + crawl-delay | 1 sitemap.txt | 2 path trap
  3 query trap | 4 near-dup cluster | 5 low-value | 6 redirects | 7 raw .txt
  8 dead links (404/500) | 9 xml sitemap (<loc>) | others generic
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from urllib.parse import parse_qs, urlparse

# ~4.6k distinct words so random page bodies are NOT simhash-near-dups of
# each other (a tiny vocabulary makes every page ≥0.875-similar and the
# crawl-time suppression gate swallows the whole web).
_SYL1 = "ba be bi bo bu da de di do du ka ke ki ko ku ma me mi mo mu".split()
_SYL2 = "lan len lin lon lun rat ret rit rot rut san sen sin son sun tar ter tir tor tur".split()
_SYL3 = "ga ge gi go gu va ve vi vo vu za ze zi zo zu".split()
_WORDS = [a + b + c for a in _SYL1 for b in _SYL2 for c in _SYL3]


@dataclass
class WebConfig:
    seed: int = 42
    n_hosts: int = 8
    pages_per_host: int = 12
    branching: int = 3
    cross_links: int = 2
    tokens_per_page: int = 180
    domain: str = "example.com"
    n_seeds: int = 4
    # hot-domain skew knob: h0 gets this many pages instead of
    # pages_per_host (0 = uniform) — lets skew tests build a web where one
    # host holds ~90% of the corpus while every other semantic is unchanged
    hot_host_pages: int = 0

    def host(self, i: int) -> str:
        return f"h{i}.{self.domain}"

    def pages_of(self, host_i: int) -> int:
        if host_i == 0 and self.hot_host_pages:
            return self.hot_host_pages
        return self.pages_per_host

    def seeds(self) -> list[str]:
        return [f"https://{self.host(i)}/" for i in range(min(self.n_seeds, self.n_hosts))]


@dataclass
class Page:
    url: str
    final_url: str
    status: int
    content: str
    encoding: str = "utf-8"


def _rng(cfg: WebConfig, *key) -> random.Random:
    return random.Random(f"{cfg.seed}:{':'.join(map(str, key))}")


_WORDS_ARR = None


def _paras_batch(cfg: WebConfig, keys: list[str],
                 sizes: list[int]) -> list[str]:
    """All of a page's deterministic filler paragraphs in ONE vectorized
    draw.  Each key seeds an independent stateless splitmix64 stream
    (token j of key k is mix(crc32(k) + (j+1)·φ)), so the output is
    byte-identical to drawing each paragraph separately — but the ~50
    per-paragraph numpy dispatch rounds per page collapse into one 2-D
    op (the fixed per-call overhead was ~25% of the bench fetch worker
    after the simhash fix)."""
    global _WORDS_ARR
    if _WORDS_ARR is None:
        import numpy as _np

        _WORDS_ARR = _np.array(_WORDS)
    import zlib as _zlib

    import numpy as _np

    seeds = _np.fromiter(
        (_zlib.crc32(f"{cfg.seed}:para:{k}".encode()) for k in keys),
        dtype=_np.uint64, count=len(keys))
    width = max(sizes)
    j = _np.arange(1, width + 1, dtype=_np.uint64)
    with _np.errstate(over="ignore"):
        x = seeds[:, None] + j[None, :] * _np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> _np.uint64(30)
        x *= _np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> _np.uint64(27)
        x *= _np.uint64(0x94D049BB133111EB)
        x ^= x >> _np.uint64(31)
    idx = (x % _np.uint64(len(_WORDS))).astype(_np.int64)
    words = _WORDS_ARR[idx]
    return [" ".join(words[i, :n].tolist()) for i, n in enumerate(sizes)]


def _para(cfg: WebConfig, key: str, n_tokens: int) -> str:
    """Single-paragraph wrapper over :func:`_paras_batch` (same stream)."""
    return _paras_batch(cfg, [key], [n_tokens])[0]


def _host_index(cfg: WebConfig, netloc: str) -> int | None:
    if not netloc.endswith("." + cfg.domain):
        return None
    sub = netloc[: -len("." + cfg.domain)]
    if not sub.startswith("h") or not sub[1:].isdigit():
        return None
    i = int(sub[1:])
    return i if 0 <= i < cfg.n_hosts else None


def _page_html(cfg: WebConfig, host_i: int, title: str, body_key: str,
               n_tokens: int, links: list[str], media: list[str] = ()) -> str:
    # one vectorized draw for every text fragment of the page
    keys, sizes = [], []
    remaining = n_tokens
    pi = 0
    while remaining > 0:
        take = min(remaining, 40)
        keys.append(f"{body_key}:{pi}")
        sizes.append(take)
        remaining -= take
        pi += 1
    n_paras = pi
    keys.append(body_key + ":h"); sizes.append(4)
    keys.append(body_key + ":b"); sizes.append(3)
    for k in range(len(links)):
        keys.append(f"{body_key}:a{k}"); sizes.append(2)
    texts = _paras_batch(cfg, keys, sizes)
    paras = [f"<p>{t}</p>" for t in texts[:n_paras]]
    heading = f"<h1>{texts[n_paras]}</h1>"
    bold = f"<b>{texts[n_paras + 1]}</b>"
    link_html = "".join(
        f'<a href="{href}">{anchor}</a> '
        for href, anchor in zip(links, texts[n_paras + 2:])
    )
    media_html = "".join(f'<img src="{src}" alt="m{k}">' for k, src in enumerate(media))
    return (
        f"<html><head><title>{title}</title></head><body>"
        f"{heading}{paras[0] if paras else ''}{bold}"
        f"{''.join(paras[1:])}{link_html}{media_html}"
        f"</body></html>"
    )


def _generic_links(cfg: WebConfig, host_i: int, page_j: int) -> list[str]:
    host = cfg.host(host_i)
    links = []
    for c in range(1, cfg.branching + 1):
        child = page_j * cfg.branching + c
        if child < cfg.pages_of(host_i):
            links.append(f"https://{host}/p/{child}")
    rng = _rng(cfg, "xlink", host_i, page_j)
    for _ in range(cfg.cross_links):
        other = rng.randrange(cfg.n_hosts)
        if other != host_i:
            oj = rng.randrange(cfg.pages_of(other))
            links.append(f"https://{cfg.host(other)}/p/{oj}")
    if page_j % 4 == 1:
        links.append(f"https://{host}/p/{page_j}/")  # trailing-slash variant (normalize M2)
    if page_j % 5 == 2:
        links.append("https://outside.net/nope")      # filtered by is_valid (M1)
        links.append(f"https://{host}/img/photo.jpg")  # bad extension (M1)
        links.append("ftp://" + host + "/file")        # bad scheme (M1)
    return links


def make_fetch_fn(**cfg_kwargs):
    """Factory for the FetchFn used by host-shard actors (importable by
    module+name so actor construction ships no closures)."""
    cfg = WebConfig(**cfg_kwargs)

    def fetch_fn(url: str) -> tuple[str, int, str]:
        p = fetch(cfg, url)
        return p.final_url, p.status, p.content

    return fetch_fn


def robots_txt(cfg: WebConfig, host_i: int) -> str | None:
    """robots.txt body for a host, or None (404 → allow all, scraper.py:58-59)."""
    feat = host_i % 16
    host = cfg.host(host_i)
    if feat == 0:
        return (
            "User-agent: *\n"
            "Disallow: /private\n"
            "Allow: /private/ok\n"      # Allow-over-Disallow (robotparser.py:270-281)
            "Crawl-delay: 1\n"
        )
    if feat == 1:
        return f"User-agent: *\nSitemap: https://{host}/sitemap.txt\n"
    if feat == 9:
        return f"User-agent: *\nSitemap: https://{host}/sitemap.xml\n"
    if feat == 3:
        return "User-agent: *\nCrawl-delay: 2\nDisallow: /admin\n"
    return None


def fetch(cfg: WebConfig, url: str) -> Page:
    """Deterministic fetch. Unknown URLs → 404 with empty content."""
    p = urlparse(url)
    host_i = _host_index(cfg, p.netloc)
    if host_i is None or p.scheme not in ("http", "https"):
        return Page(url, url, 404, "")
    host = cfg.host(host_i)
    feat = host_i % 16
    path = p.path or "/"

    if path == "/robots.txt":
        body = robots_txt(cfg, host_i)
        return Page(url, url, 200 if body is not None else 404, body or "")

    if feat == 1 and path == "/sitemap.txt":
        lines = [f"https://{host}/p/{j}" for j in range(0, cfg.pages_of(host_i), 2)]
        return Page(url, url, 200, "\n".join(lines))

    if feat == 9 and path == "/sitemap.xml":
        locs = "".join(
            f"<url><loc>https://{host}/p/{j}</loc></url>"
            for j in range(0, cfg.pages_of(host_i), 3)
        )
        return Page(url, url, 200, f'<?xml version="1.0"?><urlset>{locs}</urlset>')

    # homepage
    if path in ("", "/"):
        links = [f"https://{host}/p/0"]
        links += _generic_links(cfg, host_i, 0)[1:]
        if feat == 0:
            links += [f"https://{host}/private/secret", f"https://{host}/private/ok/info"]
        if feat == 2:
            links.append(f"https://{host}/t/zig")
        if feat == 3:
            # hub links to several query permutations of the same listing so
            # the query-trap counter (scraper.py:519-553) can reach 3 strikes
            links += [f"https://{host}/list?sort=name&page={n}" for n in range(1, 6)]
        if feat == 6:
            links.append(f"https://{host}/r/1")
        if feat == 7:
            links.append(f"https://{host}/notes.txt")
        if feat == 8:
            links += [f"https://{host}/dead/1", f"https://{host}/err/1"]
        media = [f"https://{host}/img/logo.png"]
        return Page(url, url, 200,
                    _page_html(cfg, host_i, f"Home {host}", f"{host}:home",
                               cfg.tokens_per_page, links, media))

    parts = [x for x in path.split("/") if x]

    # raw text file
    if feat == 7 and path == "/notes.txt":
        return Page(url, url, 200, _para(cfg, f"{host}:notes", 200))

    # redirect host
    if feat == 6 and len(parts) == 2 and parts[0] == "r" and parts[1].isdigit():
        j = int(parts[1])
        target = f"https://{host}/p/{j}"
        tp = fetch(cfg, target)
        return Page(url, target, tp.status, tp.content)

    # dead links host
    if feat == 8 and parts and parts[0] in ("dead", "err"):
        return Page(url, url, 404 if parts[0] == "dead" else 500, "")

    # path trap host: /t/... pages keep linking deeper with repeating segments
    if feat == 2 and parts and parts[0] == "t":
        segs = parts[1:]
        nxt = ("zig", "zag")[len(segs) % 2]
        deeper = f"https://{host}/t/{'/'.join(segs + [nxt])}"
        # distinct body per level so near-dup suppression doesn't preempt
        # the repeating-path trap detection under test
        return Page(url, url, 200,
                    _page_html(cfg, host_i, f"T {len(segs)}", f"{host}:trap:{path}",
                               cfg.tokens_per_page, [deeper]))

    # query trap host: /list?page=N — identical content, next-page links
    if feat == 3 and parts and parts[0] == "list":
        q = parse_qs(p.query)
        page_n = int(q.get("page", ["1"])[0])
        links = [
            f"https://{host}/list?page={page_n + 1}&sort=name",  # unsorted params (M4)
            f"https://{host}/p/0",
        ]
        return Page(url, url, 200,
                    _page_html(cfg, host_i, "Listing", f"{host}:list",
                               cfg.tokens_per_page, links))

    # regular pages /p/<j>
    if parts and parts[0] == "p" and len(parts) == 2 and parts[1].isdigit():
        j = int(parts[1])
        if j >= cfg.pages_of(host_i):
            return Page(url, url, 404, "")
        links = _generic_links(cfg, host_i, j)
        n_tokens = cfg.tokens_per_page
        body_key = f"{host}:p{j}"
        media = [f"https://{host}/img/p{j}.png"] if j % 3 == 0 else []
        if feat == 4:
            # near-dup cluster: all pages share one body; j only changes title
            body_key = f"{host}:neardup"
        if feat == 5:
            # low-value: token/tag ratio < 0.5 and tokens < 150 (scraper.py:294-303)
            n_tokens = 5
            media = [f"https://{host}/img/x{k}.png" for k in range(60)]
        return Page(url, url, 200,
                    _page_html(cfg, host_i, f"Page {j} {host}", body_key,
                               n_tokens, links, media))

    # allowed-but-robots-disallowed area on feat 0
    if feat == 0 and parts and parts[0] == "private":
        sub_key = f"{host}:{path}"
        return Page(url, url, 200,
                    _page_html(cfg, host_i, "Private", sub_key,
                               cfg.tokens_per_page, [f"https://{host}/p/1"]))

    return Page(url, url, 404, "")
