"""URL canonicalization, hashing and validity predicates.

Reference semantics:
- ``normalize`` strips a single trailing '/' (backend/crawler/utils/__init__.py:32-35).
- ``sort_by_query`` sorts '&'-split query params when there are >= 2
  (backend/crawler/scraper.py:496-510).
- ``canonical_string`` / ``url_hash`` key URLs on the scheme-insensitive
  identity "netloc/path/params/query/fragment"
  (backend/crawler/utils/__init__.py:25-30); the rebuild hashes it with SHA-1
  (20 bytes) per the north_rule instead of the reference's SHA-256 hexdigest.
- ``is_valid`` = scheme in {http,https}, netloc matches the allowed-domain
  pattern, path extension not in the denylist
  (backend/crawler/scraper.py:129-140, 620-631).
- ``absolute_url`` = urljoin + urldefrag (backend/crawler/scraper.py:396-400).
- ``is_trap`` / ``get_path_repeat`` = repeating path-segment trap detection
  (backend/crawler/scraper.py:258-261, 581-609).

All functions are pure and shared verbatim by the serial oracle and the Ray
stages, so golden outputs cannot drift from the distributed implementation.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter
from urllib.parse import urldefrag, urljoin, urlparse, urlunsplit

SCHEME_PATTERN = re.compile(r"^https?$")
# Same 60-extension denylist as scraper.py:133-140.
BAD_EXT_PATH_PATTERN = re.compile(
    r".*\.(css|js|bmp|gif|jpe?g|ico"
    r"|png|tiff?|mid|mp2|mp3|mp4"
    r"|wav|avi|mov|mpeg|ram|m4v|mkv|ogg|ogv|pdf"
    r"|ps|eps|tex|ppt|pptx|ppsx|doc|docx|xls|xlsx|names"
    r"|data|dat|exe|bz2|tar|msi|bin|7z|psd|dmg|iso"
    r"|epub|dll|cnf|tgz|sha1"
    r"|thmx|mso|arff|rtf|jar|csv"
    r"|rm|smil|wmv|swf|wma|zip|rar|gz|scm|img)$"
)
# The reference pins UCI domains (scraper.py:130-131); the rebuild makes the
# allowed-netloc pattern a config knob with this default for synthetic webs.
DEFAULT_NETLOC_PATTERN = re.compile(r"^([-a-z0-9]+\.)*example\.(com|org|net)$")
# The reference's own allowed-domain pattern, verbatim (scraper.py:130-131),
# for running against the reference seed list on a networked deployment.
REFERENCE_NETLOC_PATTERN = re.compile(
    r"^(([-a-z0-9]+\.)*(ics\.uci\.edu|cs\.uci\.edu|informatics\.uci\.edu|stat\.uci\.edu))"
    r"|today\.uci\.edu\/department\/information_computer_sciences$"
)
# Reference seed list (config.ini:10 SEEDURL)
REFERENCE_SEEDS = [
    "https://www.ics.uci.edu",
    "https://www.cs.uci.edu",
    "https://www.informatics.uci.edu",
    "https://www.stat.uci.edu",
]


def normalize(url: str) -> str:
    if url.endswith("/"):
        return url.rstrip("/")
    return url


def canonical_string(url: str) -> str:
    p = urlparse(url)
    return f"{p.netloc}/{p.path}/{p.params}/{p.query}/{p.fragment}"


def url_hash(url: str) -> bytes:
    """20-byte SHA-1 of the canonical (scheme-insensitive) URL identity."""
    return hashlib.sha1(canonical_string(url).encode("utf-8")).digest()


def url_host(url: str) -> str:
    return urlparse(url).netloc


def sort_by_query(link: str) -> str:
    parsed = urlparse(link)
    query = parsed.query.split("&")
    if len(query) >= 2:
        query.sort()
        return urlunsplit(
            (parsed.scheme, parsed.netloc, parsed.path, "&".join(query), parsed.fragment)
        )
    return link


_ABS_BASE: tuple[str, str] | None = None        # (page_url, scheme://netloc)
_SIMPLE_ABS = re.compile(r"[a-z][a-z0-9+.-]*://[^#]*$")  # urljoin lowercases
                                                         # schemes: uppercase
                                                         # falls through
_SIMPLE_REL = re.compile(r"/[^/#?.]?[^#?]*$")   # root-relative, no . segments


def absolute_url(page_url: str, outlink_url: str) -> str:
    """``urldefrag(urljoin(...))`` with fast paths for the two shapes that
    dominate real link graphs — already-absolute URLs and clean
    root-relative paths — because stdlib urljoin re-parses the (constant)
    base for every one of a page's links and was half the hub-page parse
    cost.  Anything else (relative paths, dot segments, queries,
    fragments, scheme-relative) takes the exact stdlib path."""
    if _SIMPLE_ABS.match(outlink_url):
        return outlink_url
    if (_SIMPLE_REL.match(outlink_url) and not outlink_url.startswith("//")
            and "/." not in outlink_url):    # dot segments need urljoin
        global _ABS_BASE
        # read the cache tuple ONCE into a local so the returned prefix
        # always matches the page_url we checked — two threads parsing
        # different pages can interleave on the module global otherwise
        base = _ABS_BASE
        if base is None or base[0] != page_url:
            p = urlparse(page_url)
            if p.scheme not in ("http", "https"):
                return urldefrag(urljoin(page_url, outlink_url))[0]
            base = (page_url, f"{p.scheme}://{p.netloc}")
            _ABS_BASE = base
        return base[1] + outlink_url
    return urldefrag(urljoin(page_url, outlink_url))[0]


def is_valid(url: str, netloc_pattern: re.Pattern = DEFAULT_NETLOC_PATTERN) -> bool:
    try:
        parsed = urlparse(url)
    except ValueError:
        return False
    return bool(
        SCHEME_PATTERN.match(parsed.scheme.lower())
        and netloc_pattern.match(parsed.netloc.lower())
        and not BAD_EXT_PATH_PATTERN.match(parsed.path.lower())
    )


def get_path_repeat(urlpath: str, threshold: int = 3) -> list[str]:
    """Path segments repeated more than ``threshold`` times (scraper.py:258-261)."""
    counts = Counter(urlpath.split("/"))
    return [seg for seg, n in counts.items() if n > threshold]


def trap_patterns(url: str, threshold: int = 3) -> tuple[bool, str | None, list[str]]:
    """Repeating-path trap check (scraper.py:581-609).

    Returns ``(is_trap, permanent_pattern, temp_patterns)`` where the
    permanent pattern blacklists everything under the prefix up to the first
    repeating segment and the temp patterns blacklist ``.../.*<segment>.*``
    shapes, exactly as the reference derives them.
    """
    parsed = urlparse(url)
    urlpath = parsed.path.lower()
    repeats = get_path_repeat(urlpath, threshold)
    if not repeats:
        return False, None, []
    urlpart = url[: min(url.find(r) for r in repeats) - 1]
    permanent = f"^{re.escape(urlpart)}.*$"
    temps = [
        f"^{re.escape('/'.join(urlpart.split('/')[:-1]))}\\/.*{r}.*$" for r in repeats
    ]
    return True, permanent, temps


def blacklist_url_pattern(url: str) -> str:
    """Exact-URL blacklist pattern (scraper.py:364-367)."""
    return f"^{re.escape(url)}{'?' if url.endswith('/') else ''}$"


def query_trap_pattern(url: str) -> str:
    """Temp-blacklist pattern for a query-trap page (scraper.py:539)."""
    parsed = urlparse(url)
    return f"^{re.escape(urlunsplit((parsed.scheme, parsed.netloc, parsed.path, '', '')))}.*$"
