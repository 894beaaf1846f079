"""The Ray-Data crawl engine: round-based BFS frontier expansion.

Each round (SURVEY.md §7.2.7, north_rule):

1. ADMIT   — pending frontier rows in canonical (depth, url) order through
             the per-host politeness clocks (HostShard actor pool; all of a
             host's traffic goes through its one shard — SURVEY.md §4).
2. FETCH+PARSE — ``map_batches(FetchParseStage)`` actor pool over zero-copy
             Arrow batches: synthetic fetch, span parse, tokenize, stable
             simhash.  The heavy columns (spans/links/tokens) never leave
             the cluster; only the compact record columns come back to the
             driver.
3. GATES   — the sequential state machine (crawl_logic.apply_gates) over the
             round's compact records in canonical order: query traps,
             low-value, parent/previous-page similarity, blacklist
             emissions.  O(round) work over ~100-byte records; the
             content-size work stayed in step 2.
4. EXPAND  — ``map_batches(LinkCheckStage)`` over the expand-approved pages:
             canonicalize + validity + round-start blacklist + trap
             predicate, distributed; surviving candidates come back tagged
             (seq, link_idx) so the canonical emission order is re-imposed.
5. ROBOTS  — one batched ``filter_links`` call per HostShard: robots
             fetch-on-first-sighting (charging the politeness clock,
             scraper.py:68), sitemap ingestion, can_fetch gate.
6. SEEN    — batched ``seen_or_add`` on the cuckoo-filter shard pool in
             canonical (url, parent) order; first-seen-wins
             (frontier.py:60-66).
7. CHECKPOINT — frontier, gate state, blacklist, host snapshots, cuckoo
             blobs, per-round token-count deltas, documents and lineage go
             to Lance/Parquet under ``ckpt_dir``; ``_SUCCESS`` marks the
             round complete.  ``CrawlEngine.resume`` restarts from the last
             complete round (north_rule resumability).

Scale posture (10^10-frontier): the frontier table and fingerprints are
columnar and checkpointed every round — at cluster scale they live in Lance
and only the round's READY slice is materialized; the driver-side structures
here (pandas frontier, footprint dict) are the single-node stand-ins for
those tables and are the documented swap points.  Blacklist growth is
round-synchronized (SURVEY.md §7.5.3).
"""

from __future__ import annotations

import json
import os
import pickle
import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions import urltools
from ..sources import synthetic_web as sw
from ..state.cuckoo import ShardedSeen, key64
from ..state.politeness import CrawlSettings, HostShard, host_shard_of
from ..stages.crawl_stages import (
    RECORD_COLUMNS,
    fetch_parse_batch,
    link_check_batch,
)
from . import crawl_logic
from .crawl_logic import BlacklistState, GateState, NewPattern

FRONTIER_COLS = [
    "url", "url_hash", "host", "depth", "parent_url", "status",
    "round_added", "round_fetched", "fetch_seq",
]


def _quiet_data_context():
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    try:
        ctx.execution_options.verbose_progress = False
    except Exception:
        pass


@dataclass
class EngineResult:
    fetch_log: list[str]
    frontier: pd.DataFrame
    gate: GateState
    blacklist: BlacklistState
    host_snapshots: dict[str, dict]
    token_counts: dict[str, int]
    longest: list[tuple[int, str]]
    rounds: int
    documents_path: str | None

    @property
    def seen_hashes(self) -> set[bytes]:
        df = self.frontier
        return set(df.loc[df.status != "cancelled", "url_hash"])

    def host_counts(self) -> dict[str, int]:
        return {
            h: s["n_urls"] for h, s in self.host_snapshots.items()
            if s["robots_processed"]
        }

    def top_tokens(self, k: int = 50) -> list[tuple[str, int]]:
        return sorted(self.token_counts.items(), key=lambda x: (-x[1], x[0]))[:k]

    def documents(self) -> pa.Table | None:
        if self.documents_path is None or not os.path.exists(self.documents_path):
            return None
        parts = []
        for rd in sorted(os.listdir(self.documents_path)):
            d = os.path.join(self.documents_path, rd)
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    parts.append(pq.read_table(os.path.join(d, f)))
        return pa.concat_tables(parts) if parts else None


class CrawlEngine:
    def __init__(
        self,
        web_cfg: sw.WebConfig,
        settings: CrawlSettings | None = None,
        ckpt_dir: str | None = None,
        n_seen_shards: int = 4,
        n_host_shards: int = 2,
        fetch_concurrency: int = 2,
        fetch_batch_size: int = 16,
        seen_buckets: int = 1 << 14,
    ):
        self.web_cfg = web_cfg
        self.settings = settings or CrawlSettings()
        self.ckpt_dir = ckpt_dir
        self.n_seen_shards = n_seen_shards
        self.n_host_shards = n_host_shards
        self.fetch_concurrency = fetch_concurrency
        self.fetch_batch_size = fetch_batch_size
        self.seen_buckets = seen_buckets

        self._pattern = self.settings.netloc_pattern()
        self.gate = GateState()
        self.blacklist = BlacklistState()
        self.token_counts: dict[str, int] = {}
        self.longest: list[tuple[int, str]] = []
        self.fetch_seq = 0
        self.start_round = 0

        self.frontier = pd.DataFrame(
            {c: pd.Series(dtype=o) for c, o in zip(
                FRONTIER_COLS,
                ["object", "object", "object", "int64", "object", "object",
                 "int64", "int64", "int64"],
            )}
        )

        self.seen = ShardedSeen(n_shards=n_seen_shards, n_buckets=seen_buckets)
        self.host_shards = [
            HostShard.remote(
                self.settings, "spidey_ray.sources.synthetic_web",
                "make_fetch_fn", _cfg_dict(web_cfg),
            )
            for _ in range(n_host_shards)
        ]
        self._seed()

    # ------------------------------------------------------------------
    def _is_valid(self, u: str) -> bool:
        return urltools.is_valid(u, self._pattern)

    def _seed(self):
        additions = [(u, 0, "") for u in self.web_cfg.seeds()]
        self._add_rows(additions, round_k=0)

    def _add_rows(self, additions: list[tuple[str, int, str]], round_k: int) -> int:
        """Canonically ordered (url, depth, parent) additions → first-seen-wins
        via the cuckoo shards → pending frontier rows."""
        if not additions:
            return 0
        prepared, keys = [], []
        for url, depth, parent in additions:
            url = urltools.normalize(url)
            h = urltools.url_hash(url)
            prepared.append((url, h, depth, parent))
            keys.append(key64(h))
        seen_mask = self.seen.seen_or_add(np.array(keys, dtype=np.uint64))
        rows = []
        for (url, h, depth, parent), was_seen in zip(prepared, seen_mask):
            if was_seen:
                continue
            rows.append(
                dict(url=url, url_hash=h, host=urltools.url_host(url),
                     depth=depth, parent_url=parent, status="pending",
                     round_added=round_k, round_fetched=-1, fetch_seq=-1)
            )
        if rows:
            add_df = pd.DataFrame(rows)
            # a cancelled row whose hash was re-admitted by the filter gets
            # replaced (reference deletes cancelled hashes from the shelve)
            self.frontier = self.frontier[
                ~(self.frontier.url_hash.isin(add_df.url_hash)
                  & (self.frontier.status == "cancelled"))
            ]
            self.frontier = pd.concat([self.frontier, add_df], ignore_index=True)
        return len(rows)

    # ------------------------------------------------------------------
    def run(self, max_rounds: int | None = None,
            stop_after_round: int | None = None) -> EngineResult:
        _quiet_data_context()
        limit = max_rounds if max_rounds is not None else self.settings.max_rounds
        rounds_done = self.start_round
        for round_k in range(self.start_round, limit):
            pending = self.frontier[self.frontier.status == "pending"]
            if pending.empty:
                break
            rounds_done = round_k + 1
            self._run_round(round_k, pending)
            if self.ckpt_dir:
                self._checkpoint(round_k)
            if stop_after_round is not None and round_k >= stop_after_round:
                break
        return self._result(rounds_done)

    # ------------------------------------------------------------------
    def _run_round(self, round_k: int, pending: pd.DataFrame) -> None:
        settings = self.settings

        # ---- 1. politeness admission (host-shard actor pool) ----
        cands = pending.sort_values(["depth", "url"], kind="mergesort")
        by_shard: list[dict[str, list[str]]] = [dict() for _ in range(self.n_host_shards)]
        for host, urls in cands.groupby("host", sort=True)["url"]:
            by_shard[host_shard_of(host, self.n_host_shards)][host] = list(urls)
        admit_refs = [
            shard.admit.remote(shard_cands, round_k)
            for shard, shard_cands in zip(self.host_shards, by_shard)
            if shard_cands
        ]
        n_admit: dict[str, int] = {}
        for out in ray.get(admit_refs):
            n_admit.update(out)
        taken: dict[str, int] = {}
        admit_mask = []
        for host in cands["host"]:
            k = taken.get(host, 0)
            ok = k < n_admit.get(host, 0)
            taken[host] = k + 1 if ok else k
            admit_mask.append(ok)
        admitted = cands[admit_mask]
        if admitted.empty:
            return

        # assign canonical seq + global fetch order
        admitted = admitted.assign(seq=np.arange(len(admitted), dtype=np.int64))
        self.frontier.loc[admitted.index, "status"] = "fetched"
        self.frontier.loc[admitted.index, "round_fetched"] = round_k
        self.frontier.loc[admitted.index, "fetch_seq"] = (
            self.fetch_seq + admitted["seq"].values
        )
        self.fetch_seq += len(admitted)

        # ---- 2. distributed fetch + parse ----
        in_tbl = pa.table({
            "seq": admitted["seq"].values,
            "url": admitted["url"].astype(str).values,
            "depth": admitted["depth"].values.astype("int32"),
            "parent_url": admitted["parent_url"].astype(str).values,
        })
        n_blocks = max(1, min(self.fetch_concurrency * 2,
                              len(admitted) // self.fetch_batch_size + 1))
        parsed = (
            ray.data.from_arrow(in_tbl)
            .repartition(n_blocks)
            .map_batches(
                fetch_parse_batch,
                fn_kwargs={"web_cfg": _cfg_dict(self.web_cfg)},
                batch_format="pyarrow",
                batch_size=self.fetch_batch_size,
                num_cpus=0.5,
            )
            .materialize()
        )

        # ---- 3. sequential gates over compact records ----
        rec_df = (
            parsed.select_columns(RECORD_COLUMNS).to_pandas()
            .sort_values("seq", kind="mergesort")
        )
        is_blacklisted = self.blacklist.matcher()
        new_patterns: list[NewPattern] = []
        expand_urls: set[str] = set()
        passed_urls: set[str] = set()
        tokenized_urls: set[str] = set()
        host_count_inc: dict[str, int] = {}
        for row in rec_df.itertuples(index=False):
            rec = crawl_logic.PageRecord(
                url=row.url, final_url=row.final_url, status=int(row.status),
                host=row.host, depth=int(row.depth), parent_url=row.parent_url,
                empty=bool(row.empty), tag_count=int(row.tag_count),
                is_sitemap=bool(row.is_sitemap), n_tokens=int(row.n_tokens),
                simhash=int(row.simhash), title=row.title,
            )
            d = crawl_logic.apply_gates(
                rec, self.gate, is_blacklisted, self._is_valid, settings)
            new_patterns.extend(d.new_patterns)
            if d.tokenized:
                tokenized_urls.add(rec.url)
                _update_longest(self.longest, rec.n_tokens, rec.url)
            if d.passed:
                passed_urls.add(rec.url)
            if d.expand_links:
                expand_urls.add(rec.url)
            if d.count_host is not None:
                host_count_inc[d.count_host] = host_count_inc.get(d.count_host, 0) + 1

        # ---- metrics: distributed token counting (A3) ----
        if tokenized_urls:
            tok_urls = tokenized_urls
            counts = (
                parsed
                .map_batches(
                    _TokenFilterExplode(tok_urls), batch_format="pyarrow",
                )
                .groupby("token")
                .sum("n")
                .to_pandas()
            )
            for t, n in zip(counts["token"], counts["sum(n)"]):
                self.token_counts[t] = self.token_counts.get(t, 0) + int(n)
            self._round_token_delta = counts
        else:
            self._round_token_delta = pd.DataFrame({"token": [], "sum(n)": []})

        # ---- documents output (gate-passed pages) ----
        if self.ckpt_dir and passed_urls:
            doc_dir = os.path.join(self.ckpt_dir, "documents", f"round={round_k:05d}")
            seq_of = {u: s for u, s in zip(rec_df.url, rec_df.seq)}
            base = self.fetch_seq - len(admitted)
            pu = passed_urls
            (
                parsed
                .map_batches(
                    lambda t, _pu=pu, _so=seq_of, _b=base: _documents_batch(t, _pu, _so, _b),
                    batch_format="pyarrow",
                )
                .write_parquet(doc_dir)
            )

        # ---- 4. distributed outlink checks ----
        cand_rows = pd.DataFrame()
        if expand_urls:
            eu = expand_urls
            cand_tbl = (
                parsed
                .map_batches(
                    lambda t, _eu=eu: t.filter(
                        pc.is_in(t["url"], value_set=pa.array(list(_eu)))),
                    batch_format="pyarrow",
                )
                .select_columns(["seq", "url", "depth", "links"])
                .map_batches(
                    link_check_batch,
                    fn_kwargs={
                        "blacklist_patterns": self.blacklist.patterns(),
                        "settings": settings,
                    },
                    batch_format="pyarrow",
                    num_cpus=0.5,
                )
                .to_pandas()
            )
            cand_tbl = cand_tbl.sort_values(["seq", "link_idx"], kind="mergesort")
            for row in cand_tbl[cand_tbl.row_kind == "trap"].itertuples(index=False):
                new_patterns.append(
                    NewPattern(row.pattern, row.reason, bool(row.temporary), cancel=True))
            cand_rows = cand_tbl[cand_tbl.row_kind == "cand"]

        # ---- 5. robots gate through host shards (canonical order) ----
        # gate-phase counts must land before link-phase robots creation
        count_refs = []
        shard_counts: list[dict[str, int]] = [dict() for _ in range(self.n_host_shards)]
        for host, n in host_count_inc.items():
            shard_counts[host_shard_of(host, self.n_host_shards)][host] = n
        for shard, counts in zip(self.host_shards, shard_counts):
            if counts:
                count_refs.append(shard.count_urls.remote(counts))
        ray.get(count_refs)

        additions: list[tuple[str, int, str]] = []
        if len(cand_rows):
            cand_rows = cand_rows.sort_values(
                ["sorted_url", "orig_link", "parent_url"], kind="mergesort")
            links_by_shard: list[dict[str, list[tuple[str, str]]]] = [
                dict() for _ in range(self.n_host_shards)
            ]
            depth_of_host: dict[str, int] = {}
            parent_depth: dict[str, list] = {}
            for row in cand_rows.itertuples(index=False):
                links_by_shard[host_shard_of(row.host, self.n_host_shards)].setdefault(
                    row.host, []).append((row.sorted_url, row.orig_link))
                if row.host not in depth_of_host:
                    depth_of_host[row.host] = int(row.depth)
                parent_depth.setdefault(row.host, []).append(
                    (row.sorted_url, int(row.depth), row.parent_url))
            bl_patterns = self.blacklist.patterns()
            refs = [
                shard.filter_links.remote(lbs, bl_patterns)
                for shard, lbs in zip(self.host_shards, links_by_shard)
                if lbs
            ]
            results: dict[str, dict] = {}
            for out in ray.get(refs):
                results.update(out)
            for host in sorted(results):
                r = results[host]
                for u in r["unchecked"] + r["checked"]:
                    additions.append((u, depth_of_host[host], ""))
                for (sorted_url, depth, parent), ok in zip(parent_depth[host], r["mask"]):
                    if ok:
                        additions.append((sorted_url, depth, parent))

        # ---- 6. frontier additions, first-seen-wins ----
        additions.sort(key=lambda a: (a[0], a[2]))
        self._add_rows(additions, round_k + 1)

        # ---- 7. round boundary: blacklist growth + cancel ----
        self._round_lineage = dict(
            round=round_k, rows_in=len(cands), urls_fetched=len(admitted),
            rows_out=len(additions),
            bytes=int(rec_df["content_len"].sum()),
        )
        for p in new_patterns:
            self.blacklist.add(p.pattern, p.reason, p.temporary)
            if p.cancel:
                cregex = re.compile(p.pattern)
                pending_now = self.frontier.status == "pending"
                hits = pending_now & self.frontier.url.map(
                    lambda u: bool(cregex.match(u)))
                if hits.any():
                    cancelled_hashes = [
                        key64(h) for h in self.frontier.loc[hits, "url_hash"]
                    ]
                    self.seen.delete(np.array(cancelled_hashes, dtype=np.uint64))
                    self.frontier.loc[hits, "status"] = "cancelled"

    # ------------------------------------------------------------------
    def _checkpoint(self, round_k: int) -> None:
        rd = os.path.join(self.ckpt_dir, f"round={round_k:05d}")
        os.makedirs(rd, exist_ok=True)
        fr = self.frontier.copy()
        fr["url_hash"] = fr["url_hash"].map(bytes)
        pq.write_table(pa.Table.from_pandas(fr, preserve_index=False),
                       os.path.join(rd, "frontier.parquet"))
        gate_blob = {
            "previouspage": self.gate.previouspage,
            "unique_url_count": self.gate.unique_url_count,
            "query_dict": {
                k: [[v[0][0], v[0][1]], v[1]] for k, v in self.gate.query_dict.items()
            },
            "fetch_seq": self.fetch_seq,
            "longest": self.longest,
        }
        with open(os.path.join(rd, "gate.json"), "w") as f:
            json.dump(gate_blob, f)
        fp = self.gate.page_footprints
        pq.write_table(
            pa.table({
                "url": list(fp.keys()),
                "simhash": pa.array([v[0] for v in fp.values()], type=pa.uint64()),
                "n_tokens": [v[1] for v in fp.values()],
            }),
            os.path.join(rd, "footprints.parquet"),
        )
        with open(os.path.join(rd, "blacklist.json"), "w") as f:
            json.dump({"permanent": self.blacklist.permanent,
                       "temp": sorted(self.blacklist.temp)}, f)
        host_snaps = ray.get([s.snapshot.remote() for s in self.host_shards])
        with open(os.path.join(rd, "host_shards.json"), "w") as f:
            json.dump(host_snaps, f)
        with open(os.path.join(rd, "seen_shards.pkl"), "wb") as f:
            pickle.dump(self.seen.serialize(), f)
        delta = self._round_token_delta
        pq.write_table(
            pa.table({"token": delta["token"].astype(str).tolist() if len(delta) else [],
                      "n": [int(x) for x in delta["sum(n)"]] if len(delta) else []}),
            os.path.join(rd, "token_delta.parquet"),
        )
        lin = getattr(self, "_round_lineage", None)
        if lin:
            pq.write_table(pa.table({k: [v] for k, v in lin.items()}),
                           os.path.join(rd, "lineage.parquet"))
        with open(os.path.join(rd, "_SUCCESS"), "w") as f:
            f.write("ok")

    @classmethod
    def resume(cls, ckpt_dir: str, web_cfg: sw.WebConfig,
               settings: CrawlSettings | None = None, **kwargs) -> "CrawlEngine":
        rounds = sorted(
            d for d in os.listdir(ckpt_dir)
            if d.startswith("round=")
            and os.path.exists(os.path.join(ckpt_dir, d, "_SUCCESS"))
        )
        if not rounds:
            return cls(web_cfg, settings, ckpt_dir=ckpt_dir, **kwargs)
        last = rounds[-1]
        rd = os.path.join(ckpt_dir, last)
        round_k = int(last.split("=")[1])

        self = cls.__new__(cls)
        self.web_cfg = web_cfg
        self.settings = settings or CrawlSettings()
        self.ckpt_dir = ckpt_dir
        self.n_seen_shards = kwargs.get("n_seen_shards", 4)
        self.n_host_shards = kwargs.get("n_host_shards", 2)
        self.fetch_concurrency = kwargs.get("fetch_concurrency", 4)
        self.fetch_batch_size = kwargs.get("fetch_batch_size", 16)
        self.seen_buckets = kwargs.get("seen_buckets", 1 << 14)
        self._pattern = self.settings.netloc_pattern()
        self.start_round = round_k + 1

        fr = pq.read_table(os.path.join(rd, "frontier.parquet")).to_pandas()
        fr["url_hash"] = fr["url_hash"].map(bytes)
        self.frontier = fr

        with open(os.path.join(rd, "gate.json")) as f:
            g = json.load(f)
        self.gate = GateState(
            previouspage=g["previouspage"],
            unique_url_count=g["unique_url_count"],
            query_dict={k: [(int(v[0][0]), int(v[0][1])), int(v[1])]
                        for k, v in g["query_dict"].items()},
        )
        fpt = pq.read_table(os.path.join(rd, "footprints.parquet"))
        self.gate.page_footprints = {
            u: (int(s), int(n))
            for u, s, n in zip(fpt["url"].to_pylist(), fpt["simhash"].to_pylist(),
                               fpt["n_tokens"].to_pylist())
        }
        self.fetch_seq = g["fetch_seq"]
        self.longest = [tuple(x) for x in g["longest"]]

        with open(os.path.join(rd, "blacklist.json")) as f:
            b = json.load(f)
        self.blacklist = BlacklistState(
            permanent=dict(b["permanent"]), temp=set(b["temp"]))

        self.token_counts = {}
        for r in rounds:
            td = pq.read_table(os.path.join(ckpt_dir, r, "token_delta.parquet"))
            for t, n in zip(td["token"].to_pylist(), td["n"].to_pylist()):
                self.token_counts[t] = self.token_counts.get(t, 0) + int(n)

        with open(os.path.join(rd, "seen_shards.pkl"), "rb") as f:
            blobs = pickle.load(f)
        self.seen = ShardedSeen(n_shards=len(blobs), blobs=blobs)

        with open(os.path.join(rd, "host_shards.json")) as f:
            host_snaps = json.load(f)
        self.host_shards = [
            HostShard.remote(
                self.settings, "spidey_ray.sources.synthetic_web",
                "make_fetch_fn", _cfg_dict(web_cfg), snapshot=snap,
            )
            for snap in host_snaps
        ]
        return self

    # ------------------------------------------------------------------
    def _result(self, rounds_done: int) -> EngineResult:
        host_snaps: dict[str, dict] = {}
        for snap in ray.get([s.snapshot.remote() for s in self.host_shards]):
            host_snaps.update(snap)
        fetched = self.frontier[self.frontier.fetch_seq >= 0].sort_values("fetch_seq")
        return EngineResult(
            fetch_log=list(fetched["url"]),
            frontier=self.frontier,
            gate=self.gate,
            blacklist=self.blacklist,
            host_snapshots=host_snaps,
            token_counts=self.token_counts,
            longest=self.longest,
            rounds=rounds_done,
            documents_path=(
                os.path.join(self.ckpt_dir, "documents") if self.ckpt_dir else None
            ),
        )


class _TokenFilterExplode:
    """Parsed rows → (token, n) partial counts for tokenized pages.
    Per-batch pre-aggregation before the global groupby (SURVEY.md §2.5 A3)."""

    def __init__(self, tokenized_urls: set[str]):
        self.urls = tokenized_urls

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for url, tokens in zip(batch["url"].to_pylist(), batch["tokens"].to_pylist()):
            if url in self.urls:
                for t in tokens:
                    counts[t] = counts.get(t, 0) + 1
        return pa.table({
            "token": list(counts.keys()),
            "n": pa.array(list(counts.values()), type=pa.int64()),
        })


def _documents_batch(t: pa.Table, passed: set[str], seq_of: dict, base_seq: int) -> pa.Table:
    mask = pc.is_in(t["url"], value_set=pa.array(list(passed)))
    t = t.filter(mask)
    crawl_seq = pa.array(
        [base_seq + seq_of[u] for u in t["url"].to_pylist()], type=pa.int64())
    return pa.table({
        "doc_id": t["url"],
        "spans": t["spans"],
        "title": t["title"],
        "crawl_seq": crawl_seq,
    })


def _update_longest(longest: list[tuple[int, str]], n: int, url: str) -> None:
    longest.append((n, url))
    longest.sort(key=lambda x: (-x[0], x[1]))
    del longest[10:]


def _cfg_dict(cfg: sw.WebConfig) -> dict:
    from dataclasses import asdict

    return asdict(cfg)
