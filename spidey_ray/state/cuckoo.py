"""Sharded cuckoo-filter URL-seen state (north_rule T1/D1).

Generalizes the reference's exact shelve membership gate
(backend/crawler/crawler/frontier.py:60-66 ``urlhash not in self.save``) into
an approximate-membership structure that scales to a 10^10-URL frontier:

- each shard is a GROWABLE chain of cuckoo-filter segments
  (``ScalableCuckoo``: B buckets × 4 slots × 16-bit fingerprints per
  segment, partial-key cuckoo hashing per Fan et al., "Cuckoo Filter:
  Practically Better Than Bloom", CoNEXT'14; geometric segment doubling per
  Almeida et al.'s scalable-Bloom construction): ~2.1 bytes/key at 95%
  load with NO fixed capacity, supports delete — needed because the
  reference's ``cancel_urls`` removes blacklisted pending URLs from the
  seen set so they can be re-added later (frontier.py:80-92),
- shards are Ray actors; keys are routed by ``key % n_shards`` so shard
  count (not per-shard memory) scales with frontier size,
- batched ``seen_or_add`` keeps the actor round-trips per crawl round at
  O(n_shards), not O(n_urls),
- ``serialize``/``restore`` round-trips the raw table for the per-round Lance
  checkpoint (north_rule resumability).

First-seen-wins semantics match frontier.py:60-66; false-positive rate at
16-bit fingerprints is ~0.003%, and at test scale (10^2..10^4 URLs in a
2^14-slot filter) collisions are absent, so oracle-equality tests are exact.
"""

from __future__ import annotations

import numpy as np
import ray

_EMPTY = np.uint16(0)
_MAX_KICKS = 500


class CuckooFilter:
    """Single-shard cuckoo filter over unsigned 64-bit keys."""

    def __init__(self, n_buckets: int = 1 << 14, slots: int = 4):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
        self.n_buckets = n_buckets
        self.slots = slots
        self.table = np.zeros((n_buckets, slots), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.default_rng(0xC0FFEE)  # deterministic evictions

    # -- hashing ----------------------------------------------------------
    @staticmethod
    def _mix(key: np.ndarray) -> np.ndarray:
        """splitmix64 finalizer: decorrelates fingerprint/index bits even for
        small or sequential keys (url-hash keys are already uniform, but the
        filter should not depend on that)."""
        with np.errstate(over="ignore"):
            k = key.astype(np.uint64, copy=True)
            k ^= k >> np.uint64(30)
            k *= np.uint64(0xBF58476D1CE4E5B9)
            k ^= k >> np.uint64(27)
            k *= np.uint64(0x94D049BB133111EB)
            k ^= k >> np.uint64(31)
        return k

    def _fingerprint(self, key: np.ndarray) -> np.ndarray:
        fp = (self._mix(key) >> np.uint64(48)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)  # 0 is the empty sentinel

    def _index1(self, key: np.ndarray) -> np.ndarray:
        return (self._mix(key) & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def _index2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key cuckoo: i2 = i1 xor H(fp)
        h = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(
            self.n_buckets - 1
        )
        return (i1.astype(np.uint64) ^ h).astype(np.int64)

    # -- scalar ops -------------------------------------------------------
    def _contains_one(self, i1: int, i2: int, fp: int) -> bool:
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def _insert_one(self, i1: int, i2: int, fp: int) -> bool:
        for idx in (i1, i2):
            row = self.table[idx]
            free = np.nonzero(row == _EMPTY)[0]
            if free.size:
                row[free[0]] = fp
                self.count += 1
                return True
        # kick chain; recorded so exhaustion can UNWIND it — a bare raise
        # would leave the final evicted fingerprint homeless (a silent
        # false negative for whichever key owned it), which matters now
        # that ScalableCuckoo catches the error and retries in a fresh
        # segment instead of crashing
        idx = i1
        cur = np.uint16(fp)
        chain: list[tuple[int, int, np.uint16]] = []
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(self.slots))
            cur, self.table[idx][slot] = self.table[idx][slot], cur
            chain.append((idx, slot, cur))
            idx = int(
                self._index2(np.array([idx], dtype=np.int64), np.array([cur]))[0]
            )
            row = self.table[idx]
            free = np.nonzero(row == _EMPTY)[0]
            if free.size:
                row[free[0]] = cur
                self.count += 1
                return True
        for c_idx, c_slot, evicted in reversed(chain):
            self.table[c_idx][c_slot] = evicted
        raise RuntimeError(
            f"cuckoo filter over capacity ({self.count}/{self.n_buckets * self.slots})"
        )

    # -- batched API ------------------------------------------------------
    def _contains_vec(self, i1: np.ndarray, i2: np.ndarray,
                      fp: np.ndarray) -> np.ndarray:
        """Vectorized membership: two gathers + a compare, no per-key loop.
        This is the crawl's hottest state op (every extracted outlink lands
        here, and in steady state most are duplicates), so it must run at
        memory speed, not Python-interpreter speed."""
        f = fp[:, None]
        return ((self.table[i1] == f).any(axis=1)
                | (self.table[i2] == f).any(axis=1))

    def insert_absent(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized insert of distinct keys known to be absent. Returns a
        success mask; False entries were kick-exhausted and their state is
        unwound (caller decides: flat filter raises, scalable grows).

        The scatter path: per round, pick one candidate bucket per key
        (alternating i1/i2), defer same-bucket colliders to the next round
        (np.unique first-occurrence), and write each key into its bucket's
        first free slot in one fancy-indexed assignment. Keys whose both
        buckets are full fall back to the scalar kick chain — rare below
        ~95% load."""
        keys = np.asarray(keys).astype(np.uint64, copy=False)
        fp = self._fingerprint(keys)
        i1 = self._index1(keys)
        i2 = self._index2(i1, fp)
        n = len(keys)
        ok = np.zeros(n, dtype=bool)
        pending = np.arange(n)
        stall = 0
        use_i2 = False
        while pending.size and stall < 2:
            b = (i2 if use_i2 else i1)[pending]
            _, first = np.unique(b, return_index=True)
            sel = pending[first]
            bsel = b[first]
            free = self.table[bsel] == _EMPTY
            has = free.any(axis=1)
            if has.any():
                self.table[bsel[has], free.argmax(axis=1)[has]] = fp[sel[has]]
                self.count += int(has.sum())
                ok[sel[has]] = True
                pending = pending[~ok[pending]]
                stall = 0
            else:
                stall += 1
            use_i2 = not use_i2
        for k in pending:  # both buckets full: kick chain
            try:
                self._insert_one(int(i1[k]), int(i2[k]), int(fp[k]))
                ok[k] = True
            except RuntimeError:
                pass
        return ok

    def seen_or_add(self, keys: np.ndarray) -> np.ndarray:
        """For each uint64 key: True if already present, else add and False.
        First-seen-wins holds inside one batch: duplicate keys after the
        first occurrence report True (np.unique keeps the first index)."""
        keys = keys.astype(np.uint64, copy=False)
        fp = self._fingerprint(keys)
        i1 = self._index1(keys)
        i2 = self._index2(i1, fp)
        out = self._contains_vec(i1, i2, fp)
        miss = np.nonzero(~out)[0]
        if not miss.size:
            return out
        # within-batch dedup: only the first occurrence of a key inserts
        _, first = np.unique(keys[miss], return_index=True)
        dup = np.ones(len(miss), dtype=bool)
        dup[first] = False
        out[miss[dup]] = True
        if not self.insert_absent(keys[miss[~dup]]).all():
            raise RuntimeError(
                f"cuckoo filter over capacity "
                f"({self.count}/{self.n_buckets * self.slots})")
        return out

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = keys.astype(np.uint64, copy=False)
        fp = self._fingerprint(keys)
        i1 = self._index1(keys)
        return self._contains_vec(i1, self._index2(i1, fp), fp)

    def delete(self, keys: np.ndarray) -> int:
        """Remove keys (cancel semantics, frontier.py:85-88). Returns #removed.
        Vectorized probe narrows to the (rare) present keys; only those take
        the scalar slot-clearing path."""
        keys = keys.astype(np.uint64, copy=False)
        fp = self._fingerprint(keys)
        i1 = self._index1(keys)
        i2 = self._index2(i1, fp)
        removed = 0
        for k in np.nonzero(self._contains_vec(i1, i2, fp))[0]:
            for idx in (int(i1[k]), int(i2[k])):
                row = self.table[idx]
                hit = np.nonzero(row == fp[k])[0]
                if hit.size:
                    row[hit[0]] = _EMPTY
                    self.count -= 1
                    removed += 1
                    break
        return removed

    # -- checkpoint -------------------------------------------------------
    def serialize(self) -> dict:
        return {
            "n_buckets": self.n_buckets,
            "slots": self.slots,
            "count": self.count,
            "table": self.table.tobytes(),
        }

    @classmethod
    def restore(cls, blob: dict) -> "CuckooFilter":
        self = cls(blob["n_buckets"], blob["slots"])
        self.table = np.frombuffer(blob["table"], dtype=np.uint16).reshape(
            blob["n_buckets"], blob["slots"]
        ).copy()
        self.count = blob["count"]
        return self


class ScalableCuckoo:
    """Growable seen-set: an ordered chain of cuckoo segments.

    A single cuckoo filter hard-fails near ~95% load (``_insert_one``
    raises) — a fixed capacity is a non-starter for a 10^10-URL frontier
    whose final size nobody knows up front.  This applies the scalable-Bloom
    construction (Almeida et al., "Scalable Bloom Filters", IPL 2007) to
    cuckoo segments: when the active (last) segment reaches ``GROW_AT`` of
    its capacity, it is frozen and a fresh segment with DOUBLE the buckets
    becomes the insert target.  Geometric growth keeps total segments
    O(log n) and amortized memory at the same ~2.1 bytes/key.

    Guarantees preserved from the single filter:
    - no false negatives: membership is the OR over segments,
    - first-seen-wins: a key is inserted only if no segment contains it,
    - delete: removes one matching fingerprint from whichever segment holds
      it (same partial-key caveat as the flat filter),
    - deterministic replay: growth points and eviction RNG depend only on
      the insert sequence, so delta-checkpoint replay reproduces an
      equivalent (membership-identical) structure.

    False-positive rate grows additively per segment (~0.003% each at
    16-bit fingerprints); with O(log n) segments it stays ~0.01%.
    """

    GROW_AT = 0.94

    def __init__(self, n_buckets: int = 1 << 14, slots: int = 4):
        self.segments = [CuckooFilter(n_buckets, slots)]

    # -- facade properties (delta-blob compat + telemetry) -----------------
    @property
    def n_buckets(self) -> int:
        return self.segments[0].n_buckets

    @property
    def slots(self) -> int:
        return self.segments[0].slots

    @property
    def count(self) -> int:
        return sum(s.count for s in self.segments)

    @property
    def capacity(self) -> int:
        return sum(s.n_buckets * s.slots for s in self.segments)

    def _grow(self) -> None:
        last = self.segments[-1]
        self.segments.append(CuckooFilter(last.n_buckets * 2, last.slots))

    def seen_or_add(self, keys: np.ndarray) -> np.ndarray:
        """For each uint64 key: True if any segment has it, else add to the
        active segment (growing first if it is at GROW_AT) and False.

        Membership is one vectorized probe per segment (the dominant cost in
        crawl steady state, where most outlinks are duplicates); only the
        unique first occurrences of genuinely-new keys take the scalar
        insert path."""
        keys = np.asarray(keys).astype(np.uint64, copy=False)
        out = self.contains(keys)
        miss = np.nonzero(~out)[0]
        if not miss.size:
            return out
        # within-batch dedup: only the first occurrence of a key inserts
        _, first = np.unique(keys[miss], return_index=True)
        dup = np.ones(len(miss), dtype=bool)
        dup[first] = False
        out[miss[dup]] = True
        self._insert_batch(keys[miss[~dup]])
        return out

    def _insert_batch(self, ikeys: np.ndarray) -> None:
        """Insert distinct keys known to be absent, growing segments as
        needed. Each chunk is bounded by the active segment's GROW_AT
        headroom, inserted via the vectorized scatter, and kick-exhausted
        leftovers (unwound, never lost) roll over into the next, larger
        segment."""
        while len(ikeys):
            active = self.segments[-1]
            room = int(self.GROW_AT * active.n_buckets * active.slots
                       ) - active.count
            if room <= 0:
                self._grow()
                continue
            take, rest = ikeys[:room], ikeys[room:]
            ok = active.insert_absent(take)
            ikeys = np.concatenate([take[~ok], rest]) if not ok.all() else rest
            if len(ikeys):
                self._grow()

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys).astype(np.uint64, copy=False)
        out = np.zeros(len(keys), dtype=bool)
        for seg in self.segments:
            miss = np.nonzero(~out)[0]
            if not miss.size:
                break
            out[miss] = seg.contains(keys[miss])
        return out

    def delete(self, keys: np.ndarray) -> int:
        """Remove one matching fingerprint per key, searching segments in
        insertion order (cancel semantics, frontier.py:85-88). Vectorized:
        each segment handles the still-pending keys it contains in one
        batched call."""
        keys = np.asarray(keys).astype(np.uint64, copy=False)
        pending = np.ones(len(keys), dtype=bool)
        removed = 0
        for seg in self.segments:
            idx = np.nonzero(pending)[0]
            if not idx.size:
                break
            present = seg.contains(keys[idx])
            if present.any():
                removed += seg.delete(keys[idx[present]])
                pending[idx[present]] = False
        return removed

    # -- checkpoint -------------------------------------------------------
    def serialize(self) -> dict:
        return {"segments": [s.serialize() for s in self.segments]}

    @classmethod
    def restore(cls, blob: dict) -> "ScalableCuckoo":
        self = cls.__new__(cls)
        if "segments" in blob:
            self.segments = [CuckooFilter.restore(b) for b in blob["segments"]]
        else:  # pre-growth full blob: a single flat table
            self.segments = [CuckooFilter.restore(blob)]
        return self


def key64(url_hash20: bytes) -> int:
    """uint64 routing/filter key from the 20-byte SHA-1 url hash."""
    return int.from_bytes(url_hash20[:8], "big")


@ray.remote(num_cpus=0.01)
class CuckooShard:
    """One URL-seen shard. Keys arriving here are already routed by
    ``key % n_shards`` so the filter sees a uniform slice of the keyspace.

    Checkpoints are DELTAS: the keys added / deleted since the last
    checkpoint (a few KB per round), with a periodic full table blob so the
    restore chain stays short (round-2 verdict: the full-table rewrite per
    round was O(seen-set) write amplification × rounds).  Replaying a delta
    re-inserts the same fingerprints, so membership answers after restore
    are identical even though eviction placement may differ."""

    def __init__(self, n_buckets: int = 1 << 14, blob: dict | None = None,
                 chain_paths: list[str] | None = None):
        import pickle

        self.filter = None
        if chain_paths:
            for p in chain_paths:
                with open(p, "rb") as f:
                    b = pickle.load(f)
                if "table" in b or "segments" in b:  # full blob
                    self.filter = ScalableCuckoo.restore(b)
                else:                       # delta: replay the ordered op log
                    if self.filter is None:
                        self.filter = ScalableCuckoo(b["n_buckets"], b["slots"])
                    if "ops" in b:
                        for kind, raw in b["ops"]:
                            arr = np.frombuffer(raw, dtype=np.uint64)
                            if not arr.size:
                                continue
                            if kind == "a":
                                self.filter.seen_or_add(arr)
                            else:
                                self.filter.delete(arr)
                    else:
                        # legacy two-array blob (pre-op-log): adds then
                        # deletes — only correct because those engines
                        # ordered ops add-before-delete within each round
                        added = np.frombuffer(b["added"], dtype=np.uint64)
                        if added.size:
                            self.filter.seen_or_add(added)
                        deleted = np.frombuffer(b["deleted"], dtype=np.uint64)
                        if deleted.size:
                            self.filter.delete(deleted)
        elif blob is not None:
            self.filter = ScalableCuckoo.restore(blob)
        if self.filter is None:
            self.filter = ScalableCuckoo(n_buckets)
        # ordered delta op log: (is_add, [chunks...]) runs, so an
        # add→delete→re-add sequence within one delta window replays in
        # sequence (a flat adds-then-deletes pair would restore the re-added
        # key as absent)
        self._delta_ops: list[tuple[bool, list[np.ndarray]]] = []

    def _log_op(self, is_add: bool, arr: np.ndarray) -> None:
        if self._delta_ops and self._delta_ops[-1][0] == is_add:
            self._delta_ops[-1][1].append(arr)
        else:
            self._delta_ops.append((is_add, [arr]))

    def seen_or_add(self, keys: np.ndarray) -> np.ndarray:
        out = self.filter.seen_or_add(keys)
        new = keys[~out]
        if new.size:
            self._log_op(True, new.astype(np.uint64, copy=True))
        return out

    def contains(self, keys: np.ndarray) -> np.ndarray:
        return self.filter.contains(keys)

    def delete(self, keys: np.ndarray) -> int:
        n = self.filter.delete(keys)
        if len(keys):
            self._log_op(False, np.asarray(keys, dtype=np.uint64).copy())
        return n

    def serialize(self) -> dict:
        return self.filter.serialize()

    def checkpoint(self, path: str, full: bool = False) -> int:
        """Write this shard's own blob — the driver records the path only,
        never the table."""
        import os
        import pickle

        if full:
            blob = self.filter.serialize()
        else:
            blob = {
                "n_buckets": self.filter.n_buckets,
                "slots": self.filter.slots,
                "ops": [("a" if is_add else "d",
                         np.concatenate(chunks).tobytes())
                        for is_add, chunks in self._delta_ops],
            }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(blob, f)
        os.replace(tmp, path)
        self._delta_ops = []
        return self.filter.count

    def count(self) -> int:
        return self.filter.count


class ShardedSeen:
    """Driver-side facade over the shard actor pool. All calls are batched:
    one RPC per shard per round-step regardless of URL count."""

    def __init__(self, n_shards: int = 4, n_buckets: int = 1 << 14,
                 blobs: list[dict] | None = None,
                 chain_paths: list[list[str]] | None = None):
        self.n_shards = n_shards
        if chain_paths is not None:
            assert len(chain_paths) == n_shards
            self.shards = [CuckooShard.remote(chain_paths=c)
                           for c in chain_paths]
        elif blobs is not None:
            assert len(blobs) == n_shards
            self.shards = [CuckooShard.remote(blob=b) for b in blobs]
        else:
            self.shards = [CuckooShard.remote(n_buckets=n_buckets) for _ in range(n_shards)]

    def _route(self, keys: np.ndarray) -> np.ndarray:
        return (keys % np.uint64(self.n_shards)).astype(np.int64)

    def _scatter_gather(self, method: str, keys: np.ndarray):
        keys = keys.astype(np.uint64, copy=False)
        shard_of = self._route(keys)
        refs, order = [], []
        for s in range(self.n_shards):
            idx = np.nonzero(shard_of == s)[0]
            if idx.size:
                refs.append(getattr(self.shards[s], method).remote(keys[idx]))
                order.append(idx)
        outs = ray.get(refs)
        if method == "delete":
            return sum(outs)
        result = np.zeros(len(keys), dtype=bool)
        for idx, out in zip(order, outs):
            result[idx] = out
        return result

    def seen_or_add(self, keys: np.ndarray) -> np.ndarray:
        return self._scatter_gather("seen_or_add", keys)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        return self._scatter_gather("contains", keys)

    def delete(self, keys: np.ndarray) -> int:
        return self._scatter_gather("delete", keys)

    def serialize(self) -> list[dict]:
        return ray.get([s.serialize.remote() for s in self.shards])

    def checkpoint_refs(self, round_dir: str, full: bool = False) -> list:
        import os

        kind = "full" if full else "delta"
        paths = [os.path.join(round_dir, f"seen_{kind}_shard{i}.pkl")
                 for i in range(self.n_shards)]
        return [s.checkpoint.remote(p, full)
                for s, p in zip(self.shards, paths)]

    def checkpoint(self, round_dir: str, full: bool = False) -> list[str]:
        """Each shard writes its own delta (or periodic full) blob under
        ``round_dir``; only paths return to the driver."""
        import os

        kind = "full" if full else "delta"
        paths = [os.path.join(round_dir, f"seen_{kind}_shard{i}.pkl")
                 for i in range(self.n_shards)]
        ray.get(self.checkpoint_refs(round_dir, full=full))
        return paths

    @classmethod
    def restore_from_dirs(cls, round_dirs: list[str]) -> "ShardedSeen":
        """Rebuild from an ORDERED chain of successful round dirs: newest
        full blob + every delta after it, per shard."""
        import os

        n_shards = 0
        for rd in reversed(round_dirs):
            n_shards = len([f for f in os.listdir(rd)
                            if f.startswith("seen_") and f.endswith(".pkl")])
            if n_shards:
                break
        if not n_shards:
            return cls()
        chains: list[list[str]] = [[] for _ in range(n_shards)]
        for rd in round_dirs:
            for i in range(n_shards):
                fp = os.path.join(rd, f"seen_full_shard{i}.pkl")
                dp = os.path.join(rd, f"seen_delta_shard{i}.pkl")
                if os.path.exists(fp):
                    chains[i] = [fp]
                elif os.path.exists(dp):
                    chains[i].append(dp)
        return cls(n_shards=n_shards, chain_paths=chains)

    def count(self) -> int:
        return sum(ray.get([s.count.remote() for s in self.shards]))
