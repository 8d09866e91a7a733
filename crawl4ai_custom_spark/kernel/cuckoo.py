"""Partitioned cuckoo filter for the URL-seen set — the deletion-capable
sibling of ``kernel.bloom`` (the north rule names "bloom/cuckoo" as the
seen-membership structure; the reference ships only the experimental bloom,
/root/reference/crawl4ai/deep_crawling/crazy.py:102-165).

Semantics follow the public cuckoo-filter design (Fan et al. 2014,
"Cuckoo Filter: Practically Better Than Bloom"): partial-key cuckoo
hashing with 4-slot buckets, fingerprint-xor alternate bucket, bounded
eviction. Differences, chosen for the crawl engine:

- **No false negatives, ever**: inserts that exhaust the eviction budget
  land in a bounded stash that ``contains_many`` also checks, so a full
  filter degrades to slightly slower membership, never to a miss — the
  pre-filter invariant (bloom/cuckoo miss => definitively unseen) is what
  the exact anti-join relies on to skip work.
- **Deterministic**: fingerprints, bucket choice, and the eviction walk
  derive only from the key and attempt counter (splitmix64 mixing, no
  RNG) — the same inserts in the same order always produce the same blob,
  which keeps checkpoint snapshots byte-reproducible.
- **Multiset adds** (Fan et al. §3.2): every insert stores a fingerprint
  copy, so two distinct keys that collide on (fingerprint, buckets) hold
  two copies and deleting one key NEVER makes the other a false negative.
  The engine only adds post-anti-join NEW urls, so duplicate copies of the
  same key stay rare by construction.
- **Deletion** (the capability bloom lacks): ``delete_many`` removes one
  fingerprint occurrence, enabling seen-set retirement for re-crawl
  scheduling (pair with removing the row from the EXACT seen table — the
  filter is only ever a pre-filter; deleting a key never inserted, or
  deleting the same key twice, can evict a colliding key's copy — callers
  delete only keys they added, once).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .bloom import _mix

_SLOTS = 4
_MAX_KICKS = 500
_ALT_MULT = np.uint64(0x5BD1E995)


def _mix64(h: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wraps mod 2^64)."""
    h = h.astype(np.uint64)
    h = (h + np.uint64(0x9E3779B97F4A7C15))
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


class CuckooFilter:
    """4-slot-bucket cuckoo filter over pre-hashed 64-bit keys.

    Fingerprints are uint16 (0 = empty sentinel; a computed 0 remaps to 1).
    ``fp_rate`` sizes the fingerprint width: eps ~ 2*SLOTS / 2^f.
    """

    def __init__(self, capacity: int = 1_000_000, fp_rate: float = 0.01,
                 blob: bytes | None = None):
        self.capacity, self.fp_rate = capacity, fp_rate
        if blob is not None:
            n, fbits, n_stash = struct.unpack_from("<QHH", blob, 0)
            off = struct.calcsize("<QHH")
            self.n_buckets, self.fbits = int(n), int(fbits)
            tbl = np.frombuffer(blob, dtype=np.uint16, count=self.n_buckets * _SLOTS,
                                offset=off).copy()
            self.table = tbl.reshape(self.n_buckets, _SLOTS)
            off += self.n_buckets * _SLOTS * 2
            self.stash: list[tuple[int, int]] = []
            for _ in range(n_stash):
                i, fp = struct.unpack_from("<QH", blob, off)
                off += struct.calcsize("<QH")
                self.stash.append((int(i), int(fp)))
            return
        self.fbits = min(16, max(4, math.ceil(math.log2(2 * _SLOTS / fp_rate))))
        n = 1
        while n * _SLOTS * 0.95 < capacity:
            n <<= 1
        self.n_buckets = n
        self.table = np.zeros((n, _SLOTS), dtype=np.uint16)
        self.stash = []

    # ---- key -> (fingerprint, bucket, alternate bucket) ------------------

    def _fingerprints(self, hashes: np.ndarray) -> np.ndarray:
        fp = _mix64(hashes) & np.uint64((1 << self.fbits) - 1)
        fp = fp.astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)

    def _i1(self, hashes: np.ndarray) -> np.ndarray:
        return (hashes.astype(np.uint64) & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def _alt(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mixed = (fp.astype(np.uint64) * _ALT_MULT) & np.uint64(self.n_buckets - 1)
        return (idx.astype(np.uint64) ^ mixed).astype(np.int64)

    # ---- vectorized membership ------------------------------------------

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.asarray(hashes, dtype=np.uint64)
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fingerprints(hashes)
        i1 = self._i1(hashes)
        i2 = self._alt(i1, fp)
        hit = ((self.table[i1] == fp[:, None]).any(axis=1)
               | (self.table[i2] == fp[:, None]).any(axis=1))
        for si, sfp in self.stash:
            hit |= (fp == sfp) & ((i1 == si) | (i2 == si))
        return hit

    # ---- inserts / deletes (per-key loop; Spark batches per partition) ---

    def add_many(self, hashes: np.ndarray) -> None:
        hashes = np.asarray(hashes, dtype=np.uint64)
        if len(hashes) == 0:
            return
        fps = self._fingerprints(hashes)
        i1s = self._i1(hashes)
        i2s = self._alt(i1s, fps)
        for fp, i1, i2 in zip(fps.tolist(), i1s.tolist(), i2s.tolist()):
            row1, row2 = self.table[i1], self.table[i2]
            placed = False
            for row in (row1, row2):
                empty = np.flatnonzero(row == 0)
                if len(empty):
                    row[empty[0]] = fp
                    placed = True
                    break
            if placed:
                continue
            # deterministic eviction walk: victim slot cycles 0..3, the
            # alternate bucket of the evicted fingerprint is the next stop
            i = i1 if (_mix(fp) & 1) == 0 else i2
            cur = fp
            for kick in range(_MAX_KICKS):
                slot = kick % _SLOTS
                cur, self.table[i, slot] = int(self.table[i, slot]), cur
                i = int(self._alt(np.array([i]), np.array([cur], dtype=np.uint16))[0])
                row = self.table[i]
                empty = np.flatnonzero(row == 0)
                if len(empty):
                    row[empty[0]] = cur
                    break
            else:
                self.stash.append((i, cur))

    def delete_many(self, hashes: np.ndarray) -> np.ndarray:
        """Remove one occurrence per key; returns per-key deleted flags.
        Callers must also delete from the EXACT seen table — the filter is
        a pre-filter, never the membership source of truth."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        out = np.zeros(len(hashes), dtype=bool)
        if len(hashes) == 0:
            return out
        fps = self._fingerprints(hashes)
        i1s = self._i1(hashes)
        i2s = self._alt(i1s, fps)
        for n, (fp, i1, i2) in enumerate(zip(fps.tolist(), i1s.tolist(),
                                             i2s.tolist())):
            done = False
            for i in (i1, i2):
                slots = np.flatnonzero(self.table[i] == fp)
                if len(slots):
                    self.table[i, slots[0]] = 0
                    done = True
                    break
            if not done:
                for k, (si, sfp) in enumerate(self.stash):
                    if sfp == fp and si in (i1, i2):
                        self.stash.pop(k)
                        done = True
                        break
            out[n] = done
        return out

    # ---- introspection / serialization ----------------------------------

    def occupancy(self) -> int:
        return int((self.table != 0).sum()) + len(self.stash)

    def cardinality_estimate(self) -> float:
        # multiset adds: occupancy counts stored copies — an upper bound on
        # distinct keys (tight when keys are added once, the engine's case)
        return float(self.occupancy())

    def to_bytes(self) -> bytes:
        head = struct.pack("<QHH", self.n_buckets, self.fbits, len(self.stash))
        body = self.table.tobytes()
        tail = b"".join(struct.pack("<QH", i, fp) for i, fp in self.stash)
        return head + body + tail
