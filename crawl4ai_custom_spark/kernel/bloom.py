"""Partitioned Bloom filter for the URL-seen set — numpy bitset, pure fold.

Capability parity with the reference's experimental Bloom URL-seen
(/root/reference/crawl4ai/deep_crawling/crazy.py:102-165): optimal m/k sizing
from (capacity, fp_rate), double-hashing instead of k independent hashes, and
a cardinality estimate from the fill ratio.

Scale design: ONE bloom per URL-hash partition. The Spark layer groups new
candidate URLs by ``hash64 % num_partitions`` and folds each group into its
partition's bitset inside ``applyInPandas`` — no shared mutable state, and the
blobs (a few MiB each) persist to the checkpoint as binary rows. Bloom hits
are *pre-filter only*; exactness always comes from the seen-table anti-join.
"""

from __future__ import annotations

import math

import numpy as np

_MASK64 = (1 << 64) - 1


def optimal_params(capacity: int, fp_rate: float) -> tuple[int, int]:
    """(m bits, k hashes) for the target capacity/false-positive rate."""
    m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
    k = max(1, round(m / capacity * math.log(2))) if capacity else 1
    return m, k


def _mix(h: int) -> int:
    # splitmix64 finalizer — deterministic second hash for double hashing.
    h = (h + 0x9E3779B97F4A7C15) & _MASK64
    h = ((h ^ (h >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    h = ((h ^ (h >> 27)) * 0x94D049BB133111EB) & _MASK64
    return h ^ (h >> 31)


class BloomFilter:
    """Bitset bloom over pre-hashed 64-bit keys (vectorized add/test)."""

    def __init__(self, capacity: int = 1_000_000, fp_rate: float = 0.01,
                 bits: np.ndarray | None = None):
        self.m, self.k = optimal_params(capacity, fp_rate)
        self.capacity, self.fp_rate = capacity, fp_rate
        nbytes = (self.m + 7) // 8
        self.m = nbytes * 8  # byte-aligned so to_bytes() roundtrips exactly
        if bits is not None:
            self.bits = np.frombuffer(bytes(bits), dtype=np.uint8).copy()
            self.m = len(self.bits) * 8
        else:
            self.bits = np.zeros(nbytes, dtype=np.uint8)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1 = hashes.astype(np.uint64)
        h2 = np.empty_like(h1)
        for i, h in enumerate(h1.tolist()):  # splitmix on python ints (no overflow)
            h2[i] = _mix(h)
        ks = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + ks * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def add_many(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        pos = self._positions(np.asarray(hashes)).ravel()
        np.bitwise_or.at(self.bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(hashes))
        hit = (self.bits[pos // 8] >> (pos % 8)) & 1
        return hit.all(axis=0).astype(bool)

    def cardinality_estimate(self) -> float:
        """-m/k * ln(1 - X/m), X = set bits."""
        x = int(np.unpackbits(self.bits).sum())
        if x >= self.m:
            return float("inf")
        return -self.m / self.k * math.log(1.0 - x / self.m)

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()
