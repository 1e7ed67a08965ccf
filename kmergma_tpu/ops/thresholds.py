"""Distance-threshold estimation and mutation simulation
(ref /root/reference/src/DistanceTesting.jl).

The estimator's *statistic* matches the reference (mean k-mer distance of
``num_trials`` random uniform-ACGT sequences of the mean reference length to
the profile, minus a safety buffer, DistanceTesting.jl:8-32).  The random
bitstream necessarily differs (NumPy PCG64 vs Julia's RNG) but the mean of
100 trials concentrates tightly, so thresholds agree to well under 1 unit;
our own seeded values are pinned by this repo's tests.
"""

from __future__ import annotations

import numpy as np

from .kmers import kmer_dist


def _rand_seq_codes(rng: np.random.Generator, length: int) -> np.ndarray:
    return rng.integers(0, 4, size=length, dtype=np.int64)


def estimate_optimal_threshold(
    mean_kfv: np.ndarray,
    average_length: int,
    seed: int = 42,
    num_trials: int = 100,
    buffer: float = 8.0,
) -> float:
    """Mean distance of random sequences to the profile, minus ``buffer``
    (ref DistanceTesting.jl:8-17)."""
    from ..consts import get_k

    rng = np.random.default_rng(seed)
    k = get_k(mean_kfv.shape[0])
    total = 0.0
    for _ in range(num_trials):
        total += kmer_dist(_rand_seq_codes(rng, average_length), mean_kfv, k)
    return total / num_trials - buffer


def estimate_optimal_thresholds(
    mean_kfvs: list[np.ndarray],
    average_lengths: list[int],
    seed: int = 42,
    num_trials: int = 100,
    buffer: float = 8.0,
) -> list[float]:
    """Cluster-mode overload: one RNG stream shared across clusters in order
    (ref DistanceTesting.jl:19-32 seeds once before the loop)."""
    from ..consts import get_k

    rng = np.random.default_rng(seed)
    k = get_k(mean_kfvs[0].shape[0])
    out = []
    for kfv, length in zip(mean_kfvs, average_lengths):
        total = 0.0
        for _ in range(num_trials):
            total += kmer_dist(_rand_seq_codes(rng, length), kfv, k)
        out.append(total / num_trials - buffer)
    return out


def mutate_seq_codes(codes: np.ndarray, mut_rate: float, rng: np.random.Generator) -> np.ndarray:
    """Random substitution of ~``mut_rate`` of positions to a different base
    (ref DistanceTesting.jl:38-67).  Returns a new code array."""
    codes = np.asarray(codes).copy()
    hit = rng.random(codes.shape[0]) <= mut_rate
    # pick one of the 3 other bases uniformly
    offsets = rng.integers(1, 4, size=codes.shape[0])
    codes[hit] = (codes[hit] + offsets[hit]) % 4
    return codes
