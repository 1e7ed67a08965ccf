"""Gapped k-mer-pair spectrum (ref /root/reference/src/PairedKmers.jl).

The reference flags this module "has unfixed bugs, do not use; proof of
concept" (PairedKmers.jl:6) yet exports and unit-tests it, so its exact
behaviour - including the quirk that the second rolling register is NOT
reset between outer-loop passes (PairedKmers.jl:44-47), carrying state from
the end of one pass into the start of the next - is part of the conformance
surface (reference test-KmerGMA.jl:346-366) and is replicated here.
"""

from __future__ import annotations

import numpy as np

from ..consts import encode_seq


def _codes(seq) -> np.ndarray:
    return seq if isinstance(seq, np.ndarray) else encode_seq(seq)


def initialize_kmers(seq, k: int) -> tuple[int, int]:
    """Prime both registers with the first k-1 bases (ref PairedKmers.jl:15-21)."""
    codes = _codes(seq)
    kmer = 0
    for c in codes[: k - 1]:
        kmer = (kmer << 2) + int(c)
    return kmer, kmer


def as_index(kmer1: int, kmer2: int, k: int) -> int:
    """1-based paired-spectrum index ((kmer2 << 2k) | kmer1) + 1
    (ref PairedKmers.jl:23-25)."""
    return ((kmer2 << (k << 1)) | kmer1) + 1


def kmer_pair_count(seq, k: int = 3) -> np.ndarray:
    """Paired k-mer spectrum, 4^(2k) float64 bins (ref PairedKmers.jl:36-50).

    O(n^2) nested rolling loop, replicated verbatim including the
    carried-over inner register.
    """
    bins = np.zeros(4 ** (2 * k), dtype=np.float64)
    kmer_pair_count_into(seq, k, bins)
    return bins


def kmer_pair_count_into(seq, k: int, bins: np.ndarray) -> None:
    """In-place variant (ref PairedKmers.jl:52-65)."""
    codes = _codes(seq)
    n = codes.shape[0]
    mask = (4**k) - 1
    kmer_i, kmer_j = initialize_kmers(codes, k)
    view = codes[k - 1 : n]  # Julia's view(seq, k:n)

    # Exact replication of the nested rolling registers.  The inner register
    # kmer_j deliberately persists across outer iterations.  After its first
    # full pass the register content at each inner position is
    # pass-invariant (the roll window saturates after k steps), so passes
    # 2..m share one precomputed index row - only pass 1 differs in its
    # first k-1 positions.
    m = view.shape[0]
    if m == 0:
        return

    # kmer_j values for pass 1 (carrying the initialisation register).
    kj = kmer_j
    pass1 = np.empty(m, dtype=np.int64)
    for t in range(m):
        kj = ((kj << 2) & mask) + int(view[t])
        pass1[t] = kj
    # steady-state pass: register carried from the end of the previous pass.
    pass_rest = np.empty(m, dtype=np.int64)
    for t in range(m):
        kj = ((kj << 2) & mask) + int(view[t])
        pass_rest[t] = kj
    # Passes 3.. equal pass 2 iff the carried register produces the same
    # values; after min(k-1, m) steps both agree, and the carry-in to every
    # pass >= 3 equals pass 2's carry-in (the last k-1 bases of view).
    # Verify cheaply and fall back to the literal loop if not.
    kj2 = int(pass_rest[-1])
    pass3 = np.empty(min(m, k), dtype=np.int64)
    for t in range(pass3.shape[0]):
        kj2 = ((kj2 << 2) & mask) + int(view[t])
        pass3[t] = kj2
    steady = np.array_equal(pass3, pass_rest[: pass3.shape[0]])

    ki = kmer_i
    for p in range(m):
        ki = ((ki << 2) & mask) + int(view[p])
        if p == 0:
            inner = pass1
        elif steady or p == 1:
            inner = pass_rest
        else:  # pragma: no cover - literal fallback
            inner = np.empty(m, dtype=np.int64)
            for t in range(m):
                kj = ((kj << 2) & mask) + int(view[t])
                inner[t] = kj
        idx = ((inner << (k << 1)) | ki)
        np.add.at(bins, idx, 1.0)
