"""Exact-occurrence search (ref /root/reference/src/ExactMatch.jl).

Two engines behind one API:
  * a device scan (``match_starts_engine``): anagram candidates from the
    production spectrum engine + host byte verification - the TPU-native
    replacement for BioSequences' Boyer-Moore search (SURVEY.md section 7
    item 8), used for large subjects;
  * a host fallback on ``bytes.find`` for small inputs (no device round-trip).

Matching is on raw uppercased sequence bytes, so N only matches N -
identical to ``ExactSearchQuery(isequal)`` symbol equality (unlike the
2-bit scan path where N folds into T).

Overlap semantics (ref ExactMatch.jl:20-43): overlap=True restarts the
search one past each match START (yielding every occurrence); overlap=False
restarts one past each match END (greedy non-overlapping).
"""

from __future__ import annotations

from typing import Union

import numpy as np

from ..utils.fasta import FastaRecord, PathOrRecords, as_records, read_fasta

Query = Union[str, bytes, FastaRecord]

_DEVICE_MIN = 1 << 20  # below this, bytes.find beats a device round-trip


def _as_bytes(x: Query) -> bytes:
    if isinstance(x, FastaRecord):
        return x.seq.upper()
    if isinstance(x, str):
        return x.upper().encode("ascii")
    return bytes(x).upper()


def match_starts_np(subject: bytes, query: bytes) -> np.ndarray:
    """All 0-based match start positions (host path, bytes.find)."""
    out = []
    start = subject.find(query)
    while start != -1:
        out.append(start)
        start = subject.find(query, start + 1)
    return np.asarray(out, dtype=np.int64)


def _ranges(starts: np.ndarray, qlen: int, overlap: bool) -> list[tuple[int, int]]:
    """1-based inclusive ranges with the reference's restart semantics."""
    out: list[tuple[int, int]] = []
    next_allowed = 0
    for s in starts:
        s = int(s)
        if overlap or s >= next_allowed:
            out.append((s + 1, s + qlen))
            next_allowed = s + qlen
    return out


def exact_match(
    query: Query,
    subject: "Query | PathOrRecords",
    overlap: bool = True,
    use_device: bool | None = None,
):
    """All exact occurrences of ``query`` in ``subject``.

    Sequence/record subject -> list of 1-based (start, stop) tuples, or
    ``None`` if no match.  Path / record-collection subject -> dict mapping
    record identifier to its range list, or the string "no match"
    (ref ExactMatch.jl:89-121).
    """
    q = _as_bytes(query)
    if not q:
        raise ValueError("empty query sequence")

    if isinstance(subject, (str, bytes)) and not _looks_like_path(subject):
        return _match_one(q, _as_bytes(subject), overlap, use_device)
    if isinstance(subject, FastaRecord):
        return _match_one(q, _as_bytes(subject), overlap, use_device)

    # path or iterable of records
    records = list(read_fasta(subject)) if _looks_like_path(subject) else as_records(subject)
    found: dict[str, list[tuple[int, int]]] = {}
    for rec in records:
        rng = _match_one(q, _as_bytes(rec), overlap, use_device)
        if rng is not None:
            found[rec.identifier] = rng
    return found if found else "no match"


def _looks_like_path(x) -> bool:
    import os

    return isinstance(x, (str, bytes)) and os.path.exists(x)


def match_starts_engine(sub: bytes, q: bytes) -> np.ndarray:
    """Exact occurrences via the production scan engine.

    The query's k-mer spectrum is used as a profile with R=1 and ws=|q|:
    a window has scaled distance 0 iff its spectrum equals the query's.
    Since window and query spectra have equal mass, the minimum nonzero
    distance is 2, so thresholding D < 2 yields exactly the anagram
    windows - a tiny candidate set that is then byte-verified.  This rides
    the latency-shaped bitmap scan (one device call + tiny fetches), unlike
    a naive per-shift comparison loop.
    """
    from ..consts import encode_seq
    from ..ops.kmers import rolling_kmer_codes
    from .scan import ScanEngine

    qlen = len(q)
    k = min(6, qlen)
    ws = qlen
    qcodes = encode_seq(q)
    spec = np.bincount(rolling_kmer_codes(qcodes, k), minlength=4**k).astype(np.int64)
    engine = ScanEngine(spec, k=k, ws=ws, r=1)
    sub_codes = encode_seq(sub)
    scale = engine.scale
    thr = 1.5 / scale  # captures D in {0, 1} exactly (D=1 is impossible)
    dist0, stream, _ = engine.record_stream(sub_codes, thr)
    cand = [0] if dist0 * scale < 2 else []
    cand += [j for j, v in stream if v * scale < 2]
    out = [s for s in cand if sub[s : s + qlen] == q]
    return np.asarray(sorted(out), dtype=np.int64)


def _match_one(q: bytes, sub: bytes, overlap: bool, use_device: bool | None):
    if len(sub) < len(q):
        return None
    if use_device is None:
        use_device = len(sub) >= _DEVICE_MIN
    starts = match_starts_engine(sub, q) if use_device else match_starts_np(sub, q)
    if starts.size == 0:
        return None
    return _ranges(starts, len(q), overlap)


def first_match(source: PathOrRecords, query: Query) -> list[tuple[str, tuple[int, int]]]:
    """First occurrence per record (ref ExactMatch.jl:8-16; returns instead
    of printing)."""
    q = _as_bytes(query)
    out = []
    for rec in as_records(source):
        sub = _as_bytes(rec)
        pos = sub.find(q)
        if pos != -1:
            out.append((rec.identifier, (pos + 1, pos + len(q))))
    return out
