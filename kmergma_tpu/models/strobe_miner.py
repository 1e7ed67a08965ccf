"""Experimental strobemer scan engine
(ref /root/reference/src/StrobemerGMA/StrobeGenomeMiner.jl and StrobeRefGen.jl).

The reference recomputes each boundary strobemer from scratch per position
(StrobeGenomeMiner.jl:50-57, O(n*(w_max-w_min))); here strobemer codes for
ALL positions are extracted once, vectorised (ops/strobemers.strobe_2_mer_codes),
and only the O(1)/step distance recurrence runs sequentially.  The
recurrence is replicated exactly - including the reference's off-by-one
right-boundary anchor (seq[i+ws-k] rather than i+ws-k+1) whose drift makes
the rolling spectrum diverge from the true window spectrum; bit-parity with
the reference requires keeping it.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..ops.align import cigar_to_unitrange, semiglobal_align
from ..ops.consensus import Profile
from ..ops.strobemers import strobe_2_mer_codes, ungapped_strobe_2_mer_count_into
from ..utils.fasta import FastaRecord, PathOrRecords, as_records
from .miner import MineResult, fmt_dist


@dataclass
class StrobeProfile:
    mean_kfv: np.ndarray  # float64[4^(2s)]
    sum_kfv: np.ndarray  # int64[4^(2s)], exact integer sum (scan path)
    n_records: int
    windowsize: int
    consensus: str
    s: int
    w_min: int
    w_max: int
    q: int

    @property
    def k(self) -> int:
        return self.w_max + self.s - 1


def gen_strobe_ref_ws_cons(
    source: PathOrRecords, s: int = 2, w_min: int = 3, w_max: int = 5, q: int = 5
) -> StrobeProfile:
    """Strobemer-spectrum analogue of gen_ref_ws_cons (ref StrobeRefGen.jl:4-43)."""
    records = as_records(source)
    if not records:
        raise ValueError("reference set is empty")
    sums = np.zeros(4 ** (2 * s), dtype=np.float64)
    profile = Profile(1)
    n, cum = 0, 0
    for rec in records:
        n += 1
        cum += len(rec)
        ungapped_strobe_2_mer_count_into(rec.codes, sums, s, w_min, w_max, q)
        profile.lengthen(len(rec))
        profile.add(rec.codes)
    inv = 1.0 / n
    return StrobeProfile(
        mean_kfv=sums * inv,
        sum_kfv=sums.astype(np.int64),
        n_records=n,
        windowsize=int(np.round(cum * inv)),
        consensus=profile.consensus_str(),
        s=s,
        w_min=w_min,
        w_max=w_max,
        q=q,
    )


def strobe_mine_genome(
    genome: PathOrRecords,
    profile: StrobeProfile,
    thr: float = 33.5,
    buff: int = 50,
    do_align: bool = True,
    gap_open: int = -69,
    gap_extend: int = -5,  # StrobeGMA's default score model (StrobeGenomeMiner.jl:17)
    score_threshold: int = 0,
    do_return_dists: bool = False,
    do_return_align: bool = False,
    get_hit_loci: bool = False,
) -> MineResult:
    import jax.numpy as jnp

    from ..ops.scan_strobe import strobe_scan_from_codes
    from .state_machine import candidate_stream_from_dists, replay_single

    s, w_min, w_max, q = profile.s, profile.w_min, profile.w_max, profile.q
    k = profile.k
    ws = profile.windowsize
    r = profile.n_records
    scale = 2.0 * k * r * r
    sprof = jnp.asarray(profile.sum_kfv.astype(np.int32))
    consensus_ws = profile.consensus[:ws]

    res = MineResult()
    dist_parts: list[np.ndarray] = []
    genome_pos = 0
    for record in as_records(genome):
        seq_len = len(record)
        if seq_len < ws:
            # ref StrobeGenomeMiner.jl:36: `continue` skips genome_pos too
            continue
        codes = record.codes
        # vectorised strobemer extraction + exact-integer device scan of the
        # reference recurrence (incl. its boundary-drift closed form)
        sc = strobe_2_mer_codes(codes, s, w_min, w_max, q)
        n_steps = seq_len - ws - 1
        d_scaled = np.asarray(
            strobe_scan_from_codes(
                jnp.asarray(sc.astype(np.int32)), sprof, ws - k, r, n_steps
            )
        )
        dists = d_scaled.astype(np.float64) / scale  # exact rationals
        if do_return_dists:
            dist_parts.append(dists[1:])

        raw_hits = replay_single(
            candidate_stream_from_dists(dists, thr), float(dists[0]), thr,
            k=k, ws=ws, seq_len=seq_len, buff=buff, cmi_offset=0,
        )

        for hit in raw_hits:
            lo, hi = hit.start, hit.stop
            rng = (lo, hi)
            keep = True
            if do_align:
                window = record.seq[lo - 1 : hi].decode("ascii").upper()
                aln = semiglobal_align(consensus_ws, window, gap_open, gap_extend)
                if aln.score < score_threshold:
                    keep = False  # ref Alignment.jl:96-98 score filter
                else:
                    if do_return_align:
                        res.alignments.append(aln)
                    alo, ahi = cigar_to_unitrange(aln)
                    rng = (max(1, lo + alo - 1), min(lo + ahi - 1, seq_len))
            if keep:
                desc = (
                    f"{record.identifier} | dist = {fmt_dist(hit.dist)}"
                    f" | MatchPos = {rng[0]}:{rng[1]}"
                    f" | GenomePos = {genome_pos}"
                    f" | Len = {rng[1] - rng[0] + 1}"
                )
                res.hits.append(FastaRecord(desc, record.seq[rng[0] - 1 : rng[1]].upper()))
                if get_hit_loci:
                    res.hit_loci.append(rng[0] + genome_pos)
        genome_pos += seq_len

    if do_return_dists:
        res.dists = np.concatenate(dist_parts) if dist_parts else np.empty(0)
    return res
