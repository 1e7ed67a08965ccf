"""Single-profile genome miner - the TPU-native ``ac_gma_testing!``
(ref /root/reference/src/GenomeMiner.jl:4-109).

Pipeline per contig (records shorter than the windowsize are skipped,
GenomeMiner.jl:37-39):

  1. device: tiled exact-integer window-distance scan + candidate
     compaction (ops/scan.ScanEngine),
  2. host: exact replay of the minima/dedupe state machine
     (models/state_machine.replay_single),
  3. host: optional semi-global alignment trim of each rare hit
     (ops/align.align_unitrange),
  4. hit records formatted exactly like the reference
     ("id | dist = a | MatchPos = b:c | GenomePos = e | Len = f",
     ref Alignment.jl:57-81).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..ops.align import AlignResult, align_unitrange
from ..ops.reference import RefProfile
from ..ops.scan import ScanEngine
from ..utils.fasta import FastaRecord, PathOrRecords, as_records
from .state_machine import replay_single


def fmt_dist(x: float) -> str:
    """Julia's string(round(x, digits=2)): IEEE round-half-even to 2
    decimals, shortest-repr formatting."""
    return repr(round(float(x), 2))


@dataclass
class MineResult:
    hits: list[FastaRecord] = field(default_factory=list)
    hit_loci: list[int] = field(default_factory=list)
    alignments: list[AlignResult] = field(default_factory=list)
    dists: np.ndarray | None = None  # concatenated per-window distances


def mine_genome(
    genome: PathOrRecords,
    profile: RefProfile,
    thr: float,
    buff: int = 50,
    do_align: bool = True,
    gap_open: int = -69,
    gap_extend: int = -1,
    do_return_dists: bool = False,
    do_return_align: bool = False,
    get_hit_loci: bool = False,
    engine: ScanEngine | None = None,
) -> MineResult:
    k, ws = profile.k, profile.windowsize
    if engine is None:
        engine = ScanEngine(profile.sum_kfv, k=k, ws=ws, r=profile.n_records)
    consensus_ws = profile.consensus_ws
    res = MineResult()
    dist_parts: list[np.ndarray] = []

    genome_pos = 0
    for record in as_records(genome):
        seq_len = len(record)
        if seq_len < ws:
            continue
        dist0, stream, dists = engine.record_stream(record.codes, thr, collect_dists=do_return_dists)
        if dists is not None:
            dist_parts.append(dists[1:])  # the reference records only the iterative phase

        raw_hits = replay_single(stream, dist0, thr, k=k, ws=ws, seq_len=seq_len, buff=buff)
        seq_str = record.seq_str().upper()
        for hit in raw_hits:
            start, stop = hit.start, hit.stop
            if do_align:
                start, stop = align_unitrange(
                    seq_str, start, stop, consensus_ws, ws, seq_len,
                    gap_open, gap_extend,
                    collector=res.alignments if do_return_align else None,
                )
            desc = (
                f"{record.identifier} | dist = {fmt_dist(hit.dist)}"
                f" | MatchPos = {start}:{stop}"
                f" | GenomePos = {genome_pos}"
                f" | Len = {stop - start + 1}"
            )
            res.hits.append(FastaRecord(desc, seq_str[start - 1 : stop].encode()))
            if get_hit_loci:
                res.hit_loci.append(start + genome_pos)
        genome_pos += seq_len

    if do_return_dists:
        res.dists = np.concatenate(dist_parts) if dist_parts else np.empty(0)
    return res
