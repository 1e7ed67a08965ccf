"""Sequential minima/dedupe state machines, replayed exactly on host.

The scan's distance values are embarrassingly parallel (ops/scan.py), but the
reference's minima tracking (currminim/CMI/stop/goal_ind,
ref /root/reference/src/GenomeMiner.jl:57,82-104) and cluster-mode overlap
suppression (prev_hit_range, ref OmnGenomeMiner.jl:122-155) are
order-dependent.  Per SURVEY.md section 7 hard-part 1, the device emits the
*sparse* stream of windows that can influence the state machine (windows
below threshold, plus the window immediately after each - the rising edges),
and this module replays the exact sequential semantics over that stream -
exactness by construction, at a cost proportional to the (tiny) number of
candidate windows, not the genome length.

Index conventions: window j (0-based start j... reported 1-based as the
j-th iterative window) covers sequence positions [j+1, ws+j] 1-based =
Julia's window after iterative step j; j=0 is the init window [1, ws].  The
single-profile miner's CMI for window j is i_left = k + j - 1
(GenomeMiner.jl:85); the cluster miner's CMI is j itself
(OmnGenomeMiner.jl:117).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterable, Iterator

import numpy as np


@dataclass
class RawHit:
    """A candidate hit before alignment/trimming."""

    cmi: int  # the reference's post-increment CMI (1-based sequence coord)
    dist: float  # currminim at emission (exact)
    start: int  # 1-based inclusive buffered range start
    stop: int  # 1-based inclusive buffered range end


def candidate_stream_from_dists(dists: np.ndarray, thr: float) -> Iterator[tuple[int, float]]:
    """(window index, value) pairs for windows with d < thr plus each rising
    edge, from a full window-distance array (index 0 = init window, not
    iterated - matches the reference's iterative phase starting after init)."""
    below = dists < thr
    mask = below.copy()
    mask[1:] |= below[:-1]
    mask[0] = False
    for j in np.nonzero(mask)[0]:
        yield int(j), float(dists[j])


def replay_single(
    stream: Iterable[tuple[int, float]],
    dist0: float,
    thr: float,
    k: int,
    ws: int,
    seq_len: int,
    buff: int,
    cmi_offset: int | None = None,
) -> list[RawHit]:
    """Exact replay of the single-profile minima machine
    (ref GenomeMiner.jl:57-104) over one record's candidate stream.

    ``stream`` must yield (j, d) sorted by j for every window with d < thr
    and every rising-edge window; other windows cannot change the state.
    ``cmi_offset`` maps the window index j to the recorded CMI: the k-mer
    miner uses i_left = j + k - 1 (the default); the strobemer miner uses
    the raw step index j (StrobeGenomeMiner.jl:75 -> cmi_offset=0).
    """
    if cmi_offset is None:
        cmi_offset = k - 1
    hits: list[RawHit] = []
    currminim = dist0
    cmi, stop, goal_ind = 2, True, 0

    for j, d in stream:
        if d < thr:
            if d < currminim:
                currminim = d
                cmi = j + cmi_offset
                stop = False
        elif not stop:
            stop = True
            cmi += 1
            if cmi > goal_ind:
                goal_ind = cmi + ws - 1
                start = max(cmi - buff, 1)
                end = min(cmi + ws - 1 + buff, seq_len)
                hits.append(RawHit(cmi=cmi, dist=currminim, start=start, stop=end))
                currminim = d
    return hits


@dataclass
class OmnHitEvent:
    """A cluster-mode rising-edge event, pre-overlap-checks."""

    cluster: int  # 0-based cluster index
    cmi: int  # the raw i value (1-based window index)
    dist: float  # curr_mins at emission
    edge_dist: float  # distance at the rising edge (resets curr_mins on accept)


def replay_omn(
    streams: list[list[tuple[int, float]]],
    dist0s: list[float],
    thr_vec: list[float],
    k: int,
    windowsizes: list[int],
    seq_len: int,
    process: Callable[[OmnHitEvent], bool],
) -> None:
    """Exact replay of the cluster-mode machine (ref OmnGenomeMiner.jl:61-157).

    The reference's main loop iterates i = 1 .. seq_len - max(ws) - k + 2
    with ALL clusters advanced in cluster order at each i (the inner
    ``for ind in 1:len_KFVs``); we merge the per-cluster sparse streams in
    (i, cluster) order so cross-cluster overlap suppression sees events in
    the exact same order.  ``process`` performs the overlap checks +
    alignment + append and returns True iff the hit was accepted (which
    resets that cluster's curr_mins to the edge distance,
    OmnGenomeMiner.jl:153).  Rejected hits do NOT reset curr_mins.

    Streams must already be bounded to i <= imax = seq_len - max(ws) - k + 2.
    """
    m = len(streams)
    maxws = max(windowsizes)
    imax = seq_len - maxws - k + 2
    if imax < 1:
        return

    curr_mins = list(dist0s)
    cmis = [1] * m
    stops = [True] * m

    merged: list[tuple[int, int, float]] = []
    for ind in range(m):
        for i, d in streams[ind]:
            if i <= imax:
                merged.append((i, ind, d))
    merged.sort()

    for i, ind, d in merged:
        if d < thr_vec[ind]:
            if d < curr_mins[ind]:
                curr_mins[ind] = d
                cmis[ind] = i
                stops[ind] = False
        elif not stops[ind]:
            stops[ind] = True
            accepted = process(
                OmnHitEvent(cluster=ind, cmi=cmis[ind], dist=curr_mins[ind], edge_dist=d)
            )
            if accepted:
                curr_mins[ind] = d
