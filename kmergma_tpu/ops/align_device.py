"""Device-side batched semi-global alignment (the Pallas/SURVEY section 7
item 5 "batched alignment stage", built as jitted XLA: the DP is a
290-step lax.scan of tiny (B, n) integer rows - latency-, not
compute-bound - and the traceback a vmapped while_loop; a hand kernel
would add nothing).

Bit-identical to ops/align.semiglobal_align (fuzz-pinned): the forward
recurrence is the same int32 arithmetic (cummax running-max F), and the
traceback ports _traceback's branch structure verbatim - endpoint = LAST
argmax of H[m], match > D > I at ties, extend-over-open inside gaps.  All
comparisons are integer, so device/host equality is structural, not
numerical.  The miners route through align.align_hits_batch, which picks
this path on TPU for hit-dense records (r4: host batch alignment measured
190 ms / 100 hits = 64% of the hit-dense scan+align wall time).

Ops are emitted as codes into a fixed (m + n + 2) buffer per hit and
decoded on host into the same AlignResult runs.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from .align import _NUC44, AlignResult, _seq_to_idx

_OPS = "=XID"
NEG = -(2**30)


def _forward(a_sub, bmat, go, ge):
    """Forward DP: returns H, E, F as int32[(m+1), B, n+1].

    a_sub: int32[m, 15] = NUC44 rows of the query letters.
    bmat: int32[B, n] subject letter indices.
    """
    import jax
    import jax.numpy as jnp

    m = a_sub.shape[0]
    B, n = bmat.shape
    # substitution rows via one-hot MXU (a 15-entry gather per cell is slow)
    oh = (bmat[:, :, None] == jnp.arange(15, dtype=jnp.int32)[None, None, :]).astype(
        jnp.float32
    )  # (B, n, 15)
    subs = jnp.einsum(
        "mk,bnk->mbn", a_sub.astype(jnp.float32), oh,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)  # (m, B, n), exact: one-hot selects single entries

    jj = jnp.arange(1, n + 1, dtype=jnp.int32)
    H0 = jnp.zeros((B, n + 1), dtype=jnp.int32)
    E0 = jnp.full((B, n + 1), NEG, dtype=jnp.int32)

    def step(carry, xs):
        H_prev, E_prev = carry
        sub_i, i = xs
        col = go + ge * i  # H[i,0] = E[i,0]
        E_i1 = jnp.maximum(H_prev[:, 1:] + (go + ge), E_prev[:, 1:] + ge)
        diag = H_prev[:, :-1] + sub_i
        G = jnp.maximum(diag, E_i1)
        base = jnp.concatenate(
            [jnp.full((B, 1), col, dtype=jnp.int32), G - ge * jj[None, :]], axis=1
        )
        run = jax.lax.cummax(base[:, :-1], axis=1)
        F_i1 = (go + ge * jj[None, :]) + run
        H_i1 = jnp.maximum(G, F_i1)
        H_i = jnp.concatenate([jnp.full((B, 1), col, dtype=jnp.int32), H_i1], axis=1)
        E_i = jnp.concatenate([jnp.full((B, 1), col, dtype=jnp.int32), E_i1], axis=1)
        F_i = jnp.concatenate([jnp.full((B, 1), NEG, dtype=jnp.int32), F_i1], axis=1)
        return (H_i, E_i), (H_i, E_i, F_i)

    iis = jnp.arange(1, m + 1, dtype=jnp.int32)
    (_, _), (Hs, Es, Fs) = jax.lax.scan(step, (H0, E0), (subs, iis))
    F0 = jnp.full((1, B, n + 1), NEG, dtype=jnp.int32)
    H = jnp.concatenate([H0[None], Hs], axis=0)
    E = jnp.concatenate([jnp.full((1, B, n + 1), NEG, jnp.int32), Es], axis=0)
    F = jnp.concatenate([F0, Fs], axis=0)
    return H, E, F, subs


def _traceback_one(H, E, F, subs_b, a_idx, b_row, go, ge, m, n):
    """Exact device port of align._traceback for ONE hit.

    H/E/F: int32[m+1, n+1]; subs_b: int32[m, n]; a_idx/b_row: letter
    indices.  Returns (score, ops_buf int8[m+n+2], n_ops, j_lead) where
    ops_buf holds op codes in traceback (reverse) order and j_lead is the
    leading free-gap D count appended last on host.
    """
    import jax
    import jax.numpy as jnp

    cap = m + n + 2
    Hm = H[m]
    score = jnp.max(Hm)
    # endpoint: LAST column attaining the max
    j0 = (n - jnp.argmax(Hm[::-1])).astype(jnp.int32)

    ops0 = jnp.full(cap, -1, dtype=jnp.int8)
    # trailing free subject gap: (n - j0) 'D's first
    kk = jnp.arange(cap, dtype=jnp.int32)
    ops0 = jnp.where(kk < (n - j0), jnp.int8(3), ops0)

    def cell(M, i, j):
        return jax.lax.dynamic_index_in_dim(
            jax.lax.dynamic_index_in_dim(M, i, 0, keepdims=False), j, 0, keepdims=False
        )

    # state: 0 = H, 1 = F, 2 = E
    def cond(c):
        i, j, st, pos, ops = c
        return i > 0

    def body(c):
        i, j, st, pos, ops = c
        h_ij = cell(H, i, j)
        sub_d = cell(subs_b, i - 1, jnp.maximum(j - 1, 0))
        diag_ok = (j > 0) & (h_ij == cell(H, i - 1, jnp.maximum(j - 1, 0)) + sub_d)
        f_ok = (j > 0) & (h_ij == cell(F, i, j))

        def from_h(_):
            a_l = jax.lax.dynamic_index_in_dim(a_idx, i - 1, 0, keepdims=False)
            b_l = jax.lax.dynamic_index_in_dim(b_row, jnp.maximum(j - 1, 0), 0, keepdims=False)
            op_diag = jnp.where(a_l == b_l, jnp.int8(0), jnp.int8(1))
            # diag branch
            di, dj, dst, dop = i - 1, j - 1, jnp.int32(0), op_diag
            # F branch: no op emitted, just switch state
            fi, fj, fst = i, j, jnp.int32(1)
            # E branch
            ei, ej, est = i, j, jnp.int32(2)
            ni = jnp.where(diag_ok, di, jnp.where(f_ok, fi, ei))
            nj = jnp.where(diag_ok, dj, jnp.where(f_ok, fj, ej))
            nst = jnp.where(diag_ok, dst, jnp.where(f_ok, fst, est))
            emit = diag_ok
            op = dop
            return ni, nj, nst, emit, op

        def from_f(_):
            ext = (j > 1) & (cell(F, i, j) == cell(F, i, jnp.maximum(j - 1, 0)) + ge)
            nst = jnp.where(ext, jnp.int32(1), jnp.int32(0))
            return i, j - 1, nst, jnp.bool_(True), jnp.int8(3)

        def from_e(_):
            ext = (i > 1) & (cell(E, i, j) == cell(E, i - 1, j) + ge)
            nst = jnp.where(ext, jnp.int32(2), jnp.int32(0))
            return i - 1, j, nst, jnp.bool_(True), jnp.int8(2)

        ni, nj, nst, emit, op = jax.lax.switch(st, [from_h, from_f, from_e], None)
        ops = jnp.where(emit, ops.at[pos].set(op), ops)
        pos = pos + jnp.where(emit, 1, 0)
        return ni, nj, nst, pos, ops

    i0 = jnp.int32(m)
    pos0 = (n - j0).astype(jnp.int32)
    _, j_f, _, pos_f, ops_f = jax.lax.while_loop(
        cond, body, (i0, j0, jnp.int32(0), pos0, ops0)
    )
    return score, ops_f, pos_f, j_f


_fwd_tb_jit = None


def _get_jit():
    global _fwd_tb_jit
    if _fwd_tb_jit is not None:
        return _fwd_tb_jit
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("m", "n", "go", "ge"))
    def run(a_sub, a_idx, bmat, *, m, n, go, ge):
        H, E, F, subs = _forward(a_sub, bmat, jnp.int32(go), jnp.int32(ge))

        def one(Hb1, Eb1, Fb1, s1, b1):
            return _traceback_one(
                Hb1, Eb1, Fb1, s1, a_idx, b1, jnp.int32(go), jnp.int32(ge), m, n
            )

        # vmap over the BATCH axis in place (axis 1 of the row-major DP
        # tensors) - materialising (B, m+1, n+1) transposes relayouts
        # 3 x ~136 MB at 100 hits for nothing
        return jax.vmap(one, in_axes=(1, 1, 1, 1, 0))(H, E, F, subs, bmat)

    _fwd_tb_jit = run
    return run


def semiglobal_align_device(
    query: "str | bytes",
    subjects: "list[str | bytes]",
    gap_open: int = -69,
    gap_extend: int = -1,
) -> "list[AlignResult]":
    """Device-batched semiglobal_align: bit-identical results."""
    if not subjects:
        return []
    import jax.numpy as jnp

    a = _seq_to_idx(query)
    bs = [_seq_to_idx(s) for s in subjects]
    m = a.shape[0]
    a_sub = jnp.asarray(_NUC44[a].astype(np.int32))
    a_idx = jnp.asarray(a.astype(np.int32))
    out: list[AlignResult | None] = [None] * len(subjects)

    by_len: dict[int, list[int]] = {}
    for i, b in enumerate(bs):
        by_len.setdefault(b.shape[0], []).append(i)
    run = _get_jit()
    for n, idxs in by_len.items():
        bmat = np.stack([bs[i] for i in idxs]).astype(np.int32)
        scores, ops, n_ops, j_leads = (
            np.asarray(x)
            for x in run(a_sub, a_idx, jnp.asarray(bmat), m=m, n=n,
                         go=int(gap_open), ge=int(gap_extend))
        )
        for bi, i_orig in enumerate(idxs):
            seq = ops[bi, : n_ops[bi]]
            # host reconstruction identical to align._traceback: traceback
            # order + leading free-gap Ds, then reversed into runs
            full = np.concatenate([seq, np.full(int(j_leads[bi]), 3, dtype=np.int8)])
            runs: list[tuple[int, str]] = []
            for op_code in full[::-1]:
                op = _OPS[int(op_code)]
                if runs and runs[-1][1] == op:
                    runs[-1] = (runs[-1][0] + 1, op)
                else:
                    runs.append((1, op))
            out[i_orig] = AlignResult(score=int(scores[bi]), cigar_runs=runs)
    return out  # type: ignore[return-value]
