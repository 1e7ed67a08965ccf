"""Device strobemer scan must match the sequential reference recurrence
exactly (including the off-by-one drift closed form)."""

import numpy as np

import jax.numpy as jnp

from kmergma_tpu.ops.scan_strobe import strobe_scan_from_codes, strobe_scan_distances_np
from kmergma_tpu.ops.strobemers import strobe_2_mer_codes


def test_strobe_scan_matches_sequential_oracle():
    rng = np.random.default_rng(21)
    s, w_min, w_max, q, ws, r = 2, 3, 5, 5, 97, 11
    k = w_max + s - 1
    codes = rng.integers(0, 4, 3000, dtype=np.int8)
    sprof = rng.integers(0, 9, 4 ** (2 * s)).astype(np.int32)

    expected = strobe_scan_distances_np(codes, sprof, s, w_min, w_max, q, ws, r)
    sc = strobe_2_mer_codes(codes, s, w_min, w_max, q)
    n_steps = codes.shape[0] - ws - 1
    got = np.asarray(
        strobe_scan_from_codes(
            jnp.asarray(sc.astype(np.int32)), jnp.asarray(sprof), ws - k, r, n_steps
        )
    )
    assert got.tolist() == expected.tolist()


def test_strobe_scan_float_matches_miner_recurrence():
    """The scaled-integer distances equal the float recurrence the
    strobe miner runs (up to float64 accumulation noise)."""
    from kmergma_tpu.models.strobe_miner import gen_strobe_ref_ws_cons, strobe_mine_genome

    profile = gen_strobe_ref_ws_cons("tests/data/Alp_V_ref.fasta")
    res = strobe_mine_genome(
        "tests/data/Alp_V_locus.fasta", profile, thr=30, do_return_dists=True, do_align=False
    )

    from kmergma_tpu.utils.fasta import read_fasta

    rec = next(read_fasta("tests/data/Alp_V_locus.fasta"))
    k = profile.k
    # integer path needs the integer summed spectrum: rebuild it
    import numpy as np
    from kmergma_tpu.ops.strobemers import ungapped_strobe_2_mer_count_into

    sums = np.zeros(4 ** (2 * profile.s))
    n = 0
    for r2 in read_fasta("tests/data/Alp_V_ref.fasta"):
        ungapped_strobe_2_mer_count_into(r2.codes, sums, profile.s, profile.w_min, profile.w_max, profile.q)
        n += 1
    d_scaled = strobe_scan_distances_np(
        rec.codes, sums.astype(np.int64), profile.s, profile.w_min, profile.w_max,
        profile.q, profile.windowsize, n,
    )
    dist_exact = d_scaled[1:] / (2.0 * k * n * n)
    assert res.dists.shape[0] == dist_exact.shape[0]
    np.testing.assert_allclose(res.dists, dist_exact, rtol=0, atol=1e-6)
