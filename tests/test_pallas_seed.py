"""Pallas seeding kernels vs scalar numpy models of the host policy."""
import numpy as np
import pytest

from vg_tpu.ops import pallas_seed

I32MAX = 2**31 - 1


def softcap_ref(ms, keep, cheap, sf):
    """Scalar model of the host soft-cap scan (_soft_cap_select /
    devseed sc_step): descending score order, cheap always taken,
    expensive while taken-score < budget."""
    R, m = ms.shape
    take = np.zeros((R, m), bool)
    for r in range(R):
        order = np.argsort(-ms[r], kind="stable")
        budget = sf * ms[r].sum()
        taken = 0.0
        for c in order:
            if not keep[r, c]:
                continue
            if cheap[r, c] or taken < budget:
                take[r, c] = True
                taken += ms[r, c]
    return take


def cluster_ref(strandk, diagk, ok, score, B, C):
    """Scalar model of the seed->cluster->top-C policy (the jnp
    reference in ops/devseed.py, reduced to one read at a time)."""
    R, S = strandk.shape
    cd = np.zeros((R, C), np.int32)
    cr = np.zeros((R, C), np.int32)
    cv = np.zeros((R, C), bool)
    for r in range(R):
        valid = strandk[r] < 2
        idx = np.lexsort((np.arange(S), diagk[r], strandk[r]))
        st, dg, o, sc, v = (strandk[r][idx], diagk[r][idx], ok[r][idx],
                            score[r][idx], valid[idx])
        new_c = np.ones(S, bool)
        new_c[1:] = (st[1:] != st[:-1]) | (dg[1:] - dg[:-1] > 2 * B)
        new_c &= v
        cid = np.maximum(np.cumsum(new_c) - 1, 0)
        # dedup (cid, o) then per-cluster score
        nclust = int(cid[v].max()) + 1 if v.any() else 0
        cl_score = np.zeros(max(nclust, 1))
        cl_diag = np.zeros(max(nclust, 1), np.int32)
        cl_strand = np.zeros(max(nclust, 1), np.int32)
        for c in range(nclust):
            sel = (cid == c) & v
            offs = o[sel]
            scs = sc[sel]
            _, first = np.unique(offs, return_index=True)
            cl_score[c] = scs[first].sum()
            pos = np.nonzero(sel)[0]
            mid = (pos.min() + pos.max()) // 2
            cl_diag[c] = dg[mid]
            cl_strand[c] = st[mid]
        order = np.argsort(-cl_score, kind="stable")[:C]
        for j, c in enumerate(order):
            if cl_score[c] > 0:
                cd[r, j] = cl_diag[c]
                cr[r, j] = cl_strand[c]
                cv[r, j] = True
    return cd, cr, cv


def test_softcap_compact_random():
    rng = np.random.default_rng(0)
    R, m = 32, 122
    cnt = rng.integers(0, 40, (R, m))
    keep = (cnt > 0) & (cnt <= 30)
    ms = np.where(keep, np.maximum(
        1.0 + np.log(500.0) - np.log(np.maximum(cnt, 1)), 1.0), 0.0
    ).astype(np.float32)
    cheap = cnt <= 10
    hs = rng.integers(0, 1000, (R, m)).astype(np.int32)
    cr = rng.integers(0, 2, (R, m)).astype(np.int32)
    want = softcap_ref(ms, keep, cheap, 0.9)

    pos_s, hs_s, cnt_s, cr_s, ms_s, take_s = (
        np.asarray(a) for a in pallas_seed.softcap_compact(
            ms, keep, cheap & keep, hs, cnt.astype(np.int32), cr,
            score_fraction=0.9))
    got = np.zeros((R, m), bool)
    for r in range(R):
        sel = take_s[r] != 0
        got[r, pos_s[r][sel & (pos_s[r] < m)]] = True
    np.testing.assert_array_equal(got, want)
    # compaction: selected entries first, in ascending position order
    for r in range(R):
        n = int(take_s[r].sum())
        assert (take_s[r][:n] == 1).all()
        ps = pos_s[r][:n]
        assert (np.diff(ps) > 0).all()
        np.testing.assert_array_equal(hs_s[r][:n], hs[r][ps])
        np.testing.assert_array_equal(cnt_s[r][:n], cnt[r][ps])
        np.testing.assert_array_equal(cr_s[r][:n], cr[r][ps])
        np.testing.assert_allclose(ms_s[r][:n], ms[r][ps], rtol=1e-6)


@pytest.mark.parametrize("S", [256, 1024])
def test_cluster_topc_random(S):
    rng = np.random.default_rng(1)
    R, C, B = 24, 8, 16
    valid = rng.random((R, S)) < 0.4
    strandk = np.where(valid, rng.integers(0, 2, (R, S)), 2).astype(
        np.int32)
    # diagonals drawn from a few hotspots so clusters form
    hot = rng.integers(0, 100000, (R, 6))
    diag = hot[np.arange(R)[:, None], rng.integers(0, 6, (R, S))] \
        + rng.integers(-B, B + 1, (R, S))
    diagk = np.where(valid, diag, I32MAX).astype(np.int32)
    ok = np.where(valid, rng.integers(0, 120, (R, S)), I32MAX).astype(
        np.int32)
    score = np.where(valid, rng.choice(
        [1.0, 1.5, 2.25, 4.0], (R, S)), 0.0).astype(np.float32)

    want = cluster_ref(strandk, diagk, ok, score, B, C)
    got = pallas_seed.cluster_topc(strandk, diagk, ok, score,
                                   band_radius=B, max_candidates=C)
    got = tuple(np.asarray(a) for a in got)
    np.testing.assert_array_equal(got[2], want[2])
    np.testing.assert_array_equal(got[0][want[2]], want[0][want[2]])
    np.testing.assert_array_equal(got[1][want[2]], want[1][want[2]])


def test_cluster_topc_empty_and_single():
    R, S, C, B = 3, 256, 4, 16
    strandk = np.full((R, S), 2, np.int32)
    diagk = np.full((R, S), I32MAX, np.int32)
    ok = np.full((R, S), I32MAX, np.int32)
    score = np.zeros((R, S), np.float32)
    # row 1: single seed; row 2: two clusters, second higher score
    strandk[1, 0] = 0
    diagk[1, 0] = 500
    ok[1, 0] = 3
    score[1, 0] = 2.0
    strandk[2, :3] = [0, 0, 1]
    diagk[2, :3] = [100, 105, 9000]
    ok[2, :3] = [5, 9, 7]
    score[2, :3] = [1.0, 1.0, 3.0]
    cd, cr, cv = (np.asarray(a) for a in pallas_seed.cluster_topc(
        strandk, diagk, ok, score, band_radius=B, max_candidates=C))
    assert not cv[0].any()
    assert cv[1, 0] and cd[1, 0] == 500 and cr[1, 0] == 0
    assert cv[2, 0] and cd[2, 0] == 9000 and cr[2, 0] == 1
    assert cv[2, 1] and cd[2, 1] in (100, 105) and cr[2, 1] == 0
    assert not cv[2, 2:].any()


def test_seed_candidates_fuzz_vs_xla_twin():
    """The Pallas-kernel seed_candidates_dev must match the retired
    pure-XLA twin (_seed_candidates_dev_xla, the implementation the
    byte-parity tests validated against host seeding) across random
    index/read configurations and budget edges."""
    import jax.numpy as jnp

    from vg_tpu.ops import devseed

    rng = np.random.default_rng(42)
    for trial, (R, L, n_keys, max_hits) in enumerate(
            [(16, 150, 400, 3), (32, 100, 50, 12),
             (8, 150, 1000, 1), (24, 200, 200, 6)]):
        k, w = 29, 11
        codes = rng.integers(0, 4, (R, L)).astype(np.uint8)
        rlen = np.full(R, L, np.int32)
        kh, kl, cr, chosen, valid = devseed.rolling_minimizers(
            codes, rlen, k, w)
        # synthetic sorted index: take some real read keys + noise
        real = (np.asarray(kh).astype(np.uint64) << np.uint64(32)) \
            | np.asarray(kl).astype(np.uint64)
        real = np.unique(real[np.asarray(chosen)])
        noise = rng.integers(0, 1 << 58, n_keys, dtype=np.uint64)
        keys = np.unique(np.concatenate([real[: n_keys // 2], noise]))
        counts = rng.integers(1, max_hits + 1, len(keys))
        offsets = np.zeros(len(keys) + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        npos = int(offsets[-1])
        pos_text = rng.integers(0, 1 << 20, npos).astype(np.int64)
        pos_rev = rng.integers(0, 2, npos).astype(np.uint8)
        ih, il = devseed.split_keys(keys)
        args = (kh, kl, cr, chosen, valid, jnp.asarray(rlen),
                jnp.asarray(ih), jnp.asarray(il),
                jnp.asarray(offsets.astype(np.int32)),
                jnp.asarray(pos_text.astype(np.int32)),
                jnp.asarray(pos_rev), None)
        kw = dict(k=k, hit_cap=10, hard_hit_cap=500, score_fraction=0.9,
                  max_candidates=8, band_radius=16)
        got = devseed.seed_candidates_dev(*args, **kw)
        want = devseed._seed_candidates_dev_xla(*args[:11], **kw)
        gs, gr, gv = (np.asarray(a) for a in got)
        ws, wr, wv = (np.asarray(a) for a in want)
        np.testing.assert_array_equal(gv, wv, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(gs[wv], ws[wv],
                                      err_msg=f"trial {trial}")
        np.testing.assert_array_equal(gr[wv], wr[wv],
                                      err_msg=f"trial {trial}")
