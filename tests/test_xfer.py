"""Wire-codec unit tests (ops/xfer.py): the tunnel transfer formats must
round-trip exactly — a silent codec bug corrupts every mapped read."""
import numpy as np

from vg_tpu.ops import xfer


def test_pack_reads4_roundtrip():
    rng = np.random.default_rng(0)
    for L in (1, 7, 8, 150, 151, 160):
        a = rng.integers(0, 6, (5, L)).astype(np.uint8)
        p = xfer.pack_reads4(a)
        assert p.dtype == np.int32
        got = np.asarray(xfer.unpack_reads4_dev(p))
        assert got.shape[1] >= L
        np.testing.assert_array_equal(got[:, :L], a)
        # pad value is 5 (never matches a base)
        if got.shape[1] > L:
            assert (got[:, L:] == 5).all()


def test_revcomp_dev_matches_host():
    from vg_tpu.utils import dna

    rng = np.random.default_rng(1)
    L = 37
    reads = np.full((4, 48), 5, np.uint8)
    lens = [37, 20, 48, 1]
    for i, n in enumerate(lens):
        reads[i, :n] = rng.integers(0, 5, n)   # incl. N codes
    got = np.asarray(xfer.revcomp_dev(reads, np.array(lens, np.int32)))
    for i, n in enumerate(lens):
        want = dna.revcomp_codes(reads[i, :n])
        np.testing.assert_array_equal(got[i, :n], want)
        assert (got[i, n:] == 5).all()


def test_pos8_roundtrip_via_bits():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    RL, W = 150, 5
    msk = rng.random((16, RL)) < 0.03
    # pack into bitmap words like the device does
    pad = np.zeros((16, W * 32), bool)
    pad[:, :RL] = msk
    words = (pad.reshape(16, W, 32).astype(np.uint32)
             << np.arange(32, dtype=np.uint32)).sum(2).astype(np.int32)
    pos8 = np.asarray(xfer.bits_to_pos8_dev(jnp.asarray(words)))
    mm = msk.sum(1)
    rows = np.nonzero(mm <= 8)[0]
    rec = xfer.pos8_to_mism_rows(pos8[rows], mm[rows], RL)
    np.testing.assert_array_equal(rec.astype(bool), msk[rows])


def test_native_encode_pack_reads_parity():
    """The fused native encoder (encode + revcomp + 2-bit wire in one
    pass) must match the numpy path (dna.encode/complement +
    ops/xfer.pack_reads2) element-for-element: codes, reverse
    complements, effective wire codes within rlen, and the N-exception
    list (row-major, capped)."""
    import pytest

    from vg_tpu.native import native_encode_pack_reads
    from vg_tpu.utils import dna

    rng = np.random.default_rng(5)
    R, L0, RL, Rpad = 100, 150, 160, 128
    EXC_CAP = 64
    seqs = []
    for i in range(R):
        s = "".join("ACGT"[c] for c in rng.integers(0, 4, L0))
        if i % 17 == 0:          # sprinkle Ns
            p = int(rng.integers(0, L0))
            s = s[:p] + "N" + s[p + 1 :]
        seqs.append(s)
    res = native_encode_pack_reads("".join(seqs).encode(), R, L0,
                                   Rpad, RL, EXC_CAP)
    if res is None:
        pytest.skip("native lib unavailable")
    codes, rc, packed, exc, n = res
    codes_ref = np.full((Rpad, RL), 5, np.uint8)
    rc_ref = np.full((Rpad, RL), 5, np.uint8)
    c2 = np.stack([dna.encode(s) for s in seqs])
    codes_ref[:R, :L0] = c2
    rc_ref[:R, :L0] = dna.complement_codes(c2)[:, ::-1]
    np.testing.assert_array_equal(codes, codes_ref)
    np.testing.assert_array_equal(rc, rc_ref)
    rlens = np.zeros(Rpad, np.int32)
    rlens[:R] = L0
    pk_ref, exc_ref = xfer.pack_reads2(codes_ref, rlens)
    sh = np.arange(16, dtype=np.uint32) * 2
    un = lambda p: ((p.view(np.uint32)[:, :, None] >> sh[None, None, :])
                    & 3).reshape(Rpad, -1)[:, :RL].astype(np.uint8)
    m = np.arange(RL)[None, :] < rlens[:, None]
    np.testing.assert_array_equal(np.where(m, un(packed), 0),
                                  np.where(m, un(pk_ref), 0))
    assert n == len(exc_ref)
    np.testing.assert_array_equal(exc, exc_ref[:EXC_CAP])
