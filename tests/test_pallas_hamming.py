"""Pallas fused Hamming top-2 kernel vs the XLA oracle (interpret mode
on the CPU test mesh; the same kernel compiles natively on TPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_tpu.matching import pallas_hamming as ph


def _rand_desc(rng, n):
    return rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint64).astype(np.uint32)


@pytest.mark.parametrize("n,m", [(256, 256), (256, 512), (512, 256)])
def test_matches_xla_oracle(n, m):
    rng = np.random.default_rng(0)
    d1 = jnp.asarray(_rand_desc(rng, n))
    d2 = jnp.asarray(_rand_desc(rng, m))
    valid2 = jnp.asarray(rng.random(m) > 0.2)
    best, idx, second = ph.hamming_top2(d1, d2, valid2, interpret=True)
    b_ref, i_ref, s_ref = ph.hamming_top2_xla(d1, d2, valid2)
    np.testing.assert_array_equal(np.asarray(best), np.asarray(b_ref))
    np.testing.assert_array_equal(np.asarray(second), np.asarray(s_ref))
    # argmin ties may differ between tile-merge order and global argmin;
    # distances at the chosen indices must agree
    d = np.asarray(ph.hamming_top2_xla(d1, d2, valid2)[0])
    from orb_slam2_tpu.matching import core
    full = np.array(core.hamming_matrix(d1, d2))
    full[:, ~np.asarray(valid2)] = 1 << 20
    chosen = full[np.arange(n), np.asarray(idx)]
    np.testing.assert_array_equal(chosen, np.asarray(best))


def test_identical_descriptors_zero_distance():
    rng = np.random.default_rng(1)
    d = jnp.asarray(_rand_desc(rng, 256))
    best, idx, second = ph.hamming_top2(d, d, jnp.ones(256, bool),
                                        interpret=True)
    assert np.all(np.asarray(best) == 0)
    assert np.array_equal(np.asarray(idx), np.arange(256))
    assert np.all(np.asarray(second) > 0)  # random descs are distinct


def test_all_columns_invalid():
    rng = np.random.default_rng(2)
    d1 = jnp.asarray(_rand_desc(rng, 256))
    d2 = jnp.asarray(_rand_desc(rng, 256))
    best, idx, second = ph.hamming_top2(d1, d2, jnp.zeros(256, bool),
                                        interpret=True)
    assert np.all(np.asarray(best) >= int(ph.BIG))


class TestMaskedTop2Mutual:
    """v2 kernel: windowed/level-masked top-2 + column-best in one pass.
    The interpret-mode kernel must agree bit-exactly with the XLA twin
    (which in turn backs the CPU execution path of the projection
    searches)."""

    def _problem(self, seed, N=256, M=256):
        rng = np.random.default_rng(seed)
        d1 = rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint64).astype(np.uint32)
        d2 = rng.integers(0, 2 ** 32, (M, 8), dtype=np.uint64).astype(np.uint32)
        # duplicate some descriptors to force distance ties
        d2[10] = d2[11] = d1[5]
        d2[40] = d2[41]
        row_attr = np.stack([
            rng.uniform(0, 600, N), rng.uniform(0, 400, N),
            rng.uniform(20, 120, N),
            rng.integers(0, 3, N).astype(float),
            rng.integers(2, 5, N).astype(float),
            (rng.random(N) < 0.9).astype(float)], axis=1).astype(np.float32)
        col_attr = np.stack([
            rng.uniform(0, 600, M), rng.uniform(0, 400, M),
            rng.integers(0, 5, M).astype(float),
            (rng.random(M) < 0.9).astype(float)], axis=1).astype(np.float32)
        return (jnp.asarray(d1), jnp.asarray(d2),
                jnp.asarray(row_attr), jnp.asarray(col_attr))

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_interpret_matches_xla(self, seed):
        d1, d2, ra, ca = self._problem(seed)
        bk, sk, ck = ph.masked_top2_mutual(d1, d2, ra, ca, interpret=True)
        bx, sx, cx = ph.masked_top2_mutual_xla(d1, d2, ra, ca)
        np.testing.assert_array_equal(np.asarray(bk), np.asarray(bx))
        np.testing.assert_array_equal(np.asarray(sk), np.asarray(sx))
        np.testing.assert_array_equal(np.asarray(ck), np.asarray(cx))

    def test_multitile(self):
        d1, d2, ra, ca = self._problem(7, N=512, M=384)
        bk, sk, ck = ph.masked_top2_mutual(d1, d2, ra, ca, interpret=True)
        bx, sx, cx = ph.masked_top2_mutual_xla(d1, d2, ra, ca)
        np.testing.assert_array_equal(np.asarray(bk), np.asarray(bx))
        np.testing.assert_array_equal(np.asarray(sk), np.asarray(sx))
        np.testing.assert_array_equal(np.asarray(ck), np.asarray(cx))


class TestMaskedTop2Epi:
    """Epipolar-gated kernel (SearchForTriangulation inner loop) vs its
    XLA twin — bit-exact in interpret mode."""

    def _problem(self, seed, N=256, M=256):
        rng = np.random.default_rng(seed)
        d1 = rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint64).astype(np.uint32)
        d2 = rng.integers(0, 2 ** 32, (M, 8), dtype=np.uint64).astype(np.uint32)
        d2[3] = d2[4] = d1[9]  # forced ties
        # normalized epipolar lines: random direction + offset
        th = rng.uniform(0, 2 * np.pi, N)
        la, lb = np.cos(th), np.sin(th)
        lc = rng.uniform(-50, 50, N)
        row_attr = np.stack([
            la, lb, lc, (rng.random(N) < 0.9).astype(float)],
            axis=1).astype(np.float32)
        col_attr = np.stack([
            rng.uniform(0, 600, M), rng.uniform(0, 400, M),
            rng.uniform(1, 400, M),   # chi2 * sigma2 thresholds
            (rng.random(M) < 0.9).astype(float)], axis=1).astype(np.float32)
        return (jnp.asarray(d1), jnp.asarray(d2),
                jnp.asarray(row_attr), jnp.asarray(col_attr))

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_interpret_matches_xla(self, seed):
        d1, d2, ra, ca = self._problem(seed)
        bk, sk, ck = ph.masked_top2_epi(d1, d2, ra, ca, interpret=True)
        bx, sx, cx = ph.masked_top2_epi_xla(d1, d2, ra, ca)
        np.testing.assert_array_equal(np.asarray(bk), np.asarray(bx))
        np.testing.assert_array_equal(np.asarray(sk), np.asarray(sx))
        np.testing.assert_array_equal(np.asarray(ck), np.asarray(cx))

    def test_multitile(self):
        d1, d2, ra, ca = self._problem(5, N=512, M=384)
        bk, sk, ck = ph.masked_top2_epi(d1, d2, ra, ca, interpret=True)
        bx, sx, cx = ph.masked_top2_epi_xla(d1, d2, ra, ca)
        np.testing.assert_array_equal(np.asarray(bk), np.asarray(bx))
        np.testing.assert_array_equal(np.asarray(sk), np.asarray(sx))
        np.testing.assert_array_equal(np.asarray(ck), np.asarray(cx))
