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
