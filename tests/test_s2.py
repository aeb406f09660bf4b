import jax.numpy as jnp
import numpy as np

import oracle
from fast_limo_tpu.ops import s2


def rand_s2(rng):
    v = rng.normal(size=3)
    return v / np.linalg.norm(v) * s2.S2_LENGTH


class TestS2vsOracle:
    def test_Bx(self, rng):
        for _ in range(10):
            v = rand_s2(rng)
            np.testing.assert_allclose(s2.Bx(jnp.asarray(v)), oracle.s2_Bx(v), atol=1e-12)

    def test_Bx_singular_branch(self):
        v = np.array([-s2.S2_LENGTH, 0.0, 0.0])
        np.testing.assert_allclose(s2.Bx(jnp.asarray(v)), oracle.s2_Bx(v), atol=1e-12)

    def test_boxplus(self, rng):
        for _ in range(10):
            v = rand_s2(rng)
            d = rng.normal(size=2) * 0.3
            np.testing.assert_allclose(
                s2.boxplus(jnp.asarray(v), jnp.asarray(d)),
                oracle.s2_boxplus(v, d), atol=1e-12)

    def test_boxminus(self, rng):
        for _ in range(10):
            a, b = rand_s2(rng), rand_s2(rng)
            np.testing.assert_allclose(
                s2.boxminus(jnp.asarray(a), jnp.asarray(b)),
                oracle.s2_boxminus(a, b), atol=1e-11)

    def test_boxminus_identical(self, rng):
        a = rand_s2(rng)
        np.testing.assert_allclose(
            s2.boxminus(jnp.asarray(a), jnp.asarray(a)), np.zeros(2), atol=1e-12)

    def test_Nx_yy(self, rng):
        for _ in range(5):
            v = rand_s2(rng)
            np.testing.assert_allclose(s2.Nx_yy(jnp.asarray(v)), oracle.s2_Nx_yy(v), atol=1e-12)

    def test_Mx(self, rng):
        for _ in range(5):
            v = rand_s2(rng)
            for d in (np.zeros(2), rng.normal(size=2) * 0.2):
                np.testing.assert_allclose(
                    s2.Mx(jnp.asarray(v), jnp.asarray(d)), oracle.s2_Mx(v, d), atol=1e-12)

    def test_boxplus_boxminus_roundtrip(self, rng):
        # boxminus(boxplus(v,d), v) == d for moderate d
        for _ in range(5):
            v = rand_s2(rng)
            d = rng.normal(size=2) * 0.2
            v2 = np.asarray(s2.boxplus(jnp.asarray(v), jnp.asarray(d)))
            d2 = np.asarray(s2.boxminus(jnp.asarray(v2), jnp.asarray(v)))
            np.testing.assert_allclose(d2, d, atol=1e-9)

    def test_norm_preserved(self, rng):
        v = rand_s2(rng)
        v2 = s2.boxplus(jnp.asarray(v), jnp.asarray([0.5, -0.3]))
        assert abs(float(jnp.linalg.norm(v2)) - s2.S2_LENGTH) < 1e-10
