"""Pallas masked-top-k kernel vs the pure-jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_limo_tpu.ops import knn as pknn


def make_case(rng, N=100, C=81):
    cand = rng.normal(size=(N, C, 3)).astype(np.float32) * 5
    valid = rng.random((N, C)) > 0.3
    q = rng.normal(size=(N, 3)).astype(np.float32) * 5
    return jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(q)


class TestMaskedTopK:
    def test_matches_reference(self, rng):
        cand, valid, q = make_case(rng)
        n1, s1, v1 = pknn.masked_topk(cand, valid, q, k=5, interpret=True)
        n2, s2, v2 = pknn.masked_topk_reference(cand, valid, q, k=5)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        # neighbor points match where valid (ties may reorder equal dists)
        m = np.asarray(v1)
        np.testing.assert_allclose(np.asarray(n1)[m], np.asarray(n2)[m],
                                   rtol=1e-5)

    def test_all_invalid(self, rng):
        cand, _, q = make_case(rng, N=8)
        valid = jnp.zeros((8, 81), bool)
        n1, s1, v1 = pknn.masked_topk(cand, valid, q, k=5, interpret=True)
        assert not bool(jnp.any(v1))

    def test_fewer_than_k_valid(self, rng):
        cand, _, q = make_case(rng, N=4)
        valid = jnp.zeros((4, 81), bool).at[:, :3].set(True)
        n1, s1, v1 = pknn.masked_topk(cand, valid, q, k=5, interpret=True)
        assert int(jnp.sum(v1)) == 4 * 3
        # ascending
        s = np.asarray(s1)
        for row in s:
            fin = row[np.isfinite(row)]
            assert np.all(np.diff(fin) >= 0)
