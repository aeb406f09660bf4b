"""models/measurement — the certified exact re-match (round 5).

The measurement model resolves the candidate neighborhood ONCE at the
predicted pose x0 and re-matches every iteration against per-query
stability margins (make_h_model docstring).  These tests pin the exactness
contract: for any iterate x, ``h_rows(x)`` must equal a model whose frozen
resolve happened AT x (i.e. a genuinely fresh full re-match) — through the
certified frozen branch for small pose deltas and through the full
re-gather fallback for large ones.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_limo_tpu.models import mapper, measurement
from fast_limo_tpu.models import state as st
from fast_limo_tpu.ops import s2, so3


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _world_map(rng, n=4000, voxel=0.5, bucket=4):
    """Map of two planes + noise walls (plane fits must find real planes)."""
    g = rng.uniform(-10, 10, (n, 2)).astype(np.float32)
    ground = np.stack([g[:, 0], g[:, 1],
                       0.02 * rng.standard_normal(n).astype(np.float32)], 1)
    wall = np.stack([g[:, 0], np.full(n, 4.0, np.float32)
                     + 0.02 * rng.standard_normal(n).astype(np.float32),
                     g[:, 1] * 0.3 + 1.5], 1)
    pts = np.concatenate([ground, wall]).astype(np.float32)
    m = mapper.create(2 ** 14, bucket)
    m = mapper.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool),
                      voxel_size=voxel)
    return m, voxel


def _state(pos, dtype=jnp.float32):
    x = st.identity(dtype, gravity=-9.81)
    return x._replace(pos=jnp.asarray(pos, dtype),
                      grav=s2.project(jnp.asarray([0, 0, -9.81], dtype)))


def _mk(m, voxel, pc, pc_valid, x0, gate=0.0, budget=128):
    return measurement.make_h_model(
        m, pc, pc_valid, voxel_size=voxel, k=5, probes=8,
        max_dist_plane=5.0, plane_threshold=0.1, max_num_matches=512,
        estimate_extrinsics=True, knn_refresh="always", x0=x0,
        dynamic_gate=gate, stale_budget=budget)


class TestCertifiedRematch:
    @pytest.mark.parametrize("gate", [0.0, 4.0])
    def test_matches_fresh_resolve(self, rng, gate):
        """h_rows(x) from a model resolved at x0 must equal h_rows(x) from
        a model resolved AT x — for a sub-margin delta (certified frozen
        branch) and a multi-voxel delta (full re-gather fallback)."""
        m, voxel = _world_map(rng)
        pc = jnp.asarray(np.stack([
            rng.uniform(-8, 8, 256), rng.uniform(-2, 3.8, 256),
            rng.uniform(0.0, 2.0, 256)], 1).astype(np.float32))
        pc_valid = jnp.asarray(rng.random(256) < 0.95)
        x0 = _state([0.3, -0.2, 0.9])

        frozen_model = _mk(m, voxel, pc, pc_valid, x0, gate)
        for delta, label in ((1e-4, "certified"), (1.7, "fallback")):
            x = x0._replace(pos=x0.pos + jnp.asarray(
                [delta, -0.5 * delta, 0.3 * delta], jnp.float32))
            fresh_model = _mk(m, voxel, pc, pc_valid, x, gate)
            H_a, h_a = frozen_model[0](x)
            H_b, h_b = fresh_model[0](x)
            np.testing.assert_allclose(
                np.asarray(H_a), np.asarray(H_b), atol=2e-5,
                err_msg=f"{label} branch H rows diverged")
            np.testing.assert_allclose(
                np.asarray(h_a), np.asarray(h_b), atol=2e-5,
                err_msg=f"{label} branch residuals diverged")
            # discrete keep decisions must agree EXACTLY (same sets/gates)
            np.testing.assert_array_equal(
                np.asarray(H_a[:, 0] != 0), np.asarray(H_b[:, 0] != 0))

    @pytest.mark.parametrize("gate", [0.0, 4.0])
    def test_patched_branch_is_exact(self, rng, gate):
        """The budgeted stale-patch branch (0 < stale ≤ budget: re-resolve
        ONLY the stale queries, merge into the window results) must equal a
        fresh full resolve.  Forced by a multi-voxel delta (everything
        stale) with the budget raised to cover all queries."""
        m, voxel = _world_map(rng)
        n_q = 192
        pc = jnp.asarray(np.stack([
            rng.uniform(-8, 8, n_q), rng.uniform(-2, 3.8, n_q),
            rng.uniform(0.0, 2.0, n_q)], 1).astype(np.float32))
        pc_valid = jnp.asarray(rng.random(n_q) < 0.95)
        x0 = _state([0.3, -0.2, 0.9])
        x = x0._replace(pos=x0.pos + jnp.asarray([1.9, -1.2, 0.4],
                                                 jnp.float32))
        patched_model = _mk(m, voxel, pc, pc_valid, x0, gate, budget=n_q)
        fresh_model = _mk(m, voxel, pc, pc_valid, x, gate)
        H_a, h_a = patched_model[0](x)
        H_b, h_b = fresh_model[0](x)
        np.testing.assert_allclose(np.asarray(H_a), np.asarray(H_b),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b),
                                   atol=2e-5)
        np.testing.assert_array_equal(np.asarray(H_a[:, 0] != 0),
                                      np.asarray(H_b[:, 0] != 0))

    def test_small_query_count_traces(self, rng):
        """Fewer queries than the stale-patch budget (128): tracing must
        clamp the patch top_k to the query count — BOTH cond branches are
        always traced, so an unclamped top_k(stale, 128) over 64 queries
        crashed at trace time even when nothing was ever stale."""
        m, voxel = _world_map(rng)
        n_q = 64
        pc = jnp.asarray(np.stack([
            rng.uniform(-8, 8, n_q), rng.uniform(-2, 3.8, n_q),
            rng.uniform(0.0, 2.0, n_q)], 1).astype(np.float32))
        x0 = _state([0.0, 0.0, 0.9])
        H, h = _mk(m, voxel, pc, jnp.ones(n_q, bool), x0)[0](x0)
        assert H.shape == (n_q, 12) and np.isfinite(np.asarray(h)).all()

    def test_large_delta_is_bitwise_full_match(self, rng):
        """Past the margins the fallback re-gathers at x — bit-identical to
        a fresh resolve at x (same ops, same order)."""
        m, voxel = _world_map(rng)
        pc = jnp.asarray(np.stack([
            rng.uniform(-8, 8, 128), rng.uniform(-2, 3.8, 128),
            rng.uniform(0.0, 2.0, 128)], 1).astype(np.float32))
        pc_valid = jnp.ones(128, bool)
        x0 = _state([0.0, 0.0, 1.0])
        x = _state([2.4, 1.1, 1.0])     # several voxels away → cert fails
        H_a, h_a = _mk(m, voxel, pc, pc_valid, x0)[0](x)
        # a model resolved at x takes its CERTIFIED branch at zero
        # displacement: same frozen set, pose-dependent gates recomputed —
        # compare against the explicit full matcher instead
        H_b, h_b = _mk(m, voxel, pc, pc_valid, x)[0](x)
        np.testing.assert_allclose(np.asarray(H_a), np.asarray(H_b),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b),
                                   atol=2e-5)
