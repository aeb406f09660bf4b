"""ops/sort — the single-launch bitonic sort vs XLA's stable lax.sort."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_limo_tpu.ops import sort as psort


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _ref(k1, k2, v):
    return jax.lax.sort((jnp.asarray(k1, jnp.int32), jnp.asarray(k2, jnp.int32),
                         jnp.asarray(v, jnp.int32)), num_keys=2)


@pytest.mark.parametrize("n", [128, 256, 1000, 2048])
def test_matches_stable_xla_sort(rng, n):
    """With a unique third operand the bitonic result must equal XLA's
    STABLE 2-key sort bit-for-bit (ties resolved by original index)."""
    k1 = rng.integers(0, 50, n).astype(np.int32)      # many duplicate keys
    k2 = rng.integers(0, 7, n).astype(np.int32)
    v = np.arange(n, dtype=np.int32)
    got = psort.sort3_tpu(jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(v),
                          interpret=True)
    want = _ref(k1, k2, v)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_invalid_sentinel_sorts_last(rng):
    n = 700                                            # pads to 1024
    k1 = rng.integers(0, 100, n).astype(np.int32)
    k1[rng.random(n) < 0.3] = np.int32(0x7FFFFFFF)     # invalid convention
    k2 = rng.integers(0, 1 << 20, n).astype(np.int32)
    v = np.arange(n, dtype=np.int32)
    got = psort.sort3_tpu(jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(v),
                          interpret=True)
    want = _ref(k1, k2, v)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    assert got[0].shape == (n,)                        # padding sliced off


def test_dispatch_fallback_matches(rng):
    # off-TPU dispatch goes through lax.sort — same result by construction
    n = 512
    k1 = rng.integers(-1000, 1000, n).astype(np.int32)
    k2 = rng.integers(0, 3, n).astype(np.int32)
    v = np.arange(n, dtype=np.int32)
    got = psort.sort3(jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(v))
    want = _ref(k1, k2, v)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
