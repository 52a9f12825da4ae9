"""Top-k retrieval tests (SURVEY.md N9): single-device vs sharded vs NumPy."""

import numpy as np
import jax.numpy as jnp

from recommendation_models_tpu.ops.topk import sharded_topk, topk_scores


def _case(rng, b=5, n=100, k=8):
    U = rng.standard_normal((b, k)).astype(np.float32)
    V = rng.standard_normal((n, k)).astype(np.float32)
    return U, V


def test_topk_matches_numpy(rng):
    U, V = _case(rng)
    scores, items = topk_scores(jnp.asarray(U), jnp.asarray(V), 10)
    full = U @ V.T
    expect = np.argsort(-full, axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(items), expect)
    np.testing.assert_allclose(np.asarray(scores),
                               np.take_along_axis(full, expect, 1), rtol=1e-5)


def test_topk_exclude(rng):
    U, V = _case(rng)
    exclude = np.array([[0, 1, -1], [5, -1, -1], [-1, -1, -1],
                        [2, 3, 4], [99, 98, 97]], np.int32)
    scores, items = topk_scores(jnp.asarray(U), jnp.asarray(V), 10,
                                jnp.asarray(exclude))
    for r in range(5):
        banned = set(e for e in exclude[r] if e >= 0)
        assert not (banned & set(np.asarray(items[r]).tolist()))


def test_sharded_topk_matches_single(rng, cpu_mesh):
    U, V = _case(rng, b=4, n=103, k=6)  # 103 not divisible by 8: padding path
    s1, i1 = topk_scores(jnp.asarray(U), jnp.asarray(V), 7)
    s2, i2 = sharded_topk(jnp.asarray(U), jnp.asarray(V), 7, cpu_mesh)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_sharded_topk_exclude(rng, cpu_mesh):
    U, V = _case(rng, b=3, n=64, k=5)
    exclude = np.array([[0, 1], [10, 20], [-1, -1]], np.int32)
    s1, i1 = topk_scores(jnp.asarray(U), jnp.asarray(V), 6, jnp.asarray(exclude))
    s2, i2 = sharded_topk(jnp.asarray(U), jnp.asarray(V), 6, cpu_mesh,
                          exclude=jnp.asarray(exclude))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
