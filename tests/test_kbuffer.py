"""k-buffer selection and compositing tests (reference semantics:
ProceduralGauss.rint:24-43 insert sort, rchit:22-31 blend + front advance)."""

import jax.numpy as jnp
import numpy as np

from gsrt.ops.kbuffer import (
    advance_depth_front,
    composite_color,
    composite_transmittance,
    topk_nearest,
)


def test_topk_sorted_ascending():
    depth = jnp.array([[5.0, 1.0, 3.0, 2.0, 4.0]])
    alpha = jnp.array([[0.5, 0.1, 0.3, 0.2, 0.4]])
    valid = jnp.ones((1, 5), bool)
    kd, ka, count = topk_nearest(depth, alpha, valid, k=3)
    np.testing.assert_allclose(np.asarray(kd)[0], [1, 2, 3])
    np.testing.assert_allclose(np.asarray(ka)[0], [0.1, 0.2, 0.3])
    assert int(count[0]) == 3


def test_topk_fewer_than_k():
    depth = jnp.array([[5.0, 1.0]])
    alpha = jnp.array([[0.5, 0.1]])
    valid = jnp.array([[True, False]])
    kd, ka, count = topk_nearest(depth, alpha, valid, k=4)
    assert int(count[0]) == 1
    np.testing.assert_allclose(np.asarray(kd)[0][0], 5.0)
    np.testing.assert_allclose(np.asarray(ka)[0], [0.5, 0, 0, 0])
    np.testing.assert_allclose(np.asarray(kd)[0][1:], [1e4] * 3)


def test_composite_transmittance_matches_product():
    trans = jnp.array([1.0])
    ka = jnp.array([[0.5, 0.25, 0.0, 0.0]])
    count = jnp.array([2])
    out = composite_transmittance(trans, ka, count)
    np.testing.assert_allclose(np.asarray(out), [0.5 * 0.75], rtol=1e-6)


def test_composite_ignores_dead_slots():
    trans = jnp.array([1.0])
    ka = jnp.array([[0.5, 0.9, 0.9, 0.9]])  # junk beyond count
    count = jnp.array([1])
    out = composite_transmittance(trans, ka, count)
    np.testing.assert_allclose(np.asarray(out), [0.5], rtol=1e-6)


def test_advance_depth_front():
    kd = jnp.array([[1.0, 2.0, 3.0, 1e4]])
    front = jnp.array([0.5])
    count = jnp.array([3])
    out = advance_depth_front(front, kd, count)
    np.testing.assert_allclose(np.asarray(out), [3.0])
    # miss → unchanged
    out2 = advance_depth_front(front, kd, jnp.array([0]))
    np.testing.assert_allclose(np.asarray(out2), [0.5])


def test_composite_color_front_to_back():
    trans = jnp.array([1.0])
    color = jnp.zeros((1, 3))
    ka = jnp.array([[0.5, 0.5]])
    kc = jnp.array([[[1.0, 0, 0], [0, 1.0, 0]]])
    count = jnp.array([2])
    t2, c2 = composite_color(trans, color, ka, kc, count)
    np.testing.assert_allclose(np.asarray(t2), [0.25], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c2)[0], [0.5, 0.25, 0.0], rtol=1e-6)


def test_composite_color_transmittance_consistent():
    """color compositing must update T exactly like composite_transmittance."""
    rng = np.random.default_rng(0)
    ka = jnp.asarray(rng.uniform(0, 0.9, (16, 8)).astype(np.float32))
    kc = jnp.asarray(rng.uniform(0, 1, (16, 8, 3)).astype(np.float32))
    count = jnp.asarray(rng.integers(0, 9, 16))
    trans = jnp.asarray(rng.uniform(0.1, 1, 16).astype(np.float32))
    t_a = composite_transmittance(trans, ka, count)
    t_b, _ = composite_color(trans, jnp.zeros((16, 3)), ka, kc, count)
    np.testing.assert_allclose(np.asarray(t_a), np.asarray(t_b), rtol=1e-5)
