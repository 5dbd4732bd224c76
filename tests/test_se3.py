"""SE(3) property tests: exp/log roundtrip, composition, inverse, transform
(SURVEY.md §4 test strategy: property tests for SE(3))."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from svo_tpu.geometry import se3


def random_se3(rng, n=16, max_angle=1.0, max_trans=5.0):
    w = rng.normal(size=(n, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0, max_angle, (n, 1))
    t = rng.uniform(-max_trans, max_trans, (n, 3))
    R = Rotation.from_rotvec(w).as_matrix()
    T = np.tile(np.eye(4), (n, 1, 1))
    T[:, :3, :3] = R
    T[:, :3, 3] = t
    return T.astype(np.float32)


def test_exp_log_roundtrip(rng):
    xi = rng.normal(size=(32, 6)).astype(np.float32) * 0.5
    T = se3.exp(jnp.asarray(xi))
    xi2 = se3.log(T)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=2e-5)


def test_exp_small_angle(rng):
    xi = rng.normal(size=(8, 6)).astype(np.float32) * 1e-6
    T = np.asarray(se3.exp(jnp.asarray(xi)))
    # First-order: T ~ I + hat4(xi)
    expected = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    expected[:, :3, 3] = xi[:, :3]
    np.testing.assert_allclose(T, expected, atol=1e-5)


def test_exp_matches_scipy(rng):
    w = rng.normal(size=(16, 3)).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_compose_inverse(rng):
    T = random_se3(rng)
    Tinv = np.asarray(se3.inverse(jnp.asarray(T)))
    prod = np.einsum("nij,njk->nik", T, Tinv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (16, 1, 1)), atol=1e-5)


def test_transform_points(rng):
    T = random_se3(rng, n=4)
    X = rng.normal(size=(4, 10, 3)).astype(np.float32)
    Y = np.asarray(se3.transform(jnp.asarray(T), jnp.asarray(X)))
    Xh = np.concatenate([X, np.ones((4, 10, 1))], axis=-1)
    Y_ref = np.einsum("nij,npj->npi", T, Xh)[..., :3]
    np.testing.assert_allclose(Y, Y_ref, atol=1e-4)


def test_orthogonalize(rng):
    R = random_se3(rng, n=8)[:, :3, :3] + rng.normal(size=(8, 3, 3)) * 0.01
    Ro = np.asarray(se3.orthogonalize(jnp.asarray(R.astype(np.float32))))
    should_be_eye = np.einsum("nij,nkj->nik", Ro, Ro)
    np.testing.assert_allclose(should_be_eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    assert np.all(np.linalg.det(Ro) > 0.99)
