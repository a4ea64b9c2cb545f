import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hidegs_tpu.core import transforms as T


def rand_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_rotmat_orthonormal():
    q = rand_quats(jax.random.PRNGKey(0), 64)
    R = T.quat_to_rotmat(q)
    eye = jnp.eye(3)[None].repeat(64, axis=0)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(64), atol=1e-5)


def test_quat_identity():
    R = T.quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(R, jnp.eye(3), atol=1e-6)


def test_quat_roundtrip():
    q = rand_quats(jax.random.PRNGKey(1), 128)
    q2 = T.rotmat_to_quat(T.quat_to_rotmat(q))
    # q and -q are the same rotation
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, jnp.ones(128), atol=1e-4)


def test_covariance_psd_and_eigvals():
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    scale = jnp.exp(jax.random.normal(k1, (32, 3)) * 0.5)
    q = rand_quats(k2, 32)
    cov = T.build_covariance_3d(scale, q)
    np.testing.assert_allclose(cov, jnp.swapaxes(cov, -1, -2), atol=1e-5)
    eig = np.linalg.eigvalsh(np.array(cov))
    expected = np.sort(np.array(scale) ** 2, axis=-1)
    np.testing.assert_allclose(eig, expected, rtol=1e-3, atol=1e-5)


def test_symm6_roundtrip():
    key = jax.random.PRNGKey(3)
    scale = jnp.exp(jax.random.normal(key, (8, 3)))
    q = rand_quats(key, 8)
    cov = T.build_covariance_3d(scale, q)
    np.testing.assert_allclose(T.symm6_to_covariance(T.covariance_to_symm6(cov)), cov, atol=1e-6)


def test_smallest_axis_is_eigvec():
    key = jax.random.PRNGKey(4)
    k1, k2 = jax.random.split(key)
    scale = jnp.exp(jax.random.normal(k1, (16, 3)))
    q = rand_quats(k2, 16)
    n = T.smallest_axis(scale, q)
    cov = T.build_covariance_3d(scale, q)
    # n should be the eigenvector of the smallest eigenvalue: cov @ n = s_min^2 n
    smin2 = jnp.min(scale, axis=-1) ** 2
    lhs = jnp.einsum("nij,nj->ni", cov, n)
    np.testing.assert_allclose(lhs, smin2[:, None] * n, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.norm(n, axis=-1), jnp.ones(16), atol=1e-5)


def test_inverse_sigmoid():
    x = jnp.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(jax.nn.sigmoid(T.inverse_sigmoid(x)), x, atol=1e-6)
