"""C++ CPU oracle vs the JAX paths (cross-backend equivalence, the
reference's test/walsh.py:51-59 python==cpp pattern)."""

import numpy as np
import jax
import pytest

from whvi_tpu.ops import build_H, fwht_butterfly, fwht_kron, whvi_mul
from whvi_tpu.ops.cpu_oracle import fwht_cpp, oracle_available, whvi_mul_cpp

pytestmark = pytest.mark.skipif(
    not oracle_available(), reason="C++ oracle failed to build"
)


@pytest.mark.parametrize("D", [2, 16, 128, 1024])
def test_cpp_fwht_matches_dense(D):
    rng = np.random.RandomState(0)
    x = rng.randn(7, D).astype(np.float64)
    got = fwht_cpp(x)
    want = x @ np.asarray(build_H(D)).astype(np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-9)


def test_cpp_fwht_f32_and_batchdims():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 64).astype(np.float32)
    got = fwht_cpp(x)
    want = np.asarray(fwht_butterfly(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_cpp_matches_jax_backends():
    rng = np.random.RandomState(2)
    x = rng.randn(5, 256).astype(np.float32)
    a = fwht_cpp(x)
    b = np.asarray(fwht_butterfly(x))
    c = np.asarray(fwht_kron(x))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-3)


def test_cpp_whvi_mul_oracle():
    rng = np.random.RandomState(3)
    D, B = 64, 6
    s1 = rng.randn(D).astype(np.float32)
    u = rng.randn(D).astype(np.float32)
    s2 = rng.randn(D).astype(np.float32)
    x = rng.randn(B, D).astype(np.float32)
    got = whvi_mul_cpp(s1, u, s2, x)
    want = np.asarray(whvi_mul(*map(np.asarray, (s1, u, s2, x))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_cpp_involution():
    rng = np.random.RandomState(4)
    x = rng.randn(4, 32).astype(np.float64)
    np.testing.assert_allclose(fwht_cpp(fwht_cpp(x)), 32 * x, rtol=1e-10)
