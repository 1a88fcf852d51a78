"""Kernel-safe special functions (ops/special.py) vs jax.scipy exact."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy import special as jsp

from mcmc_jl_tpu.ops import special


def test_log_ndtr_accuracy_f64():
    """Pure approximation error (f64 eval): < 4e-6 abs over [-38, 8]."""
    z = jnp.asarray(np.linspace(-38.0, 8.0, 100001))
    err = np.abs(np.asarray(special.log_ndtr(z) - jsp.log_ndtr(z)))
    assert err.max() < 4e-6, err.max()


def test_log_ndtr_f32_and_grad():
    z = jnp.asarray(np.linspace(-30.0, 8.0, 20001), jnp.float32)
    ours = np.asarray(special.log_ndtr(z), np.float64)
    ref = np.asarray(jsp.log_ndtr(z.astype(jnp.float64)))
    # f32: absolute where the value is O(1), relative in the deep tail
    assert np.all(np.abs(ours - ref) <= 4e-6 + 3e-7 * np.abs(ref))
    g = jax.vmap(jax.grad(special.log_ndtr))(z)
    assert np.all(np.isfinite(np.asarray(g)))
    # gradient is the inverse Mills ratio phi/Phi; check against exact
    g_ref = jax.vmap(jax.grad(jsp.log_ndtr))(z.astype(jnp.float64))
    np.testing.assert_allclose(np.asarray(g, np.float64), np.asarray(g_ref),
                               rtol=5e-4, atol=1e-5)


def test_ndtr_matches():
    z = jnp.asarray(np.linspace(-8.0, 8.0, 4001))
    np.testing.assert_allclose(np.asarray(special.ndtr(z)),
                               np.asarray(jsp.ndtr(z)), atol=5e-7)
