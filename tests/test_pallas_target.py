"""Fused custom-target HMC kernel (ops/pallas_target.py) — interpret-mode
correctness vs a plain-XLA leapfrog composition, padded-lane invariants,
and statistical gates.  (Mosaic lowering on real TPU is covered by
tests/test_tpu_compile.py::test_target_kernel_compiles_on_tpu.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcmc_jl_tpu.ops.pallas_glm import LANE, pad_chains
from mcmc_jl_tpu.ops.pallas_target import (
    coordwise_logp, fused_target_leapfrogs, run_target_hmc,
)

f32 = jnp.float32


def _normal_block(mu=0.5, sigma=2.0, d=6):
    def logp_block(theta):
        live = jax.lax.broadcasted_iota(jnp.int32, theta.shape, 1) < d
        contrib = -0.5 * ((theta - mu) / sigma) ** 2
        return jnp.sum(jnp.where(live, contrib, 0.0), axis=1, keepdims=True)

    return logp_block


def _xla_leapfrogs(logp_block, theta, m, eps, n_leaps):
    grad = jax.grad(lambda th: jnp.sum(logp_block(th)))
    g = grad(theta)
    for _ in range(n_leaps):
        m = m + 0.5 * eps * g
        theta = theta + eps * m
        g = grad(theta)
        m = m + 0.5 * eps * g
    return theta, m, g, logp_block(theta)[:, 0]


def test_fused_trajectory_matches_xla_composition():
    d, C = 6, 8
    logp_block = _normal_block(d=d)
    rng = np.random.default_rng(0)
    theta = pad_chains(jnp.asarray(rng.standard_normal((C, d)) * 0.3, f32),
                       LANE)
    m = pad_chains(jnp.asarray(rng.standard_normal((C, d)), f32), LANE)
    grad = jax.grad(lambda th: jnp.sum(logp_block(th)))(theta)

    th_k, m_k, g_k, lp_k = fused_target_leapfrogs(
        logp_block, theta, m, grad, 0.2, n_leaps=5, block_chains=C,
        interpret=True)
    th_x, m_x, g_x, lp_x = _xla_leapfrogs(logp_block, theta, m, f32(0.2), 5)

    np.testing.assert_allclose(np.asarray(th_k), np.asarray(th_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lp_k), np.asarray(lp_x),
                               rtol=1e-5, atol=1e-5)
    # padded lanes stay exactly zero through the trajectory
    assert np.all(np.asarray(th_k)[:, 6:] == 0)
    assert np.all(np.asarray(g_k)[:, 6:] == 0)


def test_coordwise_logp_safe_masking():
    """A target with logpdf(0) = -inf (Gamma-like) must still give finite
    values and gradients on the padded block."""
    from mcmc_jl_tpu.models.distributions import Gamma

    d = 4
    dist = Gamma(2.0, 1.5)
    logp_block = coordwise_logp(lambda x: dist.logpdf(x), d, LANE, safe=1.0)

    theta = pad_chains(jnp.asarray([[0.5, 1.0, 2.0, 3.0]], f32), LANE)
    lp = logp_block(theta)
    want = float(jnp.sum(dist.logpdf(jnp.asarray([0.5, 1.0, 2.0, 3.0], f32))))
    np.testing.assert_allclose(float(lp[0, 0]), want, rtol=1e-5)

    g = jax.grad(lambda th: jnp.sum(logp_block(th)))(theta)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.all(np.asarray(g)[:, d:] == 0)


def test_run_target_hmc_statistics():
    """Posterior moments of N(0.5, 2^2)^3 within MC error (interpret mode)."""
    d, mu, sigma = 3, 0.5, 2.0
    logp_block = _normal_block(mu=mu, sigma=sigma, d=d)
    theta, infos = run_target_hmc(
        logp_block, d, n_chains=64, steps=400, n_leaps=8, eps=0.9,
        seed=2, interpret=True)
    acc = float(np.mean(np.asarray(infos["accept"])))
    assert acc > 0.5, acc
    # pool the last half across chains: 64 x 200 draws
    draws = np.asarray(infos["ppars"]) if "ppars" in infos else None
    assert draws is None  # collect=False by default: no trajectories stored
    assert np.asarray(theta).shape == (64, d)
    # final positions of 64 chains after 400 transitions are ~iid target
    m_hat = np.asarray(theta).mean()
    se = sigma / np.sqrt(64 * d)
    assert abs(m_hat - mu) < 4 * se, (m_hat, se)


def test_run_target_hmc_collect_and_out_of_support():
    """collect=True emits trajectories; an out-of-support-capable target
    (Gamma) never yields non-finite logtarget (rejection, not poison)."""
    from mcmc_jl_tpu.models.distributions import Gamma

    d = 2
    dist = Gamma(3.0, 1.0)
    logp_block = coordwise_logp(lambda x: dist.logpdf(x), d, safe=1.0)
    theta, infos = run_target_hmc(
        logp_block, d, n_chains=16, steps=100, n_leaps=4, eps=0.2, seed=3,
        inits=np.full((16, d), 2.5, np.float32), interpret=True,
        collect=True)
    assert infos["ppars"].shape == (100, 16, d)
    assert infos["pgrads"].shape == (100, 16, d)
    lp = np.asarray(infos["plogtarget"])
    assert np.all(np.isfinite(lp)), lp[~np.isfinite(lp)]
    assert np.all(np.asarray(theta) > 0)


@pytest.mark.parametrize("integrator", ["2stage", "3stage"])
def test_fused_target_integrators(integrator):
    """Multi-stage integrators run through the same kernel body and conserve
    energy better than leapfrog at equal step size."""
    d, C = 4, 8
    logp_block = _normal_block(mu=0.0, sigma=1.0, d=d)
    rng = np.random.default_rng(1)
    theta = pad_chains(jnp.asarray(rng.standard_normal((C, d)) * 0.5, f32),
                       LANE)
    m = pad_chains(jnp.asarray(rng.standard_normal((C, d)), f32), LANE)
    g = jax.grad(lambda th: jnp.sum(logp_block(th)))(theta)

    def energy_drift(integ):
        th, mm, _, lp = fused_target_leapfrogs(
            logp_block, theta, m, g, 0.5, n_leaps=6, block_chains=C,
            interpret=True, integrator=integ)
        H0 = -logp_block(theta)[:, 0] + 0.5 * jnp.sum(m * m, axis=1)
        H = -lp + 0.5 * jnp.sum(mm * mm, axis=1)
        return float(jnp.mean(jnp.abs(H - H0)))

    assert energy_drift(integrator) < energy_drift("leapfrog")


def test_sharded_target_hmc_matches_per_device_runs():
    """shard_map'd fused custom-target path == per-device unsharded runs,
    bitwise (chains independent; no collectives in the hot loop)."""
    import jax
    from jax.sharding import Mesh

    from mcmc_jl_tpu.ops.pallas_target import (_run,
                                               run_target_hmc_sharded)

    d = 5
    logp_block = _normal_block(mu=0.3, sigma=1.5, d=d)
    n_dev, C, steps = 4, 16, 25
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("chains",))
    key = jax.random.PRNGKey(9)
    theta, infos = run_target_hmc_sharded(
        logp_block, d, n_chains=C, steps=steps, mesh=mesh, n_leaps=3,
        eps=0.4, key=key, interpret=True)
    assert theta.shape == (C, d)
    assert infos["plogtarget"].shape == (steps, C)

    k_init, k_run = jax.random.split(key)
    inits = 0.1 * jax.random.normal(k_init, (C, d), jnp.float32)
    th0 = pad_chains(inits, LANE)
    c = C // n_dev
    for i in range(n_dev):
        ki = jax.random.fold_in(k_run, i)
        (th_i, _, _), infos_i = _run(
            logp_block, th0[i * c:(i + 1) * c], jnp.float32(0.4), ki,
            d=d, steps=steps, n_leaps=3, block_chains=c, interpret=True,
            integrator="leapfrog", collect=False)
        np.testing.assert_array_equal(
            np.asarray(theta[i * c:(i + 1) * c]),
            np.asarray(th_i[:, :d]))
        np.testing.assert_array_equal(
            np.asarray(infos["plogtarget"][:, i * c:(i + 1) * c]),
            np.asarray(infos_i["plogtarget"]))


def test_fused_target_hmc_ks_gate():
    """KS gate (reference threshold) on the fused HMC target path."""
    import scipy.stats as st

    d = 1
    theta, infos = run_target_hmc(
        _normal_block(mu=1.0, sigma=1.0, d=d), d, n_chains=256, steps=300,
        n_leaps=5, eps=0.5, seed=5, interpret=True, collect=True)
    draws = np.asarray(infos["ppars"])[100:, :, 0].ravel()
    xs = np.sort(draws)
    y = st.norm(1.0, 1.0).cdf(xs)
    dn = np.max(np.abs(np.arange(1, len(xs) + 1) / len(xs) - y))
    assert np.sqrt(len(xs)) * dn < 10, np.sqrt(len(xs)) * dn
