"""Fused multi-step RWM kernel (ops/pallas_rwm.py) — input-noise path vs an
XLA reference composition, statistics, thinning semantics.  (The hardware-
PRNG path has no CPU lowering; it is validated on-chip by
tests/test_tpu_compile.py and the benchunit.)
"""
import jax
import jax.numpy as jnp
import numpy as np

from mcmc_jl_tpu.ops.pallas_glm import LANE, pad_chains
from mcmc_jl_tpu.ops.pallas_rwm import fused_target_rwm_steps, run_target_rwm

f32 = jnp.float32


def _normal_block(mu=0.5, sigma=2.0, d=4):
    def logp_block(theta):
        live = jax.lax.broadcasted_iota(jnp.int32, theta.shape, 1) < d
        contrib = -0.5 * ((theta - mu) / sigma) ** 2
        return jnp.sum(jnp.where(live, contrib, 0.0), axis=1, keepdims=True)

    return logp_block


def test_fused_rwm_matches_xla_composition():
    d, C, K = 4, 8, 6
    logp_block = _normal_block(d=d)
    rng = np.random.default_rng(0)
    theta = pad_chains(jnp.asarray(rng.standard_normal((C, d)) * 0.3, f32),
                       LANE)
    scale_row = jnp.zeros((1, LANE), f32).at[0, :d].set(0.7)
    z = jnp.asarray(rng.standard_normal((C, K * LANE)), f32)
    # zero noise on padded lanes comes from scale_row, not z
    logu_cols = jnp.asarray(np.log(rng.random((C, K))), f32)
    logu = jnp.repeat(logu_cols, LANE, axis=1)

    th_k, lp_k, acc_k = fused_target_rwm_steps(
        logp_block, theta, scale_row, k_steps=K, z=z, logu=logu,
        block_chains=C, interpret=True, noise="input")

    # XLA reference with identical draws
    th = theta
    lp = logp_block(th)[:, 0]
    n_acc = np.zeros(C)
    for k in range(K):
        prop = th + scale_row * z[:, k * LANE:(k + 1) * LANE]
        lp_p = logp_block(prop)[:, 0]
        ratio = np.asarray(lp_p - lp)
        a = (ratio > 0) | (ratio > np.asarray(logu_cols[:, k]))
        th = jnp.where(jnp.asarray(a)[:, None], prop, th)
        lp = jnp.where(jnp.asarray(a), lp_p, lp)
        n_acc += a

    np.testing.assert_allclose(np.asarray(th_k), np.asarray(th),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lp_k), np.asarray(lp),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc_k), n_acc / K, atol=1e-6)
    assert np.all(np.asarray(th_k)[:, d:] == 0)  # padded lanes untouched


def test_run_target_rwm_statistics():
    d, mu, sigma = 3, 0.5, 2.0
    theta, infos = run_target_rwm(
        _normal_block(mu=mu, sigma=sigma, d=d), d, n_chains=128,
        steps=600, thin=10, scale=1.2, seed=4, interpret=True)
    assert infos["ppars"].shape == (60, 128, d)
    acc = float(np.mean(np.asarray(infos["accept_rate"])))
    assert 0.1 < acc < 0.9, acc
    draws = np.asarray(infos["ppars"])[30:].reshape(-1, d)
    se = sigma / np.sqrt(len(draws) / 10)  # crude ESS discount
    assert abs(draws.mean() - mu) < 5 * se, (draws.mean(), se)
    assert abs(draws.std() - sigma) < 0.3, draws.std()


def test_run_target_rwm_out_of_support_rejects():
    from mcmc_jl_tpu.ops.pallas_target import coordwise_logp
    from mcmc_jl_tpu.models.distributions import Gamma

    d = 2
    blockfn = coordwise_logp(lambda x: Gamma(2.0, 1.0).logpdf(x), d, safe=1.0)
    theta, infos = run_target_rwm(
        blockfn, d, n_chains=32, steps=200, thin=5, scale=0.8, seed=1,
        inits=np.full((32, d), 1.5, np.float32), interpret=True)
    lp = np.asarray(infos["plogtarget"])
    assert np.all(np.isfinite(lp))
    assert np.all(np.asarray(theta) > 0)


def test_fused_rwm_ks_gate():
    """KS gate (reference threshold) on the fused RWM path: pooled draws
    from many chains vs the exact Normal CDF."""
    import scipy.stats as st

    d, mu, sigma = 1, 1.0, 1.0
    theta, infos = run_target_rwm(
        _normal_block(mu=mu, sigma=sigma, d=d), d, n_chains=256,
        steps=800, thin=10, scale=2.4, seed=7, interpret=True)
    draws = np.asarray(infos["ppars"])[40:, :, 0].ravel()  # post-warmup
    xs = np.sort(draws)
    y = st.norm(mu, sigma).cdf(xs)
    dn = np.max(np.abs(np.arange(1, len(xs) + 1) / len(xs) - y))
    # thinned draws are weakly dependent: use the reference's loose gate
    assert np.sqrt(len(xs)) * dn < 10, np.sqrt(len(xs)) * dn
