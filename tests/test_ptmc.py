"""Batched replica-exchange tempering (runners/ptmc.py) — the TPU-native
ladder SURVEY §2.4 prescribes for SerialTempMC's workload."""
import jax.numpy as jnp
import numpy as np

import mcmc_jl_tpu as mc


def _bimodal(st=0.35):
    return mc.model(
        lambda v: jnp.sum(jnp.logaddexp(
            mc.Normal(-4.0, st).logpdf(v), mc.Normal(4.0, st).logpdf(v)
        )), grad=None, init=jnp.asarray([4.0]),
        gradient=True, check_init=True,
    )


def test_ptmc_crosses_modes_and_swaps():
    m = _bimodal()
    runner = mc.PTMC(steps=8000, burnin=1000, swap_period=5,
                     betas=(0.02, 0.08, 0.25, 0.6, 1.0))
    chain = mc.run(m * mc.RWM(0.5) * runner, seed=0)
    x = chain.samples.values[:, 0]
    frac_left = np.mean(x < 0)
    assert 0.2 < frac_left < 0.8, frac_left
    # swaps actually happen
    assert chain.diagnostics["nswaps"].sum() > 50
    # cold-rung marginal sd ~ sqrt(0.35^2 + 16) ~ 4.02 for the mode mixture
    assert 3.0 < x.std() < 5.0


def test_ptmc_gaussian_moments_with_hmc():
    m = mc.model(lambda v: -0.5 * jnp.dot(v, v), grad=lambda v: -v,
                 init=jnp.ones(3))
    runner = mc.PTMC(steps=4000, burnin=1000, swap_period=10,
                     betas=(0.3, 1.0))
    chain = mc.run(m * mc.HMC(5, 0.5) * runner, seed=1)
    x = chain.samples.values
    assert np.all(np.abs(x.mean(0)) < 0.15)
    np.testing.assert_allclose(x.std(0, ddof=1), 1.0, rtol=0.15)
    assert mc.acceptance(chain) > 50


def test_ptmc_validates_ladder():
    import pytest

    with pytest.raises(AssertionError):
        mc.PTMC(betas=(1.0, 0.5))
    with pytest.raises(AssertionError):
        mc.PTMC(betas=(0.2, 0.7))
