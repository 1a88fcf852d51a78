"""Headline benchmark: effective HMC leapfrog steps/s/chip on the Bayesian
logistic-regression example (the reference's benchmark workload:
benchmarks/benchunits/binomial.jl, 10 params x 1000 obs).

Baseline (BASELINE.md): the reference evaluates loglik+gradient in 0.748 ms
=> ~1337 leapfrog steps/s on 2013-era CPU.  The TPU build's north star is
>=1e6 leapfrog/s/chip.  Here thousands of chains are vmapped into one
lax.scan so every leapfrog is a batched (C,d)x(d,N) matmul pair on the MXU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

import numpy as np

REFERENCE_LEAPFROG_RATE = 1.0 / 0.748e-3  # ≈1337/s (BASELINE.md, binomial.jl:24)


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache (TPU remote-compiles are expensive)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import mcmc_jl_tpu as mc
    from mcmc_jl_tpu.parallel import run_chains

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)

    # --- the reference's logistic model (examples/logistic_regression.jl) --
    n, nbeta = 1000, 10
    rng = np.random.default_rng(1)
    Xh = np.column_stack([np.ones(n), rng.standard_normal((n, nbeta - 1))])
    beta0 = rng.standard_normal(nbeta)
    Yh = (rng.random(n) < 1.0 / (1.0 + np.exp(-Xh @ beta0))).astype(np.float64)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    X = jnp.asarray(Xh, dtype=dtype)
    Y = jnp.asarray(Yh, dtype=dtype)

    def logp(theta):
        # vars ~ Normal(0,1); Y ~ Bernoulli(sigmoid(X @ vars))
        logits = X @ theta
        ll = jnp.dot(Y, logits) - jnp.sum(jnp.logaddexp(0.0, logits))
        prior = -0.5 * jnp.dot(theta, theta) - 0.5 * nbeta * np.log(2 * np.pi)
        return ll + prior

    model = mc.model(logp, gradient=True, init=jnp.zeros(nbeta, dtype=dtype),
                     check_init=False)

    n_leaps = 10
    sampler = mc.HMC(n_leaps, 0.05)
    n_chains = 2048 if on_tpu else 64
    steps = 100 if on_tpu else 20
    runner = mc.SerialMC(steps=steps)

    # warm-up (compile)
    infos, states, _ = run_chains(model, sampler, runner, n_chains, seed=0,
                                  jitter=0.1)
    jax.block_until_ready(infos["plogtarget"])

    # timed runs (steady state)
    best = np.inf
    for rep in range(3):
        t0 = time.perf_counter()
        infos, states, _ = run_chains(model, sampler, runner, n_chains,
                                      seed=rep + 1, jitter=0.1)
        jax.block_until_ready(infos["plogtarget"])
        best = min(best, time.perf_counter() - t0)

    leapfrogs = n_chains * steps * n_leaps
    rate = leapfrogs / best

    # sanity: chains must actually be sampling (finite logp, some accepts)
    acc = float(np.mean(np.asarray(infos["accept"])))
    lp = np.asarray(infos["plogtarget"])
    assert np.all(np.isfinite(lp)), "non-finite log-targets in bench run"
    assert acc > 0.05, f"acceptance collapsed: {acc}"

    print(json.dumps({
        "metric": "hmc_leapfrog_steps_per_sec_per_chip_logistic_1000x10",
        "value": round(rate, 1),
        "unit": "leapfrog/s",
        "vs_baseline": round(rate / REFERENCE_LEAPFROG_RATE, 1),
    }))


if __name__ == "__main__":
    main()
