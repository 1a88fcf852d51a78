"""Fused custom-target kernel vs generic engine on catalog targets.

The reference's bare-distribution rows (benchunits/bare_distribs.jl) time
single loglik/grad evals; the MCMC-relevant number is HMC transition
throughput on those targets.  This unit measures leapfrog/s of the fused
Pallas custom-target path (ops/pallas_target.py) against the generic
vmapped engine on iid catalog targets — the non-GLM analog of the headline
GLM bench.
"""
import time

import numpy as np


def _rate(go, C, steps, n_leaps, repeats=3):
    import jax

    out = go(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    ts = []
    for rep in range(repeats):
        t0 = time.perf_counter()
        out = go(jax.random.PRNGKey(rep + 1))
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return C * steps * n_leaps / float(np.median(ts))


def run():
    import jax
    import jax.numpy as jnp

    import mcmc_jl_tpu as mc
    from mcmc_jl_tpu.ops.pallas_target import (coordwise_logp,
                                               run_target_hmc)

    on_tpu = jax.default_backend() == "tpu"
    # CPU (test) config stays tiny; TPU measures a real block
    C, steps, n_leaps, d = (4096, 300, 10, 10) if on_tpu else (64, 20, 5, 10)

    cases = [
        ("Normal(1,1)", mc.Normal(1.0, 1.0), 1.0, 0.8),
        ("Gamma(3,0.2)", mc.Gamma(3.0, 0.2), 0.6, 0.05),
        ("Laplace(0,1)", mc.Laplace(0.0, 1.0), 0.0, 0.5),
    ]
    out = []
    for name, dist, x0, eps in cases:
        blockfn = coordwise_logp(lambda x, dd=dist: dd.logpdf(x), d,
                                 safe=x0 + 0.5)
        inits = np.full((C, d), x0 + 0.5, np.float32)

        def go(key, fn=blockfn, i=inits):
            th, infos = run_target_hmc(
                fn, d, C, steps, n_leaps=n_leaps, eps=eps, key=key,
                inits=i, interpret=not on_tpu)
            return jnp.mean(th), jnp.mean(infos["accept"])

        r = _rate(go, C, steps, n_leaps)
        out.append((f"fused-target HMC {name} d={d}: leapfrog/s",
                    r / 1e6, "M/s"))

        # generic engine comparison (smaller chain count — it is slower)
        Cg = 256 if on_tpu else 16
        m = mc.model(lambda v, dd=dist: jnp.sum(dd.logpdf(v)),
                     gradient=True, init=jnp.full((d,), x0 + 0.5),
                     check_init=False)
        from mcmc_jl_tpu.parallel import run_chains

        def gg(seed, m=m):
            infos, _, _ = run_chains(
                m, mc.HMC(n_leaps, eps), mc.SerialMC(steps=steps), Cg,
                seed=seed)
            return infos["plogtarget"]

        gg(0)
        ts = []
        for rep in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(gg(rep + 1))
            ts.append(time.perf_counter() - t0)
        rg = Cg * steps * n_leaps / float(np.median(ts))
        out.append((f"generic HMC {name} d={d}: leapfrog/s", rg / 1e6,
                    "M/s"))

    # fused multi-step RWM (hardware PRNG on TPU; the reference's
    # "100 RWM steps" workload, benchunits/binomial.jl:25 analog)
    from mcmc_jl_tpu.ops.pallas_rwm import run_target_rwm

    Cr, steps_r, thin = (16384, 10000, 100) if on_tpu else (64, 60, 10)
    dist0, x0 = cases[0][1], cases[0][2]
    blockfn = coordwise_logp(lambda x, dd=dist0: dd.logpdf(x), d,
                             safe=x0 + 0.5)

    def gr(key):
        th, infos = run_target_rwm(
            blockfn, d, Cr, steps_r, scale=1.1, thin=thin, key=key,
            block_chains=1024 if on_tpu else 64,
            interpret=not on_tpu)
        return jnp.mean(th), jnp.mean(infos["accept_rate"])

    rr = _rate(gr, Cr, steps_r, 1)
    out.append((f"fused RWM {cases[0][0]} d={d} (thin={thin}): "
                "transitions/s", rr / 1e6, "M/s"))
    return out
