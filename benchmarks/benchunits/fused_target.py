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

    def fetch(out):
        # device->host fetch INSIDE the timer: block_until_ready does not
        # reliably block through the axon tunnel (bench.py lesson; this
        # unit recorded a 230x-inflated RWM row before this fix)
        return [float(np.asarray(o)) for o in jax.tree_util.tree_leaves(out)]

    fetch(go(jax.random.PRNGKey(0)))
    ts = []
    for rep in range(repeats):
        t0 = time.perf_counter()
        fetch(go(jax.random.PRNGKey(rep + 1)))
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
            return float(jnp.mean(infos["plogtarget"]))  # reduced fetch

        gg(0)  # the fetch inside gg makes the warm-up synchronous too
        ts = []
        for rep in range(2):
            t0 = time.perf_counter()
            gg(rep + 1)
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

    # --- round-4: DATA-BEARING lifted target (the reference's Ornstein
    # AR(1) likelihood, examples/ornstein.jl) — closed-over series hoisted
    # into VMEM rows (ops/pallas_target.lifted_model_block) vs the generic
    # engine at the identical config
    import dataclasses

    import examples.ornstein as oe
    from mcmc_jl_tpu.ops.pallas_target import lifted_model_block
    from mcmc_jl_tpu.parallel.pchains import run_chains

    x = oe.make_series(duration=1000)
    m = dataclasses.replace(oe.make_model(x),
                            init=jnp.asarray([15.0, 0.15, 9.0]))
    logp_block, consts = lifted_model_block(m)
    Co, steps_o, nlo = (2048, 500, 5) if on_tpu else (32, 40, 5)
    inits = jnp.broadcast_to(jnp.asarray(m.init, jnp.float32), (Co, 3))

    def go_lift(key):
        th, infos = run_target_hmc(
            logp_block, 3, Co, steps_o, n_leaps=nlo, eps=0.003, key=key,
            inits=inits, interpret=not on_tpu, consts=consts)
        return jnp.mean(th), jnp.mean(infos["plogtarget"][-1])

    r_lift = _rate(go_lift, Co, steps_o, nlo)
    out.append(("ornstein 3-param x 1000 obs (lifted data): fused "
                "leapfrog/s", r_lift / 1e6, "M/s"))

    Cg = min(Co, 256)

    def go_gen(key):
        infos, _, _ = run_chains(m, mc.HMC(nlo, 0.003),
                                 mc.SerialMC(steps=steps_o), Cg, key=key)
        return jnp.mean(infos["plogtarget"][-1])

    r_gen = _rate(go_gen, Cg, steps_o, nlo)
    out.append(("ornstein 3-param x 1000 obs: generic leapfrog/s",
                r_gen / 1e6, "M/s"))
    out.append(("ornstein lifted fused vs generic (rate ratio)",
                r_lift / max(r_gen, 1e-9), "x"))
    return out
