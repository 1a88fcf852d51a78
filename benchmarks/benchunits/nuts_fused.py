"""Exact-NUTS fused tree kernel vs the generic engine, and the opt-in
warm handoff measured where it is claimed to win (VERDICT r4 next #2/#4).

Three contenders on the headline logistic 10x1000 posterior, identical
(steps, burnin, maxdoublings) budgets:

* generic exact NUTS (vmapped engine, per-leaf value_and_grad cost);
* EXACT fused NUTS (ops/pallas_nuts.py): the same sampler, whole tree
  build per kernel launch;
* the opt-in warm HANDOFF (frozen empirical length through the dyn-len
  HMC kernel — gives up the per-step U-turn rule).

Rows: transitions/s and pooled min-ESS/s at 256 AND 1024 chains (the
handoff's round-4 32-chain rows were latency-bound noise; the claim it
wins at scale must be measured at scale or retracted — BENCH.md).
"""
import time

import numpy as np


def _data(n=1000, nbeta=10):
    rng = np.random.default_rng(1)
    X = np.column_stack([np.ones(n), rng.standard_normal((n, nbeta - 1))])
    beta0 = rng.standard_normal(nbeta)
    Y = (rng.random(n) < 1.0 / (1.0 + np.exp(-X @ beta0))).astype(float)
    return X, Y


def _min_ess(x):
    from mcmc_jl_tpu.stats.var import mcvar_iid, mcvar_imse

    kept = x.shape[0]
    tot = 0.0
    for c in range(x.shape[1]):
        tot += float(np.min(kept * mcvar_iid(x[:, c]) / mcvar_imse(x[:, c])))
    return tot


def run():
    import jax
    import jax.numpy as jnp

    import mcmc_jl_tpu as mc
    from mcmc_jl_tpu.parallel import run_chains
    from mcmc_jl_tpu.ops.warmstart import (warmfused_nuts_chains,
                                           warmfused_nuts_exact_chains)

    on_tpu = jax.default_backend() == "tpu"
    X, Y = _data()
    model = mc.model(glm=("logistic", X, Y))
    md = 6
    if on_tpu:
        chain_counts = (256, 1024)
        steps, burnin = 1500, 500
    else:
        chain_counts = (32,)
        steps, burnin = 400, 150
    kept = steps - burnin
    runner = mc.SerialMC(steps=steps, burnin=burnin)
    out = []

    def fetch(infos):
        return float(jnp.mean(infos["plogtarget"][-1]))

    def time_run(fn):
        fn()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    store = {}
    for C in chain_counts:
        ess_chains = min(32, C)

        def ess_per_s(key, dt):
            x = np.asarray(jax.device_get(
                store[key]["ppars"][burnin:, :ess_chains]))
            return _min_ess(x) * (C / ess_chains) / dt

        # --- generic exact NUTS (the round-4 baseline path) --------------
        s_gen = mc.NUTS(maxdoublings=md)

        def run_generic(seed=0):
            infos, _, _ = run_chains(model, s_gen, runner, C, seed=seed,
                                     jitter=0.1)
            store["gen"] = infos
            return fetch(infos)

        dt = time_run(run_generic)
        out.append((f"nuts x{C}: generic exact transitions/s",
                    C * steps / dt, "trans/s"))
        out.append((f"nuts x{C}: generic exact min-ESS/s",
                    ess_per_s("gen", dt), "ess/s"))
        rate_gen = C * steps / dt

        # --- EXACT fused NUTS (same sampler, fused tree kernel) ----------
        def run_exact(seed=0):
            infos, states = warmfused_nuts_exact_chains(
                model, s_gen, runner, C, key=jax.random.PRNGKey(seed),
                interpret=not on_tpu)
            store["exact"] = infos
            store["states"] = states
            return fetch(infos)

        dt = time_run(run_exact)
        out.append((f"nuts x{C}: EXACT fused transitions/s",
                    C * steps / dt, "trans/s"))
        out.append((f"nuts x{C}: EXACT fused vs generic (rate ratio)",
                    (C * steps / dt) / rate_gen, "x"))
        essps_exact = ess_per_s("exact", dt)
        out.append((f"nuts x{C}: EXACT fused min-ESS/s", essps_exact,
                    "ess/s"))

        # --- opt-in warm handoff (dyn-len HMC kernel, no U-turn rule) ----
        s_ho = mc.NUTS(maxdoublings=md, warm_handoff=True)

        def run_handoff(seed=0):
            infos, _ = warmfused_nuts_chains(
                model, s_ho, runner, C, key=jax.random.PRNGKey(seed),
                interpret=not on_tpu)
            store["ho"] = infos
            return fetch(infos)

        dt = time_run(run_handoff)
        essps_ho = ess_per_s("ho", dt)
        out.append((f"nuts x{C}: warm-handoff transitions/s",
                    C * steps / dt, "trans/s"))
        out.append((f"nuts x{C}: warm-handoff min-ESS/s", essps_ho,
                    "ess/s"))
        out.append((f"nuts x{C}: handoff vs EXACT fused (ESS/s ratio)",
                    essps_ho / max(essps_exact, 1e-12), "x"))

        # --- sampling-PHASE-only rates: frozen states, generic vs fused
        # tree kernel (the end-to-end rows above dilute the fused phase
        # with the shared generic warmup)
        states = store["states"]

        class _Blk:  # continuation shim: no further adaptation fires
            len = kept
            burnin = 0
            thinning = 1

        def run_phase_gen(seed=0):
            infos, _, _ = run_chains(model, s_gen, _Blk, C,
                                     key=jax.random.PRNGKey(seed),
                                     states=states)
            return fetch(infos)

        dt_pg = time_run(run_phase_gen)
        out.append((f"nuts x{C}: PHASE generic transitions/s",
                    C * kept / dt_pg, "trans/s"))

        from mcmc_jl_tpu.ops.warmstart import fused_continue_chains

        def run_phase_fused(seed=0):
            infos, _ = fused_continue_chains(
                model, s_gen, states, kept, jax.random.PRNGKey(seed),
                interpret=not on_tpu)
            return fetch(infos)

        dt_pf = time_run(run_phase_fused)
        out.append((f"nuts x{C}: PHASE fused transitions/s",
                    C * kept / dt_pf, "trans/s"))
        out.append((f"nuts x{C}: PHASE fused vs generic (rate ratio)",
                    dt_pg / dt_pf, "x"))
    return out
