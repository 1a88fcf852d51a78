"""Chain-parallel scaling benchmark unit.

Measures sampling throughput (RWM steps/s over all chains) as chains are
sharded over 1, 2, ..., all available devices, reporting scaling efficiency
vs the single-device rate — the BASELINE.md ">=80% at 2 hosts" metric,
exercised here on whatever mesh is present (virtual CPU devices in CI, TPU
chips on hardware; chains are communication-free so chip- and host-scaling
behave identically)."""
import time

import numpy as np


def run():
    import jax
    import jax.numpy as jnp

    import mcmc_jl_tpu as mc
    from mcmc_jl_tpu.parallel import run_chains
    from jax.sharding import Mesh

    model = mc.model(lambda v: -jnp.dot(v, v), grad=lambda v: -2 * v,
                     init=jnp.ones(8), check_init=False)
    sampler = mc.HMC(5, 0.2)
    steps = 200
    runner = mc.SerialMC(steps=steps)
    devices = jax.devices()
    chains_per_dev = 64

    def rate(ndev):
        mesh = Mesh(np.array(devices[:ndev]), ("chains",))
        n_chains = chains_per_dev * ndev
        r = run_chains(model, sampler, runner, n_chains, seed=0, mesh=mesh)
        jax.block_until_ready(r[0]["plogtarget"])
        ts = []
        for rep in range(3):
            t0 = time.perf_counter()
            r = run_chains(model, sampler, runner, n_chains, seed=rep + 1,
                           mesh=mesh)
            jax.block_until_ready(r[0]["plogtarget"])
            ts.append(time.perf_counter() - t0)
        return n_chains * steps / float(np.median(ts))

    out = []
    ndevs = sorted({1, 2, len(devices)} & set(range(1, len(devices) + 1)))
    base = None
    for nd in ndevs:
        r = rate(nd)
        out.append((f"scaling: HMC steps/s on {nd} device(s)", r, "steps/s"))
        if nd == 1:
            base = r
        elif base:
            out.append((
                f"scaling: efficiency at {nd} device(s)",
                r / (base * nd) * 100.0, "%",
            ))
    return out
