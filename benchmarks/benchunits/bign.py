"""Large-N likelihood benchmark unit (ops/pallas_glm_bign.py).

SURVEY §2.4's data axis: the reference's benchmark likelihood at N=1000
scaled up.  Times the N-tiled (logp, gradient) kernel per evaluation with
the design matrix STAGED ON DEVICE (the steady-state of any real run —
re-uploading X each call would measure the host tunnel).  CPU runs use an
interpret-sized problem; TPU the real large-N shapes.
"""
import time

import numpy as np


def run():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from mcmc_jl_tpu.ops.pallas_glm_bign import (glm_logp_grad_tiled,
                                                 pad_design_tiled)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        configs = [(100_000, 4096, 8192), (1_000_000, 1024, 8192)]
        G = 20
    else:
        configs = [(4096, 64, 1024)]
        G = 5
    rng = np.random.default_rng(1)
    out = []
    for N, C, tn in configs:
        X = rng.standard_normal((N, 10)).astype(np.float32)
        Y = (rng.random(N) < 0.5).astype(np.float32)
        XT, Y2, W, d_pad, _ = pad_design_tiled(X, Y, tile_n=tn)
        th0 = jnp.asarray(np.pad(
            0.01 * rng.standard_normal((C, 10)).astype(np.float32),
            ((0, 0), (0, d_pad - 10))))
        use_w = W is not None

        @partial(jax.jit, static_argnames=("tn",))
        def scan(XT, Y2, W, th, tn):
            def body(th, _):
                kw = dict(tile_n=tn, block_chains=min(256, C),
                          interpret=not on_tpu)
                if use_w:
                    kw.update(weights=W, _use_w=True)
                lp, g = glm_logp_grad_tiled(XT, Y2, th, **kw)
                return th + 1e-6 * g, jnp.sum(lp)

            th, lps = jax.lax.scan(body, th, None, length=G)
            return lps[-1]

        float(scan(XT, Y2, W, th0, tn))  # compile + stage
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(scan(XT, Y2, W, th0, tn))
            ts.append(time.perf_counter() - t0)
        per_grad = float(np.median(ts)) / G
        out.append((f"bign: logistic 10x{N} loglik+grad, C={C} chains "
                    f"(N-tiled kernel)", per_grad * 1e3, "ms"))
        out.append((f"bign: leapfrog/s at 10x{N}, C={C}",
                    C / per_grad, "leapfrog/s"))

    # --- round-4: ChEES x big-N (VERDICT r3 missing #4's benchlog row) ---
    # the dynamic-length flagship sampler composed with the N-tiled kernel:
    # full warm pipeline (pooled adaptation -> frozen (eps, T) -> traced
    # trip-count XLA loop around the tiled gradient) at N=1e5
    import mcmc_jl_tpu as mc
    from mcmc_jl_tpu.ops.warmstart import warmfused_chees_chains

    if on_tpu:
        Nc, Cc, burnin, steps = 100_000, 512, 100, 400
    else:  # CPU: N just over BIGN_THRESHOLD so the tiled route engages
        Nc, Cc, burnin, steps = 20_000, 8, 30, 60
    X = rng.standard_normal((Nc, 10)).astype(np.float32)
    Y = (rng.random(Nc) < 0.5).astype(np.float32)
    m = mc.model(glm=("logistic", X, Y))
    s = mc.ChEESHMC(len0=0.3, max_leaps=32)
    r = mc.SerialMC(steps=steps, burnin=burnin)

    def go(seed):
        infos, _ = warmfused_chees_chains(m, s, r, Cc,
                                          key=jax.random.PRNGKey(seed),
                                          interpret=not on_tpu)
        float(jnp.mean(infos["plogtarget"][-1]))  # reduced stop-clock fetch
        return infos

    go(0)  # compile + warm
    t0 = time.perf_counter()
    infos = go(1)
    dt = time.perf_counter() - t0
    # count EVERY integrated leapfrog (warmup rows included — the timer
    # spans them too; lengths are chain-shared, so column 0 x Cc is exact)
    leaps = float(np.sum(np.asarray(infos["nleaps"])[:, 0])) * Cc
    out.append((f"bign: ChEES warm-fused transitions/s at 10x{Nc}, C={Cc} "
                f"(warmup incl)", Cc * steps / dt, "trans/s"))
    out.append((f"bign: ChEES warm-fused leapfrog/s at 10x{Nc}, C={Cc} "
                f"(warmup incl)", leaps / dt, "leapfrog/s"))
    return out
