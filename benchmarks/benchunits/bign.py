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
    return out
