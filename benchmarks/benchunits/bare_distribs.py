"""Bare-distribution benchmark unit (reference: benchunits/bare_distribs.jl).

Times loglik eval and loglik+gradient on a length-1000 iid vector for a
sweep of distributions — the reference's per-distribution rows in
benchlog.csv."""
import time

import numpy as np


def _timeit(f, inner=20, repeats=5):
    import jax

    f()
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            r = f()
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def run():
    import jax
    import jax.numpy as jnp

    import mcmc_jl_tpu as mc

    cases = [
        ("Normal(1,1)", lambda: mc.Normal(1.0, 1.0), 1.0),
        ("Cauchy(0,1)", lambda: mc.Cauchy(0.0, 1.0), 0.0),
        ("Exponential(3)", lambda: mc.Exponential(3.0), 3.0),
        ("Gamma(3,0.2)", lambda: mc.Gamma(3.0, 0.2), 0.6),
        ("Laplace(0,1)", lambda: mc.Laplace(0.0, 1.0), 0.0),
    ]
    out = []
    for name, mk, x0 in cases:
        def ex(x, _mk=mk):
            mc.tilde(x, _mk())

        m = mc.model(ex, gradient=True, x=np.full(1000, x0 + 0.5),
                     check_init=False)
        t = _timeit(lambda m=m: m.eval(m.init))
        out.append((f"{name} on vector of 1000: loglik eval", t * 1e3, "ms"))
        t = _timeit(lambda m=m: m.evalallg(m.init))
        out.append((f"{name} on vector of 1000: loglik+grad", t * 1e3, "ms"))
    return out
