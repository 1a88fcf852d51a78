"""Slice sampler (Neal 2003) — reference: src/samplers/slice_sample.jl.

The reference ships this as a standalone function (never wired into the
runner stack; used by test/test_ss.jl only — SURVEY §2.3 "orphan").  We keep
the same standalone surface but compile the whole history as a single
``lax.scan`` over iterations, sweeping coordinates with ``fori_loop`` and
using bounded ``while_loop``s for the step-out and shrink phases (dynamic
shapes don't exist under XLA; the iteration caps are generous and a
shrink-to-point aborts the coordinate instead of raising, mirroring the
reference's assert at slice_sample.jl:99).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_STEPOUT = 1000
MAX_SHRINK = 1000


def slice_sample(logdist, initial, niter, widths=None, step_out=True, burnin=0,
                 seed=0, key=None):
    """Multivariate (coordinate-wise) slice sampling.

    Returns the (niter, D) history for array initial values; a scalar initial
    value returns shape (niter,) (the reference's univariate interface,
    slice_sample.jl:110-113).
    """
    initial_arr = jnp.atleast_1d(jnp.asarray(initial, dtype=jnp.result_type(float)))
    scalar = jnp.ndim(initial) == 0
    D = initial_arr.shape[0]
    if widths is None:
        widths = jnp.ones((D,), dtype=initial_arr.dtype)
    else:
        widths = jnp.broadcast_to(
            jnp.asarray(widths, dtype=initial_arr.dtype), (D,)
        )
    if key is None:
        key = jax.random.PRNGKey(seed)

    if scalar:
        f = lambda x: logdist(x[0])  # noqa: E731
    else:
        f = logdist

    history = _slice_scan(f, initial_arr, int(niter), int(burnin), widths,
                          bool(step_out), key)
    return np.asarray(history[:, 0] if scalar else history)


@partial(jax.jit, static_argnames=("logdist", "niter", "burnin", "step_out"))
def _slice_scan(logdist, initial, niter, burnin, widths, step_out, key):
    D = initial.shape[0]

    def sweep_dim(dd, carry):
        state, log_px, key = carry
        key, k_u, k_r, k_shrink = jax.random.split(key, 4)
        log_uprime = jnp.log(jax.random.uniform(k_u, (), dtype=state.dtype)) + log_px
        w = widths[dd]

        r = jax.random.uniform(k_r, (), dtype=state.dtype)
        x_l = state.at[dd].add(-r * w)
        x_r = state.at[dd].add((1.0 - r) * w)

        if step_out:
            def out_cond_l(c):
                x, it = c
                return (logdist(x) > log_uprime) & (it < MAX_STEPOUT)

            def out_body_l(c):
                x, it = c
                return x.at[dd].add(-w), it + 1

            x_l, _ = jax.lax.while_loop(out_cond_l, out_body_l, (x_l, 0))

            def out_cond_r(c):
                x, it = c
                return (logdist(x) > log_uprime) & (it < MAX_STEPOUT)

            def out_body_r(c):
                x, it = c
                return x.at[dd].add(w), it + 1

            x_r, _ = jax.lax.while_loop(out_cond_r, out_body_r, (x_r, 0))

        # shrink until accepted (slice_sample.jl:85-101)
        def shr_cond(c):
            _, _, _, accepted, it, _ = c
            return (~accepted) & (it < MAX_SHRINK)

        def shr_body(c):
            xl, xr, xp, _, it, k = c
            k, ks = jax.random.split(k)
            u = jax.random.uniform(ks, (), dtype=state.dtype)
            xi = u * (xr[dd] - xl[dd]) + xl[dd]
            xp = xp.at[dd].set(xi)
            lp = logdist(xp)
            accepted = lp > log_uprime
            xr = jnp.where(~accepted & (xi > state[dd]), xr.at[dd].set(xi), xr)
            xl = jnp.where(~accepted & (xi < state[dd]), xl.at[dd].set(xi), xl)
            return xl, xr, xp, accepted, it + 1, k

        _, _, xprime, _, _, _ = jax.lax.while_loop(
            shr_cond, shr_body, (x_l, x_r, state, jnp.asarray(False), 0, k_shrink)
        )
        new_state = state.at[dd].set(xprime[dd])
        return new_state, logdist(new_state), key

    def one_iter(carry, _):
        state, log_px, key = carry
        state, log_px, key = jax.lax.fori_loop(0, D, sweep_dim,
                                               (state, log_px, key))
        return (state, log_px, key), state

    carry0 = (initial, logdist(initial), key)
    (_, _, _), hist = jax.lax.scan(one_iter, carry0, None, length=niter + burnin)
    return hist[burnin:]
