"""Pallas fused multi-leapfrog HMC for ARBITRARY jax-expressible targets.

The GLM kernel (:mod:`.pallas_glm`) covers posteriors whose log-lik is
elementwise in a linear predictor.  This module generalizes the fused
trajectory to ANY log-density that is a pure jnp function of the parameter
block: the user supplies ``logp_block`` mapping a ``(blk, d_pad)`` chain
block to per-chain log-densities ``(blk, 1)``, and the kernel differentiates
it IN-KERNEL with ``jax.grad`` at trace time — positions, momenta and
gradients stay in VMEM across the whole ``n_leaps`` trajectory, exactly like
the GLM kernel's hot loop.  (Reference hot path: src/samplers/HMC.jl:93-102
x model.evalallg — SURVEY §3.2; this extends the speed-of-light path from
GLM posteriors to the reference's whole bare-distribution benchmark family,
benchmarks/benchunits/bare_distribs.jl.)

Contract for ``logp_block``:
  * pure jnp ops only (it is traced inside the kernel; Mosaic must lower it);
  * no captured array constants — Pallas rejects them; bake parameters as
    Python scalars, synthesize index-dependent masks/values with
    ``jax.lax.broadcasted_iota`` (see :func:`coordwise_logp`), or — for
    real data arrays — take them as explicit ``logp_block(theta, *consts)``
    arguments delivered as VMEM rows (:func:`lifted_model_block` builds
    this automatically from any model closure; structured large data still
    belongs on the GLM kernels);
  * padded lanes (columns >= d) hold zeros and MUST contribute zero to both
    the value and the gradient — :func:`coordwise_logp` builds a compliant
    block function from a per-coordinate logpdf, masking padded lanes with an
    in-support ``safe`` value before evaluation (the double-where pattern, so
    gradients stay finite even when ``logpdf(0) = -inf``).

Momenta are refreshed on live columns only and padded with zeros, so padded
coordinates stay exactly zero through the trajectory.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_glm import LANE, _round_up, _trajectory, pad_chains


def coordwise_logp(logpdf, d, d_pad=None, safe=0.5):
    """Build a kernel-safe ``logp_block`` from a per-coordinate logpdf.

    ``logpdf`` is an elementwise jnp callable (e.g. the catalog logpdfs in
    :mod:`mcmc_jl_tpu.models.distributions` with parameters bound);
    ``safe`` must be an in-support scalar — padded lanes are evaluated there
    (then masked to zero) so out-of-support ``-inf``/``nan`` at the padded
    zeros can never poison the value or the gradient.
    """
    del d_pad  # shape comes from the block; kept for call-site clarity

    def logp_block(theta):
        # the live-lane mask is generated IN-KERNEL via iota: Pallas rejects
        # kernels that capture array constants (they would need to be routed
        # as VMEM inputs), but iota is materialized by Mosaic directly
        live = jax.lax.broadcasted_iota(jnp.int32, theta.shape, 1) < d
        x = jnp.where(live, theta, jnp.asarray(safe, theta.dtype))
        contrib = jnp.where(live, logpdf(x), 0.0)
        return jnp.sum(contrib, axis=1, keepdims=True)

    return logp_block


def _kernel(*refs, logp_block, n_leaps, integrator, vec_eps=False,
            dyn_len=False, n_consts=0):
    """One fused HMC trajectory for a block of chains on a custom target.

    ``vec_eps=True`` reads a per-coordinate (1, d_pad) step-size row instead
    of the SMEM scalar: kick and drift broadcast it column-wise, which IS
    diagonal-mass HMC in theta-space (``eps_j = eps * s_j`` — the identical
    fold the generic engine applies, samplers/hmc.py step) — the warm-start
    pipeline's frozen metric for custom targets (ops/warmstart.py).

    ``dyn_len=True`` reads the leap count from an SMEM scalar: a runtime
    trip count, so ONE compiled kernel serves every Halton-jittered
    trajectory length of a ChEES / NUTS-handoff sampling phase on a
    data-free target (the custom-target analog of pallas_glm's dyn_len).

    ``n_consts > 0``: the target is DATA-BEARING — ``logp_block(theta,
    *consts)`` takes that many hoisted closure constants, delivered as
    replicated (1, size) VMEM rows (see :func:`lifted_model_block`); they
    are read once per launch and stay VMEM-resident across the whole
    trajectory, exactly like the GLM kernel's design matrix."""
    it = iter(refs)
    eps_ref = next(it)
    nl_ref = next(it) if dyn_len else None
    theta_ref, m_ref, grad_ref = (next(it) for _ in range(3))
    const_refs = [next(it) for _ in range(n_consts)]
    theta_out, m_out, grad_out, lp_out = list(it)

    eps = eps_ref[:] if vec_eps else eps_ref[0, 0]
    nl = nl_ref[0, 0] if dyn_len else n_leaps
    consts = [r[:] for r in const_refs]
    lb = (lambda th: logp_block(th, *consts)) if n_consts else logp_block
    grad_only = jax.grad(lambda th: jnp.sum(lb(th)))

    def logp_grad(th):
        # one forward + one backward pass for per-chain values AND gradient
        lp, vjp = jax.vjp(lb, th)
        (g,) = vjp(jnp.ones_like(lp))
        return lp, g

    theta, m, g, lp = _trajectory(theta_ref[:], m_ref[:], grad_ref[:], eps,
                                  grad_only, logp_grad, n_leaps=nl,
                                  integrator=integrator)

    theta_out[:] = theta
    m_out[:] = m
    grad_out[:] = g
    # per-chain scalars ride lane-broadcast (blk, LANE) blocks — Mosaic
    # cannot tile (blk, 1) VMEM blocks (pallas_glm round-1 lesson)
    lp_out[:] = jnp.broadcast_to(lp, lp_out.shape)


def fused_target_leapfrogs(logp_block, theta, m, grad, eps, *, n_leaps=10,
                           block_chains=256, interpret=False,
                           integrator="leapfrog", consts=()):
    """Run ``n_leaps`` fused integrator steps of all chains on a custom
    target.

    Args:
      logp_block: ``(blk, d_pad) -> (blk, 1)`` pure-jnp log-density (see
        module docstring for the padded-lane contract).  Pass a *stable*
        function object — it keys the compile cache.
      theta, m, grad: (C, d_pad) lane-padded chain state (padded cols zero).
      eps: scalar step size, or a (d_pad,)/(1, d_pad) per-coordinate row
        (the diagonal-mass fold — see ``_kernel``).
      consts: hoisted data constants as (1, size) f32 rows for a
        DATA-BEARING ``logp_block(theta, *consts)`` (see
        :func:`lifted_model_block`); replicated into VMEM per block.
    Returns (theta, m, grad, logp) with logp shape (C,).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, d_pad = theta.shape
    assert d_pad % LANE == 0, f"d_pad ({d_pad}) must be lane-padded ({LANE})"
    blk = min(block_chains, C)
    assert C % blk == 0, \
        f"block_chains ({blk}) must evenly divide the chain count ({C})"
    vec_eps = getattr(eps, "ndim", 0) >= 1 and np.size(eps) > 1
    smem_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    if vec_eps:
        eps2 = jnp.reshape(jnp.asarray(eps, jnp.float32), (1, d_pad))
        eps_spec = pl.BlockSpec((1, d_pad), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
    else:
        eps2 = jnp.reshape(jnp.float32(eps), (1, 1))
        eps_spec = smem_spec
    dyn = not isinstance(n_leaps, int)

    grid = (C // blk,)
    chain_spec = pl.BlockSpec((blk, d_pad), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    inputs = [eps2]
    in_specs = [eps_spec]
    if dyn:
        inputs.append(jnp.reshape(jnp.asarray(n_leaps, jnp.int32), (1, 1)))
        in_specs.append(smem_spec)
    inputs += [theta, m, grad]
    in_specs += [chain_spec, chain_spec, chain_spec]
    for c in consts:
        c = jnp.asarray(c)  # native dtype: f32 on TPU, f64 under x64 tests
        assert c.ndim == 2 and c.shape[0] == 1, \
            "consts must be (1, size) rows (lifted_model_block layout)"
        inputs.append(c)
        in_specs.append(pl.BlockSpec(c.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_kernel, logp_block=logp_block,
                          n_leaps=0 if dyn else n_leaps,
                          integrator=integrator, vec_eps=vec_eps,
                          dyn_len=dyn, n_consts=len(consts)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        grid=grid,
        in_specs=in_specs,
        out_specs=[chain_spec, chain_spec, chain_spec,
                   pl.BlockSpec((blk, LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((C, d_pad), theta.dtype),
            jax.ShapeDtypeStruct((C, d_pad), theta.dtype),
            jax.ShapeDtypeStruct((C, d_pad), theta.dtype),
            jax.ShapeDtypeStruct((C, LANE), theta.dtype),
        ],
        interpret=interpret,
    )(*inputs)
    theta, m, grad, lp = out
    return theta, m, grad, lp[:, 0]


def _multistep_kernel(*refs, logp_block, d, n_leaps, k_trans, integrator,
                      n_consts=0):
    """``k_trans`` FULL HMC transitions on a custom target in ONE kernel
    launch: Box-Muller momentum refresh on the hardware PRNG, fused
    trajectory, Metropolis accept — all VMEM-resident; only (theta, grad,
    lp, accept-count) touch HBM per launch.  The custom-target analog of
    pallas_glm._multistep_kernel (VERDICT r2 missing #5: the catalog-target
    path previously launched one trajectory per kernel call)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .pallas_rwm import _normal_hw, _uniform

    it = iter(refs)
    seed_ref, eps_ref, theta_ref = (next(it) for _ in range(3))
    const_refs = [next(it) for _ in range(n_consts)]
    theta_out, grad_out, lp_out, acc_out = list(it)

    pltpu.prng_seed(seed_ref[pl.program_id(0), 0])
    eps = eps_ref[0, 0]
    consts = [r[:] for r in const_refs]
    lb = (lambda th: logp_block(th, *consts)) if n_consts else logp_block
    grad_only = jax.grad(lambda th: jnp.sum(lb(th)))

    def logp_grad(th):
        lp, vjp = jax.vjp(lb, th)
        (g,) = vjp(jnp.ones_like(lp))
        return lp, g

    theta0 = theta_ref[:]
    blk, d_pad = theta0.shape
    live = jax.lax.broadcasted_iota(jnp.int32, (blk, d_pad), 1) < d
    lp0, g0 = logp_grad(theta0)

    def body(_, carry):
        theta, lp, g, acc = carry
        m0 = jnp.where(live, _normal_hw((blk, d_pad)), 0.0)
        logu = jnp.log(1.0 - _uniform((blk, LANE)))[:, 0:1]
        h0 = -lp + 0.5 * jnp.sum(m0 * m0, axis=1, keepdims=True)
        th_p, m, g_p, lp_p = _trajectory(theta, m0, g, eps, grad_only,
                                         logp_grad, n_leaps=n_leaps,
                                         integrator=integrator)
        h = -lp_p + 0.5 * jnp.sum(m * m, axis=1, keepdims=True)
        ratio = h0 - h
        ratio = jnp.where(jnp.isnan(ratio), -jnp.inf, ratio)
        a = (ratio > 0) | (ratio > logu)                   # (blk, 1)
        aw = jnp.broadcast_to(a, theta.shape)
        theta = jnp.where(aw, th_p, theta)
        g = jnp.where(aw, g_p, g)
        lp = jnp.where(a, lp_p, lp)
        return theta, lp, g, acc + a.astype(jnp.float32)

    theta, lp, g, acc = jax.lax.fori_loop(
        0, k_trans, body, (theta0, lp0, g0, jnp.zeros_like(lp0)))

    theta_out[:] = theta
    grad_out[:] = g
    lp_out[:] = jnp.broadcast_to(lp, lp_out.shape)
    acc_out[:] = jnp.broadcast_to(acc / k_trans, acc_out.shape)


@functools.partial(jax.jit, static_argnames=("logp_block", "d", "n_leaps",
                                             "k_trans", "block_chains",
                                             "integrator"))
def _multistep_inner(theta, seeds, eps, *, logp_block, d, n_leaps=10,
                     k_trans=10, block_chains=256, integrator="leapfrog",
                     consts=()):
    """Launch the multi-transition custom-target kernel once.  TPU-only
    (hardware PRNG has no CPU lowering).  Returns (theta, grad, lp (C,),
    accept_rate (C,))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, d_pad = theta.shape
    blk = min(block_chains, C)
    assert C % blk == 0, \
        f"block_chains ({blk}) must evenly divide the chain count ({C})"
    n_blocks = C // blk
    eps2 = jnp.reshape(jnp.float32(eps), (1, 1))
    seeds2 = jnp.reshape(jnp.asarray(seeds, jnp.int32), (n_blocks, 1))

    chain_spec = pl.BlockSpec((blk, d_pad), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((blk, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    inputs = [seeds2, eps2, theta]
    in_specs = [
        pl.BlockSpec((n_blocks, 1), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        chain_spec,
    ]
    for c in consts:
        c = jnp.asarray(c)
        assert c.ndim == 2 and c.shape[0] == 1, \
            "consts must be (1, size) rows (lifted_model_block layout)"
        inputs.append(c)
        in_specs.append(pl.BlockSpec(c.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    theta, grad, lp, acc = pl.pallas_call(
        functools.partial(_multistep_kernel, logp_block=logp_block, d=d,
                          n_leaps=n_leaps, k_trans=k_trans,
                          integrator=integrator, n_consts=len(consts)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[chain_spec, chain_spec, col_spec, col_spec],
        out_shape=[
            jax.ShapeDtypeStruct((C, d_pad), theta.dtype),
            jax.ShapeDtypeStruct((C, d_pad), theta.dtype),
            jax.ShapeDtypeStruct((C, LANE), theta.dtype),
            jax.ShapeDtypeStruct((C, LANE), theta.dtype),
        ],
    )(*inputs)
    return theta, grad, lp[:, 0], acc[:, 0]


def run_target_hmc_multistep(logp_block, d, n_chains, steps, thin=10,
                             n_leaps=10, eps=0.1, seed=0, key=None,
                             inits=None, block_chains=256,
                             integrator="leapfrog", collect=False,
                             consts=()):
    """Sample a custom target with the multi-transition in-kernel-PRNG path.

    ``steps`` transitions run as ``steps // thin`` launches of ``thin``
    in-kernel transitions; infos carry one row per launch (thinned chain:
    ``plogtarget``/``accept_rate`` (+``ppars``/``pgrads`` with collect)).
    TPU-only — use :func:`run_target_hmc` elsewhere.  Statistically
    identical to it (same trajectory/accept math, different PRNG stream)."""
    assert steps % thin == 0, "steps must be divisible by thin"
    d_pad = _round_up(d, LANE)
    if key is None:
        key = jax.random.PRNGKey(seed)
    k_init, k_run = jax.random.split(key)
    if inits is None:
        inits = 0.1 * jax.random.normal(k_init, (n_chains, d),
                                        dtype=jnp.float32)
    theta0 = pad_chains(jnp.asarray(inits, dtype=jnp.float32), d_pad)
    block = min(block_chains, n_chains)
    if n_chains % block != 0:
        from .glm_hmc import _pick_block

        block = _pick_block(n_chains)
    n_blocks = n_chains // block

    @functools.partial(jax.jit, static_argnames=())
    def scan_launches(theta0, key):
        import numpy as np

        def launch(theta, k):
            seeds = jax.random.randint(k, (n_blocks,), 0,
                                       np.int32(2**31 - 1), dtype=jnp.int32)
            theta, g, lp, acc = _multistep_inner(
                theta, seeds, jnp.float32(eps), logp_block=logp_block, d=d,
                n_leaps=n_leaps, k_trans=thin, block_chains=block,
                integrator=integrator, consts=consts)
            info = {"plogtarget": lp, "accept_rate": acc}
            if collect:
                info.update({"ppars": theta[:, :d], "pgrads": g[:, :d]})
            return theta, info

        keys = jax.random.split(key, steps // thin)
        return jax.lax.scan(launch, theta0, keys)

    theta, infos = scan_launches(theta0, k_run)
    return theta[:, :d], infos


_TARGET_PROBE_CACHE = {}


def target_kernel_supported(logp_block, d_pad, blk=128,
                            integrator="leapfrog", vec_eps=False,
                            dyn_len=False, consts=()):
    """Compile-probe the fused custom-target kernel on the current backend.

    A user ``logp_block`` may contain ops Mosaic cannot lower; routing must
    degrade to the generic XLA path instead of hard-failing a production run
    (the round-1 GLM step-kernel lesson).  AOT ``lower().compile()`` on
    abstract avals, cached per (function, shape) signature.
    ``vec_eps=True`` probes the per-coordinate step-size variant the
    warm-start diagonal-mass fold uses; ``dyn_len=True`` the runtime
    trip-count variant of the ChEES / NUTS-handoff phases
    (ops/warmstart.py); ``consts`` the hoisted data rows of a
    data-bearing target (:func:`lifted_model_block`).
    """
    cshapes = tuple((tuple(c.shape), str(jnp.asarray(c).dtype))
                    for c in consts)
    sig = (logp_block, d_pad, blk, integrator, vec_eps, dyn_len, cshapes,
           jax.default_backend())
    hit = _TARGET_PROBE_CACHE.get(sig)
    if hit is not None:
        return hit
    f32 = jax.ShapeDtypeStruct
    cd = f32((blk, d_pad), jnp.float32)
    eps_aval = f32((1, d_pad), jnp.float32) if vec_eps else f32((), jnp.float32)
    extra = [jax.ShapeDtypeStruct((), jnp.int32)] if dyn_len else []
    extra += [jax.ShapeDtypeStruct(c.shape, jnp.asarray(c).dtype)
              for c in consts]

    def probe(th, m, g, eps, *rest):
        it = iter(rest)
        nl = next(it) if dyn_len else 2
        cs = tuple(it)
        return fused_target_leapfrogs(
            logp_block, th, m, g, eps, n_leaps=nl, block_chains=blk,
            integrator=integrator, consts=cs)

    try:
        jax.jit(probe).lower(cd, cd, cd, eps_aval, *extra).compile()
        ok = True
    except Exception as e:  # pragma: no cover - backend-specific
        import logging

        logging.getLogger(__name__).warning(
            "fused custom-target kernel failed to compile on %s (%s); "
            "using the generic XLA path",
            jax.default_backend(), type(e).__name__)
        ok = False
    _TARGET_PROBE_CACHE[sig] = ok
    return ok


@functools.partial(jax.jit, static_argnames=("logp_block", "d", "steps",
                                             "n_leaps", "block_chains",
                                             "interpret", "integrator",
                                             "collect"))
def _run(logp_block, theta0, eps, key, *, d, steps, n_leaps, block_chains,
         interpret, integrator="leapfrog", collect=False, consts=()):
    """Scan ``steps`` fused-HMC transitions on a custom target.

    Trajectory in the kernel, momentum refresh + Metropolis accept in XLA
    (the composed structure measured fastest for the GLM kernel).  Same
    accept rule incl. NaN-reject as the generic engine (samplers/hmc.py).
    ``consts``: hoisted data rows for a data-bearing ``logp_block``
    (see :func:`lifted_model_block`)."""
    C, d_pad = theta0.shape

    def refresh(k):
        m = jax.random.normal(k, (C, d), dtype=theta0.dtype)
        return jnp.pad(m, ((0, 0), (0, d_pad - d)))

    lb = _bind_consts(logp_block, consts)
    grad_only = jax.grad(lambda th: jnp.sum(lb(th)))
    lp0 = lb(theta0)[:, 0]
    g0 = grad_only(theta0)

    def step(carry, k):
        theta, lp, g = carry
        k_mom, k_acc = jax.random.split(k)
        m0 = refresh(k_mom)
        H0 = -lp + 0.5 * jnp.sum(m0 * m0, axis=1)
        p_theta, p_m, p_g, p_lp = fused_target_leapfrogs(
            logp_block, theta, m0, g, eps, n_leaps=n_leaps,
            block_chains=block_chains, interpret=interpret,
            integrator=integrator, consts=consts,
        )
        H = -p_lp + 0.5 * jnp.sum(p_m * p_m, axis=1)
        ratio = H0 - H
        logu = jnp.log(jax.random.uniform(k_acc, (C,), dtype=theta.dtype))
        accept = jnp.where(jnp.isnan(ratio), False,
                           (ratio > 0) | (ratio > logu))
        a = accept[:, None]
        theta = jnp.where(a, p_theta, theta)
        g = jnp.where(a, p_g, g)
        lp = jnp.where(accept, p_lp, lp)
        info = {"plogtarget": lp, "accept": accept}
        if collect:
            # slice the live d columns INSIDE the scan body: the stacked ys
            # dominate the run's HBM footprint and padded lanes are zero
            info.update({"ppars": theta[:, :d], "pgrads": g[:, :d]})
        return (theta, lp, g), info

    keys = jax.random.split(key, steps)
    (theta, lp, g), infos = jax.lax.scan(step, (theta0, lp0, g0), keys)
    return (theta, lp, g), infos


@functools.lru_cache(maxsize=128)
def _model_block_cached(ev, d):
    def logp_block(theta):
        lp = jax.vmap(lambda row: ev(row[:d].astype(jnp.float32)))(theta)
        return jnp.reshape(lp, (theta.shape[0], 1)).astype(theta.dtype)

    return logp_block


#: hoisted-data budget for the lifted path: the rows are replicated into
#: VMEM per chain block alongside the 6 (blk, d_pad) state blocks
MAX_CONST_BYTES = 8 * 1024 * 1024
MAX_CONSTS = 16


def _bind_consts(logp_block, consts):
    """Close a data-bearing ``logp_block(theta, *consts)`` over its hoisted
    rows (identity for data-free blocks) — the one place the binding rule
    lives for the XLA-side value/grad computations."""
    if not consts:
        return logp_block
    return lambda th: logp_block(th, *consts)


@functools.lru_cache(maxsize=128)
def _lifted_block_cached(ev, d):
    th0 = jnp.zeros((d,), jnp.float32)
    # hoist every array the eval closes over into explicit arguments:
    # Pallas rejects captured array constants, but as kernel INPUTS the
    # same data rides replicated VMEM rows like the GLM kernel's design
    # matrix — any data-bearing model whose math Mosaic can lower gets
    # the fused path (e.g. the reference's Ornstein AR(1) likelihood,
    # examples/ornstein.jl).  jax.closure_convert only hoists TRACER
    # constants (its custom-derivative use case); concrete data arrays
    # live in the jaxpr's consts, so we pull them out ourselves and
    # re-evaluate the jaxpr with the consts as runtime arguments.
    # disable_jit inlines the model's jitted eval (a PjitFunction): without
    # it the data stays buried in a nested pjit eqn and consts come out
    # empty (and Mosaic would meet an opaque pjit call inside the kernel).
    with jax.disable_jit():
        closed = jax.make_jaxpr(lambda th: ev(th))(th0)
    # budget check on METADATA, before any device copy: an over-budget
    # model must not pay a (possibly huge) transfer nor pin rejected rows
    # in this cache — the rejection itself is cached (returns None)
    if len(closed.consts) > MAX_CONSTS:
        return None
    if sum(int(np.prod(np.shape(c)) or 1) * np.dtype(c.dtype).itemsize
           for c in closed.consts) > MAX_CONST_BYTES:
        return None
    # cache HOST rows: an lru entry pinning device-resident buffers would
    # hold up to MAX_CONST_BYTES of dead HBM per repeatedly-reconstructed
    # model until eviction; callers jnp.asarray the rows at use time (a
    # cheap re-upload amortized by the per-run compile caches)
    shapes = tuple(tuple(np.shape(c)) for c in closed.consts)
    rows = tuple(np.asarray(c).reshape(1, -1) for c in closed.consts)

    def converted(th, *cs):
        out = jax.core.eval_jaxpr(closed.jaxpr, cs, th)
        return out[0]

    def logp_block(theta, *cs):
        vals = [jnp.reshape(c, s) for c, s in zip(cs, shapes)]
        lp = jax.vmap(lambda row: converted(row[:d].astype(jnp.float32),
                                            *vals))(theta)
        return jnp.reshape(lp, (theta.shape[0], 1)).astype(theta.dtype)

    return logp_block, rows


def lifted_model_block(model):
    """Kernel-ready ``(logp_block, consts)`` from ANY model ``eval`` whose
    math Mosaic can lower — closed-over data arrays are hoisted from the
    eval's jaxpr into explicit ``(1, size)`` VMEM rows (``consts``).
    Data-free models return ``consts == ()`` and behave exactly like
    :func:`model_block_fn`.  Returns ``None`` when the hoisted data
    exceeds the VMEM budget (``MAX_CONST_BYTES``/``MAX_CONSTS``) — such
    models belong on the GLM kernels (structured large data) or the
    generic engine.  Cached (rejections included) on
    ``(model.eval, model.size)``.
    """
    try:
        return _lifted_block_cached(model.eval, model.size)
    except Exception:  # exotic evals may not trace under disable_jit
        return None


def run_target_hmc_sharded(logp_block, d, n_chains, steps, mesh=None,
                           axis="chains", n_leaps=10, eps=0.1, seed=0,
                           key=None, inits=None, block_chains=256,
                           interpret=False, integrator="leapfrog",
                           consts=()):
    """Mesh-sharded fused custom-target HMC: chains split over ``mesh[axis]``.

    The multi-chip version of :func:`run_target_hmc`, mirroring
    :func:`mcmc_jl_tpu.ops.glm_hmc.run_glm_hmc_sharded`: each device runs
    the fused kernel on its local chain shard; chains are independent, so
    the hot loop uses NO collectives (SURVEY §3.5 — the property that makes
    the reference's prun embarrassingly parallel).  Per-device streams =
    ``fold_in(key, axis index)``.
    """
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    import numpy as np

    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (axis,))
    n_dev = mesh.shape[axis]
    assert n_chains % n_dev == 0, (
        f"n_chains ({n_chains}) must be divisible by the '{axis}' mesh "
        f"axis size ({n_dev})")
    c_local = n_chains // n_dev

    d_pad = _round_up(d, LANE)
    if key is None:
        key = jax.random.PRNGKey(seed)
    k_init, k_run = jax.random.split(key)
    if inits is None:
        inits = 0.1 * jax.random.normal(k_init, (n_chains, d), jnp.float32)
    theta0 = pad_chains(jnp.asarray(inits, jnp.float32), d_pad)
    block = min(block_chains, c_local)
    if c_local % block != 0:
        from .glm_hmc import _pick_block

        block = _pick_block(c_local)
    run_keys = jax.vmap(lambda i: jax.random.fold_in(k_run, i))(
        jnp.arange(n_dev))

    def local_run(th0, keys):
        # consts close over: shard_map lifts them as replicated operands
        (theta, lp, g), infos = _run(
            logp_block, th0, jnp.float32(eps), keys[0], d=d, steps=steps,
            n_leaps=n_leaps, block_chains=block, interpret=interpret,
            integrator=integrator, consts=consts)
        return theta, infos

    # check_vma=False: the Pallas calls inside the per-device body
    # are opaque to shard_map's varying-mesh-axes checker (it cannot
    # see that the kernel treats operands as device-local), so the
    # check rejects valid programs.  Correctness is gated by the
    # sharded-vs-unsharded equivalence tests instead
    # (tests/test_sharded.py, test_warmfused sharded gates, the
    # bign 2x4-vs-1x1 test) — a regression breaks those, not this.
    fn = shard_map(local_run, mesh=mesh,
                   in_specs=(P(axis), P(axis)),
                   out_specs=(P(axis), P(None, axis)),
                   check_vma=False)
    theta, infos = fn(theta0, run_keys)
    return theta[:, :d], infos


def model_block_fn(model):
    """Kernel-safe ``logp_block`` from a model's ``eval`` via in-kernel vmap.

    Rows are sliced to the model's live ``d`` columns before ``eval`` sees
    them, so padded lanes contribute nothing to value or gradient.  Works
    for any data-free model whose ``eval`` Mosaic can lower (DSL-built
    catalog targets, custom closures over scalars); models that close over
    data arrays are rejected by Pallas (captured array constants) and the
    compile probe routes them back to the generic engine.

    Cached on ``(model.eval, model.size)`` so repeated runs of the same
    model return the SAME function object — the compile-probe and jit caches
    key on it.
    """
    return _model_block_cached(model.eval, model.size)


def fused_target_chains(model, sampler, runner, n_chains, key,
                        interpret=None):
    """Run ``n_chains`` plain-HMC chains on an arbitrary model (data-free,
    or data-bearing via the lifted-constant path) through the fused
    custom-target kernel; protocol-compatible with
    :func:`mcmc_jl_tpu.ops.glm_hmc.fused_hmc_chains` (f32 compute,
    post-accept info keys, exact-resume final states)."""
    from .glm_hmc import final_hmc_states

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = model.size
    lifted = lifted_model_block(model)
    assert lifted is not None, \
        "model data exceeds the lifted-kernel budget (routing bug)"
    logp_block, consts = lifted
    inits = jnp.broadcast_to(jnp.asarray(model.init, jnp.float32),
                             (n_chains, d))
    theta, infos = run_target_hmc(
        logp_block, d, n_chains, runner.len, n_leaps=sampler.n_leaps,
        eps=sampler.leap_step, key=key, inits=inits, interpret=interpret,
        integrator=sampler.integrator, collect=True, consts=consts)
    # recompute final lp/grad shape inputs for the resume states
    d_pad = _round_up(d, LANE)
    thetaF = pad_chains(jnp.asarray(theta, jnp.float32), d_pad)
    lpF = infos["plogtarget"][-1]
    gF = pad_chains(infos["pgrads"][-1].astype(jnp.float32), d_pad)
    states = final_hmc_states(model, sampler, n_chains, runner.len,
                              thetaF, lpF, gF)
    return infos, states


def fused_mala_target_chains(model, sampler, runner, n_chains, key,
                             interpret=None):
    """Plain MALA on a bounded custom target through the fused kernel —
    the one-leapfrog-HMC equivalence of
    :func:`mcmc_jl_tpu.ops.glm_hmc.fused_mala_chains` (MALA.jl:65-126)."""
    from ..samplers.base import tuner_init
    from ..samplers.hmc import HMC
    from ..samplers.mala import MALAState

    shim = HMC(1, float(np.sqrt(sampler.scale)))
    infos, hstates = fused_target_chains(model, shim, runner, n_chains,
                                         key, interpret=interpret)
    bcast = lambda a: jnp.broadcast_to(a, (n_chains,) + a.shape)  # noqa: E731
    tune = jax.tree_util.tree_map(bcast, tuner_init(sampler.scale))
    states = MALAState(pars=hstates.pars, logtarget=hstates.logtarget,
                       grad=hstates.grad, tune=tune, i=hstates.i)
    return infos, states


def run_target_hmc(logp_block, d, n_chains, steps, n_leaps=10, eps=0.1,
                   seed=0, key=None, inits=None, block_chains=256,
                   interpret=False, integrator="leapfrog", collect=False,
                   consts=()):
    """Sample a custom target with the fused Pallas HMC path.

    ``logp_block`` per the module contract (use :func:`coordwise_logp` for
    iid-coordinate targets, :func:`lifted_model_block` for data-bearing
    models — pass its ``consts`` through here).  Returns (theta (C, d),
    infos) like :func:`mcmc_jl_tpu.ops.glm_hmc.run_glm_hmc`.
    """
    d_pad = _round_up(d, LANE)
    if key is None:
        key = jax.random.PRNGKey(seed)
    k_init, k_run = jax.random.split(key)
    if inits is None:
        inits = 0.1 * jax.random.normal(k_init, (n_chains, d),
                                        dtype=jnp.float32)
    theta0 = pad_chains(jnp.asarray(inits, dtype=jnp.float32), d_pad)
    block = min(block_chains, n_chains)
    if n_chains % block != 0:
        from .glm_hmc import _pick_block

        block = _pick_block(n_chains)
    (theta, _, _), infos = _run(
        logp_block, theta0, jnp.float32(eps), k_run, d=d, steps=steps,
        n_leaps=n_leaps, block_chains=block, interpret=interpret,
        integrator=integrator, collect=collect, consts=consts,
    )
    if collect:
        infos = {k: (v[..., :d] if v.ndim == 3 else v)
                 for k, v in infos.items()}
    return theta[:, :d], infos
