"""Fused-kernel HMC driver for GLM posteriors.

Couples the Pallas trajectory kernel (:mod:`.pallas_glm`) with the
Metropolis accept/refresh logic in plain XLA: per outer step, momenta are
refreshed, the whole ``n_leaps`` trajectory runs inside one kernel launch,
and the accept test is a (C,)-vector op.  This is the speed-of-light path
for the benchmark workload; statistically identical to
``HMC(n_leaps, eps)`` on the same model (same leapfrog, same accept rule —
reference HMC.jl:136-165).

Momenta are drawn only on the ``d`` live columns (padded lanes masked to
zero), so padded coordinates stay exactly zero through the trajectory and
``plogtarget`` is the exact model log-density — no phantom dimensions in the
Hamiltonian or the diagnostics.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_glm import (glm_hmc_leapfrogs, glm_hmc_step, pad_chains,
                         pad_design)


@partial(jax.jit, static_argnames=("d", "steps", "n_leaps", "block_chains",
                                   "interpret", "mxu_dtype", "kind", "lam",
                                   "collect", "integrator", "fused_step"))
def _run(XT, Y, theta0, eps, key, *, d, steps, n_leaps, block_chains,
         interpret, mxu_dtype=jnp.float32, kind="logistic", W=None, O=None,
         lam=1.0, lam_vec=None, collect=False, integrator="leapfrog",
         fused_step=False):
    """Scan ``steps`` fused-HMC transitions for all chains.

    ``collect=False`` (bench mode) emits only (plogtarget, accept) per step;
    ``collect=True`` additionally emits the post-accept ppars/pgrads so the
    fused path can stand in for the generic multi-chain engine.  Pre-step
    values are NOT emitted — they are exact duplicates of the previous step's
    post-accept values, and the extra (steps, C, d_pad) buffers would double
    the scan-output HBM footprint.

    ``fused_step=True`` runs the whole transition (trajectory + Metropolis
    accept) inside one kernel launch (pallas_glm.py ``_step_kernel``);
    ``False`` launches only the trajectory kernel and does accept/select in
    XLA — the fallback the public entries route to if the step kernel fails
    to lower on the local toolchain (see :func:`step_kernel_supported`).
    ``lam_vec`` (traced (1, d_pad), padded lanes = 1) replaces the static
    scalar ``lam`` with a per-coordinate prior precision — the vector-prior
    path the warm-start pipeline uses to fold a diagonal mass metric into
    the kernel (ops/warmstart.py).
    """
    C, d_pad = theta0.shape
    from .pallas_glm import is_mat_prior, link_terms
    ll_fn, resid_fn = link_terms(kind)
    prior = lam if lam_vec is None else lam_vec
    mat = lam_vec is not None and is_mat_prior(lam_vec)

    def prior_term(theta):
        # scalar/vector prior: elementwise; dense-mass fold: theta @ A
        if mat:
            return jnp.dot(theta, prior, preferred_element_type=jnp.float32)
        return prior * theta

    def refresh(k):
        # momenta live only on the d real columns (padded theta stays exactly
        # 0 through the trajectory).  Drawing (C, d) and zero-padding costs
        # ~d/d_pad of the threefry work of drawing the full (C, d_pad) block
        # and masking — at the bench config that is 10/128 of ~2.1M normals
        # per transition.
        m = jax.random.normal(k, (C, d), dtype=theta0.dtype)
        return jnp.pad(m, ((0, 0), (0, d_pad - d)))

    def logp_grad(theta):
        logits = jnp.dot(theta, XT, preferred_element_type=jnp.float32)
        if O is not None:
            logits = logits + O
        r = resid_fn(logits, Y)
        ll = ll_fn(logits, Y)
        if W is not None:
            r, ll = W * r, W * ll
        pt = prior_term(theta)
        g = jnp.dot(r, XT.T, preferred_element_type=jnp.float32) - pt
        lp = jnp.sum(ll, axis=1) - 0.5 * jnp.sum(pt * theta, axis=1)
        return lp, g

    lp0, g0 = logp_grad(theta0)

    def step_fused(carry, k):
        # refresh noise + MH uniforms in XLA (same stream as the composed
        # path); the whole transition — kick/drift trajectory, Hamiltonian,
        # accept-select — runs inside ONE kernel launch, so the (C, d_pad)
        # state never round-trips HBM between refresh and accept.
        theta, lp, g = carry
        k_mom, k_acc = jax.random.split(k)
        m0 = refresh(k_mom)
        logu = jnp.log(jax.random.uniform(k_acc, (C, 1), dtype=theta.dtype))
        theta, g, lp2, acc = glm_hmc_step(
            XT, Y, theta, g, lp[:, None], m0, logu, eps, n_leaps=n_leaps,
            block_chains=block_chains, interpret=interpret,
            mxu_dtype=mxu_dtype, kind=kind,
            weights=W, offsets=O, prior_prec=prior, integrator=integrator,
        )
        lp = lp2[:, 0]
        info = {"plogtarget": lp, "accept": acc[:, 0] > 0.5}
        if collect:
            # slice the live d columns INSIDE the scan body: the stacked ys
            # are the run's dominant HBM footprint, and the padded lanes are
            # identically zero (d_pad/d is 12.8x at the bench shape)
            info.update({"ppars": theta[:, :d], "pgrads": g[:, :d]})
        return (theta, lp, g), info

    def step_composed(carry, k):
        # trajectory in the kernel, refresh + Metropolis in XLA; one extra
        # HBM round-trip of the (C, d_pad) state per transition.
        theta, lp, g = carry
        k_mom, k_acc = jax.random.split(k)
        m0 = refresh(k_mom)
        H0 = -lp + 0.5 * jnp.sum(m0 * m0, axis=1)
        p_theta, p_m, p_g, p_lp = glm_hmc_leapfrogs(
            XT, Y, theta, m0, g, eps, n_leaps=n_leaps,
            block_chains=block_chains, interpret=interpret,
            mxu_dtype=mxu_dtype, kind=kind,
            weights=W, offsets=O, prior_prec=prior, integrator=integrator,
        )
        H = -p_lp + 0.5 * jnp.sum(p_m * p_m, axis=1)
        ratio = H0 - H
        logu = jnp.log(jax.random.uniform(k_acc, (C, 1),
                                          dtype=theta.dtype))[:, 0]
        accept = jnp.where(jnp.isnan(ratio), False,
                           (ratio > 0) | (ratio > logu))
        a = accept[:, None]
        theta = jnp.where(a, p_theta, theta)
        g = jnp.where(a, p_g, g)
        lp = jnp.where(accept, p_lp, lp)
        info = {"plogtarget": lp, "accept": accept}
        if collect:
            info.update({"ppars": theta[:, :d], "pgrads": g[:, :d]})
        return (theta, lp, g), info

    step = step_fused if fused_step else step_composed
    keys = jax.random.split(key, steps)
    (theta, lp, g), infos = jax.lax.scan(step, (theta0, lp0, g0), keys)
    return (theta, lp, g), infos


@partial(jax.jit, static_argnames=("d", "n_launches", "k_trans", "n_leaps",
                                   "block_chains", "mxu_dtype", "kind",
                                   "lam", "integrator", "collect"))
def _run_multistep(XT, Y, theta0, eps, key, *, d, n_launches, k_trans,
                   n_leaps, block_chains, mxu_dtype=jnp.float32,
                   kind="logistic", W=None, O=None, lam=1.0, lam_vec=None,
                   integrator="leapfrog", collect=False):
    """Scan ``n_launches`` multi-transition kernel launches (TPU only).

    Each launch runs ``k_trans`` full HMC transitions with refresh noise and
    Metropolis uniforms drawn from the in-kernel hardware PRNG
    (pallas_glm._multistep_kernel) — infos carry one thinned row per launch:
    ``plogtarget``/``accept_rate`` (+``ppars``/``pgrads`` with collect)."""
    from .pallas_glm import _multistep_inner

    C = theta0.shape[0]
    n_blocks = C // min(block_chains, C)

    def launch(theta, k):
        from .pallas_glm import is_mat_prior

        seeds = jax.random.randint(k, (n_blocks,), 0, np.int32(2**31 - 1),
                                   dtype=jnp.int32)
        mat = lam_vec is not None and is_mat_prior(lam_vec)
        vec = lam_vec is not None and not mat
        theta, g, lp, acc = _multistep_inner(
            XT, Y, theta, seeds, eps, d=d, n_leaps=n_leaps, k_trans=k_trans,
            block_chains=block_chains, mxu_dtype=mxu_dtype, kind=kind,
            weights=W, offsets=O,
            prior_prec=lam_vec if lam_vec is not None else lam,
            _use_w=W is not None, _use_o=O is not None,
            _unit_prior=lam_vec is None and float(lam) == 1.0,
            _vec_prior=vec, _mat_prior=mat,
            integrator=integrator)
        info = {"plogtarget": lp, "accept_rate": acc}
        if collect:
            info.update({"ppars": theta[:, :d], "pgrads": g[:, :d]})
        return theta, info

    keys = jax.random.split(key, n_launches)
    return jax.lax.scan(launch, theta0, keys)


def run_glm_hmc_multistep(X, Y, n_chains, steps, thin=10, n_leaps=10,
                          eps=0.05, seed=0, key=None, inits=None,
                          block_chains=256, mxu_dtype=jnp.float32,
                          kind="logistic", weights=None, offsets=None,
                          prior_prec=1.0, integrator="leapfrog",
                          collect=False):
    """Sample a GLM posterior with the multi-transition in-kernel-PRNG path.

    ``steps`` transitions run as ``steps // thin`` launches of ``thin``
    in-kernel transitions; infos carry one row per launch (thinned chain).
    TPU-only: the hardware PRNG has no CPU lowering — use
    :func:`run_glm_hmc` elsewhere.  Statistically identical to
    ``run_glm_hmc`` (same trajectory/accept math; different PRNG stream).
    """
    assert steps % thin == 0, "steps must be divisible by thin"
    XT, Y2, d_pad = pad_design(X, Y)
    N = XT.shape[1]
    d = X.shape[1]
    if key is None:
        key = jax.random.PRNGKey(seed)
    k_init, k_run = jax.random.split(key)
    if inits is None:
        inits = 0.1 * jax.random.normal(k_init, (n_chains, d),
                                        dtype=jnp.float32)
    theta0 = pad_chains(jnp.asarray(inits, dtype=jnp.float32), d_pad)
    block = min(block_chains, n_chains)
    if n_chains % block != 0:
        block = _pick_block(n_chains)
    W = (None if weights is None
         else jnp.reshape(jnp.asarray(weights, jnp.float32), (1, N)))
    O = (None if offsets is None
         else jnp.reshape(jnp.asarray(offsets, jnp.float32), (1, N)))
    theta, infos = _run_multistep(
        XT, Y2, theta0, jnp.float32(eps), k_run, d=d,
        n_launches=steps // thin, k_trans=thin, n_leaps=n_leaps,
        block_chains=block, mxu_dtype=mxu_dtype, kind=kind, W=W, O=O,
        lam=float(prior_prec), integrator=integrator, collect=collect)
    if collect:
        infos = {k: (v[..., :d] if v.ndim == 3 else v)
                 for k, v in infos.items()}
    return theta[:, :d], infos


_STEP_PROBE_CACHE = {}
_TRAJ_PROBE_CACHE = {}


def trajectory_kernel_supported(d_pad, N, blk, kind="logistic", use_w=False,
                                use_o=False, unit_prior=True,
                                vec_prior=False, mat_prior=False,
                                dyn_len=False, integrator="leapfrog"):
    """Compile-probe the fused trajectory kernel on the current backend.

    The built-in links are TPU-validated, but a custom ``(ll, resid)`` pair
    may contain ops Mosaic cannot lower (e.g. ``erf``/``lgamma`` applied to
    the data) — auto-routing must degrade to the generic engine instead of
    hard-failing mid-run.  AOT ``lower().compile()``, cached per signature.
    """
    import jax

    sig = (d_pad, N, blk, kind if isinstance(kind, str) else id(kind),
           use_w, use_o, unit_prior, vec_prior, mat_prior, dyn_len,
           integrator, jax.default_backend())
    hit = _TRAJ_PROBE_CACHE.get(sig)
    if hit is not None:
        return hit
    f32 = jax.ShapeDtypeStruct
    cd = f32((blk, d_pad), jnp.float32)
    extra = []
    if use_w:
        extra.append(f32((1, N), jnp.float32))
    if use_o:
        extra.append(f32((1, N), jnp.float32))
    if vec_prior:
        extra.append(f32((1, d_pad), jnp.float32))
    if mat_prior:
        extra.append(f32((d_pad, d_pad), jnp.float32))
    if dyn_len:
        extra.append(jax.ShapeDtypeStruct((), jnp.int32))

    def probe(XT, Y, th, m, g, eps, *wo):
        kw = dict(n_leaps=2, block_chains=blk, interpret=False, kind=kind,
                  prior_prec=1.0 if unit_prior else 0.5,
                  integrator=integrator)
        it = iter(wo)
        if use_w:
            kw["weights"] = next(it)
        if use_o:
            kw["offsets"] = next(it)
        if vec_prior or mat_prior:
            kw["prior_prec"] = next(it)
        if dyn_len:
            kw["n_leaps"] = next(it)
        return glm_hmc_leapfrogs(XT, Y, th, m, g, eps, **kw)

    try:
        jax.jit(probe).lower(
            f32((d_pad, N), jnp.float32), f32((1, N), jnp.float32),
            cd, cd, cd, f32((), jnp.float32), *extra,
        ).compile()
        ok = True
    except Exception as e:  # pragma: no cover - backend-specific
        import logging

        logging.getLogger(__name__).warning(
            "fused GLM-HMC trajectory kernel failed to compile on %s (%s); "
            "using the generic engine",
            jax.default_backend(), type(e).__name__)
        ok = False
    _TRAJ_PROBE_CACHE[sig] = ok
    return ok


def model_kernel_supported(model, sampler, n_chains=256, vec_prior=False,
                           mat_prior=False, dyn_len=False):
    """True if ``model``'s GLM spec lowers through the fused trajectory
    kernel on the current backend (used by the prun auto-routing).
    ``vec_prior=True`` probes the per-coordinate-precision variant the
    warm-start diag-mass fold uses; ``mat_prior=True`` the full-matrix
    variant of the dense-mass fold; ``dyn_len=True`` the runtime-trip-count
    variant ChEES needs (ops/warmstart.py).  Datasets beyond the
    whole-trajectory kernel's VMEM budget probe the N-tiled gradient
    kernel instead (ops/pallas_glm_bign.py)."""
    from .pallas_glm import _round_up, LANE

    spec = model.glm_spec
    if spec is None:
        return False
    N = spec.X.shape[0]
    d_pad = _round_up(spec.X.shape[1], LANE)
    from .pallas_glm_bign import BIGN_THRESHOLD, TILE_N, bign_kernel_supported

    folded = vec_prior or mat_prior
    if N > BIGN_THRESHOLD:
        # dyn_len needs no kernel variant here: the tiled driver's leapfrog
        # loop lives in XLA, where a traced trip count is a while_loop
        # (ops/warmstart.py ChEES big-N path)
        n_pad = _round_up(N, TILE_N)
        return bign_kernel_supported(
            d_pad, n_pad, _pick_block(n_chains), kind=spec.kind,
            # pad_design_tiled synthesizes a weight vector only when tile
            # padding exists or the model has weights — probe the exact
            # specialization the run will compile
            use_w=(N % TILE_N != 0) or spec.weights is not None,
            use_o=spec.offsets is not None,
            unit_prior=not folded and float(spec.prior_prec) == 1.0,
            vec_prior=vec_prior, mat_prior=mat_prior)
    return trajectory_kernel_supported(
        d_pad, N, _pick_block(n_chains), kind=spec.kind,
        use_w=spec.weights is not None, use_o=spec.offsets is not None,
        unit_prior=not folded and float(spec.prior_prec) == 1.0,
        vec_prior=vec_prior, mat_prior=mat_prior, dyn_len=dyn_len,
        # NUTS (warm handoff) has no integrator field: its fused phase
        # always integrates with leapfrog
        integrator=getattr(sampler, "integrator", "leapfrog"))


def step_kernel_supported(d_pad, N, blk, kind="logistic", use_w=False,
                          use_o=False, unit_prior=True,
                          integrator="leapfrog"):
    """Compile-probe the fused full-transition kernel on the current backend.

    The fused step kernel stresses Mosaic harder than the trajectory kernel
    (lane-broadcast scalar blocks, in-kernel selects); a lowering failure
    must degrade to the composed path, not kill a production run
    (round-1 regression: the kernel was validated interpret-only and
    hard-failed on real TPU).  AOT ``lower().compile()`` on abstract avals —
    no device buffers, a few hundred ms through the remote-compile tunnel,
    cached per shape signature.
    """
    import jax

    sig = (d_pad, N, blk, str(kind), use_w, use_o, unit_prior, integrator,
           jax.default_backend())
    hit = _STEP_PROBE_CACHE.get(sig)
    if hit is not None:
        return hit
    f32 = jax.ShapeDtypeStruct
    cd = f32((blk, d_pad), jnp.float32)
    c1 = f32((blk, 1), jnp.float32)
    kwargs = dict(n_leaps=2, block_chains=blk, interpret=False,
                  kind=kind, prior_prec=1.0 if unit_prior else 0.5,
                  integrator=integrator)
    # weights/offsets must be LOWERED ARGUMENTS, not closed-over structs:
    # glm_hmc_step calls jnp.asarray on them, which rejects a
    # ShapeDtypeStruct outside a trace (TypeError -> probe always False)
    extra = []
    if use_w:
        extra.append(f32((1, N), jnp.float32))
    if use_o:
        extra.append(f32((1, N), jnp.float32))

    def probe(XT, Y, th, g, lp, m0, logu, eps, *wo):
        kw = dict(kwargs)
        it = iter(wo)
        if use_w:
            kw["weights"] = next(it)
        if use_o:
            kw["offsets"] = next(it)
        return glm_hmc_step(XT, Y, th, g, lp, m0, logu, eps, **kw)

    try:
        jax.jit(probe).lower(
            f32((d_pad, N), jnp.float32), f32((1, N), jnp.float32),
            cd, cd, c1, cd, c1, f32((), jnp.float32), *extra,
        ).compile()
        ok = True
    except Exception as e:  # pragma: no cover - backend-specific
        import logging

        logging.getLogger(__name__).warning(
            "fused GLM-HMC step kernel failed to compile on %s (%s); "
            "using the composed trajectory-kernel path",
            jax.default_backend(), type(e).__name__)
        ok = False
    _STEP_PROBE_CACHE[sig] = ok
    return ok


def _choose_fused_step(fused_step, XT, blk, kind, W, O, lam, integrator,
                       interpret):
    """Resolve a user ``fused_step`` policy to a static bool.

    ``"auto"`` (default) picks the composed path: measured marginally faster
    on v5e (169.9M vs 164.9M leapfrog/s at the bench config — the
    lane-broadcast scalar blocks the step kernel needs cost more HBM traffic
    than the one state round-trip they save) and it exercises the simpler,
    battle-tested kernel.  ``True`` requests the single-launch transition
    kernel, compile-probed first so a Mosaic lowering failure degrades to the
    composed path instead of killing the run (round-1 regression).  Both
    paths consume the same PRNG stream and produce identical chains.
    """
    if fused_step == "auto" or fused_step is False:
        return False
    if interpret:
        return True  # interpret mode can't fail Mosaic lowering
    unit = isinstance(lam, (int, float)) and float(lam) == 1.0
    return step_kernel_supported(XT.shape[0], XT.shape[1], blk, kind=kind,
                                 use_w=W is not None, use_o=O is not None,
                                 unit_prior=unit, integrator=integrator)


def fused_mala_chains(model, sampler, runner, n_chains, key,
                      interpret=None):
    """Run plain-MALA chains on a ``model(glm=...)`` posterior through the
    fused HMC kernels.

    MALA with drift step (variance) ``s`` IS one-leapfrog HMC at
    ``eps = sqrt(s)``: the leapfrog proposal ``theta + (eps^2/2) g +
    eps m`` is exactly ``N(theta + (s/2) g, s I)`` and the Hamiltonian MH
    ratio equals MALA's q-corrected ratio (reference MALA.jl:65-126 vs
    HMC.jl:93-102 — the standard equivalence), so the fused trajectory
    kernel serves the reference's most-used gradient sampler after HMC
    with zero new kernel code (VERDICT r4 stretch #10).  Protocol matches
    :func:`fused_hmc_chains`; final states are exact-resume MALAStates.

    One-leapfrog transitions are the WORST per-launch amortization, so on
    TPU the driver of choice is the multistep rows kernel (k transitions
    per launch, in-kernel PRNG, per-transition rows) with the jittered
    length pinned to 1 via ``T = eps`` — measured 0.76x plain-XLA when
    launching one trajectory kernel per transition vs the generic engine,
    multistep recovers the fused advantage."""
    from ..samplers.base import tuner_init
    from ..samplers.hmc import HMC
    from ..samplers.mala import MALAState

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spec = model.glm_spec
    d = model.size
    eps_lf = float(np.sqrt(sampler.scale))
    bcast = lambda a: jnp.broadcast_to(a, (n_chains,) + a.shape)  # noqa: E731

    from .pallas_glm_bign import BIGN_THRESHOLD

    if not interpret and spec.X.shape[0] <= BIGN_THRESHOLD:
        from .pallas_glm import pad_design
        from .warmstart import _chees_run_ms, _ms_route

        XT, Y2, d_pad = pad_design(spec.X, spec.Y)
        N = XT.shape[1]
        W = (None if spec.weights is None
             else jnp.reshape(jnp.asarray(spec.weights, jnp.float32),
                              (1, N)))
        O = (None if spec.offsets is None
             else jnp.reshape(jnp.asarray(spec.offsets, jnp.float32),
                              (1, N)))
        lam = float(spec.prior_prec)
        use_ms, kt = _ms_route(interpret, False, runner.len, spec, d_pad,
                               n_chains, lam, None, W, O, "leapfrog",
                               XT=XT, Y=Y2, extras=False, max_leaps=1, d=d)
        if use_ms:
            inits = jnp.broadcast_to(jnp.asarray(model.init, jnp.float32),
                                     (n_chains, d))
            theta0p = pad_chains(inits, d_pad)
            # T = eps pins the jittered leap count to ceil(u) == 1
            (thetaF, lpF, gF), infos = _chees_run_ms(
                XT, Y2, theta0p, jnp.float32(eps_lf), jnp.float32(eps_lf),
                key, d=d, steps=runner.len, i0=1, max_leaps=1, k_trans=kt,
                block_chains=_pick_block(n_chains), kind=spec.kind, W=W,
                O=O, lam=lam, extras=False)
            mdt = model.init.dtype
            tune = jax.tree_util.tree_map(bcast, tuner_init(sampler.scale))
            states = MALAState(
                pars=thetaF[:, :d].astype(mdt), logtarget=lpF.astype(mdt),
                grad=gF[:, :d].astype(mdt), tune=tune,
                i=jnp.full((n_chains,), runner.len + 1, jnp.int32))
            states = jax.vmap(lambda s, th: sampler.reset(model, s, th))(
                states, states.pars)
            return infos, states

    shim = HMC(1, eps_lf)
    infos, hstates = fused_hmc_chains(model, shim, runner, n_chains, key,
                                      interpret=interpret)
    tune = jax.tree_util.tree_map(bcast, tuner_init(sampler.scale))
    states = MALAState(pars=hstates.pars, logtarget=hstates.logtarget,
                       grad=hstates.grad, tune=tune, i=hstates.i)
    return infos, states


def run_glm_hmc(X, Y, n_chains, steps, n_leaps=10, eps=0.05, seed=0,
                key=None, inits=None, block_chains=256, interpret=False,
                mxu_dtype=jnp.float32, kind="logistic",
                weights=None, offsets=None, prior_prec=1.0,
                integrator="leapfrog", fused_step="auto"):
    """Sample a GLM posterior with the fused Pallas HMC path.

    ``kind`` is a built-in link name or a custom ``(ll, resid)`` pair;
    ``weights``/``offsets`` are optional per-observation (N,) arrays;
    ``prior_prec`` is the N(0, 1/lam I) prior precision.
    Returns (theta (C, d), infos {plogtarget, accept} stacked over steps).
    """
    XT, Y2, d_pad = pad_design(X, Y)
    N = XT.shape[1]
    d = X.shape[1]
    if key is None:
        key = jax.random.PRNGKey(seed)
    k_init, k_run = jax.random.split(key)
    if inits is None:
        inits = 0.1 * jax.random.normal(k_init, (n_chains, d), dtype=jnp.float32)
    theta0 = pad_chains(jnp.asarray(inits, dtype=jnp.float32), d_pad)
    # a non-divisor block would trip the kernel's C % blk assert
    block = min(block_chains, n_chains)
    if n_chains % block != 0:
        block = _pick_block(n_chains)
    W = (None if weights is None
         else jnp.reshape(jnp.asarray(weights, jnp.float32), (1, N)))
    O = (None if offsets is None
         else jnp.reshape(jnp.asarray(offsets, jnp.float32), (1, N)))
    lam = float(prior_prec)
    (theta, _, _), infos = _run(
        XT, Y2, theta0, jnp.float32(eps), k_run, d=d, steps=steps,
        n_leaps=n_leaps, block_chains=block, interpret=interpret,
        mxu_dtype=mxu_dtype, kind=kind, W=W, O=O, lam=lam,
        integrator=integrator,
        fused_step=_choose_fused_step(fused_step, XT, block, kind, W, O,
                                      lam, integrator, interpret),
    )
    return theta[:, :d], infos


def _pick_block(n):
    import math

    if n <= 256:
        return n
    return 256 if n % 256 == 0 else max(math.gcd(n, 256), 1)


def run_glm_hmc_sharded(X, Y, n_chains, steps, mesh=None, axis="chains",
                        n_leaps=10, eps=0.05, seed=0, key=None, inits=None,
                        block_chains=256, interpret=False,
                        mxu_dtype=jnp.float32, kind="logistic",
                        weights=None, offsets=None, prior_prec=1.0,
                        integrator="leapfrog"):
    """Mesh-sharded fused GLM-HMC: chains split over ``mesh[axis]``.

    The multi-chip version of :func:`run_glm_hmc` — the reference's ``prun``
    process pool (runners.jl:35-42) at pod scale: each device runs the
    Pallas trajectory kernel on its local chain shard; the design matrix and
    responses are replicated; chains are independent, so the hot loop uses
    NO collectives at all (the reason near-linear scaling is attainable —
    SURVEY §3.5).  Per-device PRNG streams come from ``fold_in(key, axis
    index)``, so results are independent of the mesh size layout-wise but
    not bitwise-identical across different device counts.

    ``mesh`` defaults to a 1-D mesh over all local devices.  ``n_chains``
    must be divisible by the mesh axis size (and the per-device chunk by
    ``block_chains``).  Returns the same ``(theta (C, d), infos)`` surface
    as :func:`run_glm_hmc`, with rows [i*C/n_dev:(i+1)*C/n_dev] produced by
    device i.
    """
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    if mesh is None:
        devs = np.asarray(jax.devices())
        mesh = Mesh(devs, (axis,))
    n_dev = mesh.shape[axis]
    assert n_chains % n_dev == 0, (
        f"n_chains ({n_chains}) must be divisible by the '{axis}' mesh "
        f"axis size ({n_dev})")
    c_local = n_chains // n_dev

    XT, Y2, d_pad = pad_design(X, Y)
    N = XT.shape[1]
    d = X.shape[1]
    if key is None:
        key = jax.random.PRNGKey(seed)
    k_init, k_run = jax.random.split(key)
    if inits is None:
        inits = 0.1 * jax.random.normal(k_init, (n_chains, d),
                                        dtype=jnp.float32)
    theta0 = pad_chains(jnp.asarray(inits, dtype=jnp.float32), d_pad)
    block = min(block_chains, c_local)
    if c_local % block != 0:
        block = _pick_block(c_local)
    W = (None if weights is None
         else jnp.reshape(jnp.asarray(weights, jnp.float32), (1, N)))
    O = (None if offsets is None
         else jnp.reshape(jnp.asarray(offsets, jnp.float32), (1, N)))
    lam = float(prior_prec)
    # one key row per device, sharded alongside the chain rows
    run_keys = jax.vmap(lambda i: jax.random.fold_in(k_run, i))(
        jnp.arange(n_dev))

    kw = dict(d=d, steps=steps, n_leaps=n_leaps, block_chains=block,
              interpret=interpret, mxu_dtype=mxu_dtype, kind=kind,
              lam=lam, integrator=integrator)

    def local_run(xt, y, th0, keys):
        # W/O are closed over: shard_map lifts them as replicated constants
        (theta, lp, g), infos = _run(xt, y, th0, jnp.float32(eps), keys[0],
                                     W=W, O=O, **kw)
        return theta, infos

    rep = P()
    # check_vma=False: the Pallas calls inside the per-device body
    # are opaque to shard_map's varying-mesh-axes checker (it cannot
    # see that the kernel treats operands as device-local), so the
    # check rejects valid programs.  Correctness is gated by the
    # sharded-vs-unsharded equivalence tests instead
    # (tests/test_sharded.py, test_warmfused sharded gates, the
    # bign 2x4-vs-1x1 test) — a regression breaks those, not this.
    fn = shard_map(local_run, mesh=mesh,
                   in_specs=(rep, rep, P(axis), P(axis)),
                   out_specs=(P(axis), P(None, axis)),
                   check_vma=False)
    theta, infos = fn(XT, Y2, theta0, run_keys)
    return theta[:, :d], infos


def final_hmc_states(model, sampler, n_chains, steps_done, thetaF, lpF, gF):
    """Batched HMCState for resume after a fused-kernel run (f32 kernel
    outputs re-evaluated at model precision so the generic path composes)."""
    from ..samplers.base import tuner_init
    from ..samplers.hmc import HMCState
    from ..samplers.massadapt import mass_init

    d = model.size
    mdt = model.init.dtype
    bcast = lambda a: jnp.broadcast_to(a, (n_chains,) + a.shape)  # noqa: E731
    tune = jax.tree_util.tree_map(bcast, tuner_init(sampler.leap_step,
                                                    sampler.n_leaps))
    mass = jax.tree_util.tree_map(bcast, mass_init(None, d, mdt))
    states = HMCState(
        pars=thetaF[:, :d].astype(mdt), logtarget=lpF.astype(mdt),
        grad=gF[:, :d].astype(mdt), tune=tune,
        i=jnp.full((n_chains,), steps_done + 1, jnp.int32), mass=mass,
    )
    # refresh logp/grad at model precision (f64 on CPU) for exact resume
    return jax.vmap(lambda s, th: sampler.reset(model, s, th))(
        states, states.pars
    )


def fused_hmc_chains(model, sampler, runner, n_chains, key, interpret=None,
                     fused_step="auto"):
    """Run ``n_chains`` plain-HMC chains on a ``model(glm=...)`` posterior
    through the fused Pallas kernel, returning ``(infos, final_states)``
    protocol-compatible with :func:`mcmc_jl_tpu.parallel.run_chains`
    (f32 compute; post-accept keys only — the pre-step duplicates the
    generic engine also emits are dropped before they ever hit HBM)."""
    from .pallas_glm import pad_chains, pad_design

    spec = model.glm_spec
    assert spec is not None, "fused_hmc_chains requires a model(glm=...) model"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from .pallas_glm_bign import BIGN_THRESHOLD

    if spec.X.shape[0] > BIGN_THRESHOLD:
        # large-N: the N-tiled gradient kernel streams X^T instead of
        # replicating it in VMEM (ops/pallas_glm_bign.py)
        from .pallas_glm_bign import run_glm_hmc_bign

        d = model.size
        inits = jnp.broadcast_to(jnp.asarray(model.init, jnp.float32),
                                 (n_chains, d))
        theta, infos = run_glm_hmc_bign(
            spec.X, spec.Y, n_chains, runner.len, n_leaps=sampler.n_leaps,
            eps=sampler.leap_step, key=key, inits=inits,
            interpret=interpret, kind=spec.kind, weights=spec.weights,
            offsets=spec.offsets, prior_prec=float(spec.prior_prec),
            integrator=sampler.integrator, collect=True)
        from .pallas_glm import _round_up, LANE

        d_pad = _round_up(d, LANE)
        thetaF = pad_chains(jnp.asarray(theta, jnp.float32), d_pad)
        gF = pad_chains(infos["pgrads"][-1].astype(jnp.float32), d_pad)
        states = final_hmc_states(model, sampler, n_chains, runner.len,
                                  thetaF, infos["plogtarget"][-1], gF)
        return infos, states
    XT, Y2, d_pad = pad_design(spec.X, spec.Y)
    N = XT.shape[1]
    d = model.size
    W = (None if spec.weights is None
         else jnp.reshape(jnp.asarray(spec.weights, jnp.float32), (1, N)))
    O = (None if spec.offsets is None
         else jnp.reshape(jnp.asarray(spec.offsets, jnp.float32), (1, N)))
    inits = jnp.broadcast_to(jnp.asarray(model.init, jnp.float32), (n_chains, d))
    theta0 = pad_chains(inits, d_pad)

    block = _pick_block(n_chains)
    lam = float(spec.prior_prec)
    (thetaF, lpF, gF), infos = _run(
        XT, Y2, theta0, jnp.float32(sampler.leap_step), key,
        d=d, steps=runner.len, n_leaps=sampler.n_leaps,
        block_chains=block, interpret=interpret,
        kind=spec.kind, W=W, O=O, lam=lam, collect=True,
        integrator=sampler.integrator,
        fused_step=_choose_fused_step(fused_step, XT, block, spec.kind, W,
                                      O, lam, sampler.integrator, interpret),
    )
    infos = {k: (v[..., :d] if v.ndim == 3 else v) for k, v in infos.items()}
    states = final_hmc_states(model, sampler, n_chains, runner.len,
                              thetaF, lpF, gF)
    return infos, states
