"""WALNUTS — within-orbit adaptive leapfrog NUTS.

Beyond the reference (whose NUTS, src/samplers/NUTS.jl, integrates every
orbit with one fixed step size): following Bou-Rabee, Carpenter et al.,
"The Within-Orbit Adaptive Leapfrog No-U-Turn Sampler" (arXiv:2506.18746;
PAPERS.md), each *macro* leapfrog step of size ``h`` on the orbit grid is
integrated with ``2^l`` micro leapfrog steps of size ``h / 2^l``, where
``l`` is chosen per macro step as the smallest value (up to
``max_halvings``) whose micro-path energy range
``max_k H(z_k) - min_k H(z_k) <= delta``.  Stiff regions (e.g. the neck of
Neal's funnel) automatically get fine steps while flat regions pay one
gradient per macro step, so one chain can traverse scale variation that
makes fixed-step NUTS diverge or stall.

Correctness (re-derived here, conservatively): the energy-range criterion
is *symmetric* — integrating backward from the macro endpoint with the
selected ``l`` retraces exactly the same micro states (leapfrog
reversibility), so the selected ``l`` passes its own reverse check by
construction.  The selection is *irreversible* only if some coarser
``l' < l`` passes the criterion from the reverse side (over a different
micro path).  Such a macro step is treated exactly like a divergence: the
subtree containing it is invalidated (``bad`` -> NUTS divergence gate) and
none of its states is selectable.  Detailed balance then holds by the same
argument that covers divergent subtrees in standard NUTS: rebuilding the
doubling from any *selectable* state deterministically reproduces the same
macro grid (every connecting step is reversible and
``flip . Psi_l . flip = Psi_l^{-1}``) and re-encounters the same failure.
This is stricter than the paper's weighting scheme (we reject a subtree
where it down-weights), which can cost efficiency, never exactness.

Cost: the common case (``l = 0`` passes) is exactly one gradient per macro
step — the reverse check is free because ``l = 0`` is the smallest
candidate.  A macro step that settles at ``l`` costs ``2^{l+1} - 1``
forward micro gradients (trying ``0..l``) plus up to ``2^l - 1``
reverse-check gradients.

Use ``multinomial=True`` (inherited; recommended) for Stan-style Boltzmann
state selection; dual averaging adapts the macro step ``h`` as in NUTS.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .integrators import hamiltonian, leapfrog
from .nuts import NUTS


@dataclasses.dataclass(frozen=True, repr=False)
class WALNUTS(NUTS):
    #: micro-path energy-range tolerance per macro step
    delta: float = 0.5
    #: maximum step halvings: micro step down to h / 2^max_halvings
    max_halvings: int = 4

    needs_gradient = True
    #: dual averaging regulates eps so ~70% of macro steps run un-halved
    #: (the H-G accept statistic is blind here: micro adaptation keeps
    #: exp(H0-H) near 1 at any macro step, so it would inflate eps forever)
    _adapt_stat = "halvings"

    def __post_init__(self):
        super().__post_init__()
        assert self.delta > 0, "energy tolerance delta must be > 0"
        assert 0 <= self.max_halvings < 10, "max_halvings must be in [0, 10)"

    # ------------------------------------------------------------------
    def _leaf_advance(self, model, pars, lp, m, grad, eps_signed, key):
        """One adaptive macro step of size ``eps_signed``.

        Forward: smallest l in [0, max_halvings] with micro-path energy
        range <= delta (falls back to l = max_halvings, flagged bad if even
        that exceeds the tolerance).  Reverse check: bad if any coarser
        l' < l passes from the flipped endpoint."""
        del key  # deterministic selection
        L = self.max_halvings
        dtype = pars.dtype
        lp0 = lp  # log-target at pars, carried by the tree loop

        def integrate(pars0, lp_start, m0, grad0, n, eps):
            """n micro leapfrogs at step eps; returns endpoint and the
            energy range over the path including the start state (NaN
            poisons the range so the tolerance check fails)."""

            def body(_, c):
                p, lp, g, mm, hmin, hmax = c
                p, lp, g, mm = leapfrog(model, p, mm, g, eps)
                H = hamiltonian(lp, mm)
                hmin = jnp.where(jnp.isnan(H), jnp.inf, jnp.minimum(hmin, H))
                hmax = jnp.where(jnp.isnan(H), jnp.inf, jnp.maximum(hmax, H))
                return p, lp, g, mm, hmin, hmax

            H_init = hamiltonian(lp_start, m0)
            init = (pars0, lp_start, grad0, m0, H_init, H_init)
            p, lp, g, mm, hmin, hmax = jax.lax.fori_loop(0, n, body, init)
            return p, lp, g, mm, hmax - hmin

        delta = jnp.asarray(self.delta, dtype)

        # ---- forward selection: smallest passing l ------------------------
        def fwd_cond(c):
            return (~c["done"]) & (c["l"] <= L)

        def fwd_body(c):
            n = jnp.asarray(1, jnp.int32) << c["l"]
            eps_l = eps_signed / n.astype(dtype)
            p, lp, g, mm, rng = integrate(pars, lp0, m, grad, n, eps_l)
            ok = rng <= delta
            take = ok | (c["l"] >= L)  # last candidate taken regardless
            return {
                "l": c["l"] + 1, "done": take,
                "sel_l": jnp.where(take, c["l"], c["sel_l"]),
                "pars": jnp.where(take, p, c["pars"]),
                "lp": jnp.where(take, lp, c["lp"]),
                "grad": jnp.where(take, g, c["grad"]),
                "m": jnp.where(take, mm, c["m"]),
                "ok": jnp.where(take, ok, c["ok"]),
            }

        fwd0 = {
            "l": jnp.asarray(0, jnp.int32), "done": jnp.asarray(False),
            "sel_l": jnp.asarray(0, jnp.int32),
            "pars": pars, "lp": jnp.zeros((), dtype), "grad": grad, "m": m,
            "ok": jnp.asarray(False),
        }
        f = jax.lax.while_loop(fwd_cond, fwd_body, fwd0)
        sel_l = f["sel_l"]
        new_pars, new_lp, new_grad, new_m = f["pars"], f["lp"], f["grad"], f["m"]
        tol_ok = f["ok"]

        # ---- reverse check: does any coarser l' < sel_l pass from the
        # flipped endpoint?  (l' == sel_l retraces the same micro states and
        # passes by symmetry, so it needs no computation.) ------------------
        def rev_cond(c):
            # tol_ok False already decided bad — don't pay for the check
            return (~c["coarser_ok"]) & (c["l"] < sel_l) & tol_ok

        def rev_body(c):
            n = jnp.asarray(1, jnp.int32) << c["l"]
            eps_l = eps_signed / n.astype(dtype)
            _, _, _, _, rng = integrate(new_pars, new_lp, -new_m, new_grad,
                                        n, eps_l)
            return {"l": c["l"] + 1,
                    "coarser_ok": c["coarser_ok"] | (rng <= delta)}

        r = jax.lax.while_loop(
            rev_cond, rev_body,
            {"l": jnp.asarray(0, jnp.int32), "coarser_ok": jnp.asarray(False)},
        )
        bad = (~tol_ok) | r["coarser_ok"]
        return new_pars, new_lp, new_grad, new_m, bad, sel_l > 0
