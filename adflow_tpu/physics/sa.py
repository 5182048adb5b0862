"""Spalart-Allmaras one-equation turbulence model.

Reference analogue: ``sa_block`` = saSource + saViscous + advection +
saResScale (`/root/reference/src/turbulence/sa.F90:16,89,346,678`), solved
segregated there (DD-ADI, turbAPI.F90); here the nuTilde equation is carried
as w[..., 5] and solved FULLY COUPLED in the Newton vector (the reference's
ANK coupled mode) — one residual, one Jacobian, no separate turbulence
machinery on the hot path.

Standard SA-noft2/ft2 closure (Spalart & Allmaras 1994):
  d(nuT)/dt + u.grad(nuT) = cb1 (1-ft2) S~ nuT
      - (cw1 fw - cb1/k^2 ft2)(nuT/d)^2
      + 1/sigma [ div((nu+nuT) grad nuT) + cb2 (grad nuT)^2 ]
Discretization: first-order upwind advection (the reference's default
turbulence order), Green-Gauss + normal-corrected face gradients for
diffusion (shared scheme with physics/viscous.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from adflow_tpu.core.refstate import GAMMA
from adflow_tpu.physics.thermo import (
    IMX, IMZ, IRHO, ITURB, laminar_viscosity)
from adflow_tpu.physics.viscous import (
    _face_avg, _face_gradient, _shift, green_gauss_gradients)

# closure constants (sa.F90 / paramTurb.F90)
CB1 = 0.1355
CB2 = 0.622
SIGMA = 2.0 / 3.0
KARMAN = 0.41
CW1 = CB1 / KARMAN ** 2 + (1.0 + CB2) / SIGMA
CW2 = 0.3
CW3 = 2.0
CV1 = 7.1
CT3 = 1.2
CT4 = 0.5


def eddy_viscosity(w, mu):
    """mu_t = rho nuTilde fv1 (zero for negative nuTilde). ``w`` cell states
    with the turbulence slot, ``mu`` laminar viscosity, same shape."""
    rho = w[..., IRHO]
    nut = jnp.maximum(w[..., ITURB], 0.0)
    chi = rho * nut / mu
    fv1 = chi ** 3 / (chi ** 3 + CV1 ** 3)
    return rho * nut * fv1


def sa_destruction_diag(w, metrics, d_ext):
    """Positive part of d(R_sa)/d(nuTilde) from the destruction term
    (per-cell, includes the volume factor), for point-implicit treatment of
    the stiff near-wall source in explicit smoothers. The reference avoids
    this stiffness by solving turbulence implicitly (DD-ADI,
    `/root/reference/src/turbulence/turbAPI.F90:4`); dividing the explicit
    turbulence update by (1 + alpha dt/V * diag) is the pointwise-local,
    partition-invariant equivalent. cw1*fw is upper-bounded by its maximum
    (fw <= (1+cw3^6)^(1/6) ~ 2.0) — overdamping only slows the local
    turbulence transient, never changes the converged state (R = 0)."""
    it = (slice(2, -2),) * 3
    nut_c = jnp.maximum(w[it][..., ITURB], 0.0)
    d_c = jnp.maximum(d_ext[1:-1, 1:-1, 1:-1], 1e-12)
    fw_max = (1.0 + CW3 ** 6) ** (1.0 / 6.0)
    return 2.0 * CW1 * fw_max * nut_c / d_c ** 2 * metrics.vol[it]


def sa_residual(w, p, metrics, cfg, ref, d_ext):
    """SA residual on the interior: (ni, nj, nk, 1), sign such that
    V d(nuT)/dt = -R. Halos of w filled; d_ext: wall distance on the
    one-ring extended grid (geom/walldist.py)."""
    dtype = w.dtype
    rho = w[..., IRHO]
    vel = w[..., IMX:IMZ + 1] / rho[..., None]
    nut = w[..., ITURB]
    t = GAMMA * p / rho
    mu = laminar_viscosity(t, ref.mu_inf, ref.t_inf_dim)
    nu_lam = mu / rho

    it = (slice(2, -2),) * 3
    nut_c = nut[it]
    rho_c = rho[it]
    nu_c = nu_lam[it]
    vol = metrics.vol[it]
    d_c = jnp.maximum(d_ext[1:-1, 1:-1, 1:-1], 1e-12)

    # ---- gradients (velocity for vorticity, nuTilde for diffusion) ------
    fields = jnp.concatenate([vel, nut[..., None]], axis=-1)      # nf = 4
    g = green_gauss_gradients(fields, metrics)     # (n+2.., 4, 3)
    g_int = g[1:-1, 1:-1, 1:-1]
    gu = g_int[..., 0:3, :]
    wx = gu[..., 2, 1] - gu[..., 1, 2]
    wy = gu[..., 0, 2] - gu[..., 2, 0]
    wz = gu[..., 1, 0] - gu[..., 0, 1]
    # guarded sqrt: d(sqrt)/dx -> inf at 0, and omega IS exactly 0 in
    # uniform flow (freestream init) — the unguarded form NaN'd every
    # Newton/adjoint JVP at startup
    omega = jnp.sqrt(jnp.maximum(wx ** 2 + wy ** 2 + wz ** 2,
                                 jnp.asarray(1e-32, dtype)))
    if cfg.use_rotation_sa:
        # Dacles-Mariani rotation correction (reference useRotationSA,
        # sa.F90 / turbUtils.F90): S = omega + 2 min(0, |strain| - |vort|)
        sxx = gu[..., 0, 0]
        syy = gu[..., 1, 1]
        szz = gu[..., 2, 2]
        sxy = 0.5 * (gu[..., 0, 1] + gu[..., 1, 0])
        sxz = 0.5 * (gu[..., 0, 2] + gu[..., 2, 0])
        syz = 0.5 * (gu[..., 1, 2] + gu[..., 2, 1])
        strain2 = 2.0 * (sxy ** 2 + sxz ** 2 + syz ** 2) \
            + sxx ** 2 + syy ** 2 + szz ** 2
        strain = jnp.sqrt(jnp.maximum(2.0 * strain2,
                                      jnp.asarray(1e-32, dtype)))
        omega = omega + 2.0 * jnp.minimum(0.0, strain - omega)
    gnut = g_int[..., 3, :]
    gnut2 = jnp.sum(gnut * gnut, axis=-1)

    # ---- source terms ----------------------------------------------------
    nut_pos = jnp.maximum(nut_c, 1e-14)
    chi = nut_pos / nu_c
    fv1 = chi ** 3 / (chi ** 3 + CV1 ** 3)
    fv2 = 1.0 - chi / (1.0 + chi * fv1)
    inv_k2d2 = 1.0 / (KARMAN ** 2 * d_c ** 2)
    s_tilde = omega + nut_pos * fv2 * inv_k2d2
    # clip S~ away from zero (standard guard; reference uses a similar
    # limiter) keeping it differentiable
    s_tilde = jnp.maximum(s_tilde, 0.3 * omega + 1e-16)

    ft2 = (CT3 * jnp.exp(-CT4 * chi ** 2)
           if (cfg.use_ft2 and cfg.turbulence_model == "sa") else 0.0)

    r = jnp.minimum(nut_pos * inv_k2d2 / s_tilde, 10.0)
    g_fw = r + CW2 * (r ** 6 - r)
    # fw saturates at (1+cw3^6)^(1/6) ~ 2.0 for large g (fw(100) differs by
    # <1e-10), but the JVP of g^6 is 6 g^5 dg: at the r=10 clip g ~ 3e5 and
    # Krylov/adjoint tangents of a few e13 push 6 g^5 dg past f32 max
    # (~1.2e42 -> inf -> NaN). Clamping g bounds the tangent without
    # changing fw to f32 precision (round-2 multichip dryrun NaN).
    g_fw = jnp.minimum(g_fw, 100.0)
    fw = g_fw * ((1.0 + CW3 ** 6) / (g_fw ** 6 + CW3 ** 6)) ** (1.0 / 6.0)

    prod = CB1 * (1.0 - ft2) * s_tilde * nut_c
    destr = (CW1 * fw - CB1 / KARMAN ** 2 * ft2) * (nut_c / d_c) ** 2
    R = -(prod - destr) * vol
    # cb2 gradient-squared volume term of the diffusion operator
    R = R - (CB2 / SIGMA) * gnut2 * vol

    # ---- advection (1st-order upwind) + diffusion, per direction ---------
    # nu + nuTilde at cells (one-ring ext); clipped so transient negative
    # nuTilde can't produce negative diffusivity
    nu_eff = (nu_lam + jnp.maximum(nut, 0.0))[1:-1, 1:-1, 1:-1]
    q_div = 0.0
    for axis in range(3):
        s = (metrics.si, metrics.sj, metrics.sk)[axis]
        itx = [slice(2, -2)] * 3
        itx[axis] = slice(None)
        vA = vel[tuple(itx)]
        vL = _shift(vA, axis, 1, -2)
        vR = _shift(vA, axis, 2, -1)
        q_f = jnp.sum(0.5 * (vL + vR) * s, axis=-1)      # u_f . S_f
        vf = (metrics.vfI, metrics.vfJ, metrics.vfK)[axis]
        if vf is not None:
            # ALE: advect in the frame of the moving grid (reference
            # subtracts sFace in the turbulence qs terms, turbUtils.F90)
            q_f = q_f - jnp.sum(vf * s, axis=-1)
        ntA = nut[tuple(itx)]
        ntL = _shift(ntA, axis, 1, -2)
        ntR = _shift(ntA, axis, 2, -1)
        if cfg.turb_order.replace(" ", "").lower() == "secondorder":
            # second-order turbulence advection (reference turbulenceOrder
            # 'second order', doc/options.yaml:198): van-Albada-limited
            # MUSCL reconstruction of nuTilde at the face
            from adflow_tpu.physics.upwind import _van_albada
            ntLL = _shift(ntA, axis, 0, -3)
            ntRR = _shift(ntA, axis, 3, 0)
            dc = ntR - ntL
            ntLft = ntL + 0.5 * _van_albada(ntL - ntLL, dc)
            ntRgt = ntR - 0.5 * _van_albada(ntRR - ntR, dc)
            nt_up = jnp.where(q_f >= 0.0, ntLft, ntRgt)
        else:
            nt_up = jnp.where(q_f >= 0.0, ntL, ntR)
        flux_adv = q_f * nt_up
        R = R + (_shift(flux_adv, axis, 1, 0) - _shift(flux_adv, axis, 0, -1))
        q_div = q_div + (_shift(q_f, axis, 1, 0) - _shift(q_f, axis, 0, -1))

        # diffusion: (1/sigma) (nu+nuT)_f  grad(nuT)_f . S_f
        gf = _face_gradient(g, fields, metrics.xc_ext, axis, tuple(itx))
        gnut_f = gf[..., 3, :]
        nue_f = _face_avg(nu_eff, axis)
        flux_diff = (1.0 / SIGMA) * nue_f * jnp.sum(gnut_f * s, axis=-1)
        R = R - (_shift(flux_diff, axis, 1, 0)
                 - _shift(flux_diff, axis, 0, -1))

    # non-conservative correction: - nuT_c * div(u)*... (integral identity
    # int u.grad nuT = surface flux - nuT * div u)
    R = R - nut_c * q_div

    s = cfg.turb_scales[0]
    if s != 1.0:
        R = R * s
    return R[..., None]
