"""Menter SST k-omega two-equation turbulence model.

Reference analogue: ``SST.F90`` (`/root/reference/src/turbulence/SST.F90`,
1,648 LoC: sources + advection + viscous, F1/F2 blending) — one of the two
supported models (`doc/options.yaml:214-218`). Solved here FULLY COUPLED:
k and omega are carried as w[..., 5:7] (primitive values, like the SA
nuTilde slot) inside the same residual/Jacobian, instead of the reference's
segregated DD-ADI sweep.

Menter (1994) standard SST closure. Transport in primitive form
(rho factored out, matching the nuTilde convention of physics/sa.py):
  dk/dt + u.grad k  = (P_k - beta* rho k w)/rho + (1/rho) div((mu+sk mut)grad k)
  dw/dt + u.grad w  = gamma_b Om^2 - beta w^2
                      + (1/rho) div((mu+sw mut) grad w) + CD_kw
Discretization: 1st-order upwind advection, Green-Gauss + normal-corrected
face gradients for diffusion (shared with physics/viscous.py), vorticity
production with the standard 20*beta*rho*k*w limiter.
"""

from __future__ import annotations

import jax.numpy as jnp

from adflow_tpu.core.refstate import GAMMA
from adflow_tpu.physics.thermo import IMX, IMZ, IRHO, ITURB, laminar_viscosity
from adflow_tpu.physics.viscous import (
    _face_avg, _face_gradient, _shift, green_gauss_gradients)

# closure constants (SST.F90 / paramTurb.F90)
BETA_STAR = 0.09
A1 = 0.31
KARMAN = 0.41
SIGMA_K1, SIGMA_W1, BETA_1 = 0.85, 0.5, 0.075
SIGMA_K2, SIGMA_W2, BETA_2 = 1.0, 0.856, 0.0828
GAMMA_1 = BETA_1 / BETA_STAR - SIGMA_W1 * KARMAN ** 2 / jnp.sqrt(BETA_STAR)
GAMMA_2 = BETA_2 / BETA_STAR - SIGMA_W2 * KARMAN ** 2 / jnp.sqrt(BETA_STAR)

IK, IW = ITURB, ITURB + 1
W_FLOOR = 1e-8
K_FLOOR = 0.0


def _vorticity(g_vel):
    """|curl u| from a (..., 3, 3) velocity gradient (g[a, b] = d u_a/d x_b)."""
    wx = g_vel[..., 2, 1] - g_vel[..., 1, 2]
    wy = g_vel[..., 0, 2] - g_vel[..., 2, 0]
    wz = g_vel[..., 1, 0] - g_vel[..., 0, 1]
    # guarded: sqrt has an infinite derivative at 0 and vorticity is exactly
    # zero in uniform flow (freestream init) — unguarded this NaN'd JVPs
    return jnp.sqrt(jnp.maximum(wx ** 2 + wy ** 2 + wz ** 2, 1e-32))


def blending_f1(k, w_t, nu, d, cross_kw):
    """Menter F1 (SST.F90 blending): 1 near walls (k-w), 0 outside (k-eps)."""
    w_pos = jnp.maximum(w_t, W_FLOOR)
    k_pos = jnp.maximum(k, 1e-30)   # sqrt'(0) = inf: keep JVPs finite
    cd_kw = jnp.maximum(2.0 * SIGMA_W2 / w_pos * cross_kw, 1e-20)
    arg1 = jnp.minimum(
        jnp.maximum(jnp.sqrt(k_pos) / (BETA_STAR * w_pos * d),
                    500.0 * nu / (d ** 2 * w_pos)),
        4.0 * SIGMA_W2 * k_pos / (cd_kw * d ** 2))
    return jnp.tanh(arg1 ** 4)


def blending_f2(k, w_t, nu, d):
    w_pos = jnp.maximum(w_t, W_FLOOR)
    k_pos = jnp.maximum(k, 1e-30)   # sqrt'(0) = inf: keep JVPs finite
    arg2 = jnp.maximum(2.0 * jnp.sqrt(k_pos) / (BETA_STAR * w_pos * d),
                       500.0 * nu / (d ** 2 * w_pos))
    return jnp.tanh(arg2 ** 2)


def eddy_viscosity(w, p, metrics, ref, d_ext):
    """mu_t on the one-ring extended grid:
    mu_t = rho a1 k / max(a1 w, Om F2) (Menter SST limiter)."""
    rho = w[..., IRHO]
    vel = w[..., IMX:IMZ + 1] / rho[..., None]
    t = GAMMA * p / rho
    mu = laminar_viscosity(t, ref.mu_inf, ref.t_inf_dim)

    g = green_gauss_gradients(vel, metrics)       # one-ring grid, (.., 3, 3)
    om = _vorticity(g)
    ext = (slice(1, -1),) * 3
    rho_e = rho[ext]
    k_e = jnp.maximum(w[ext][..., IK], 0.0)
    w_e = jnp.maximum(w[ext][..., IW], W_FLOOR)
    nu_e = mu[ext] / rho_e
    d_e = jnp.maximum(d_ext, 1e-12)
    f2 = blending_f2(k_e, w_e, nu_e, d_e)
    return rho_e * A1 * k_e / jnp.maximum(A1 * w_e, om * f2)


def sst_residual(w, p, metrics, cfg, ref, d_ext):
    """SST residual on the interior: (ni, nj, nk, 2) for (k, omega); sign
    such that V dq/dt = -R. Halos filled; d_ext = wall distance on the
    one-ring extended grid."""
    rho = w[..., IRHO]
    vel = w[..., IMX:IMZ + 1] / rho[..., None]
    t = GAMMA * p / rho
    mu = laminar_viscosity(t, ref.mu_inf, ref.t_inf_dim)
    nu_lam = mu / rho

    it = (slice(2, -2),) * 3
    vol = metrics.vol[it]
    rho_c = rho[it]
    nu_c = nu_lam[it]
    k_c = w[it][..., IK]
    w_c = w[it][..., IW]
    k_pos = jnp.maximum(k_c, 0.0)
    w_pos = jnp.maximum(w_c, W_FLOOR)
    d_c = jnp.maximum(d_ext[1:-1, 1:-1, 1:-1], 1e-12)

    # ---- gradients: u, v, w, k, omega (nf = 5) ---------------------------
    fields = jnp.concatenate([vel, w[..., IK:IW + 1]], axis=-1)
    g = green_gauss_gradients(fields, metrics)
    g_int = g[1:-1, 1:-1, 1:-1]
    om = _vorticity(g_int[..., 0:3, :])
    gk = g_int[..., 3, :]
    gw = g_int[..., 4, :]
    cross_kw = jnp.sum(gk * gw, axis=-1)

    f1 = blending_f1(k_pos, w_pos, nu_c, d_c, cross_kw)
    f2 = blending_f2(k_pos, w_pos, nu_c, d_c)
    mut_c = rho_c * A1 * k_pos / jnp.maximum(A1 * w_pos, om * f2)
    nut_c = mut_c / rho_c

    beta = f1 * BETA_1 + (1.0 - f1) * BETA_2
    gam = f1 * GAMMA_1 + (1.0 - f1) * GAMMA_2
    sig_k = f1 * SIGMA_K1 + (1.0 - f1) * SIGMA_K2
    sig_w = f1 * SIGMA_W1 + (1.0 - f1) * SIGMA_W2

    # ---- sources (per unit mass, times volume) ---------------------------
    p_k = jnp.minimum(mut_c * om ** 2,
                      20.0 * BETA_STAR * rho_c * k_pos * w_pos)
    src_k = p_k / rho_c - BETA_STAR * k_pos * w_pos
    src_w = (gam * om ** 2 - beta * w_pos ** 2
             + 2.0 * (1.0 - f1) * SIGMA_W2 / w_pos * cross_kw / rho_c)
    Rk = -src_k * vol
    Rw = -src_w * vol

    # ---- advection (upwind) + diffusion per direction --------------------
    nu_eff_k = nu_lam[1:-1, 1:-1, 1:-1]
    # pad mut/nut to the one-ring grid for face averaging: recompute there
    mut_e = eddy_viscosity(w, p, metrics, ref, d_ext)
    nut_e = mut_e / rho[1:-1, 1:-1, 1:-1]
    q_div = 0.0
    adv_k = 0.0
    adv_w = 0.0
    diff_k = 0.0
    diff_w = 0.0
    # cell sigma coefficients on the one-ring grid need F1 there; edge-pad
    # the interior F1 (one ring) — adequate since F1 saturates at walls/far.
    f1_e = jnp.pad(f1, ((1, 1), (1, 1), (1, 1)), mode="edge")
    sig_k_e = f1_e * SIGMA_K1 + (1.0 - f1_e) * SIGMA_K2
    sig_w_e = f1_e * SIGMA_W1 + (1.0 - f1_e) * SIGMA_W2
    for axis in range(3):
        s = (metrics.si, metrics.sj, metrics.sk)[axis]
        itx = [slice(2, -2)] * 3
        itx[axis] = slice(None)
        vA = vel[tuple(itx)]
        vL = _shift(vA, axis, 1, -2)
        vR = _shift(vA, axis, 2, -1)
        q_f = jnp.sum(0.5 * (vL + vR) * s, axis=-1)
        vf = (metrics.vfI, metrics.vfJ, metrics.vfK)[axis]
        if vf is not None:
            # ALE: advect in the moving-grid frame (see sa.py)
            q_f = q_f - jnp.sum(vf * s, axis=-1)
        for iq, acc in ((IK, "k"), (IW, "w")):
            qA = w[tuple(itx)][..., iq]
            qL = _shift(qA, axis, 1, -2)
            qR = _shift(qA, axis, 2, -1)
            if cfg.turb_order.replace(" ", "").lower() == "secondorder":
                # second-order turbulence advection (turbulenceOrder
                # option; see sa.py for the SA twin)
                from adflow_tpu.physics.upwind import _van_albada
                qLL = _shift(qA, axis, 0, -3)
                qRR = _shift(qA, axis, 3, 0)
                dc = qR - qL
                qLft = qL + 0.5 * _van_albada(qL - qLL, dc)
                qRgt = qR - 0.5 * _van_albada(qRR - qR, dc)
                q_up = jnp.where(q_f >= 0.0, qLft, qRgt)
            else:
                q_up = jnp.where(q_f >= 0.0, qL, qR)
            flux = q_f * q_up
            dflux = _shift(flux, axis, 1, 0) - _shift(flux, axis, 0, -1)
            if acc == "k":
                adv_k = adv_k + dflux
            else:
                adv_w = adv_w + dflux
        q_div = q_div + (_shift(q_f, axis, 1, 0) - _shift(q_f, axis, 0, -1))

        gf = _face_gradient(g, fields, metrics.xc_ext, axis, tuple(itx))
        gk_f = gf[..., 3, :]
        gw_f = gf[..., 4, :]
        nuk_f = _face_avg(nu_eff_k + sig_k_e * nut_e, axis)
        nuw_f = _face_avg(nu_eff_k + sig_w_e * nut_e, axis)
        fk = nuk_f * jnp.sum(gk_f * s, axis=-1)
        fw = nuw_f * jnp.sum(gw_f * s, axis=-1)
        diff_k = diff_k + (_shift(fk, axis, 1, 0) - _shift(fk, axis, 0, -1))
        diff_w = diff_w + (_shift(fw, axis, 1, 0) - _shift(fw, axis, 0, -1))

    Rk = Rk + adv_k - k_c * q_div - diff_k
    Rw = Rw + adv_w - w_c * q_div - diff_w

    sk, sw = cfg.turb_scales[:2]
    if sk != 1.0:
        Rk = Rk * sk
    if sw != 1.0:
        Rw = Rw * sw
    return jnp.stack([Rk, Rw], axis=-1)
