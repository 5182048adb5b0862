"""Pallas TPU blockette v2: fused FULL-RANS (SA) residual kernel.

Reference analogue: the complete blockette pipeline
(`/root/reference/src/NKSolver/blockette.F90:70` blocketteRes) — the
reference's tiled residual contains not just the central+JST part but
``saSource`` (:976), ``allNodalGradients`` (:5205) and ``viscousFlux``
(:5517) inside the tile; that totality is where its 2-3x comes from.
Round-2's kernel (ops/pallas_residual.py) fused only the 5-channel inviscid
part; the XLA path still materialised ~11 GB of viscous/SA intermediates in
HBM per 1M-cell evaluation (measured: 34.7 ms, 329 GB/s achieved — the
residual is bandwidth-bound on spilled intermediates). This kernel computes
ALL SIX residual channels in VMEM per i-slab:

  derived state (p, T, Sutherland mu, eddy mu_t)           [flowUtils.F90]
  pressure sensor + spectral radii + JST central flux      [fluxes.F90:4,1049]
  Green-Gauss cell gradients of (u, v, w, T, nuTilde)      [blockette.F90:5205]
  normal-corrected face gradients -> full stress tensor    [fluxes.F90:2534]
  SA source + first-order-upwind advection + diffusion     [sa.F90:16]
  turbulence row scale                                     [sa.F90:678]

Layout discipline (same as ops/pallas_residual.py): channels first, k is the
lane axis padded to a 128 multiple, all k-stencil shifts are full-lane
rotations (jnp.roll), i/j shifts are sublane slices. Lane convention "PC":
lane l = padded-cell k index l for cell arrays; face-indexed arrays are
rolled on load so that face f touches PC cells (f, f+1).

Differentiation: primal-only kernel with a ``jax.custom_jvp`` that evaluates
the mathematically identical jnp composition for tangents (and hence, via
JAX transpose, for the adjoint). For the Krylov hot loop the solvers can use
a forward-difference JVP built from two primal kernel calls — exactly the
reference's matrix-free PETSc MFFD operator (NKSolvers.F90 NKMatMult:244).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adflow_tpu.core.refstate import GAMMA, PR_LAMINAR, PR_TURB, S_SUTH
from adflow_tpu.physics import sa as _sa

_SIG = _sa.SIGMA

# On-device bisection knob (ADFLOW_TPU_RANS_STAGE): 6 = full kernel;
# 1 = inviscid only, 2 = +gradients, 3 = +SA source, 4/5/6 = +i/j/k
# viscous+SA face passes. Debug aid for Mosaic faults — stages < 6 produce
# wrong physics and are never used by the solver.
import os as _os

_STAGE = int(_os.environ.get("ADFLOW_TPU_RANS_STAGE", "6"))
_VMEM_MB = int(_os.environ.get("ADFLOW_TPU_RANS_VMEM_MB", "100"))


def _kernel(ni, nk, ti, vis2, vis4, expo, mu_inf, t_inf_dim, use_ft2,
            turb_scale,
            wt, vol, xc, dist, siE, sjE, skE, porI, porJ, porK, out,
            wS, volS, xcS, dS, siS, sjS, skS, piS, pjS, pkS, oS, sems):
    """Residual for interior i-rows [i0, i0+ti): all 6 channels.

    Slab row conventions (PC = padded-cell index within the slab):
      wS, volS:   rows 0..ti+3   = global padded rows i0..i0+ti+3
      xcS, dS:    rows 0..ti+1   = global EXT rows i0..i0+ti+1
                  (ext cell e = padded cell e+1; global ext row i0+a is the
                  padded row i0+a+1, so slab ext row a = slab PC row a+1)
      siS:        rows 0..ti+2; row m = face between PC rows m, m+1
      sjS:        rows = PC rows 1..ti+2 stored 0..ti+1; col n = face
                  between PC cols n, n+1
      skS:        rows = PC rows 1..ti+2 stored 0..ti+1; after the load
                  roll, lane f = k-face between PC lanes f, f+1
      porI:       rows 0..ti (interior i-faces of this slab's out rows)
      porJ/porK:  rows = out rows 0..ti-1
      oS:         rows 0..ti-1 = interior cells; lanes PC (valid 2..nk+1)
    """
    it = pl.program_id(0)
    i0 = jnp.minimum(it * ti, ni - ti)   # clamp: last tile overlaps

    copies = [
        pltpu.make_async_copy(wt.at[:, pl.ds(i0, ti + 4)], wS, sems.at[0]),
        pltpu.make_async_copy(vol.at[pl.ds(i0, ti + 4)], volS, sems.at[1]),
        pltpu.make_async_copy(xc.at[:, pl.ds(i0, ti + 2)], xcS, sems.at[2]),
        pltpu.make_async_copy(dist.at[pl.ds(i0, ti + 2)], dS, sems.at[3]),
        pltpu.make_async_copy(siE.at[:, pl.ds(i0, ti + 3)], siS, sems.at[4]),
        pltpu.make_async_copy(sjE.at[:, pl.ds(i0, ti + 2)], sjS, sems.at[5]),
        pltpu.make_async_copy(skE.at[:, pl.ds(i0, ti + 2)], skS, sems.at[6]),
        pltpu.make_async_copy(porI.at[pl.ds(i0, ti + 1)], piS, sems.at[7]),
        pltpu.make_async_copy(porJ.at[pl.ds(i0, ti)], pjS, sems.at[8]),
        pltpu.make_async_copy(porK.at[pl.ds(i0, ti)], pkS, sems.at[9]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    def kroll(a, o):
        """kroll(a, o)[..., l] = a[..., l + o] (lane rotation)."""
        return a if o == 0 else jnp.roll(a, -o, axis=a.ndim - 1)

    f32 = jnp.float32

    if _STAGE < 1:                    # bisection stub: DMA in/out only
        for c in range(6):
            oS[c] = wS[c][2:-2, 2:-2] + volS[2:-2, 2:-2] \
                + xcS[0][1:-1, 1:-1] + dS[1:-1, 1:-1]
        outc = pltpu.make_async_copy(oS, out.at[:, pl.ds(i0, ti)],
                                     sems.at[10])
        outc.start()
        outc.wait()
        return

    # ---- derived cell fields on the full slab (ti+4, nj+4, kp), PC lanes --
    rho = wS[0]
    mx, my, mz, rhoE = wS[1], wS[2], wS[3], wS[4]
    nut = wS[5]
    inv_rho = 1.0 / rho
    u = mx * inv_rho
    v = my * inv_rho
    wv = mz * inv_rho
    ps = (GAMMA - 1.0) * (rhoE - 0.5 * (mx * u + my * v + mz * wv))
    T = GAMMA * ps * inv_rho
    s_suth = S_SUTH / t_inf_dim
    mu = mu_inf * T * jnp.sqrt(T) * ((1.0 + s_suth) / (T + s_suth))
    nu_lam = mu * inv_rho
    # eddy viscosity mu_t = rho nut+ fv1 (sa.py eddy_viscosity)
    nut_p0 = jnp.maximum(nut, 0.0)
    chi_mu = rho * nut_p0 / mu
    chi3 = chi_mu * chi_mu * chi_mu
    mut = rho * nut_p0 * (chi3 / (chi3 + _sa.CV1 ** 3))
    mu_eff = mu + mut
    k_eff = mu / (PR_LAMINAR * (GAMMA - 1.0)) + mut / (PR_TURB * (GAMMA - 1.0))
    nu_eff_sa = nu_lam + nut_p0        # SA diffusivity (nu + nuT)+

    # face-aligned metric views (PC conventions per the docstring)
    siV = [siS[c] for c in range(3)]                       # lane = ext k
    siV = [kroll(a, -1) for a in siV]                      # lane -> PC
    sjV = [kroll(sjS[c], -1) for c in range(3)]
    # skE's own k index IS the face index (face f touches PC f, f+1)
    skV = [skS[c] for c in range(3)]
    xcV = [kroll(xcS[c], -1) for c in range(3)]            # lane -> PC
    dV = kroll(dS[:], -1)                                  # lane -> PC

    # ======================================================================
    # PART 1: central + JST on the 5 mean-flow channels
    # ======================================================================
    def sens(pm, p0, pp):
        return jnp.abs(pp - 2.0 * p0 + pm) / (pp + 2.0 * p0 + pm)

    # sensor at one-ring ext (rows 1..ti+2 stored 0..ti+1, cols 1..nj+2)
    nu_s = sens(ps[:-2, 1:-1], ps[1:-1, 1:-1], ps[2:, 1:-1])
    nu_s = jnp.maximum(nu_s, sens(ps[1:-1, :-2], ps[1:-1, 1:-1],
                                  ps[1:-1, 2:]))
    nu_s = jnp.maximum(nu_s, sens(kroll(ps, -1), ps, kroll(ps, 1))[1:-1, 1:-1])

    # spectral radii at ext cells (rows 0..ti+1 of (ti+2), cols (nj+2), PC)
    rE = rho[1:-1, 1:-1]
    uE, vE, wE = u[1:-1, 1:-1], v[1:-1, 1:-1], wv[1:-1, 1:-1]
    cE = jnp.sqrt(GAMMA * ps[1:-1, 1:-1] / rE)

    def rad_of(sx, sy, sz):
        un = uE * sx + vE * sy + wE * sz
        return jnp.abs(un) + cE * jnp.sqrt(sx * sx + sy * sy + sz * sz)

    # cell-averaged face areas; ext cell at slab PC row r lives at
    # radii-array row r-1 (r = 1..ti+2)
    radI = rad_of(*[0.5 * (siV[c][:-1] + siV[c][1:]) for c in range(3)])
    radJ = rad_of(*[0.5 * (sjV[c][:, :-1] + sjV[c][:, 1:])
                    for c in range(3)])
    radK = rad_of(*[0.5 * (kroll(skV[c], -1) + skV[c]) for c in range(3)])
    epsr = 1e-30

    def scale3(ra, rb, rc):
        return ra * (1.0 + (rb / (ra + epsr)) ** expo
                     + (rc / (ra + epsr)) ** expo)

    sradI = scale3(radI, radJ, radK)
    sradJ = scale3(radJ, radI, radK)
    sradK = scale3(radK, radI, radJ)

    wvars = [rho, mx, my, mz, rhoE]
    dvars = [rho, mx, my, mz, rhoE + ps]

    def flux_pack(stW, stP, s_faces, por):
        (_, rL, rR, _) = stW[0]
        (_, pL, pR, _) = stP
        sx, sy, sz = s_faces
        xL, yL, zL = stW[1][1], stW[2][1], stW[3][1]
        xR, yR, zR = stW[1][2], stW[2][2], stW[3][2]
        eL, eR = stW[4][1], stW[4][2]
        qL = (xL * sx + yL * sy + zL * sz) / rL * por
        qR = (xR * sx + yR * sy + zR * sz) / rR * por
        pa = 0.5 * (pL + pR)
        return [0.5 * (rL * qL + rR * qR),
                0.5 * (xL * qL + xR * qR) + pa * sx,
                0.5 * (yL * qL + yR * qR) + pa * sy,
                0.5 * (zL * qL + zR * qR) + pa * sz,
                0.5 * ((eL + pL) * qL + (eR + pR) * qR)]

    def diss_terms(nuL, nuR, lamL, lamR, por):
        lam = 0.5 * (lamL + lamR)
        e2 = vis2 * jnp.maximum(nuL, nuR)
        return lam, e2 * por, jnp.maximum(0.0, vis4 - e2) * por

    R = [None] * 6

    def add_R(c, dR):
        R[c] = dR if R[c] is None else R[c] + dR

    # ---- i-direction: face ff (0..ti) between PC rows ff+1, ff+2 ---------
    st_i = [tuple(a[f:f + ti + 1, 2:-2] for f in range(4)) for a in wvars]
    pst_i = tuple(ps[f:f + ti + 1, 2:-2] for f in range(4))
    dst_i = [tuple(a[f:f + ti + 1, 2:-2] for f in range(4)) for a in dvars]
    s_i = tuple(siV[c][1:-1, 1:-1] for c in range(3))
    por_i = kroll(piS[:], -2)
    f_i = flux_pack(st_i, pst_i, s_i, por_i)
    nuA, srA = nu_s[:, 1:-1], sradI[:, 1:-1]
    lam, eps2, eps4 = diss_terms(nuA[:-1], nuA[1:], srA[:-1], srA[1:], por_i)
    for c in range(5):
        dL, dR_, dLL, dRR = dst_i[c][1], dst_i[c][2], dst_i[c][0], dst_i[c][3]
        fc = f_i[c] - lam * (eps2 * (dR_ - dL)
                             - eps4 * (dRR - 3.0 * dR_ + 3.0 * dL - dLL))
        add_R(c, fc[1:] - fc[:-1])

    # ---- j-direction ------------------------------------------------------
    njp4 = ps.shape[1]
    st_j = [tuple(a[2:-2, f:f + njp4 - 3] for f in range(4)) for a in wvars]
    pst_j = tuple(ps[2:-2, f:f + njp4 - 3] for f in range(4))
    dst_j = [tuple(a[2:-2, f:f + njp4 - 3] for f in range(4)) for a in dvars]
    s_j = tuple(sjV[c][1:-1, 1:-1] for c in range(3))
    por_j = kroll(pjS[:], -2)
    f_j = flux_pack(st_j, pst_j, s_j, por_j)
    nuA, srA = nu_s[1:-1], sradJ[1:-1]
    lam, eps2, eps4 = diss_terms(nuA[:, :-1], nuA[:, 1:],
                                 srA[:, :-1], srA[:, 1:], por_j)
    for c in range(5):
        dL, dR_, dLL, dRR = dst_j[c][1], dst_j[c][2], dst_j[c][0], dst_j[c][3]
        fc = f_j[c] - lam * (eps2 * (dR_ - dL)
                             - eps4 * (dRR - 3.0 * dR_ + 3.0 * dL - dLL))
        add_R(c, fc[:, 1:] - fc[:, :-1])

    # ---- k-direction: flux at lane f = face between PC lanes f, f+1 ------
    st_k = [tuple(kroll(a[2:-2, 2:-2], f - 1) for f in range(4))
            for a in wvars]
    pst_k = tuple(kroll(ps[2:-2, 2:-2], f - 1) for f in range(4))
    dst_k = [tuple(kroll(a[2:-2, 2:-2], f - 1) for f in range(4))
             for a in dvars]
    s_k = tuple(skV[c][1:-1, 1:-1] for c in range(3))
    # interior k-face kf (0..nk) = face lane f = kf+1 -> roll by -1
    por_k = kroll(pkS[:], -1)
    f_k = flux_pack(st_k, pst_k, s_k, por_k)
    nuA, srA = nu_s[1:-1, 1:-1], sradK[1:-1, 1:-1]
    lam, eps2, eps4 = diss_terms(nuA, kroll(nuA, 1), srA, kroll(srA, 1),
                                 por_k)
    for c in range(5):
        dL, dR_, dLL, dRR = dst_k[c][1], dst_k[c][2], dst_k[c][0], dst_k[c][3]
        fc = f_k[c] - lam * (eps2 * (dR_ - dL)
                             - eps4 * (dRR - 3.0 * dR_ + 3.0 * dL - dLL))
        # interior cell PC lane m: upper face lane m, lower face lane m-1
        add_R(c, fc - kroll(fc, -1))

    # ======================================================================
    # PART 2: Green-Gauss cell gradients of (u, v, w, T, nuTilde) at the
    # one-ring ext cells (rows 1..ti+2 of the slab, stored 0..ti+1)
    # ======================================================================
    if _STAGE < 2:                    # bisection stub: inviscid only
        zi = jnp.zeros_like(rho[2:-2, 2:-2])
        add_R(5, zi)
        for c in range(6):
            oS[c] = R[c]
        outc = pltpu.make_async_copy(oS, out.at[:, pl.ds(i0, ti)],
                                     sems.at[10])
        outc.start()
        outc.wait()
        return

    fields = [u, v, wv, T, nut]
    volE = volS[1:-1, 1:-1]          # ext rows/cols, PC lanes
    inv_volE = 1.0 / volE
    grads = []                        # 5 fields x 3 comps, (ti+2, nj+2, kp)
    for phi in fields:
        phc = phi[1:-1, 1:-1]
        dpi = 0.5 * (phi[2:, 1:-1] - phc)       # +i neighbor minus center
        dmi = 0.5 * (phi[:-2, 1:-1] - phc)
        dpj = 0.5 * (phi[1:-1, 2:] - phc)
        dmj = 0.5 * (phi[1:-1, :-2] - phc)
        dpk = 0.5 * (kroll(phi, 1) - phi)[1:-1, 1:-1]
        dmk = 0.5 * (kroll(phi, -1) - phi)[1:-1, 1:-1]
        gcomp = []
        for c in range(3):
            acc = (dpi * siV[c][1:] - dmi * siV[c][:-1]
                   + dpj * sjV[c][:, 1:] - dmj * sjV[c][:, :-1]
                   + dpk * skV[c] - dmk * kroll(skV[c], -1))
            gcomp.append(acc * inv_volE)
        grads.append(gcomp)

    # cb2 |grad nut|^2 and vorticity at interior cells (rows 1..ti of the
    # grad arrays = interior PC rows 2..ti+1; cols 1..nj; lanes PC)
    ii = (slice(1, -1), slice(1, -1))
    gnut2 = sum(grads[4][c][ii] ** 2 for c in range(3))
    wx = grads[2][1][ii] - grads[1][2][ii]
    wy = grads[0][2][ii] - grads[2][0][ii]
    wz = grads[1][0][ii] - grads[0][1][ii]
    omega = jnp.sqrt(jnp.maximum(wx * wx + wy * wy + wz * wz, 1e-32))

    if _STAGE < 3:                    # bisection stub: +gradients only
        add_R(5, gnut2 + omega)
        for c in range(6):
            oS[c] = R[c]
        outc = pltpu.make_async_copy(oS, out.at[:, pl.ds(i0, ti)],
                                     sems.at[10])
        outc.start()
        outc.wait()
        return

    # ======================================================================
    # PART 3: SA source terms (sa.F90 saSource:89; physics/sa.py twin)
    # ======================================================================
    nut_c = nut[2:-2, 2:-2]
    nu_c = nu_lam[2:-2, 2:-2]
    vol_c = volS[2:-2, 2:-2]
    d_c = jnp.maximum(dV[1:-1, 1:-1], 1e-12)
    nut_pos = jnp.maximum(nut_c, 1e-14)
    chi = nut_pos / nu_c
    chi3c = chi * chi * chi
    fv1 = chi3c / (chi3c + _sa.CV1 ** 3)
    fv2 = 1.0 - chi / (1.0 + chi * fv1)
    inv_k2d2 = 1.0 / (_sa.KARMAN ** 2 * d_c * d_c)
    s_tilde = omega + nut_pos * fv2 * inv_k2d2
    s_tilde = jnp.maximum(s_tilde, 0.3 * omega + 1e-16)
    ft2 = (_sa.CT3 * jnp.exp(-_sa.CT4 * chi * chi) if use_ft2 else 0.0)
    r_sa = jnp.minimum(nut_pos * inv_k2d2 / s_tilde, 10.0)
    r6 = r_sa ** 6
    g_fw = jnp.minimum(r_sa + _sa.CW2 * (r6 - r_sa), 100.0)
    g6 = g_fw ** 6
    fw = g_fw * ((1.0 + _sa.CW3 ** 6) / (g6 + _sa.CW3 ** 6)) ** (1.0 / 6.0)
    prod = _sa.CB1 * (1.0 - ft2) * s_tilde * nut_c
    destr = (_sa.CW1 * fw - _sa.CB1 / _sa.KARMAN ** 2 * ft2) \
        * (nut_c / d_c) ** 2
    Rt = -(prod - destr) * vol_c
    Rt = Rt - (_sa.CB2 / _SIG) * gnut2 * vol_c

    # ======================================================================
    # PART 4: viscous + SA advection/diffusion, per face direction
    # ======================================================================
    velf = (u, v, wv)
    q_div = None

    def face_gradient(axis_pack):
        """gbar + normal correction for all 5 fields at this axis's faces.

        axis_pack supplies, per needed array, a pair (L, R) view at faces:
          gL/gR: cell gradients; xL/xR: centers; phL/phR: fields.
        Returns list[5] of 3-component face gradients.
        """
        (gLR, xLR, phLR) = axis_pack
        xL, xR = xLR
        delta = [xR[c] - xL[c] for c in range(3)]
        dist2 = jnp.maximum(sum(dd * dd for dd in delta), 1e-30)
        inv_d = 1.0 / jnp.sqrt(dist2)
        ehat = [dd * inv_d for dd in delta]
        out5 = []
        for f in range(5):
            gL, gR = gLR(f)
            phL, phR = phLR(f)
            gbar = [0.5 * (gL[c] + gR[c]) for c in range(3)]
            g_e = sum(gbar[c] * ehat[c] for c in range(3))
            corr = (phR - phL) * inv_d - g_e
            out5.append([gbar[c] + corr * ehat[c] for c in range(3)])
        return out5

    def visc_flux(gf5, mu_f, k_f, vf, s_face):
        """(0, fmom(3), fen) viscous flux . S at faces."""
        gu = [gf5[a] for a in range(3)]          # gu[a][b] = d u_a / d x_b
        div = gu[0][0] + gu[1][1] + gu[2][2]
        fmom = []
        for a in range(3):
            acc = 0.0
            for b in range(3):
                tau_ab = mu_f * (gu[a][b] + gu[b][a])
                if a == b:
                    tau_ab = tau_ab - (2.0 / 3.0) * mu_f * div
                acc = acc + tau_ab * s_face[b]
            fmom.append(acc)
        fen = sum(vf[a] * fmom[a] for a in range(3)) \
            + k_f * sum(gf5[3][c] * s_face[c] for c in range(3))
        return fmom, fen

    if _STAGE < 4:                    # bisection stub: +SA source only
        add_R(5, Rt)
        for c in range(6):
            oS[c] = R[c]
        outc = pltpu.make_async_copy(oS, out.at[:, pl.ds(i0, ti)],
                                     sems.at[10])
        outc.start()
        outc.wait()
        return

    # ---------- i-faces: ff = 0..ti between PC rows ff+1, ff+2 ------------
    # grads array row rg = PC row rg+1 -> faces use grad rows ff..ff+1
    s_face = [siV[c][1:-1, 1:-1] for c in range(3)]
    gLR = lambda f: ([grads[f][c][:-1, 1:-1] for c in range(3)],
                     [grads[f][c][1:, 1:-1] for c in range(3)])
    xLR = ([xcV[c][:-1, 1:-1] for c in range(3)],
           [xcV[c][1:, 1:-1] for c in range(3)])
    phLR = lambda f: (fields[f][1:-2, 2:-2], fields[f][2:-1, 2:-2])
    gf5 = face_gradient((gLR, xLR, phLR))
    mu_f = 0.5 * (mu_eff[1:-2, 2:-2] + mu_eff[2:-1, 2:-2])
    k_f = 0.5 * (k_eff[1:-2, 2:-2] + k_eff[2:-1, 2:-2])
    vf = [0.5 * (velf[a][1:-2, 2:-2] + velf[a][2:-1, 2:-2]) for a in range(3)]
    fmom, fen = visc_flux(gf5, mu_f, k_f, vf, s_face)
    for a in range(3):
        add_R(1 + a, -(fmom[a][1:] - fmom[a][:-1]))
    add_R(4, -(fen[1:] - fen[:-1]))
    # SA advection + diffusion on i-faces
    q_f = sum(vf[a] * s_face[a] for a in range(3))
    nt_up = jnp.where(q_f >= 0.0, nut[1:-2, 2:-2], nut[2:-1, 2:-2])
    fadv = q_f * nt_up
    nue_f = 0.5 * (nu_eff_sa[1:-2, 2:-2] + nu_eff_sa[2:-1, 2:-2])
    fdif = (1.0 / _SIG) * nue_f * sum(gf5[4][c] * s_face[c] for c in range(3))
    Rt = Rt + (fadv[1:] - fadv[:-1]) - (fdif[1:] - fdif[:-1])
    q_div = q_f[1:] - q_f[:-1]

    if _STAGE < 5:                    # bisection stub: +i faces only
        add_R(5, Rt)
        for c in range(6):
            oS[c] = R[c]
        outc = pltpu.make_async_copy(oS, out.at[:, pl.ds(i0, ti)],
                                     sems.at[10])
        outc.start()
        outc.wait()
        return

    # ---------- j-faces: n = 0..nj between PC cols n+1, n+2 ---------------
    s_face = [sjV[c][1:-1, 1:-1] for c in range(3)]
    gLR = lambda f: ([grads[f][c][1:-1, :-1] for c in range(3)],
                     [grads[f][c][1:-1, 1:] for c in range(3)])
    xLR = ([xcV[c][1:-1, :-1] for c in range(3)],
           [xcV[c][1:-1, 1:] for c in range(3)])
    phLR = lambda f: (fields[f][2:-2, 1:-2], fields[f][2:-2, 2:-1])
    gf5 = face_gradient((gLR, xLR, phLR))
    mu_f = 0.5 * (mu_eff[2:-2, 1:-2] + mu_eff[2:-2, 2:-1])
    k_f = 0.5 * (k_eff[2:-2, 1:-2] + k_eff[2:-2, 2:-1])
    vf = [0.5 * (velf[a][2:-2, 1:-2] + velf[a][2:-2, 2:-1]) for a in range(3)]
    fmom, fen = visc_flux(gf5, mu_f, k_f, vf, s_face)
    for a in range(3):
        add_R(1 + a, -(fmom[a][:, 1:] - fmom[a][:, :-1]))
    add_R(4, -(fen[:, 1:] - fen[:, :-1]))
    q_f = sum(vf[a] * s_face[a] for a in range(3))
    nt_up = jnp.where(q_f >= 0.0, nut[2:-2, 1:-2], nut[2:-2, 2:-1])
    fadv = q_f * nt_up
    nue_f = 0.5 * (nu_eff_sa[2:-2, 1:-2] + nu_eff_sa[2:-2, 2:-1])
    fdif = (1.0 / _SIG) * nue_f * sum(gf5[4][c] * s_face[c] for c in range(3))
    Rt = Rt + (fadv[:, 1:] - fadv[:, :-1]) - (fdif[:, 1:] - fdif[:, :-1])
    q_div = q_div + (q_f[:, 1:] - q_f[:, :-1])

    if _STAGE < 6:                    # bisection stub: +j faces only
        add_R(5, Rt)
        for c in range(6):
            oS[c] = R[c]
        outc = pltpu.make_async_copy(oS, out.at[:, pl.ds(i0, ti)],
                                     sems.at[10])
        outc.start()
        outc.wait()
        return

    # ---------- k-faces: lane f between PC lanes f, f+1 -------------------
    s_face = [skV[c][1:-1, 1:-1] for c in range(3)]
    gi = (slice(1, -1), slice(1, -1))
    gLR = lambda f: ([grads[f][c][gi] for c in range(3)],
                     [kroll(grads[f][c], 1)[gi] for c in range(3)])
    xLR = ([xcV[c][1:-1, 1:-1] for c in range(3)],
           [kroll(xcV[c], 1)[1:-1, 1:-1] for c in range(3)])
    phLR = lambda f: (fields[f][2:-2, 2:-2], kroll(fields[f], 1)[2:-2, 2:-2])
    gf5 = face_gradient((gLR, xLR, phLR))
    mu_f = 0.5 * (mu_eff + kroll(mu_eff, 1))[2:-2, 2:-2]
    k_f = 0.5 * (k_eff + kroll(k_eff, 1))[2:-2, 2:-2]
    vf = [0.5 * (velf[a] + kroll(velf[a], 1))[2:-2, 2:-2] for a in range(3)]
    fmom, fen = visc_flux(gf5, mu_f, k_f, vf, s_face)
    for a in range(3):
        add_R(1 + a, -(fmom[a] - kroll(fmom[a], -1)))
    add_R(4, -(fen - kroll(fen, -1)))
    q_f = sum(vf[a] * s_face[a] for a in range(3))
    nt_up = jnp.where(q_f >= 0.0, nut[2:-2, 2:-2],
                      kroll(nut, 1)[2:-2, 2:-2])
    fadv = q_f * nt_up
    nue_f = 0.5 * (nu_eff_sa + kroll(nu_eff_sa, 1))[2:-2, 2:-2]
    fdif = (1.0 / _SIG) * nue_f * sum(gf5[4][c] * s_face[c] for c in range(3))
    Rt = Rt + (fadv - kroll(fadv, -1)) - (fdif - kroll(fdif, -1))
    q_div = q_div + (q_f - kroll(q_f, -1))

    # non-conservative correction + row scale (sa.py)
    Rt = Rt - nut_c * q_div
    add_R(5, Rt * turb_scale)

    for c in range(6):
        oS[c] = R[c]
    outc = pltpu.make_async_copy(oS, out.at[:, pl.ds(i0, ti)], sems.at[10])
    outc.start()
    outc.wait()


@functools.lru_cache(maxsize=32)
def _build_call(dims, kp, ti, vis2, vis4, expo, mu_inf, t_inf_dim, use_ft2,
                turb_scale, interpret):
    ni, nj, nk = dims
    grid = (max(1, -(-ni // ti)),)
    f32 = jnp.float32
    kern = functools.partial(_kernel, ni, nk, ti, vis2, vis4, expo, mu_inf,
                             t_inf_dim, use_ft2, turb_scale)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 10,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((6, ni, nj, kp), f32),
        scratch_shapes=[
            pltpu.VMEM((6, ti + 4, nj + 4, kp), f32),   # w slab
            pltpu.VMEM((ti + 4, nj + 4, kp), f32),      # vol slab
            pltpu.VMEM((3, ti + 2, nj + 2, kp), f32),   # xc slab
            pltpu.VMEM((ti + 2, nj + 2, kp), f32),      # dist slab
            pltpu.VMEM((3, ti + 3, nj + 2, kp), f32),   # siE slab
            pltpu.VMEM((3, ti + 2, nj + 3, kp), f32),   # sjE slab
            pltpu.VMEM((3, ti + 2, nj + 2, kp), f32),   # skE slab
            pltpu.VMEM((ti + 1, nj, kp), f32),          # porI slab
            pltpu.VMEM((ti, nj + 1, kp), f32),          # porJ slab
            pltpu.VMEM((ti, nj, kp), f32),              # porK slab
            pltpu.VMEM((6, ti, nj, kp), f32),           # out slab
            pltpu.SemaphoreType.DMA((11,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_MB * 2 ** 20),
        interpret=interpret,
    )


def pick_tile(ni, nj, nk, budget_bytes=10 * 2 ** 20):
    """Largest i-tile whose VMEM input slabs fit the budget (the compute
    intermediates are roughly 2x the slab footprint; budget keeps total
    under the 100 MB limit with headroom)."""
    lane = -(-(nk + 4) // 128) * 128
    sub = -(-(nj + 4) // 8) * 8
    per_plane = lane * sub * 4
    for ti in (32, 16, 8, 4, 2, 1):
        if ti > ni:
            continue
        rows = (6 * (ti + 4) + (ti + 4) + 3 * (ti + 2) + (ti + 2)
                + 3 * (ti + 3) + 3 * (ti + 2) + 3 * (ti + 2)
                + (ti + 1) + 2 * ti + 6 * ti)
        if rows * per_plane <= budget_bytes:
            return ti
    return 1


def _prep_inputs(w6, metrics, dist, por):
    """Host/trace-side reshuffle into the kernel layout (channels first,
    k-padded). Pure slicing/pad — fuses into the surrounding jit."""
    nip4, njp4, nkp4 = w6.shape[0], w6.shape[1], w6.shape[2]
    nk = nkp4 - 4
    kp = -(-nkp4 // 128) * 128
    f32 = jnp.float32

    def padk(a):
        pad = [(0, 0)] * (a.ndim - 1) + [(0, kp - a.shape[-1])]
        return jnp.pad(a.astype(f32), pad)

    wt = padk(jnp.moveaxis(w6, -1, 0))
    vol = padk(metrics.vol)
    xc = padk(jnp.moveaxis(metrics.xc_ext, -1, 0))
    dst = padk(dist)
    siE = padk(jnp.moveaxis(metrics.siE, -1, 0))
    sjE = padk(jnp.moveaxis(metrics.sjE, -1, 0))
    skE = padk(jnp.moveaxis(metrics.skE, -1, 0))
    porI = padk(jnp.asarray(por[0], f32))
    porJ = padk(jnp.asarray(por[1], f32))
    porK = padk(jnp.asarray(por[2], f32))
    # Mosaic operands must be BUFFERS: when metrics/porosities are jit
    # closure constants, XLA folds the pad/transpose and feeds the kernel an
    # HLO constant, whose placement faults the DMA engine (measured: the
    # same kernel runs with the arrays as jit parameters and device-faults
    # with them as constants — and the fault wedges the TPU for the rest of
    # the process). optimization_barrier stops the folding.
    args = jax.lax.optimization_barrier(
        (wt, vol, xc, dst, siE, sjE, skE, porI, porJ, porK))
    return args, kp, nk


def _pallas_impl(w6, siE, sjE, skE, vol, xc, dist, porI, porJ, porK,
                 vis2, vis4, expo, mu_inf, t_inf_dim, use_ft2, turb_scale):
    from adflow_tpu.geom.metrics import BlockMetrics
    m = BlockMetrics(siE=siE, sjE=sjE, skE=skE, vol=vol, xc_ext=xc)
    (args, kp, nk) = _prep_inputs(w6, m, dist, (porI, porJ, porK))
    ni, nj = w6.shape[0] - 4, w6.shape[1] - 4
    ti = pick_tile(ni, nj, nk)
    interpret = jax.default_backend() != "tpu"
    call = _build_call((ni, nj, nk), kp, ti, float(vis2), float(vis4),
                       float(expo), float(mu_inf), float(t_inf_dim),
                       bool(use_ft2), float(turb_scale), interpret)
    out = call(*args)
    return jnp.moveaxis(out[..., 2:nk + 2], 0, -1)


def _jnp_reference(w6, siE, sjE, skE, vol, xc, dist, porI, porJ, porK,
                   vis2, vis4, expo, mu_inf, t_inf_dim, use_ft2, turb_scale):
    """The mathematically identical XLA composition (tangent/adjoint path)."""
    from adflow_tpu.geom.metrics import BlockMetrics
    from adflow_tpu.physics.fluxes import inviscid_residual
    from adflow_tpu.physics.residual import ProblemConfig
    from adflow_tpu.physics.sa import sa_residual
    from adflow_tpu.physics.thermo import pressure
    from adflow_tpu.physics.viscous import viscous_residual

    class _Ref:
        pass

    ref = _Ref()
    ref.mu_inf = mu_inf
    ref.t_inf_dim = t_inf_dim
    m = BlockMetrics(siE=siE, sjE=sjE, skE=skE, vol=vol, xc_ext=xc)
    cfg = ProblemConfig(equation_type="rans", vis2=vis2, vis4=vis4,
                        diss_exponent=expo, turbulence_model="sa",
                        turb_res_scale=turb_scale, use_ft2=use_ft2)
    p = pressure(w6)
    r = inviscid_residual(w6, p, m, vis2, vis4, expo,
                          por=(porI, porJ, porK))
    r = r + viscous_residual(w6, p, m, cfg, ref)
    rt = sa_residual(w6, p, m, cfg, ref, dist)
    return jnp.concatenate([r, rt], axis=-1)


@functools.partial(jax.custom_jvp, nondiff_argnums=(10, 11, 12, 13, 14, 15,
                                                    16))
def fused_rans_residual(w6, siE, sjE, skE, vol, xc, dist, porI, porJ, porK,
                        vis2, vis4, expo, mu_inf, t_inf_dim, use_ft2,
                        turb_scale):
    """Drop-in fused full-RANS (SA) residual: all 6 channels in one kernel.

    Primal runs the Pallas blockette; jvp/vjp run through the jnp twin so
    exact-AD Newton matvecs and the adjoint keep working with the kernel
    enabled. The FD matvec path (solvers) uses the primal twice instead.
    """
    return _pallas_impl(w6, siE, sjE, skE, vol, xc, dist, porI, porJ, porK,
                        vis2, vis4, expo, mu_inf, t_inf_dim, use_ft2,
                        turb_scale)


@fused_rans_residual.defjvp
def _fused_jvp(vis2, vis4, expo, mu_inf, t_inf_dim, use_ft2, turb_scale,
               primals, tangents):
    out = fused_rans_residual(*primals, vis2, vis4, expo, mu_inf, t_inf_dim,
                              use_ft2, turb_scale)
    _, t = jax.jvp(
        lambda *a: _jnp_reference(*a, vis2, vis4, expo, mu_inf, t_inf_dim,
                                  use_ft2, turb_scale), primals, tangents)
    return out, t
