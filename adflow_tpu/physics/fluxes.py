"""Inviscid fluxes: central + JST scalar dissipation, spectral radii.

Reference analogues (`/root/reference/src/solver/fluxes.F90`):
- ``inviscidCentralFlux`` (:4) — here: average-of-analytic-fluxes form.
- ``inviscidDissFluxScalar`` (:1049) — JST 2nd/4th-difference blend with a
  pressure-based shock sensor and directionally-scaled spectral radii
  (``dissipationScalingExponent``), energy row differenced on rhoE+p.
- spectral radii: ``timeStep_block`` (`src/solver/solverUtils.F90:43`).

Everything is written as whole-array slicing over the halo-padded block so
XLA fuses the stencils; the same functions are the reference point for the
Pallas blockette kernel (SURVEY.md §2.5).

Shapes for a block with (ni, nj, nk) interior cells:
  w, p: halo-padded (ni+4, nj+4, nk+4, ...)
  si: (ni+1, nj, nk, 3), sj/sk analogous
  returns residual contributions on the interior (ni, nj, nk, 5).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from adflow_tpu.core.refstate import GAMMA
from adflow_tpu.physics.thermo import IMX, IMZ, IRHO, IRHOE


def _euler_flux(w, p, svec):
    """F(w) . S for conservative w and face-area vector svec (trailing 3)."""
    rho = w[..., IRHO]
    m = w[..., IMX:IMZ + 1]
    q = jnp.sum(m * svec, axis=-1) / rho          # u.S
    fmass = rho * q
    fmom = m * q[..., None] + p[..., None] * svec
    fen = (w[..., IRHOE] + p) * q
    return jnp.concatenate(
        [fmass[..., None], fmom, fen[..., None]], axis=-1)


def _shift(a, axis, lo, hi):
    """a sliced [lo : len+hi] along axis (hi <= 0 means from the end)."""
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(lo, a.shape[axis] + hi if hi < 0 else None)
    return a[tuple(idx)]


def extended_face_areas(metrics):
    """Face-area arrays on the one-ring extended cell grid, for spectral
    radii at halo cells (stored in BlockMetrics: true values at shard
    interfaces, edge-replicated at physical boundaries)."""
    return metrics.siE, metrics.sjE, metrics.skE


LS_PRECON_K = 3.0          # beta^2 = clip(max(M^2, K Mref^2), eps, 1)


def spectral_radii(w, p, metrics, precon_mach: float = 0.0
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Convective spectral radii (radI, radJ, radK) per cell on the one-ring
    extended grid: shape (ni+2, nj+2, nk+2). rad = |u . sAvg| + c |sAvg|.

    ``precon_mach`` > 0 switches on the Weiss-Smith low-speed
    preconditioner's eigenvalues (reference: lowSpeedPreconditioner,
    residuals.F90:172-331): the acoustic speed is rescaled by
    beta^2 = clip(max(M_loc^2, K Mref^2), ., 1) so artificial dissipation
    and pseudo-time steps stay O(u) as M -> 0 instead of O(c) — the fix
    for the central scheme's low-Mach accuracy/stiffness (hydrofoil and
    wind-turbine class cases, doc/verification.rst:26-50)."""
    wE = w[1:-1, 1:-1, 1:-1]
    pE = p[1:-1, 1:-1, 1:-1]
    rho = wE[..., IRHO]
    vel = wE[..., IMX:IMZ + 1] / rho[..., None]
    c2 = GAMMA * pE / rho
    c = jnp.sqrt(c2)
    beta2 = None
    if precon_mach and precon_mach > 0.0:
        m2 = jnp.sum(vel * vel, axis=-1) / c2
        beta2 = jnp.clip(jnp.maximum(m2, LS_PRECON_K * precon_mach ** 2),
                         1e-10, 1.0)
    siE, sjE, skE = extended_face_areas(metrics)

    def rad(sE, vfE, axis):
        s_avg = 0.5 * (_shift(sE, axis, 0, -1) + _shift(sE, axis, 1, 0))
        un = jnp.sum(vel * s_avg, axis=-1)
        if vfE is not None:
            # ALE: convective speed relative to the moving faces
            vf_avg = 0.5 * (_shift(vfE, axis, 0, -1) + _shift(vfE, axis, 1, 0))
            un = un - jnp.sum(vf_avg * s_avg, axis=-1)
        smag = jnp.linalg.norm(s_avg, axis=-1)
        if beta2 is None:
            return jnp.abs(un) + c * smag
        # preconditioned system eigenvalue (Weiss-Smith):
        # lam = 0.5 (1+b2)|un| + sqrt(0.25 (1-b2)^2 un^2 + b2 c^2 |S|^2);
        # b2 = 1 recovers |un| + c|S| exactly
        return (0.5 * (1.0 + beta2) * jnp.abs(un)
                + jnp.sqrt(0.25 * (1.0 - beta2) ** 2 * un * un
                           + beta2 * c2 * smag * smag))

    return (rad(siE, metrics.vfIE, 0), rad(sjE, metrics.vfJE, 1),
            rad(skE, metrics.vfKE, 2))


def scaled_diss_radii(radI, radJ, radK, exponent: float):
    """Directional scaling of the dissipation coefficient,
    phi_i = 1 + (radJ/radI)^x + (radK/radI)^x (fluxes.F90 JST scaling)."""
    eps = 1e-30

    def scale(ra, rb, rc):
        return ra * (1.0 + (rb / (ra + eps)) ** exponent
                     + (rc / (ra + eps)) ** exponent)

    return (scale(radI, radJ, radK), scale(radJ, radI, radK),
            scale(radK, radI, radJ))


def inviscid_residual(w, p, metrics, vis2: float, vis4: float,
                      diss_exponent: float = 0.67, por=None,
                      const_diss: bool = False, precon_mach: float = 0.0):
    """Central + JST residual on the interior, positive = net outflow.

    ``por``: optional per-axis face porosity masks (1 = normal flux, 0 =
    solid-wall face). At zero-porosity faces the convective velocity and the
    artificial dissipation are switched off so only the pressure acts —
    the reference's boundFlux treatment (fluxes.F90:60-77, porosities from
    preprocessingAPI.F90:524 setPorosities). Without it, mirror ghosts leak
    momentum convection and JST dissipation through walls.

    Returns R with shape (ni, nj, nk, 5): sum over faces of
    (central flux - artificial dissipation flux) . S.
    """
    radI, radJ, radK = spectral_radii(w, p, metrics, precon_mach)
    sradI, sradJ, sradK = scaled_diss_radii(radI, radJ, radK, diss_exponent)

    # shock sensor per cell on the extended grid needs p two-deep: full array
    nu = _pressure_sensor(p)

    # rhoE+p in the dissipation energy row (5 mean-flow vars only)
    wd = jnp.concatenate(
        [w[..., :IRHOE], (w[..., IRHOE] + p)[..., None]], axis=-1)

    R = None
    for axis, (s, srad, vf) in enumerate(
            [(metrics.si, sradI, metrics.vfI),
             (metrics.sj, sradJ, metrics.vfJ),
             (metrics.sk, sradK, metrics.vfK)]):
        mask = None if por is None else por[axis]
        flux = _face_flux_axis(w, p, wd, nu, s, srad, axis, vis2, vis4, mask,
                               const_diss, vf=vf)
        dR = _shift(flux, axis, 1, 0) - _shift(flux, axis, 0, -1)
        R = dR if R is None else R + dR
    return R


def _pressure_sensor(p):
    """JST pressure switch nu = |d2p| / (p_{+1} + 2p + p_{-1}) per cell, on
    the one-ring extended grid, max over the three directions."""
    nu = None
    pe = p
    for axis in range(3):
        pm = _shift(pe, axis, 0, -2)
        p0 = _shift(pe, axis, 1, -1)
        pp = _shift(pe, axis, 2, 0)
        s = jnp.abs(pp - 2.0 * p0 + pm) / (pp + 2.0 * p0 + pm)
        # restrict other axes to the extended range [1:-1]
        idx = [slice(1, -1)] * 3
        idx[axis] = slice(None)
        s = s[tuple(idx)]
        nu = s if nu is None else jnp.maximum(nu, s)
    return nu


def _face_flux_axis(w, p, wd, nu, s, srad, axis, vis2, vis4, por=None,
                    const_diss: bool = False, vf=None):
    """Total face flux (central - dissipation) along one axis.

    Face f (0..n_ax) separates interior cells f-1, f; in padded coords the
    four-cell stencil is w[f .. f+3]. Output shape: faces x interior
    tangential x 5. ``por``: face porosity (see inviscid_residual).
    ``vf``: optional ALE face velocity vectors (same shape as s) — the
    convective velocity becomes relative to the moving face and the energy
    row gains the p * (vf . S) face-work term (inviscidCentralFlux with
    sFace, fluxes.F90:4; at zero-porosity moving walls the p*sdot piston
    work survives, matching the reference's boundFlux + sFace treatment).
    """
    it = [slice(2, -2)] * 3
    it[axis] = slice(None)

    wLL = _shift(w, axis, 0, -3)[tuple(it)]
    wL = _shift(w, axis, 1, -2)[tuple(it)]
    wR = _shift(w, axis, 2, -1)[tuple(it)]
    wRR = _shift(w, axis, 3, 0)[tuple(it)]
    pL = _shift(p, axis, 1, -2)[tuple(it)]
    pR = _shift(p, axis, 2, -1)[tuple(it)]

    sdot = None if vf is None else jnp.sum(vf * s, axis=-1)
    qL = jnp.sum(wL[..., IMX:IMZ + 1] * s, axis=-1) / wL[..., 0]
    qR = jnp.sum(wR[..., IMX:IMZ + 1] * s, axis=-1) / wR[..., 0]
    qrelL = qL if sdot is None else qL - sdot
    qrelR = qR if sdot is None else qR - sdot
    if por is not None:
        # kill convection (relative velocity) at solid faces; pressure
        # (+ moving-wall work) remains (fluxes.F90 boundFlux)
        pv = jnp.asarray(por, w.dtype)
        qrelL = qrelL * pv
        qrelR = qrelR * pv
    pa = 0.5 * (pL + pR)
    fmass = 0.5 * (wL[..., 0] * qrelL + wR[..., 0] * qrelR)
    fmom = (0.5 * (wL[..., IMX:IMZ + 1] * qrelL[..., None]
                   + wR[..., IMX:IMZ + 1] * qrelR[..., None])
            + pa[..., None] * s)
    fen = 0.5 * ((wL[..., IRHOE] + pL) * qrelL
                 + (wR[..., IRHOE] + pR) * qrelR)
    if sdot is not None:
        fen = fen + pa * sdot
    central = jnp.concatenate(
        [fmass[..., None], fmom, fen[..., None]], axis=-1)

    # -- JST dissipation --------------------------------------------------
    # sensor and scaled radius live on the one-ring extended grid (n+2);
    # faces need cells f-1 and f -> extended indices f and f+1.
    et = [slice(1, -1)] * 3
    et[axis] = slice(None)
    nuA = nu[tuple(et)]
    srA = srad[tuple(et)]
    nuL = _shift(nuA, axis, 0, -1)
    nuR = _shift(nuA, axis, 1, 0)
    lamL = _shift(srA, axis, 0, -1)
    lamR = _shift(srA, axis, 1, 0)
    lam = 0.5 * (lamL + lamR)

    if const_diss:
        # coarse-grid dissipation: constant 2nd-difference only, no sensor
        # (fluxes.F90 inviscidDissFluxScalarCoarse:4977, vis2Coarse)
        eps2 = vis2 * jnp.ones_like(jnp.maximum(nuL, nuR))
        eps4 = jnp.zeros_like(eps2)
    else:
        eps2 = vis2 * jnp.maximum(nuL, nuR)
        eps4 = jnp.maximum(0.0, vis4 - eps2)
    if por is not None:
        pv = jnp.asarray(por, w.dtype)
        eps2 = eps2 * pv
        eps4 = eps4 * pv

    dL = _shift(wd, axis, 1, -2)[tuple(it)]
    dR = _shift(wd, axis, 2, -1)[tuple(it)]
    dLL = _shift(wd, axis, 0, -3)[tuple(it)]
    dRR = _shift(wd, axis, 3, 0)[tuple(it)]
    d1 = dR - dL
    d3 = dRR - 3.0 * dR + 3.0 * dL - dLL
    diss = lam[..., None] * (eps2[..., None] * d1 - eps4[..., None] * d3)

    return central - diss
