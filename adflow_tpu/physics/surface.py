"""Surface integration: forces, moments, cost functions.

Reference analogue: ``surfaceIntegrations.F90``
(`/root/reference/src/solver/surfaceIntegrations.F90`): ``wallIntegrationFace``
(:406) integrates p + viscous stresses into force/moment coefficients;
``getCostFunctions`` (:5) maps them to the cost-function menu
(cl, cd, cmx..., reference IDs at src/modules/constants.F90:349-440).

Pressure force on a wall face: F += (p_face - pInf) * S_out, with S_out the
face area vector pointing out of the fluid (into the body). Subtracting pInf
matches the reference (it integrates gauge pressure so free-stream meshes
give exactly zero force). Viscous stress uses the wall-gradient from the
no-slip halo state. Differentiable end-to-end for the adjoint.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from adflow_tpu.core.mesh import (VISCOUS_WALL_BCS, WALL_BCS, BCType,
                                  MultiBlockMesh)
from adflow_tpu.core.refstate import GAMMA, PR_LAMINAR, ReferenceState
from adflow_tpu.physics.bc import BCOp, build_bc_ops
from adflow_tpu.physics.thermo import (
    IMX, IMZ, IRHO, laminar_viscosity, pressure, temperature)


@dataclasses.dataclass(frozen=True)
class WallPatch:
    """Compiled wall subface for integration: slices into cell/face arrays."""

    block: int
    bc: BCType
    family: str
    axis: int
    sign: float
    face_sl: Tuple          # into si/sj/sk: boundary faces of the patch
    int_sl: Tuple           # first interior cell layer (padded coords)
    ghost_sl: Tuple         # first ghost layer
    fnode_sl: Tuple         # into x: the 4-node window of the patch faces


def build_wall_patches(mesh: MultiBlockMesh,
                       families: Optional[Sequence[str]] = None,
                       include: Tuple[BCType, ...] = WALL_BCS
                       ) -> List[WallPatch]:
    patches = []
    for bi, blk in enumerate(mesh.blocks):
        dims = blk.dims
        for sf in blk.bcs:
            if sf.bc not in include:
                continue
            if families is not None and sf.family not in families:
                continue
            ax = sf.face.axis
            t1, t2 = [a for a in range(3) if a != ax]
            rng = sf.rng or ((0, dims[t1]), (0, dims[t2]))
            (a0, a1), (b0, b1) = rng
            fs = [None] * 3
            fs[ax] = dims[ax] if sf.face.is_high else 0
            fs[t1], fs[t2] = slice(a0, a1), slice(b0, b1)
            isl = [None] * 3
            gsl = [None] * 3
            isl[ax] = 2 + dims[ax] - 1 if sf.face.is_high else 2
            gsl[ax] = 2 + dims[ax] if sf.face.is_high else 1
            isl[t1] = gsl[t1] = slice(2 + a0, 2 + a1)
            isl[t2] = gsl[t2] = slice(2 + b0, 2 + b1)
            nsl = [None] * 3
            nsl[ax] = dims[ax] if sf.face.is_high else 0
            nsl[t1], nsl[t2] = slice(a0, a1 + 1), slice(b0, b1 + 1)
            patches.append(WallPatch(
                block=bi, bc=sf.bc, family=sf.family, axis=ax,
                sign=1.0 if sf.face.is_high else -1.0,
                face_sl=tuple(fs), int_sl=tuple(isl), ghost_sl=tuple(gsl),
                fnode_sl=tuple(nsl)))
    return patches


def _patch_face_centers(x, patch: WallPatch):
    # x[fnode_sl] drops the face axis: remaining spatial axes are the two
    # in-face directions in ascending original order -> positions 0, 1.
    xs = x[patch.fnode_sl]

    def corner(d1, d2):
        return xs[d1:xs.shape[0] - 1 + d1, d2:xs.shape[1] - 1 + d2]

    return 0.25 * (corner(0, 0) + corner(1, 0) + corner(0, 1) + corner(1, 1))


def patch_iblank_mask(iblank_list, patch):
    """(T1, T2) weight for a wall patch's faces: 1 where the adjacent cell
    computes, 0 at overset fringe/hole wall cells — the simplified stand-in
    for the reference's zipper mesh (overset/zipperMesh.F90:18), which
    removes overlapped surface quads before integration."""
    if iblank_list is None or iblank_list[patch.block] is None:
        return None
    ib = jnp.asarray(iblank_list[patch.block])
    ibp = jnp.pad(ib, ((2, 2), (2, 2), (2, 2), (0, 0)), constant_values=1.0)
    return ibp[patch.int_sl][..., 0]


def wall_viscous_tractions(w, m, cfg, ref, patch: WallPatch, extras=None,
                           cache=None):
    """Full-gradient viscous traction (force-per-face 3-vector ON THE BODY)
    at a wall patch's boundary faces.

    Uses the SAME face flux as the viscous residual (viscous.py
    face_viscous_flux: Green-Gauss cell gradients + normal-corrected face
    gradient + full stress tensor incl. the -2/3 mu div(u) term), so the
    integrated CDv is consistent with the momentum the residual removes at
    the wall. Replaces the round-1/2 thin-layer first-cell estimate.
    Reference: surfaceIntegrations.F90 wallIntegrationFace:406 reading the
    viscSubfaceType tau stored by viscousFlux (fluxes.F90:2534).

    Sign: Cauchy convention t(n) = tau . n with n pointing from the body
    into the fluid = -s_out/|s|, i.e. df_v = -sign * (tau . S_axis).
    ``cache`` (dict) memoizes the per-(block, axis) face-flux sweep.
    """
    from adflow_tpu.physics.viscous import face_viscous_flux

    key = (patch.block, patch.axis)
    if cache is not None and key in cache:
        fmom = cache[key]
    else:
        p = pressure(w)
        fmom, _fen = face_viscous_flux(w, p, m, cfg, ref, patch.axis,
                                       extras=extras)
        if cache is not None:
            cache[key] = fmom
    return -patch.sign * fmom[patch.face_sl]


def integrate_forces(w_list, x_list, metrics_list,
                     patches: Sequence[WallPatch], ref: ReferenceState,
                     cfg=None, iblank_list=None,
                     extras_list=None,
                     patch_weights=None,
                     cp_targets=None, zipper=None) -> Dict[str, jnp.ndarray]:
    """Integrated force + moment vectors (nondim), pressure and viscous
    parts. Halos of w must be filled. ``patch_weights``: optional per-patch
    (T1, T2) face weights — the zipper-equivalent overlap deduplication for
    overset surfaces (overset/assembly.py overlap_surface_weights;
    reference zipperIntegrations.F90). ``zipper``: optional ZipperGaps —
    gap-strip triangles stitching the dedup fronts watertight
    (overset/assembly.py build_zipper_gaps; reference zipperMesh.F90:18),
    integrated with face-associated pressure/traction data. Returns dict
    of 3-vectors."""
    force_p = jnp.zeros(3)
    force_v = jnp.zeros(3)
    moment = jnp.zeros(3)
    # center-of-force sums (surfaceIntegrations.F90:1149-1166 COFSumF*):
    # cof[i, j] = sum over faces of df_i * xco_j (xco wrt the ORIGIN),
    # cof_lift[j] = sum of (df . lift_dir) * xco_j
    cof = jnp.zeros((3, 3))
    cof_lift = jnp.zeros(3)
    cp_err2 = jnp.zeros(())   # cperror2 inverse-design objective

    ld = jnp.asarray(ref.lift_dir)
    xref = jnp.asarray(ref.moment_ref)
    visc_cache = {}
    for ip, patch in enumerate(patches):
        w = w_list[patch.block]
        m = metrics_list[patch.block]
        s = (m.si, m.sj, m.sk)[patch.axis]
        s_out = patch.sign * s[patch.face_sl]          # out of the fluid
        mask = patch_iblank_mask(iblank_list, patch)
        pw = patch_weights[ip] if patch_weights is not None else None
        if pw is not None:
            pw = jnp.asarray(pw, s_out.dtype)
            mask = pw if mask is None else mask * pw
        if mask is not None:
            s_out = s_out * mask[..., None]
        wi = w[patch.int_sl]
        wg = w[patch.ghost_sl]
        p_face = 0.5 * (pressure(wi) + pressure(wg))
        dfp = (p_face - ref.p_inf)[..., None] * s_out
        fp = jnp.sum(dfp, axis=(0, 1))
        xc = _patch_face_centers(x_list[patch.block], patch)
        mom = jnp.sum(jnp.cross(xc - xref, dfp), axis=(0, 1))
        force_p = force_p + fp
        moment = moment + mom
        df = dfp

        if patch.bc in VISCOUS_WALL_BCS and cfg is not None and cfg.viscous:
            ex = (extras_list[patch.block]
                  if extras_list is not None else None)
            dfv = wall_viscous_tractions(w, m, cfg, ref, patch, extras=ex,
                                         cache=visc_cache)
            if mask is not None:
                dfv = dfv * mask[..., None]
            fv = jnp.sum(dfv, axis=(0, 1))
            force_v = force_v + fv
            moment = moment + jnp.sum(jnp.cross(xc - xref, dfv), axis=(0, 1))
            df = df + dfv

        cof = cof + jnp.einsum("tki,tkj->ij", df, xc)
        cof_lift = cof_lift + jnp.einsum("tk,tkj->j", df @ ld, xc)
        if cp_targets is not None:
            # cperror2 (surfaceIntegrations.F90:527: sum over wall faces
            # of (Cp - CpTarget)^2 dA; targets set via setTargetCp)
            tgt = cp_targets[ip]
            if tgt is not None:
                cp = (p_face - ref.p_inf) / jnp.maximum(ref.q_inf, 1e-30)
                da = jnp.linalg.norm(s_out, axis=-1)
                cp_err2 = cp_err2 + jnp.sum(
                    (cp - jnp.asarray(tgt)) ** 2 * da)

    if zipper is not None and zipper.n_tris:
        import numpy as _np
        dtype = w_list[0].dtype
        for pi in _np.unique(zipper.patch_idx):
            patch = patches[int(pi)]
            msel = zipper.patch_idx == pi
            w = w_list[patch.block]
            m = metrics_list[patch.block]
            s = (m.si, m.sj, m.sk)[patch.axis]
            s_out = patch.sign * s[patch.face_sl]   # unmasked: data faces
            p_face = 0.5 * (pressure(w[patch.int_sl])
                            + pressure(w[patch.ghost_sl]))
            idx = jnp.asarray(zipper.face_flat[msel])
            pg = p_face.reshape(-1)[idx]
            nf = s_out.reshape(-1, 3)[idx]
            sv = jnp.asarray(zipper.svec[msel], dtype)
            # orient the triangle with its data face's outward normal
            sgn = jnp.sign(jnp.sum(sv * nf, axis=-1))
            sv = sv * jnp.where(sgn == 0.0, 1.0, sgn)[..., None]
            cen = jnp.asarray(zipper.centroid[msel], dtype)
            dfp = (pg - ref.p_inf)[..., None] * sv
            force_p = force_p + jnp.sum(dfp, axis=0)
            moment = moment + jnp.sum(jnp.cross(cen - xref, dfp), axis=0)
            df = dfp
            if patch.bc in VISCOUS_WALL_BCS and cfg is not None \
                    and cfg.viscous:
                ex = (extras_list[patch.block]
                      if extras_list is not None else None)
                dfv_face = wall_viscous_tractions(
                    w, m, cfg, ref, patch, extras=ex, cache=visc_cache)
                a_face = jnp.linalg.norm(s_out, axis=-1).reshape(-1)[idx]
                a_tri = jnp.linalg.norm(sv, axis=-1)
                tv = dfv_face.reshape(-1, 3)[idx] \
                    / jnp.maximum(a_face, 1e-30)[..., None] \
                    * a_tri[..., None]
                force_v = force_v + jnp.sum(tv, axis=0)
                moment = moment + jnp.sum(jnp.cross(cen - xref, tv),
                                          axis=0)
                df = df + tv
            cof = cof + jnp.einsum("ti,tj->ij", df, cen)
            cof_lift = cof_lift + jnp.einsum("t,tj->j", df @ ld, cen)

    out = {"force_p": force_p, "force_v": force_v, "moment": moment,
           "cof": cof, "cof_lift": cof_lift}
    if cp_targets is not None:
        out["cperror2"] = cp_err2
    return out


def cost_functions(forces: Dict[str, jnp.ndarray], ref: ReferenceState
                   ) -> Dict[str, jnp.ndarray]:
    """Map integrated vectors to the cost-function menu.

    Names follow the reference's python map (pyADflow.py:6471-6556
    adflowCostFunctions -> constants.F90:349-440, nCostFunction = 104).
    Dimensional functions (lift/drag/fx.../mx...) scale the nondim sums by
    p_ref_dim = rho_inf_dim a_inf_dim^2 = gamma P_inf_dim, which is how
    the freestream P/rho design variables reach force outputs (the
    reference's iDV['p']/iDV['rho'] chains)."""
    qs = ref.q_inf * ref.area_ref
    pdim = ref.p_ref_dim
    fp = forces["force_p"]
    fv = forces["force_v"]
    fm = forces.get("flow_fm", jnp.zeros(3))
    f = fp + fv + fm
    ld = jnp.asarray(ref.lift_dir)
    dd = jnp.asarray(ref.drag_dir)
    lift = f @ ld
    drag = f @ dd
    mom = forces["moment"] / (qs * ref.chord_ref)
    out = {
        # dimensional forces/moments (N, N m)
        "lift": lift * pdim, "drag": drag * pdim,
        "fx": f[0] * pdim, "fy": f[1] * pdim, "fz": f[2] * pdim,
        "mx": forces["moment"][0] * pdim,
        "my": forces["moment"][1] * pdim,
        "mz": forces["moment"][2] * pdim,
        "liftpressure": (fp @ ld) * pdim, "liftviscous": (fv @ ld) * pdim,
        "liftmomentum": (fm @ ld) * pdim,
        "dragpressure": (fp @ dd) * pdim, "dragviscous": (fv @ dd) * pdim,
        "dragmomentum": (fm @ dd) * pdim,
        "forcexpressure": fp[0] * pdim, "forceypressure": fp[1] * pdim,
        "forcezpressure": fp[2] * pdim,
        "forcexviscous": fv[0] * pdim, "forceyviscous": fv[1] * pdim,
        "forcezviscous": fv[2] * pdim,
        "forcexmomentum": fm[0] * pdim, "forceymomentum": fm[1] * pdim,
        "forcezmomentum": fm[2] * pdim,
        # coefficients
        "cl": lift / qs, "cd": drag / qs,
        "clp": (fp @ ld) / qs, "clv": (fv @ ld) / qs,
        "clm": (fm @ ld) / qs,
        "cdp": (fp @ dd) / qs, "cdv": (fv @ dd) / qs,
        "cdm": (fm @ dd) / qs,
        "cfx": f[0] / qs, "cfy": f[1] / qs, "cfz": f[2] / qs,
        "cfxp": fp[0] / qs, "cfyp": fp[1] / qs, "cfzp": fp[2] / qs,
        "cfxv": fv[0] / qs, "cfyv": fv[1] / qs, "cfzv": fv[2] / qs,
        "cfxm": fm[0] / qs, "cfym": fm[1] / qs, "cfzm": fm[2] / qs,
        "cmx": mom[0], "cmy": mom[1], "cmz": mom[2],
    }
    # center of force (constants.F90:90-101 costfuncCoForce** / CofLift*):
    # per-component force centroid; zero when the component vanishes
    if "cof" in forces:
        cof = forces["cof"]
        for i, nm in enumerate("xyz"):
            safe = jnp.where(jnp.abs(f[i]) > 1e-30, f[i], 1.0)
            on = jnp.abs(f[i]) > 1e-30
            for j, nj in enumerate("xyz"):
                out[f"cof{nm}{nj}"] = jnp.where(on, cof[i, j] / safe, 0.0)
        safe_l = jnp.where(jnp.abs(lift) > 1e-30, lift, 1.0)
        on_l = jnp.abs(lift) > 1e-30
        for j, nj in enumerate("xyz"):
            out[f"cofl{nj}"] = jnp.where(
                on_l, forces["cof_lift"][j] / safe_l, 0.0)
        # reference python aliases colx/coly/colz
        out["colx"], out["coly"], out["colz"] = (
            out["coflx"], out["cofly"], out["coflz"])
    if "sepavg" in forces:
        out["sepsensoravgx"] = forces["sepavg"][0]
        out["sepsensoravgy"] = forces["sepavg"][1]
        out["sepsensoravgz"] = forces["sepavg"][2]
    for k in ("sepsensor", "cavitation", "cpmin_exact", "area",
              "cperror2"):
        if k in forces:
            out[k] = forces[k]
    for k, v in forces.items():
        if k.startswith("flow_") and k != "flow_fm":
            out[k[5:]] = v
    return out


# ---------------------------------------------------------------------------
# wall sensors (surfaceIntegrations.F90 wallIntegrationFace:406: sepSensor,
# cavitation sensor)
# ---------------------------------------------------------------------------

SEP_SENSOR_SHARPNESS = 10.0
SEP_SENSOR_OFFSET = 0.0
CAVITATION_NUMBER = 1.4
CAVITATION_RHO = 100.0  # KS sharpness for cpmin aggregation


def wall_sensors(w_list, metrics_list, patches: Sequence[WallPatch],
                 ref: ReferenceState, iblank_list=None, x_list=None
                 ) -> Dict[str, jnp.ndarray]:
    """Separation sensor (KS-smoothed backflow area fraction), its spatial
    centroid sums (sepsensoravgx/y/z, iSepAvg) and cavitation sensor
    (smoothed -Cp exceedance area), reference
    surfaceIntegrations.F90:406-520."""
    sep = jnp.zeros(())
    sepavg = jnp.zeros(3)
    cav = jnp.zeros(())
    area = jnp.zeros(())
    cp_ks = jnp.zeros(())   # KS aggregation accumulator for cpmin
    vhat_inf = jnp.asarray(ref.vel_dir)
    for patch in patches:
        w = w_list[patch.block]
        m = metrics_list[patch.block]
        s = (m.si, m.sj, m.sk)[patch.axis]
        s_out = patch.sign * s[patch.face_sl]
        da = jnp.linalg.norm(s_out, axis=-1)
        msk = patch_iblank_mask(iblank_list, patch)
        if msk is not None:
            da = da * msk
        wi = w[patch.int_sl]
        v = wi[..., IMX:IMZ + 1] / wi[..., IRHO:IRHO + 1]
        vmag = jnp.linalg.norm(v, axis=-1, keepdims=True)
        vhat = v / jnp.maximum(vmag, 1e-14)
        sdot = jnp.sum(vhat * vhat_inf, axis=-1)
        # sepSensor: ~1 where the near-wall flow opposes the free stream
        dsep = da / (1.0 + jnp.exp(2.0 * SEP_SENSOR_SHARPNESS
                                   * (sdot - SEP_SENSOR_OFFSET)))
        sep = sep + jnp.sum(dsep)
        if x_list is not None:
            xc = _patch_face_centers(x_list[patch.block], patch)
            sepavg = sepavg + jnp.einsum("tk,tkj->j", dsep, xc)
        wg = w[patch.ghost_sl]
        p_face = 0.5 * (pressure(wi) + pressure(wg))
        cp = (p_face - ref.p_inf) / jnp.maximum(ref.q_inf, 1e-30)
        # cavitation: area where -Cp exceeds the cavitation number
        cav = cav + jnp.sum(
            da / (1.0 + jnp.exp(-2.0 * SEP_SENSOR_SHARPNESS
                                * (-cp - CAVITATION_NUMBER))))
        cp_ks = cp_ks + jnp.sum(jnp.exp(-CAVITATION_RHO * cp) * da)
        area = area + jnp.sum(da)
    out = {"sepsensor": sep, "cavitation": cav, "area": area}
    if x_list is not None:
        out["sepavg"] = sepavg
    if patches:
        out["cpmin_exact"] = -jnp.log(cp_ks / jnp.maximum(area, 1e-30)) \
            / CAVITATION_RHO
    return out


# ---------------------------------------------------------------------------
# flow-through integration (surfaceIntegrations.F90 flowIntegrationFace:894:
# mass flow, mass-averaged Pt/Tt/Ps/MN over inflow/outflow planes)
# ---------------------------------------------------------------------------

FLOW_THROUGH_BCS = (BCType.SUBSONIC_INFLOW, BCType.SUBSONIC_OUTFLOW,
                    BCType.SUPERSONIC_INFLOW, BCType.SUPERSONIC_OUTFLOW,
                    BCType.MASS_BLEED_INFLOW, BCType.MASS_BLEED_OUTFLOW,
                    BCType.DOMAIN_INTERFACE_ALL,
                    BCType.DOMAIN_INTERFACE_P,
                    BCType.DOMAIN_INTERFACE_RHO,
                    BCType.DOMAIN_INTERFACE_RHOUVW,
                    BCType.DOMAIN_INTERFACE_TOTAL)


def flow_through(w_list, metrics_list, patches: Sequence[WallPatch],
                 ref: ReferenceState) -> Dict[str, jnp.ndarray]:
    """Mass flow + mass/area-averaged totals through inflow/outflow planes.
    Positive mdot = flow INTO the domain at inflow families (the reference
    sign convention: inward normal positive for inflow)."""
    mdot = jnp.zeros(())
    m_pt = jnp.zeros(())
    m_tt = jnp.zeros(())
    m_ps = jnp.zeros(())
    m_mn = jnp.zeros(())
    a_pt = jnp.zeros(())
    a_ps = jnp.zeros(())
    area = jnp.zeros(())
    g = GAMMA
    for patch in patches:
        w = w_list[patch.block]
        m = metrics_list[patch.block]
        s = (m.si, m.sj, m.sk)[patch.axis]
        s_out = patch.sign * s[patch.face_sl]
        da = jnp.linalg.norm(s_out, axis=-1)
        wi = w[patch.int_sl]
        wg = w[patch.ghost_sl]
        wf = 0.5 * (wi + wg)
        rho = wf[..., IRHO]
        v = wf[..., IMX:IMZ + 1] / rho[..., None]
        p = pressure(wf)
        c2 = g * p / rho
        mn = jnp.linalg.norm(v, axis=-1) / jnp.sqrt(c2)
        pt = p * (1.0 + 0.5 * (g - 1.0) * mn ** 2) ** (g / (g - 1.0))
        tt_ratio = (g * p / rho) * (1.0 + 0.5 * (g - 1.0) * mn ** 2)
        dm = -rho * jnp.sum(v * s_out, axis=-1)     # + into the domain
        mdot = mdot + jnp.sum(dm)
        m_pt = m_pt + jnp.sum(dm * pt)
        m_tt = m_tt + jnp.sum(dm * tt_ratio)
        m_ps = m_ps + jnp.sum(dm * p)
        m_mn = m_mn + jnp.sum(dm * mn)
        a_pt = a_pt + jnp.sum(da * pt)
        a_ps = a_ps + jnp.sum(da * p)
        area = area + jnp.sum(da)
    safe_m = jnp.where(jnp.abs(mdot) > 1e-30, mdot, 1.0)
    safe_a = jnp.maximum(area, 1e-30)
    return {
        "flow_mdot": mdot,
        "flow_mavgptot": m_pt / safe_m,
        "flow_mavgttot": m_tt / safe_m,
        "flow_mavgps": m_ps / safe_m,
        "flow_mavgmn": m_mn / safe_m,
        "flow_aavgptot": a_pt / safe_a,
        "flow_aavgps": a_ps / safe_a,
        "flow_area": area,
    }
