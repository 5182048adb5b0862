"""Pallas TPU blockette: fused central+JST inviscid residual kernel.

Reference analogue: the "blockette" tiled residual path
(`/root/reference/src/NKSolver/blockette.F90:9,70`) — ADflow keeps a second,
cache-tiled implementation of the hot residual loop because sweeping the
whole block through memory once per stencil pass wastes bandwidth. On TPU
the same idea maps to a Pallas kernel: one grid pass over i-slabs, each slab
DMA'd HBM->VMEM once, with the pressure sensor, spectral radii, directional
scaling, central fluxes and the JST 2nd/4th-difference dissipation all
computed in VMEM and a single residual slab written back. The XLA jnp path
(`physics/fluxes.py`) materialises each of those intermediates in HBM.

Layout: TPU VMEM tiles the last two axes (sublane x lane), so the 5-channel
trailing axis of the solver's (ni+4, nj+4, nk+4, 5) state would waste 96% of
every lane tile. The wrapper therefore moves channels to the FRONT
(5, ni+4, nj+4, nk+4) and the kernel works on per-channel 3-D arrays whose
(j, k) planes tile naturally.

Differentiation: Pallas kernels are primal-only; ``fused_inviscid_residual``
carries a ``jax.custom_jvp`` whose tangent rule evaluates jax.jvp of the
mathematically-identical jnp implementation — so NK matvecs (jvp) and the
adjoint (vjp via transposed jvp) keep working with the kernel enabled.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adflow_tpu.core.refstate import GAMMA


def _sh(a, ax, lo, hi):
    """a[lo : len+hi] along axis ax (hi <= 0 counts from the end)."""
    idx = [slice(None)] * a.ndim
    idx[ax] = slice(lo, a.shape[ax] + hi if hi < 0 else None)
    return a[tuple(idx)]


def _kernel(ni, nk, ti, vis2, vis4, expo,
            wt, p, siE, sjE, skE, porI, porJ, porK, out,
            wS, pS, siS, sjS, skS, piS, pjS, pkS, oS, sems):
    """One grid step: residual for interior i-planes [i0, i0+ti).

    Lane-dim (k) discipline: every array keeps the FULL 128-aligned kp lane
    extent end to end — Mosaic faults on composed partial-lane slices — and
    all k-direction stencil shifts are lane rotations (jnp.roll). Alignment
    convention: lane l means padded-cell k=l for cell-centred arrays (w, p,
    sensor, radii, residual), k-face index l for face-centred k arrays
    (k-flux, porK), so valid outputs live at lanes 2..nk+1 and the rolled-in
    wraparound garbage never reaches them (max |shift| = 3 < halo depth + pad).
    """
    it = pl.program_id(0)
    i0 = jnp.minimum(it * ti, ni - ti)   # clamp: last tile overlaps

    copies = [
        pltpu.make_async_copy(wt.at[:, pl.ds(i0, ti + 4)], wS, sems.at[0]),
        pltpu.make_async_copy(p.at[pl.ds(i0, ti + 4)], pS, sems.at[1]),
        pltpu.make_async_copy(siE.at[:, pl.ds(i0, ti + 3)], siS, sems.at[2]),
        pltpu.make_async_copy(sjE.at[:, pl.ds(i0, ti + 2)], sjS, sems.at[3]),
        pltpu.make_async_copy(skE.at[:, pl.ds(i0, ti + 2)], skS, sems.at[4]),
        pltpu.make_async_copy(porI.at[pl.ds(i0, ti + 1)], piS, sems.at[5]),
        pltpu.make_async_copy(porJ.at[pl.ds(i0, ti)], pjS, sems.at[6]),
        pltpu.make_async_copy(porK.at[pl.ds(i0, ti)], pkS, sems.at[7]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    def kroll(a, o):
        """kroll(a, o)[..., l] = a[..., l + o] (lane rotation)."""
        return a if o == 0 else jnp.roll(a, -o, axis=a.ndim - 1)

    w = [wS[c] for c in range(5)]                  # (ti+4, nj+4, kp)
    ps = pS[:]
    rho, mx, my, mz, rhoE = w

    # -- pressure sensor, padded-cell lanes, i/j ext grid (ti+2, nj+2, kp) --
    def sens(pm, p0, pp):
        return jnp.abs(pp - 2.0 * p0 + pm) / (pp + 2.0 * p0 + pm)

    nu = sens(ps[:-2, 1:-1], ps[1:-1, 1:-1], ps[2:, 1:-1])
    nu = jnp.maximum(nu, sens(ps[1:-1, :-2], ps[1:-1, 1:-1], ps[1:-1, 2:]))
    nu = jnp.maximum(
        nu, sens(kroll(ps, -1), ps, kroll(ps, 1))[1:-1, 1:-1])

    # -- spectral radii + directional JST scaling (ti+2, nj+2, kp) ---------
    rE = rho[1:-1, 1:-1]
    inv_rE = 1.0 / rE
    uE = mx[1:-1, 1:-1] * inv_rE
    vE = my[1:-1, 1:-1] * inv_rE
    wEv = mz[1:-1, 1:-1] * inv_rE
    cE = jnp.sqrt(GAMMA * ps[1:-1, 1:-1] * inv_rE)

    def rad_of(sa):
        un = uE * sa[0] + vE * sa[1] + wEv * sa[2]
        return jnp.abs(un) + cE * jnp.sqrt(
            sa[0] * sa[0] + sa[1] * sa[1] + sa[2] * sa[2])

    # siE/sjE k-index e <-> cell e-1 <-> padded cell e+1: shift to the
    # padded-cell lane convention. skE k-index e <-> k-face e-1.
    siV = kroll(siS[:], -1)                        # lane = padded cell
    sjV = kroll(sjS[:], -1)                        # lane = padded cell
    skV = skS[:]                                   # lane = face + 1
    radI = rad_of(0.5 * (siV[:, :-1] + siV[:, 1:]))
    radJ = rad_of(0.5 * (sjV[:, :, :-1] + sjV[:, :, 1:]))
    radK = rad_of(0.5 * (kroll(skV, -1) + skV))
    eps = 1e-30

    def scale(ra, rb, rc):
        return ra * (1.0 + (rb / (ra + eps)) ** expo
                     + (rc / (ra + eps)) ** expo)

    sradI = scale(radI, radJ, radK)
    sradJ = scale(radJ, radI, radK)
    sradK = scale(radK, radI, radJ)

    # dissipation variables: energy row differenced on rhoE + p
    wvars = [rho, mx, my, mz, rhoE]
    dvars = [rho, mx, my, mz, rhoE + ps]

    def flux_pack(stencils, pstenc, s_faces, por):
        """central - JST flux given 4-point stencils per channel."""
        (rLL, rL, rR, rRR) = stencils[0]
        (_, pL, pR, _) = pstenc
        sx, sy, sz = s_faces
        xL, yL, zL = stencils[1][1], stencils[2][1], stencils[3][1]
        xR, yR, zR = stencils[1][2], stencils[2][2], stencils[3][2]
        eL, eR = stencils[4][1], stencils[4][2]
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
        eps2 = e2 * por
        eps4 = jnp.maximum(0.0, vis4 - e2) * por
        return lam, eps2, eps4

    R = [None] * 5

    def add_R(c, dR):
        R[c] = dR if R[c] is None else R[c] + dR

    # ---- i-direction: faces 0..ti <-> slab padded i f..f+3 ---------------
    st_i = [tuple(a[f:f + ti + 1, 2:-2] for f in range(4)) for a in wvars]
    pst_i = tuple(ps[f:f + ti + 1, 2:-2] for f in range(4))
    dst_i = [tuple(a[f:f + ti + 1, 2:-2] for f in range(4)) for a in dvars]
    s_i = tuple(siV[c, 1:-1, 1:-1] for c in range(3))
    por_i = kroll(piS[:], -2)
    f_i = flux_pack(st_i, pst_i, s_i, por_i)
    nuA = nu[:, 1:-1]
    srA = sradI[:, 1:-1]
    lam, eps2, eps4 = diss_terms(nuA[:-1], nuA[1:], srA[:-1], srA[1:], por_i)
    for c in range(5):
        dL, dR_, dLL, dRR = (dst_i[c][1], dst_i[c][2],
                             dst_i[c][0], dst_i[c][3])
        fc = f_i[c] - lam * (eps2 * (dR_ - dL)
                             - eps4 * (dRR - 3.0 * dR_ + 3.0 * dL - dLL))
        add_R(c, fc[1:] - fc[:-1])

    # ---- j-direction: faces 0..nj --------------------------------------
    st_j = [tuple(a[2:-2, f:f + a.shape[1] - 3] for f in range(4))
            for a in wvars]
    pst_j = tuple(ps[2:-2, f:f + ps.shape[1] - 3] for f in range(4))
    dst_j = [tuple(a[2:-2, f:f + a.shape[1] - 3] for f in range(4))
             for a in dvars]
    s_j = tuple(sjV[c, 1:-1, 1:-1] for c in range(3))
    por_j = kroll(pjS[:], -2)
    f_j = flux_pack(st_j, pst_j, s_j, por_j)
    nuA = nu[1:-1]
    srA = sradJ[1:-1]
    lam, eps2, eps4 = diss_terms(nuA[:, :-1], nuA[:, 1:],
                                 srA[:, :-1], srA[:, 1:], por_j)
    for c in range(5):
        dL, dR_, dLL, dRR = (dst_j[c][1], dst_j[c][2],
                             dst_j[c][0], dst_j[c][3])
        fc = f_j[c] - lam * (eps2 * (dR_ - dL)
                             - eps4 * (dRR - 3.0 * dR_ + 3.0 * dL - dLL))
        add_R(c, fc[:, 1:] - fc[:, :-1])

    # ---- k-direction: lane=face index f, stencil lanes f..f+3 ------------
    st_k = [tuple(kroll(a[2:-2, 2:-2], f) for f in range(4)) for a in wvars]
    pst_k = tuple(kroll(ps[2:-2, 2:-2], f) for f in range(4))
    dst_k = [tuple(kroll(a[2:-2, 2:-2], f) for f in range(4)) for a in dvars]
    s_k = tuple(kroll(skV[c, 1:-1, 1:-1], 1) for c in range(3))
    por_k = pkS[:]
    f_k = flux_pack(st_k, pst_k, s_k, por_k)
    nuA = nu[1:-1, 1:-1]
    srA = sradK[1:-1, 1:-1]
    lam, eps2, eps4 = diss_terms(kroll(nuA, 1), kroll(nuA, 2),
                                 kroll(srA, 1), kroll(srA, 2), por_k)
    for c in range(5):
        dL, dR_, dLL, dRR = (dst_k[c][1], dst_k[c][2],
                             dst_k[c][0], dst_k[c][3])
        fc = f_k[c] - lam * (eps2 * (dR_ - dL)
                             - eps4 * (dRR - 3.0 * dR_ + 3.0 * dL - dLL))
        add_R(c, kroll(fc, -1) - kroll(fc, -2))

    for c in range(5):
        oS[c] = R[c]
    outc = pltpu.make_async_copy(oS, out.at[:, pl.ds(i0, ti)], sems.at[8])
    outc.start()
    outc.wait()


@functools.lru_cache(maxsize=32)
def _build_call(dims, kp, ti, vis2, vis4, expo, interpret):
    ni, nj, nk = dims
    grid = (max(1, -(-ni // ti)),)
    f32 = jnp.float32
    kern = functools.partial(_kernel, ni, nk, ti, vis2, vis4, expo)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((5, ni, nj, kp), f32),
        scratch_shapes=[
            pltpu.VMEM((5, ti + 4, nj + 4, kp), f32),   # w slab
            pltpu.VMEM((ti + 4, nj + 4, kp), f32),      # p slab
            pltpu.VMEM((3, ti + 3, nj + 2, kp), f32),   # siE slab
            pltpu.VMEM((3, ti + 2, nj + 3, kp), f32),   # sjE slab
            pltpu.VMEM((3, ti + 2, nj + 2, kp), f32),   # skE slab
            pltpu.VMEM((ti + 1, nj, kp), f32),          # porI slab
            pltpu.VMEM((ti, nj + 1, kp), f32),          # porJ slab
            pltpu.VMEM((ti, nj, kp), f32),              # porK slab
            pltpu.VMEM((5, ti, nj, kp), f32),           # out slab
            pltpu.SemaphoreType.DMA((9,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=32 * 2 ** 20),
        interpret=interpret,
    )


def pick_tile(ni, nj, nk, budget_bytes=5 * 2 ** 20):
    """Largest i-tile whose VMEM slabs fit the budget (lane-padded)."""
    lane = -(-(nk + 4) // 128) * 128
    sub = -(-(nj + 4) // 8) * 8
    per_plane = lane * sub * 4
    for ti in (32, 16, 8, 4, 2, 1):
        if ti > ni:
            continue
        total = (6 * (ti + 4) + 9 * (ti + 3) + 5 * ti + 3 * (ti + 1)) * per_plane
        if total <= budget_bytes:
            return ti
    return 1


def _pallas_impl(w5, p, siE, sjE, skE, porI, porJ, porK,
                 vis2, vis4, expo):
    ni, nj, nk = p.shape[0] - 4, p.shape[1] - 4, p.shape[2] - 4
    kp = -(-(nk + 4) // 128) * 128        # lane-aligned padded k extent
    ti = pick_tile(ni, nj, nk)
    interpret = jax.default_backend() != "tpu"
    call = _build_call((ni, nj, nk), kp, ti, float(vis2), float(vis4),
                       float(expo), interpret)
    f32 = jnp.float32

    def padk(a):
        pad = [(0, 0)] * (a.ndim - 1) + [(0, kp - a.shape[-1])]
        return jnp.pad(a.astype(f32), pad)

    wt = padk(jnp.moveaxis(w5, -1, 0))
    # operands through an optimization barrier so closure-constant metrics/
    # porosities reach Mosaic as buffers, not HLO constants (constant
    # operands device-fault the DMA — see ops/pallas_rans.py _prep_inputs)
    args = jax.lax.optimization_barrier(
        (wt, padk(p),
         padk(jnp.moveaxis(siE, -1, 0)),
         padk(jnp.moveaxis(sjE, -1, 0)),
         padk(jnp.moveaxis(skE, -1, 0)),
         padk(porI), padk(porJ), padk(porK)))
    out = call(*args)
    return jnp.moveaxis(out[..., 2:nk + 2], 0, -1)


def _jnp_reference(w5, p, siE, sjE, skE, porI, porJ, porK,
                   vis2, vis4, expo):
    """The mathematically identical XLA path, used for tangents."""
    from adflow_tpu.geom.metrics import BlockMetrics
    from adflow_tpu.physics.fluxes import inviscid_residual
    m = BlockMetrics(siE=siE, sjE=sjE, skE=skE, vol=None, xc_ext=None)
    return inviscid_residual(w5, p, m, vis2, vis4, expo,
                             por=(porI, porJ, porK))


@functools.partial(jax.custom_jvp, nondiff_argnums=(8, 9, 10))
def fused_inviscid_residual(w5, p, siE, sjE, skE, porI, porJ, porK,
                            vis2, vis4, expo):
    """Drop-in fused central+JST residual (mean-flow 5 channels).

    Primal runs the Pallas blockette; jvp/vjp run through the jnp twin so
    the kernel is safe inside NK matvecs and the adjoint.
    """
    return _pallas_impl(w5, p, siE, sjE, skE, porI, porJ, porK,
                        vis2, vis4, expo)


@fused_inviscid_residual.defjvp
def _fused_jvp(vis2, vis4, expo, primals, tangents):
    out = fused_inviscid_residual(*primals, vis2, vis4, expo)
    _, t = jax.jvp(
        lambda *a: _jnp_reference(*a, vis2, vis4, expo), primals, tangents)
    return out, t
