"""Residual assembly: the single canonical R(w, x) pipeline.

Reference analogue: ``blocketteRes`` (`/root/reference/src/NKSolver/
blockette.F90:70`) — the one "evaluate residual" entry used by the smoothers,
the NK/ANK matrix-vector products, AND the adjoint. The reference maintains
two complete implementations (tiled blockette + residual_block,
src/solver/residuals.F90:4); here there is exactly one, differentiated by
jax.jvp/vjp, with tiling left to XLA (a Pallas twin of the same math is the
perf path, ops/pallas_residual.py).

Pipeline per evaluation (mirrors SURVEY.md §3.2 hot loop):
  physical BCs -> b2b halo exchange -> physical BCs (corner fix-up)
  -> inviscid central+JST fluxes [-> viscous -> turbulence] -> R.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from adflow_tpu.core.mesh import MultiBlockMesh
from adflow_tpu.core.refstate import ReferenceState
from adflow_tpu.dist.halo import ConnOp, build_conn_ops, exchange_halos_list
from adflow_tpu.geom.metrics import BlockMetrics, compute_metrics
from adflow_tpu.physics import bc as bc_mod
from adflow_tpu.physics.bc import BCOp, apply_bcs, build_bc_ops
from adflow_tpu.physics.fluxes import inviscid_residual, spectral_radii
from adflow_tpu.physics.thermo import pressure


@dataclasses.dataclass(frozen=True)
class ProblemConfig:
    """Static (trace-time) problem definition for the residual pipeline."""

    equation_type: str            # 'euler' | 'laminar ns' | 'rans'
    vis2: float
    vis4: float
    diss_exponent: float
    discretization: str = "central plus scalar dissipation"
    limiter: str = "van albada"
    entropy_fix: float = 0.05
    # face flux for the upwind path (reference riemannSolver option:
    # 'Roe' | 'van Leer' | 'ausmdv' — the latter terminates in the
    # reference as well, fluxes.F90:2522-2526)
    riemann_solver: str = "roe"
    turbulence_model: str = "sa"
    # turbulence advection order (reference turbulenceOrder option,
    # doc/options.yaml:198: 'first order' recommended / 'second order');
    # second order = limited MUSCL reconstruction of the advected
    # turbulence variable (sa.py / sst.py advection terms)
    turb_order: str = "first order"
    # turbulence residual row scaling (reference: turbResScale option,
    # inputParam.F90:252/293, applied in sa.F90 saResScale:678). Float or
    # per-variable tuple; see ``turb_scales``. Scaled rows balance the
    # combined norm and the Newton system; explicit updates divide it back.
    turb_res_scale: object = 1.0
    # SA variants (reference: useQCR / useRotationSA / useft2SA options,
    # inputPhysics.F90; sa.F90 source terms; QCR2000 stress correction in
    # the viscous flux, fluxes.F90:2742)
    use_ft2: bool = True
    use_rotation_sa: bool = False
    use_qcr: bool = False
    # coarse-MG-level mode: constant 2nd-difference dissipation only
    # (fluxes.F90 coarse variants, option vis2Coarse)
    coarse_level: bool = False
    # low-speed (Weiss-Smith) preconditioner: 0.0 = off; > 0 = the
    # freestream Mach used in the beta^2 cutoff (reference:
    # lowSpeedPreconditioner option, residuals.F90:172-331)
    ls_precon_mach: float = 0.0
    # Pallas blockette perf path for the central+JST mean-flow residual
    # (reference: useBlockettes option, NKSolver/blockette.F90:70); primal
    # only — derivatives route through the jnp twin via custom_jvp.
    use_pallas: bool = False

    @property
    def viscous(self) -> bool:
        return self.equation_type in ("laminar ns", "rans")

    @property
    def rans(self) -> bool:
        return self.equation_type == "rans"

    @property
    def n_turb(self) -> int:
        if not self.rans:
            return 0
        return 1 if self.turbulence_model.startswith("sa") else 2

    @property
    def turb_scales(self) -> tuple:
        """Per-turbulence-variable residual scale, length n_turb."""
        s = self.turb_res_scale
        t = (tuple(float(v) for v in s) if isinstance(s, (tuple, list))
             else (float(s),))
        while len(t) < self.n_turb:
            t = t + (t[-1],)
        return t[:self.n_turb]

    def row_scale(self, dtype=None):
        """(nw,) per-channel residual row scale [1]*5 + turb_scales, or None
        when no scaling is active. Any term added to the scaled residual
        outside block_residual (pseudo-time diagonals, BDF/time-spectral
        time terms, PC rows) must be multiplied by this so the combined
        system stays an exact row-scaling of the physical equations."""
        if self.n_turb == 0 or all(s == 1.0 for s in self.turb_scales):
            return None
        import jax.numpy as _jnp
        return _jnp.asarray((1.0,) * 5 + self.turb_scales, dtype)


@dataclasses.dataclass(frozen=True)
class BlockStatic:
    """Per-block static metadata (shapes, BC slices, face porosities)."""

    dims: Tuple[int, int, int]
    bc_ops: Tuple[BCOp, ...]
    por: Optional[tuple] = None   # (porI, porJ, porK) numpy face masks
    # overset compute mask (ni, nj, nk, 1): 1 compute, 0 fringe/hole
    # (the reference's iblank, modules/block.F90 / oversetAPI.F90)
    iblank: Optional[object] = None


def _build_porosities(block) -> tuple:
    """Face porosity masks: 1 everywhere except 0 at solid-wall faces
    (reference: setPorosities, preprocessingAPI.F90:524 — walls get
    boundFlux: no convection, no dissipation, pressure only)."""
    import numpy as _np
    from adflow_tpu.core.mesh import WALL_BCS

    ni, nj, nk = block.dims
    por = [_np.ones((ni + 1, nj, nk)), _np.ones((ni, nj + 1, nk)),
           _np.ones((ni, nj, nk + 1))]
    for sf in block.bcs:
        if sf.bc not in WALL_BCS:
            continue
        ax = sf.face.axis
        t1, t2 = [a for a in range(3) if a != ax]
        dims = block.dims
        rng = sf.rng or ((0, dims[t1]), (0, dims[t2]))
        idx = [None, None, None]
        idx[ax] = dims[ax] if sf.face.is_high else 0
        idx[t1] = slice(rng[0][0], rng[0][1])
        idx[t2] = slice(rng[1][0], rng[1][1])
        por[ax][tuple(idx)] = 0.0
    return tuple(por)


@dataclasses.dataclass(frozen=True)
class MeshTopology:
    """All static topology for the residual: per-block metadata + exchange."""

    blocks: Tuple[BlockStatic, ...]
    conn_ops: Tuple[ConnOp, ...]
    overset: Optional[object] = None   # OversetTable (overset/assembly.py)


def build_topology(mesh: MultiBlockMesh, cut_callback=None) -> MeshTopology:
    from adflow_tpu.core.mesh import BCType as _BCT
    from adflow_tpu.overset.assembly import build_overset, iblank_masks

    has_ovs = any(sf.bc is _BCT.OVERSET
                  for b in mesh.blocks for sf in b.bcs)
    ovs = (build_overset(mesh, cut_callback=cut_callback)
           if (has_ovs or cut_callback is not None) else None)
    masks = iblank_masks(ovs, len(mesh.blocks), [b.dims for b in mesh.blocks])
    return MeshTopology(
        blocks=tuple(
            BlockStatic(dims=b.dims, bc_ops=tuple(build_bc_ops(b)),
                        por=_build_porosities(b), iblank=masks[i])
            for i, b in enumerate(mesh.blocks)),
        conn_ops=tuple(build_conn_ops(mesh)),
        overset=ovs,
    )


def fill_halos(w_list, metrics_list, topo: MeshTopology,
               ref: ReferenceState, winf):
    """BC -> exchange -> BC sequence filling every ghost cell (reference:
    applyAllBC + whalo2, ordered so corners resolve; see dist/halo.py).

    The second BC pass is REQUIRED even without connections: subfaces
    extended into tangential halos read edge/corner ghosts that a later BC
    in the sequence writes, so one pass leaves corners depending on whatever
    the ghost cells held before (state-history garbage — non-deterministic
    residuals and pathological Jacobians). Two passes make every ghost a
    pure function of the interior.
    """
    w_list = [apply_bcs(w, m, bs.bc_ops, ref, winf)
              for w, m, bs in zip(w_list, metrics_list, topo.blocks)]
    if topo.conn_ops:
        w_list = exchange_halos_list(w_list, topo.conn_ops)
    if topo.overset is not None:
        # chimera fringe update AFTER b2b (reference: wOverset inside whalo2,
        # haloExchange.F90:1330) so donors read freshly-exchanged values
        from adflow_tpu.overset.assembly import apply_overset
        w_list = apply_overset(w_list, topo.overset)
    w_list = [apply_bcs(w, m, bs.bc_ops, ref, winf)
              for w, m, bs in zip(w_list, metrics_list, topo.blocks)]
    return w_list


def block_residual(w, metrics: BlockMetrics, cfg: ProblemConfig,
                   ref: ReferenceState, extras: Optional[dict] = None,
                   por=None):
    """Residual for one block with already-filled halos.

    Returns (ni, nj, nk, nw): net outflow flux per interior cell (the
    semi-discrete system is V dw/dt = -R).
    """
    # fully fused Pallas RANS blockette (ops/pallas_rans.py): all 6 channels
    # (central+JST + viscous + SA + row scale) in one VMEM pass — the
    # complete blocketteRes pipeline (blockette.F90:70). Falls through to
    # the composed path for configs the kernel doesn't cover.
    if (cfg.use_pallas and cfg.rans and cfg.turbulence_model == "sa"
            and not cfg.use_rotation_sa and not cfg.coarse_level
            and not cfg.use_qcr
            and cfg.discretization.startswith("central")
            and "matrix" not in cfg.discretization
            and por is not None and metrics.vfIE is None
            and w.dtype == jnp.float32
            and cfg.ls_precon_mach == 0.0
            and extras is not None and "walldist" in extras
            and "act_src" not in extras
            and "act_src_momentum" not in extras):
        from adflow_tpu.ops.pallas_rans import fused_rans_residual
        return fused_rans_residual(
            w, metrics.siE, metrics.sjE, metrics.skE, metrics.vol,
            metrics.xc_ext, extras["walldist"],
            jnp.asarray(por[0], w.dtype), jnp.asarray(por[1], w.dtype),
            jnp.asarray(por[2], w.dtype),
            cfg.vis2, cfg.vis4, cfg.diss_exponent,
            ref.mu_inf, ref.t_inf_dim, cfg.use_ft2, cfg.turb_scales[0])

    p = pressure(w)
    if cfg.discretization.startswith("upwind"):
        from adflow_tpu.physics.upwind import upwind_residual
        r = upwind_residual(w, p, metrics, cfg, por=por)
    elif ("matrix" in cfg.discretization) and not cfg.coarse_level:
        # central flux + |A_roe|-scaled JST blend (fluxes.F90
        # inviscidDissFluxMatrix:403); coarse levels fall back to the
        # constant scalar dissipation like the reference's coarse variants.
        from adflow_tpu.physics.upwind import matrix_dissipation_residual
        r = inviscid_residual(w, p, metrics, 0.0, 0.0, cfg.diss_exponent,
                              por=por)
        r = r + matrix_dissipation_residual(w, p, metrics, cfg, por=por)
    elif (cfg.use_pallas and not cfg.coarse_level and por is not None
          and metrics.vfIE is None and w.dtype == jnp.float32):
        # fused Pallas blockette (ops/pallas_residual.py): one VMEM pass
        # over i-slabs instead of XLA's HBM-materialised stencil chain
        from adflow_tpu.ops.pallas_residual import fused_inviscid_residual
        r = fused_inviscid_residual(
            w[..., :5], p, metrics.siE, metrics.sjE, metrics.skE,
            jnp.asarray(por[0], w.dtype), jnp.asarray(por[1], w.dtype),
            jnp.asarray(por[2], w.dtype),
            cfg.vis2, cfg.vis4, cfg.diss_exponent)
    else:
        r = inviscid_residual(w, p, metrics, cfg.vis2, cfg.vis4,
                              cfg.diss_exponent, por=por,
                              const_diss=cfg.coarse_level,
                              precon_mach=cfg.ls_precon_mach)
    if cfg.viscous:
        from adflow_tpu.physics.viscous import viscous_residual
        r = r + viscous_residual(w, p, metrics, cfg, ref, extras=extras)
    if cfg.rans:
        d = extras["walldist"] if extras else None
        if cfg.turbulence_model.startswith("sst"):
            from adflow_tpu.physics.sst import sst_residual
            rt = sst_residual(w, p, metrics, cfg, ref, d)
        else:
            from adflow_tpu.physics.sa import sa_residual
            rt = sa_residual(w, p, metrics, cfg, ref, d)
        r = jnp.concatenate([r, rt], axis=-1)
    if extras and "act_src" in extras:
        # actuator-region momentum/energy sources (sourceTerms_block,
        # residuals.F90:348; R convention: V dw/dt = -R, so sources
        # SUBTRACT from R)
        src = extras["act_src"]
        r = r.at[..., :5].add(-src)
    if extras and "act_src_momentum" in extras:
        # momentum sources with the energy row f . u evaluated at the
        # CURRENT state — the reference adds f.u per residual evaluation
        # (residuals.F90:348); folding it at registration time freezes the
        # velocity and corrupts the energy equation as the solve converges
        fm = extras["act_src_momentum"]
        wi_ = w[2:-2, 2:-2, 2:-2]
        u_ = wi_[..., 1:4] / wi_[..., 0:1]
        en = jnp.sum(fm[..., 1:4] * u_, axis=-1)
        r = r.at[..., 1:4].add(-fm[..., 1:4])
        r = r.at[..., 4].add(-(fm[..., 4] + en))
    return r


def residual_list(w_list, metrics_list, topo: MeshTopology,
                  cfg: ProblemConfig, ref: ReferenceState, winf,
                  extras_list: Optional[Sequence[dict]] = None):
    """Full multiblock residual: halo fill + per-block kernels."""
    w_list = fill_halos(w_list, metrics_list, topo, ref, winf)
    out = []
    for i, (w, m) in enumerate(zip(w_list, metrics_list)):
        ex = extras_list[i] if extras_list else None
        r = block_residual(w, m, cfg, ref, ex, por=topo.blocks[i].por)
        ib = topo.blocks[i].iblank
        if ib is not None:
            # zero fringe/hole residual rows (iblank guard); the matching
            # STATES are overwritten by interpolation every fill, so the
            # fringe DOFs are dead inputs & outputs — GMRES stays regular
            # in the compute subspace.
            r = r * jnp.asarray(ib, r.dtype)
        out.append(r)
    return out


def residual_from_x(w_list, x_list, topo: MeshTopology, cfg: ProblemConfig,
                    ref: ReferenceState, winf,
                    extras_list: Optional[Sequence[dict]] = None):
    """Residual with metrics recomputed from node coordinates — the
    geometry-differentiable entry (reference: adjointExtra.F90 chain)."""
    metrics_list = [compute_metrics(x) for x in x_list]
    return residual_list(w_list, metrics_list, topo, cfg, ref, winf,
                         extras_list)
