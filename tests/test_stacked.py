"""Blocks-over-chips: stacked multi-block solver (dist/stacked.py).

Partition invariance is the correctness bar (reference: the random-block-
order regression case, tests/reg_tests/test_functionals.py:96-110, and
loadBalance.F90 block splitting): splitting a block and/or distributing the
stack over 8 virtual devices must reproduce the single-device per-block-list
path to roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from adflow_tpu.core.refstate import AeroProblem, make_reference_state
from adflow_tpu.dist.stacked import (
    balance_blocks, build_stacked_problem, make_stacked_rk_step, split_block,
    stack_metrics, stack_state, stack_walldist, stacked_ank_step,
    stacked_residual)
from adflow_tpu.geom.metrics import compute_metrics
from adflow_tpu.geom.walldist import compute_wall_distances
from adflow_tpu.meshgen.analytic import wing_omesh
from adflow_tpu.physics.residual import (
    ProblemConfig, build_topology, fill_halos, residual_list)
from adflow_tpu.solvers.smoothers import rk_iteration

# full solves / heavy regression: excluded from the fast tier
# (run the complete suite with plain `pytest tests/`)
pytestmark = pytest.mark.slow


def _setup(equation_type="euler"):
    viscous = equation_type != "euler"
    mesh = wing_omesh(ni=32, nj=12, nk=8, viscous=viscous)
    cfg = ProblemConfig(
        equation_type=equation_type, vis2=0.25, vis4=1.0 / 64.0,
        diss_exponent=0.67, turbulence_model="sa",
        turb_res_scale=(1e4 if equation_type == "rans" else 1.0))
    ap = AeroProblem(name="w", mach=0.6, alpha=2.0,
                     reynolds=(1e6 if viscous else None))
    ref = make_reference_state(ap, lift_index=2, n_turb=cfg.n_turb)
    winf = jnp.asarray(ref.winf())
    return mesh, cfg, ref, winf


def _list_residual(mesh, cfg, ref, winf):
    from adflow_tpu.geom.metrics import compute_metrics_conn
    topo = build_topology(mesh)
    metrics = compute_metrics_conn(
        mesh.blocks, [jnp.asarray(b.x) for b in mesh.blocks])
    extras = None
    if cfg.rans:
        xs = [jnp.asarray(b.x) for b in mesh.blocks]
        ds = compute_wall_distances(mesh, xs, xs[0].dtype)
        extras = [{"walldist": d} for d in ds]
    w = [jnp.broadcast_to(winf, tuple(d + 4 for d in b.dims) + (ref.nw,))
         for b in mesh.blocks]
    # perturb deterministically (same field regardless of splitting)
    w2 = []
    for bi, b in enumerate(mesh.blocks):
        xcs = np.asarray(compute_metrics(jnp.asarray(b.x)).xc_ext)
        bump = 0.01 * np.sin(3.0 * xcs[..., 0]) * np.cos(2.0 * xcs[..., 1])
        wb = np.asarray(w[bi]).copy()
        wb[1:-1, 1:-1, 1:-1, 0] *= (1.0 + bump)
        w2.append(jnp.asarray(wb))
    r = residual_list(w2, metrics, topo, cfg, ref, winf, extras)
    return w2, r


def _stacked_residual_of(mesh, cfg, ref, winf, w_by_block, n_dev=1):
    prob = build_stacked_problem(mesh)
    sm = stack_metrics(mesh, prob, winf.dtype)
    w = stack_state(prob, winf, winf.dtype)
    for pos, orig in enumerate(prob.order):
        if orig < 0:
            continue
        ni, nj, nk = mesh.blocks[orig].dims
        w = w.at[pos, :ni + 4, :nj + 4, :nk + 4].set(w_by_block[orig])
    extras = None
    if cfg.rans:
        xs = [jnp.asarray(b.x) for b in mesh.blocks]
        ds = compute_wall_distances(mesh, xs, xs[0].dtype)
        extras = {"walldist": stack_walldist(mesh, prob, ds, winf.dtype)}

    fn = jax.jit(lambda w: stacked_residual(w, sm, prob, cfg, ref, winf,
                                            extras))
    if n_dev > 1:
        devs = np.array(jax.devices()[:n_dev])
        dm = Mesh(devs, axis_names=("b",))
        sh = NamedSharding(dm, P("b"))
        w = jax.device_put(w, sh)
        sm = jax.device_put(sm, sh)
        if extras is not None:
            extras = jax.device_put(extras, sh)
        fn = jax.jit(lambda w: stacked_residual(w, sm, prob, cfg, ref, winf,
                                                extras))
    r = fn(w)
    return prob, np.asarray(r)


@pytest.mark.parametrize("equation_type", ["euler", "rans"])
def test_stacked_residual_matches_list(equation_type):
    mesh, cfg, ref, winf = _setup(equation_type)
    w2, r_list = _list_residual(mesh, cfg, ref, winf)
    prob, r_st = _stacked_residual_of(mesh, cfg, ref, winf, w2)
    for pos, orig in enumerate(prob.order):
        ni, nj, nk = mesh.blocks[orig].dims
        a = np.asarray(r_list[orig])
        bq = r_st[pos, :ni, :nj, :nk]
        scale = np.abs(a).max(axis=(0, 1, 2)) + 1e-12
        err = np.max(np.abs(a - bq) / scale)
        assert err < 1e-12, f"{equation_type} block {orig}: {err}"


@pytest.mark.parametrize("equation_type", ["euler", "rans"])
def test_split_block_residual_invariance(equation_type):
    """Splitting the wing along k must not change the (reassembled)
    residual: the internal stitch connection reproduces interior coupling
    exactly (loadBalance.F90:677 correctness requirement)."""
    mesh, cfg, ref, winf = _setup(equation_type)
    w2, r_list = _list_residual(mesh, cfg, ref, winf)
    mesh2 = split_block(mesh, 0, 2, 4)

    # build split states from the unsplit field
    w_by_block = []
    wb = np.asarray(w2[0])
    w_by_block.append(jnp.asarray(wb[:, :, :4 + 4]))
    w_by_block.append(jnp.asarray(wb[:, :, 4:]))
    prob, r_st = _stacked_residual_of(mesh2, cfg, ref, winf, w_by_block)

    a = np.asarray(r_list[0])
    scale = np.abs(a).max(axis=(0, 1, 2)) + 1e-12
    recon = np.concatenate(
        [r_st[prob.order.index(0)][:32, :12, :4],
         r_st[prob.order.index(1)][:32, :12, :4]], axis=2)
    err = np.max(np.abs(a - recon) / scale)
    assert err < 1e-10, f"{equation_type}: split mismatch {err}"


def test_stacked_sharded_8dev_matches_1dev():
    """balance_blocks + stacked RK + ANK over 8 devices == 1 device."""
    mesh, cfg, ref, winf = _setup("rans")
    mesh2, order = balance_blocks(mesh, 4)
    assert len([o for o in order if o >= 0]) == len(mesh2.blocks)
    prob = build_stacked_problem(mesh2, order)
    sm = stack_metrics(mesh2, prob, winf.dtype)
    xs = [jnp.asarray(b.x) for b in mesh2.blocks]
    ds = compute_wall_distances(mesh2, xs, xs[0].dtype)
    extras = {"walldist": stack_walldist(mesh2, prob, ds, winf.dtype)}

    def run(n_dev):
        w = stack_state(prob, winf, winf.dtype)
        sml, exl, wl = sm, extras, w
        if n_dev > 1:
            devs = np.array(jax.devices()[:n_dev])
            dm = Mesh(devs, axis_names=("b",))
            sh = NamedSharding(dm, P("b"))
            wl = jax.device_put(w, sh)
            sml = jax.device_put(sm, sh)
            exl = jax.device_put(extras, sh)
        rk = jax.jit(make_stacked_rk_step(prob, cfg, ref, cfl=1.0))
        for _ in range(2):
            wl, norms = rk(wl, sml, winf, exl)
        w2, r0, r1, linres = jax.jit(
            lambda w: stacked_ank_step(w, sml, prob, cfg, ref, winf,
                                       jnp.asarray(5.0, winf.dtype),
                                       extras=exl))(wl)
        return np.asarray(w2), np.asarray(norms), np.asarray([r0, r1, linres])

    n_stack = prob.nb
    n_dev = min(4, n_stack)
    w1, n1, s1 = run(1)
    w4, n4, s4 = run(n_dev)
    assert np.all(np.isfinite(s4)), s4
    assert s4[1] < s4[0], f"stacked ANK did not reduce residual: {s4}"
    scale = np.abs(w1).max() + 1e-12
    err = np.abs(w1 - w4).max() / scale
    assert err < 1e-10, f"sharded stacked mismatch {err}"
    assert abs(n1 - n4).max() / (np.abs(n1).max() + 1e-12) < 1e-10


def test_cross_block_donor_remap_invariance():
    """Split a block that ANOTHER block connects into: the donor-side
    remap must produce partial-face (rng) connections and leave the
    reassembled residual unchanged (loadBalance.F90:880
    splitBlocksLoadBalance donor remapping)."""
    mesh, cfg, ref, winf = _setup("euler")
    # first split along k -> two cross-connected blocks (0 <-> 1)
    m1 = split_block(mesh, 0, 2, 4)
    # now split block 0 along j: block 1's connection INTO block 0 must be
    # remapped (it is lateral to the cut -> splits into two rng windows)
    m2 = split_block(m1, 0, 1, 6)
    rngs = [c.rng for b in m2.blocks for c in b.conns if c.rng is not None]
    assert rngs, "expected partial-face connections after donor remap"

    w2, r_list = _list_residual(mesh, cfg, ref, winf)
    wb = np.asarray(w2[0])
    # states for the 3 parts from the unsplit field (halo-padded slices)
    w_by_block = [
        jnp.asarray(wb[:, :6 + 4, :4 + 4]),       # block 0: j<6,  k<4
        jnp.asarray(wb[:, :, 4:]),                # block 1: k>=4
        jnp.asarray(wb[:, 6:, :4 + 4]),           # block 2: j>=6, k<4
    ]
    prob, r_st = _stacked_residual_of(m2, cfg, ref, winf, w_by_block)

    a = np.asarray(r_list[0])
    scale = np.abs(a).max(axis=(0, 1, 2)) + 1e-12
    low = np.concatenate(
        [r_st[prob.order.index(0)][:32, :6, :4],
         r_st[prob.order.index(2)][:32, :6, :4]], axis=1)
    recon = np.concatenate(
        [low, r_st[prob.order.index(1)][:32, :12, :4]], axis=2)
    err = np.max(np.abs(a - recon) / scale)
    assert err < 1e-10, f"cross-block donor remap mismatch: {err}"

    # the per-block-list path (build_conn_ops) must agree too
    from adflow_tpu.geom.metrics import compute_metrics_conn
    topo2 = build_topology(m2)
    mets2 = compute_metrics_conn(
        m2.blocks, [jnp.asarray(b.x) for b in m2.blocks])
    r_l2 = residual_list(w_by_block, mets2, topo2, cfg, ref, winf, None)
    low2 = np.concatenate(
        [np.asarray(r_l2[0]), np.asarray(r_l2[2])], axis=1)
    recon2 = np.concatenate([low2, np.asarray(r_l2[1])], axis=2)
    err2 = np.max(np.abs(a - recon2) / scale)
    assert err2 < 1e-10, f"list-path donor remap mismatch: {err2}"
