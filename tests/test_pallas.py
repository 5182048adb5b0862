"""Pallas blockette vs jnp residual: numerical equivalence + derivatives.

Runs the TPU kernel in interpreter mode on CPU (the driver's bench runs it
compiled on the real chip). Reference analogue: the blockette-vs-residuals
consistency the reference relies on (NKSolver/blockette.F90 is asserted to
match solver/residuals.F90 through its regression suite).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adflow_tpu.core.refstate import AeroProblem, make_reference_state
from adflow_tpu.geom.metrics import compute_metrics
from adflow_tpu.meshgen.analytic import wing_omesh
from adflow_tpu.physics.residual import (
    ProblemConfig, build_topology, fill_halos, block_residual)


def _setup(dtype=jnp.float32):
    mesh = wing_omesh(ni=16, nj=8, nk=8)
    cfg = ProblemConfig(equation_type="euler", vis2=0.25, vis4=1.0 / 64.0,
                        diss_exponent=0.67)
    ap = AeroProblem(name="p", mach=0.5, alpha=2.0)
    ref = make_reference_state(ap, lift_index=2, n_turb=0)
    winf = jnp.asarray(ref.winf(), dtype)
    topo = build_topology(mesh)
    x = jnp.asarray(mesh.blocks[0].x, dtype)
    metrics = [compute_metrics(x)]
    b = mesh.blocks[0]
    rng = np.random.default_rng(3)
    w = np.broadcast_to(np.asarray(winf),
                        tuple(d + 4 for d in b.dims) + (5,)).copy()
    w *= 1.0 + 0.01 * rng.standard_normal(w.shape)
    w = jnp.asarray(w, dtype)
    (wf,) = fill_halos([w], metrics, topo, ref, winf)
    return wf, metrics[0], cfg, ref, topo


def test_pallas_matches_jnp():
    wf, m, cfg, ref, topo = _setup()
    por = topo.blocks[0].por
    r_jnp = block_residual(wf, m, cfg, ref, por=por)
    cfg_p = dataclasses.replace(cfg, use_pallas=True)
    r_pal = block_residual(wf, m, cfg_p, ref, por=por)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_jnp),
                               rtol=2e-5, atol=2e-5 * float(abs(r_jnp).max()))


def test_pallas_jvp_and_vjp_route_through_jnp():
    wf, m, cfg, ref, topo = _setup()
    por = topo.blocks[0].por
    cfg_p = dataclasses.replace(cfg, use_pallas=True)

    def f(cfg_, w):
        return jnp.sum(block_residual(w, m, cfg_, ref, por=por) ** 2)

    g_jnp = jax.grad(lambda w: f(cfg, w))(wf)
    g_pal = jax.grad(lambda w: f(cfg_p, w))(wf)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_jnp),
                               rtol=1e-4, atol=1e-4 * float(abs(g_jnp).max()))

    t = jnp.ones_like(wf)
    _, jv_jnp = jax.jvp(lambda w: f(cfg, w), (wf,), (t,))
    _, jv_pal = jax.jvp(lambda w: f(cfg_p, w), (wf,), (t,))
    assert np.isfinite(jv_pal)
    np.testing.assert_allclose(jv_pal, jv_jnp, rtol=1e-4)
