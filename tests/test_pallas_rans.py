"""Fused full-RANS Pallas blockette (ops/pallas_rans.py) vs the jnp twin.

Runs in interpreter mode on CPU (the compiled path needs a real TPU; see
NOTES_TPU_INFRA.md for the hardware campaign). The twin IS the production
XLA path, so agreement here proves the kernel computes the same
discretization: central+JST + full viscous + SA + row scale, all 6
channels. Reference: the blockette containing saSource/viscousFlux/
allNodalGradients in-tile (blockette.F90:70,976,5205,5517).
"""

import jax
import jax.numpy as jnp
import numpy as np

from adflow_tpu.core.refstate import AeroProblem, make_reference_state
from adflow_tpu.geom.metrics import compute_metrics
from adflow_tpu.geom.walldist import compute_wall_distances
from adflow_tpu.meshgen.analytic import wing_omesh
from adflow_tpu.ops.pallas_rans import _jnp_reference, _pallas_impl
from adflow_tpu.physics.residual import build_topology


def _setup(ni=24, nj=12, nk=8):
    mesh = wing_omesh(ni=ni, nj=nj, nk=nk, viscous=True)
    ap = AeroProblem(name="w", mach=0.8, alpha=1.5, reynolds=1e6)
    ref = make_reference_state(ap, lift_index=2, n_turb=1)
    winf = jnp.asarray(ref.winf(), jnp.float32)
    x = jnp.asarray(mesh.blocks[0].x, jnp.float32)
    m = compute_metrics(x)
    d = compute_wall_distances(mesh, [x], jnp.float32)[0]
    por = build_topology(mesh).blocks[0].por
    rng = np.random.RandomState(0)
    shp = tuple(dd + 4 for dd in mesh.blocks[0].dims) + (6,)
    w = np.broadcast_to(np.asarray(winf), shp).copy()
    w *= (1.0 + 0.03 * rng.randn(*shp).astype(np.float32))
    w[..., 5] = np.abs(w[..., 5])
    args = (jnp.asarray(w, jnp.float32), m.siE, m.sjE, m.skE, m.vol,
            m.xc_ext, d, jnp.asarray(por[0], jnp.float32),
            jnp.asarray(por[1], jnp.float32),
            jnp.asarray(por[2], jnp.float32))
    consts = (0.25, 1.0 / 64.0, 0.67, ref.mu_inf, ref.t_inf_dim, True, 1e4)
    return args, consts


def test_fused_rans_matches_jnp_twin():
    args, consts = _setup()
    ref_out = np.asarray(_jnp_reference(*args, *consts))
    pal_out = np.asarray(_pallas_impl(*args, *consts))
    assert pal_out.shape == ref_out.shape
    for c in range(6):
        scale = np.abs(ref_out[..., c]).max() + 1e-30
        err = np.abs(ref_out[..., c] - pal_out[..., c]).max() / scale
        assert err < 2e-5, f"channel {c}: rel err {err}"


def test_fused_rans_jvp_routes_through_twin():
    """custom_jvp: tangents exist and are finite (they evaluate the jnp
    twin, so ANK/NK matvecs and the adjoint stay exact with the kernel
    on)."""
    args, consts = _setup(ni=16, nj=8, nk=8)

    def f(w):
        return _pallas_impl(w, *args[1:], *consts)

    w = args[0]
    v = jnp.ones_like(w)
    from adflow_tpu.ops.pallas_rans import fused_rans_residual

    def g(w):
        return fused_rans_residual(w, *args[1:], *consts)

    out, tang = jax.jvp(g, (w,), (v,))
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.isfinite(np.asarray(tang)))
