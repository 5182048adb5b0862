"""Wall-distance accuracy tests.

Reference analogue: the wall-distance machinery of
`/root/reference/src/wallDistance/wallDistance.F90` (ADT search + Newton
quad projection). These pin: exact planar distances on a uniform channel,
Newton-projection accuracy on random bilinear quads, and the f32 near-wall
regression (first-cell distances must not collapse to zero via the
matmul-expansion cancellation)."""

import jax.numpy as jnp
import numpy as np

from adflow_tpu.geom.walldist import (
    _project_points_quads, compute_wall_distances)
from adflow_tpu.meshgen.analytic import channel_mesh, wing_omesh


def test_channel_exact_planar():
    ni, nj, nk = 8, 10, 4
    mesh = channel_mesh(ni=ni, nj=nj, nk=nk, length=2.0, height=1.0,
                        width=0.5)
    x = jnp.asarray(mesh.blocks[0].x, jnp.float64)
    d = compute_wall_distances(mesh, [x], jnp.float64)[0]
    # interior cell centers: y = (j + 0.5)/nj; walls at y=0 and y=1
    yc = (np.arange(nj) + 0.5) / nj
    want = np.minimum(yc, 1.0 - yc)
    got = np.asarray(d[1:-1, 1:-1, 1:-1])
    np.testing.assert_allclose(
        got, np.broadcast_to(want[None, :, None], got.shape), rtol=1e-12)


def test_quad_projection_matches_dense_sampling():
    rng = np.random.default_rng(7)
    n = 64
    quads = rng.normal(size=(n, 4, 3))
    # make them bilinear-consistent but skewed: c near a+ (b-a)+(d-a)
    quads[:, 2] = (quads[:, 1] + quads[:, 3] - quads[:, 0]
                   + 0.3 * rng.normal(size=(n, 3)))
    pts = rng.normal(size=(n, 3)) * 2.0

    d_newton = np.asarray(_project_points_quads(
        jnp.asarray(pts), jnp.asarray(quads)))

    # dense parametric sampling lower-bounds the quality
    m = 121
    u = np.linspace(0, 1, m)
    uu, vv = np.meshgrid(u, u, indexing="ij")
    a, b, c, d = [quads[:, i] for i in range(4)]
    e0, e1 = b - a, d - a
    e2 = a - b + c - d
    xs = (a[:, None, None] + uu[None, ..., None] * e0[:, None, None]
          + vv[None, ..., None] * e1[:, None, None]
          + (uu * vv)[None, ..., None] * e2[:, None, None])
    d_samp = np.sqrt(((xs - pts[:, None, None]) ** 2).sum(-1)).min((1, 2))
    # Newton must beat (or tie) sampling, and not be wildly below it
    assert np.all(d_newton <= d_samp + 1e-9)
    assert np.all(d_newton >= d_samp - 0.05 * (d_samp + 0.1))


def test_f32_near_wall_no_collapse():
    mesh = wing_omesh(ni=24, nj=8, nk=8, viscous=True)
    x = jnp.asarray(mesh.blocks[0].x, jnp.float32)
    d = compute_wall_distances(mesh, [x], jnp.float32)[0]
    dmin = float(d.min())
    # first-cell center sits at ~half the viscous wall spacing — never 0
    assert dmin > 1e-8, f"near-wall distance collapsed: {dmin}"
    # and the interior maximum is the farfield scale
    assert float(d.max()) > 1.0


def test_approx_update_tracks_deformation():
    """useApproxWallDistance fast path (reference:
    updateWallDistancesQuickly, wallDistance.F90:36): after a smooth mesh
    deformation, re-projecting onto the STORED nearest elements matches a
    full re-search wherever the nearest element didn't change."""
    import numpy as np
    from adflow_tpu.geom.walldist import (compute_wall_distances,
                                          update_wall_distances)
    from adflow_tpu.meshgen.analytic import naca0012_omesh

    mesh = naca0012_omesh(ni=48, nj=16)
    x0 = [jnp.asarray(b.x) for b in mesh.blocks]
    d0, assoc = compute_wall_distances(mesh, x0, x0[0].dtype,
                                       return_assoc=True)
    # smooth vertical bend of the whole mesh (wall moves with it)
    x1 = [x.at[..., 1].add(0.05 * jnp.sin(x[..., 0])) for x in x0]
    d_fast = update_wall_distances(mesh, x1, assoc, x0[0].dtype)
    d_full = compute_wall_distances(mesh, x1, x0[0].dtype)
    rel = np.abs(np.asarray(d_fast[0]) - np.asarray(d_full[0])) / (
        np.asarray(d_full[0]) + 1e-12)
    # near-identical for the near-wall rows (the rows SA cares about);
    # cells whose nearest element changed under the bend carry the
    # documented approximation error of the quick path
    near = np.asarray(d_full[0]) < 0.5
    assert rel[near].max() < 5e-3, rel[near].max()
    assert np.median(rel) < 1e-6


def test_wall_dist_cutoff():
    """wallDistCutoff: distances beyond the cutoff become the large
    constant (doc/options.yaml:333)."""
    import numpy as np
    from adflow_tpu.geom.walldist import FAR_DIST, compute_wall_distances
    from adflow_tpu.meshgen.analytic import naca0012_omesh

    mesh = naca0012_omesh(ni=32, nj=12)
    x0 = [jnp.asarray(b.x) for b in mesh.blocks]
    d = compute_wall_distances(mesh, x0, x0[0].dtype, cutoff=1.0)[0]
    d = np.asarray(d)
    assert (d > 1.0).any()
    assert np.all((d <= 1.0) | (d == FAR_DIST))
