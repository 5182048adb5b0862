import time, jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), jax.devices())
from adflow_tpu.core.refstate import AeroProblem, make_reference_state
from adflow_tpu.geom.metrics import compute_metrics
from adflow_tpu.meshgen.analytic import wing_omesh
from adflow_tpu.physics.residual import ProblemConfig, build_topology, fill_halos, block_residual
import dataclasses

ni, nj, nk = 192, 64, 124
mesh = wing_omesh(ni=ni, nj=nj, nk=nk)
cfg = ProblemConfig(equation_type="euler", vis2=0.25, vis4=1/64., diss_exponent=0.67)
ap = AeroProblem(name="p", mach=0.8, alpha=2.0)
ref = make_reference_state(ap, lift_index=2, n_turb=0)
winf = jnp.asarray(ref.winf(), jnp.float32)
topo = build_topology(mesh)
x = jnp.asarray(mesh.blocks[0].x, jnp.float32)
m = compute_metrics(x)
b = mesh.blocks[0]
rng = np.random.default_rng(0)
w = np.broadcast_to(np.asarray(winf), tuple(d+4 for d in b.dims)+(5,)).copy()
w *= 1.0 + 0.01*rng.standard_normal(w.shape)
w = jnp.asarray(w, jnp.float32)
por = topo.blocks[0].por
cfg_p = dataclasses.replace(cfg, use_pallas=True)

@jax.jit
def r_jnp(w):
    return block_residual(w, m, cfg, ref, por=por)
@jax.jit
def r_pal(w):
    return block_residual(w, m, cfg_p, ref, por=por)

(wf,) = fill_halos([w], [m], topo, ref, winf)
a = r_jnp(wf); a.block_until_ready()
bb = r_pal(wf); bb.block_until_ready()
err = float(jnp.max(jnp.abs(a-bb))/jnp.max(jnp.abs(a)))
print("rel err:", err)

def bench(f, wf, reps=20):
    f(wf).block_until_ready()
    t0=time.perf_counter()
    for _ in range(reps): o=f(wf)
    o.block_until_ready()
    return (time.perf_counter()-t0)/reps

tj = bench(r_jnp, wf); tp = bench(r_pal, wf)
ncell = ni*nj*nk
print(f"jnp: {tj*1e3:.2f} ms ({ncell/tj/1e6:.1f} Mcell/s)  pallas: {tp*1e3:.2f} ms ({ncell/tp/1e6:.1f} Mcell/s)  speedup {tj/tp:.2f}x")
