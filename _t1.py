import time, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
t0=time.time()
print("devices:", jax.devices(), flush=True)

def k(x_hbm, o_hbm, xs, os, sems):
    i = pl.program_id(0)
    c = pltpu.make_async_copy(x_hbm.at[:, pl.ds(i*8, 12)], xs, sems.at[0])
    c.start(); c.wait()
    os[:] = xs[:][:, 2:10] * 2.0
    c2 = pltpu.make_async_copy(os, o_hbm.at[:, pl.ds(i*8, 8)], sems.at[1])
    c2.start(); c2.wait()

x = jnp.arange(4*72*128, dtype=jnp.float32).reshape(4, 72, 128)
out = pl.pallas_call(
    k, grid=(8,),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((4, 64, 128), jnp.float32),
    scratch_shapes=[pltpu.VMEM((4,12,128), jnp.float32),
                    pltpu.VMEM((4,8,128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))],
    compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
)(x)
ref = x[:, 2:66]*2.0
print("minimal pallas ok:", float(jnp.max(jnp.abs(out-ref))), f"{time.time()-t0:.0f}s", flush=True)

# now the real kernel on a small grid
import dataclasses
from adflow_tpu.core.refstate import AeroProblem, make_reference_state
from adflow_tpu.geom.metrics import compute_metrics
from adflow_tpu.meshgen.analytic import wing_omesh
from adflow_tpu.physics.residual import ProblemConfig, build_topology, fill_halos, block_residual

ni, nj, nk = 64, 32, 60
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
def r_jnp(w): return block_residual(w, m, cfg, ref, por=por)
@jax.jit
def r_pal(w): return block_residual(w, m, cfg_p, ref, por=por)

(wf,) = fill_halos([w], [m], topo, ref, winf)
a = r_jnp(wf); a.block_until_ready()
print("jnp compiled", f"{time.time()-t0:.0f}s", flush=True)
bb = r_pal(wf); bb.block_until_ready()
err = float(jnp.max(jnp.abs(a-bb))/jnp.max(jnp.abs(a)))
print("kernel rel err:", err, f"{time.time()-t0:.0f}s", flush=True)

def bench(f, wf, reps=20):
    f(wf).block_until_ready()
    t=time.perf_counter()
    for _ in range(reps): o=f(wf)
    o.block_until_ready()
    return (time.perf_counter()-t)/reps
tj = bench(r_jnp, wf); tp = bench(r_pal, wf)
ncell = ni*nj*nk
print(f"SMALL jnp: {tj*1e3:.2f} ms ({ncell/tj/1e6:.0f} Mc/s)  pallas: {tp*1e3:.2f} ms ({ncell/tp/1e6:.0f} Mc/s)  speedup {tj/tp:.2f}x", flush=True)
