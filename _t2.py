import time, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
t0=time.time()
print("devices:", jax.devices(), flush=True)

# stage 1: 3D copy slicing dim 0 only
def k1(x, o, xs, sems):
    i = pl.program_id(0)
    c = pltpu.make_async_copy(x.at[pl.ds(i*8, 12)], xs, sems.at[0])
    c.start(); c.wait()
    c2 = pltpu.make_async_copy(xs.at[2:10], o.at[pl.ds(i*8, 8)], sems.at[1])
    c2.start(); c2.wait()
x = jnp.arange(68*72*128, dtype=jnp.float32).reshape(68, 72, 128)
out = pl.pallas_call(k1, grid=(8,),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((64, 72, 128), jnp.float32),
    scratch_shapes=[pltpu.VMEM((12,72,128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))],
    compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
)(x)
print("stage1 ok:", float(jnp.max(jnp.abs(out - x[2:66]))), f"{time.time()-t0:.0f}s", flush=True)

# stage 2: 4D slicing dim 1, compute in VMEM, full writeback
def k2(x, o, xs, os, sems):
    i = pl.program_id(0)
    c = pltpu.make_async_copy(x.at[:, pl.ds(i*8, 12)], xs, sems.at[0])
    c.start(); c.wait()
    v = xs[:]
    for ch in range(5):
        os[ch] = v[ch, 2:10] * 2.0 + v[ch, 1:9]
    c2 = pltpu.make_async_copy(os, o.at[:, pl.ds(i*8, 8)], sems.at[1])
    c2.start(); c2.wait()
x4 = jnp.arange(5*68*72*128, dtype=jnp.float32).reshape(5, 68, 72, 128)
out = pl.pallas_call(k2, grid=(8,),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((5, 64, 72, 128), jnp.float32),
    scratch_shapes=[pltpu.VMEM((5,12,72,128), jnp.float32),
                    pltpu.VMEM((5,8,72,128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))],
    compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
)(x4)
ref = x4[:, 2:66]*2.0 + x4[:, 1:65]
print("stage2 ok:", float(jnp.max(jnp.abs(out - ref))), f"{time.time()-t0:.0f}s", flush=True)

# stage 3: masked store to partial lanes + logical slicing of values
def k3(x, o, xs, os, sems):
    i = pl.program_id(0)
    c = pltpu.make_async_copy(x.at[:, pl.ds(i*8, 12)], xs, sems.at[0])
    c.start(); c.wait()
    for ch in range(5):
        v = xs[ch][:, :, :60]          # logical k extent < 128
        r = v[2:10, 2:-2, :] * 3.0
        os[ch, :, :, :60] = r
    c2 = pltpu.make_async_copy(os, o.at[:, pl.ds(i*8, 8)], sems.at[1])
    c2.start(); c2.wait()
out = pl.pallas_call(k3, grid=(8,),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec(memory_space=pl.ANY),
    out_shape=jax.ShapeDtypeStruct((5, 64, 68, 128), jnp.float32),
    scratch_shapes=[pltpu.VMEM((5,12,72,128), jnp.float32),
                    pltpu.VMEM((5,8,68,128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))],
    compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
)(x4)
ref = x4[:, 4:68, 2:70, :60]*3.0
print("stage3 ok:", float(jnp.max(jnp.abs(out[:,:,:,:60] - ref))), f"{time.time()-t0:.0f}s", flush=True)
