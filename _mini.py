import sys, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

which = sys.argv[1]

if which == "smem_dma":
    # HBM -> SMEM DMA + dynamic scalar read
    def k(x_hbm, o_ref, buf, sem):
        cp = pltpu.make_async_copy(x_hbm.at[0], buf, sem)
        cp.start(); cp.wait()
        i = jnp.int32(5)
        o_ref[:] = jnp.zeros_like(o_ref) + buf[0, i]
    x = jnp.arange(2*6*128, dtype=jnp.float32).reshape(2,6,128)
    out = pl.pallas_call(k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((6,128), jnp.float32), pltpu.SemaphoreType.DMA(())],
    )(x)
    print("smem_dma ok", np.asarray(out)[0,0])
elif which == "vmem_dma":
    def k(x_hbm, o_ref, buf, sem):
        cp = pltpu.make_async_copy(x_hbm.at[0], buf, sem)
        cp.start(); cp.wait()
        o_ref[:] = jnp.zeros_like(o_ref) + buf[0, 5]
    x = jnp.arange(2*6*128, dtype=jnp.float32).reshape(2,6,128)
    out = pl.pallas_call(k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((6,128), jnp.float32), pltpu.SemaphoreType.DMA(())],
    )(x)
    print("vmem_dma ok", np.asarray(out)[0,0])
elif which == "smem_dyn":
    # dynamic scalar index into SMEM scratch written by kernel
    def k(s_ref, o_ref, buf):
        buf[3, 7] = s_ref[0]
        i = (s_ref[0].astype(jnp.int32)) % 6
        j = (s_ref[0].astype(jnp.int32) * 7) % 128
        buf[i, j] = 42.0
        o_ref[:] = jnp.zeros_like(o_ref) + buf[i, j]
    out = pl.pallas_call(k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((6,128), jnp.float32)],
    )(jnp.ones((1,), jnp.float32))
    print("smem_dyn ok", np.asarray(out)[0,0])
