"""Isolate the stage-A fault: HBM->SMEM DMA variants.

PYTHONPATH=/root/repo:/root/.axon_site python tools/trav_bisect2.py <case>
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
LANES = 128


def run(rows, out_smem, grid, src_rows=None, vmem_dst=False):
    """DMA a (rows, 128) block from a (4, rows, 128) HBM table into
    scratch, then write one scalar out."""
    src_rows = src_rows or rows
    table = jnp.arange(4 * src_rows * LANES, dtype=_F32).reshape(
        4, src_rows, LANES)

    def kernel(hbm, out, win, sem):
        cp = pltpu.make_async_copy(hbm.at[1], win, sem)
        cp.start()
        cp.wait()
        if out_smem:
            out[0, 0] = win[0, 0]
            out[0, 1] = win[rows - 1, LANES - 1]
        else:
            out[:] = jnp.full((8, LANES), win[0, 0], _F32)

    kw = dict(
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM) if out_smem
        else pl.BlockSpec((8, LANES), lambda *i: (0, 0),
                          memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2) if out_smem else (8, LANES),
                                       _F32),
        scratch_shapes=[
            (pltpu.VMEM if vmem_dst else pltpu.SMEM)((rows, LANES), _F32),
            pltpu.SemaphoreType.DMA(())],
    )
    if grid:
        kw["grid"] = (1,)
    out = pl.pallas_call(kernel, **kw)(table)
    got = np.asarray(out)
    want0 = 1 * src_rows * LANES  # first elem of block 1
    print("ok:", got.ravel()[:2], "expect first:", want0)


CASES = {
    # stage-A repro: 6-row SMEM window, SMEM out, no grid
    "a6_smem_nogrid": lambda: run(6, True, False),
    # 3-row window (same as the working stage C)
    "a3_smem_nogrid": lambda: run(3, True, False),
    # 6-row window but with a grid
    "a6_smem_grid": lambda: run(6, True, True),
    # 6-row window, VMEM output instead of SMEM output
    "a6_vmemout_nogrid": lambda: run(6, False, False),
    # 6-row window into VMEM scratch instead of SMEM
    "a6_vmemdst_nogrid": lambda: run(6, True, False, vmem_dst=True),
    # 8-row (native f32 tile) window
    "a8_smem_nogrid": lambda: run(8, True, False),
    # 1-row window
    "a1_smem_nogrid": lambda: run(1, True, False),
}

if __name__ == "__main__":
    print("devices:", jax.devices())
    CASES[sys.argv[1]]()
