"""Minimal-delta probes on top of the KNOWN-GOOD stage-C pattern
(tools/trav_bisect.py stage C ran clean on the real TPU).

Each case adds ONE primitive the redesigned sweep kernel needs:
  base  : stage-C replica — double-buffered HBM->SMEM chunk DMA, scalar reads
  p1    : + blocked SMEM input (read one scalar, no control flow)
  p2    : base but DMA dst in VMEM, chunk consumed as vectors (matmul style)
  p3    : + SMEM-input scalar as dynamic fori bound AND DMA block index
  p4    : + vector reduce -> scalar -> pl.when control flow
  p5    : PrefetchScalarGridSpec variant of p3

PYTHONPATH=/root/repo:/root/.axon_site python tools/trav_probe2.py <case>
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32
LANES = 128
TILES = 2
ROWS = 8
N_CHUNKS = 6          # blocks in the HBM table
BUF_ROWS = 3          # rows per chunk block


def make_inputs():
    rays = jnp.arange(TILES * ROWS * LANES, dtype=_F32).reshape(
        TILES * ROWS, LANES) * 1e-3
    table = jnp.arange(N_CHUNKS * BUF_ROWS * LANES, dtype=_F32).reshape(
        N_CHUNKS, BUF_ROWS, LANES) * 1e-4
    # per-tile scalars: (n, blk0, 0, 0)
    spans = jnp.asarray(np.array([[3, 1, 0, 0], [2, 4, 0, 0]], np.int32))
    return rays, table, spans


def lane_spec():
    return pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def common_call(kernel, n_extra_in, extra_specs, smem_dst=True):
    rays, table, spans = make_inputs()
    ins = [rays, table] + ([spans[:, None, :]] if n_extra_in else [])
    buf_space = pltpu.SMEM if smem_dst else pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=(TILES,),
        in_specs=[lane_spec(), pl.BlockSpec(memory_space=pl.ANY)]
        + extra_specs,
        out_specs=lane_spec(),
        out_shape=jax.ShapeDtypeStruct((TILES * ROWS, LANES), _F32),
        scratch_shapes=[buf_space((2, BUF_ROWS, LANES), _F32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(*ins)
    return np.asarray(out), [np.asarray(x) for x in (rays, table, spans)]


def dma_helpers(table_ref, buf, sem):
    def fetch(slot, blk):
        pltpu.make_async_copy(
            table_ref.at[blk], buf.at[slot], sem.at[slot]).start()

    def wait(slot):
        pltpu.make_async_copy(
            table_ref.at[0], buf.at[slot], sem.at[slot]).wait()

    return fetch, wait


def sweep_loop(v, table_ref, buf, sem, blk0, n, scalar_reads):
    """Double-buffered chunk loop, stage-C discipline."""
    fetch, wait = dma_helpers(table_ref, buf, sem)

    def body(c, acc):
        slot = jnp.remainder(c, 2)

        @pl.when(c == 0)
        def _():
            fetch(slot, blk0)

        @pl.when(c + 1 < n)
        def _():
            fetch(1 - slot, blk0 + c + 1)

        wait(slot)
        if scalar_reads:
            return acc + buf[slot, 0, 0] + buf[slot, 2, LANES - 1]
        return acc + buf[slot][0:1, :]  # vector consume, broadcast add

    init = jnp.float32(0.0) if scalar_reads else jnp.zeros((1, LANES), _F32)
    return jax.lax.fori_loop(0, n, body, init)


def expect_scalar(table, blk0, n):
    return sum(table[blk0 + c, 0, 0] + table[blk0 + c, 2, LANES - 1]
               for c in range(n))


def case_base():
    def kernel(ray_ref, table_ref, out, buf, sem):
        acc = sweep_loop(ray_ref[:], table_ref, buf, sem,
                         jnp.int32(1), 3, True)
        out[:] = ray_ref[:] + acc

    out, (rays, table, _) = common_call(kernel, 0, [])
    exp = rays.reshape(TILES, ROWS, LANES) + expect_scalar(table, 1, 3)
    np.testing.assert_allclose(out.reshape(TILES, ROWS, LANES), exp,
                               rtol=1e-5)
    print("CASE OK")


def span_smem_spec():
    return pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0),
                        memory_space=pltpu.SMEM)


def case_p1():
    def kernel(ray_ref, table_ref, span_ref, out, buf, sem):
        acc = sweep_loop(ray_ref[:], table_ref, buf, sem,
                         jnp.int32(1), 3, True)
        sp = span_ref[0, 0, 0]
        out[:] = ray_ref[:] + acc + sp.astype(_F32)

    out, (rays, table, spans) = common_call(kernel, 1, [span_smem_spec()])
    exp = (rays.reshape(TILES, ROWS, LANES) + expect_scalar(table, 1, 3)
           + spans[:, 0, None, None].astype(np.float32))
    np.testing.assert_allclose(out.reshape(TILES, ROWS, LANES), exp,
                               rtol=1e-5)
    print("CASE OK")


def case_p2():
    def kernel(ray_ref, table_ref, out, buf, sem):
        acc = sweep_loop(ray_ref[:], table_ref, buf, sem,
                         jnp.int32(1), 3, False)
        out[:] = ray_ref[:] + acc

    out, (rays, table, _) = common_call(kernel, 0, [], smem_dst=False)
    exp = (rays.reshape(TILES, ROWS, LANES)
           + sum(table[1 + c, 0] for c in range(3))[None, None, :])
    np.testing.assert_allclose(out.reshape(TILES, ROWS, LANES), exp,
                               rtol=1e-5)
    print("CASE OK")


def case_p3():
    def kernel(ray_ref, table_ref, span_ref, out, buf, sem):
        n = span_ref[0, 0, 0]
        blk0 = span_ref[0, 0, 1]
        acc = sweep_loop(ray_ref[:], table_ref, buf, sem, blk0, n, True)
        out[:] = ray_ref[:] + acc

    out, (rays, table, spans) = common_call(kernel, 1, [span_smem_spec()])
    exp = np.stack([
        rays.reshape(TILES, ROWS, LANES)[i]
        + expect_scalar(table, spans[i, 1], spans[i, 0])
        for i in range(TILES)])
    np.testing.assert_allclose(out.reshape(TILES, ROWS, LANES), exp,
                               rtol=1e-5)
    print("CASE OK")


def case_p4():
    def kernel(ray_ref, table_ref, out, buf, sem):
        v = ray_ref[:]
        acc = sweep_loop(v, table_ref, buf, sem, jnp.int32(1), 3, True)
        m = jnp.max(v)

        @pl.when(m > 0.5)
        def _():
            out[:] = v + acc

        @pl.when(m <= 0.5)
        def _():
            out[:] = v - acc

    out, (rays, table, _) = common_call(kernel, 0, [])
    acc = expect_scalar(table, 1, 3)
    r = rays.reshape(TILES, ROWS, LANES)
    exp = np.stack([r[i] + acc if r[i].max() > 0.5 else r[i] - acc
                    for i in range(TILES)])
    np.testing.assert_allclose(out.reshape(TILES, ROWS, LANES), exp,
                               rtol=1e-5)
    print("CASE OK")


def case_p5():
    rays, table, spans = make_inputs()

    def kernel(ns_ref, blk_ref, ray_ref, table_ref, out, buf, sem):
        i = pl.program_id(0)
        n = ns_ref[i]
        blk0 = blk_ref[i]
        acc = sweep_loop(ray_ref[:], table_ref, buf, sem, blk0, n, True)
        out[:] = ray_ref[:] + acc

    pf_lane = pl.BlockSpec((ROWS, LANES), lambda i, *_: (i, 0),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(TILES,),
        in_specs=[pf_lane, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pf_lane,
        scratch_shapes=[pltpu.SMEM((2, BUF_ROWS, LANES), _F32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((TILES * ROWS, LANES), _F32),
    )(spans[:, 0], spans[:, 1], rays, table)
    out = np.asarray(out)
    table = np.asarray(table)
    spans = np.asarray(spans)
    r = np.asarray(rays).reshape(TILES, ROWS, LANES)
    exp = np.stack([
        r[i] + expect_scalar(table, spans[i, 1], spans[i, 0])
        for i in range(TILES)])
    np.testing.assert_allclose(out.reshape(TILES, ROWS, LANES), exp,
                               rtol=1e-5)
    print("CASE OK")


def staged(callable_, *args):
    import time
    f = jax.jit(callable_)
    t0 = time.time()
    low = f.lower(*args)
    print(f"lowered +{time.time()-t0:.1f}s", flush=True)
    comp = low.compile()
    print(f"compiled +{time.time()-t0:.1f}s", flush=True)
    out = jax.block_until_ready(comp(*args))
    print(f"executed +{time.time()-t0:.1f}s", flush=True)
    return out


def case_p3s():
    rays, table, spans = make_inputs()

    def kernel(ray_ref, table_ref, span_ref, out, buf, sem):
        n = span_ref[0, 0, 0]
        blk0 = span_ref[0, 0, 1]
        acc = sweep_loop(ray_ref[:], table_ref, buf, sem, blk0, n, True)
        out[:] = ray_ref[:] + acc

    def fn(rays, table, spans):
        return pl.pallas_call(
            kernel,
            grid=(TILES,),
            in_specs=[lane_spec(), pl.BlockSpec(memory_space=pl.ANY),
                      span_smem_spec()],
            out_specs=lane_spec(),
            out_shape=jax.ShapeDtypeStruct((TILES * ROWS, LANES), _F32),
            scratch_shapes=[pltpu.SMEM((2, BUF_ROWS, LANES), _F32),
                            pltpu.SemaphoreType.DMA((2,))],
        )(rays, table, spans)

    out = np.asarray(staged(fn, rays, table, spans[:, None, :]))
    print("p3s done", out.reshape(TILES, ROWS, LANES)[0, 0, 0])


def case_p4s():
    rays, table, spans = make_inputs()

    def kernel(ray_ref, table_ref, out, buf, sem):
        v = ray_ref[:]
        acc = sweep_loop(v, table_ref, buf, sem, jnp.int32(1), 3, True)
        m = jnp.max(v)

        @pl.when(m > 0.5)
        def _():
            out[:] = v + acc

        @pl.when(m <= 0.5)
        def _():
            out[:] = v - acc

    def fn(rays, table):
        return pl.pallas_call(
            kernel,
            grid=(TILES,),
            in_specs=[lane_spec(), pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=lane_spec(),
            out_shape=jax.ShapeDtypeStruct((TILES * ROWS, LANES), _F32),
            scratch_shapes=[pltpu.SMEM((2, BUF_ROWS, LANES), _F32),
                            pltpu.SemaphoreType.DMA((2,))],
        )(rays, table)

    out = np.asarray(staged(fn, rays, table))
    print("p4s done", out.reshape(TILES, ROWS, LANES)[0, 0, 0])


CASES = dict(base=case_base, p1=case_p1, p2=case_p2, p3=case_p3,
             p4=case_p4, p5=case_p5, p3s=case_p3s, p4s=case_p4s)

if __name__ == "__main__":
    print("devices:", jax.devices())
    CASES[sys.argv[1]]()
