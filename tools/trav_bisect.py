"""Bisect the tile-traversal TPU kernel fault into isolated mini-kernels.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/trav_bisect.py A|B|C|D
Each stage runs in its own process (a kernel fault kills the TPU worker).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_path_tracer.core.config import LAMBERTIAN
from tpu_path_tracer.kernels.pallas.traversal import (
    LANES, NODE_BLOCK_ROWS, NODE_WINDOW, TRI_BLOCK_ROWS, TRI_CHUNK,
    MAX_SPANS, SPAN_MIN, TILE_ROWS, pack_nodes, pack_tris)
from tpu_path_tracer.scene import procedural
from tpu_path_tracer.scene.builder import SceneBuilder

_F32 = jnp.float32
NODE_COLS = 12
TRI_COLS = 12


def scene():
    b = SceneBuilder()
    m = b.add_material("w", LAMBERTIAN, [0.7, 0.7, 0.7])
    b.add_mesh(procedural.icosphere(subdivisions=3, radius=0.8), m)
    sc, meta = b.build(bvh="median")
    return sc.triangles, sc.bvh


def rays(n=2048):
    k = np.random.default_rng(11)
    origin = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (n, 1))
    target = k.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = target - origin
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(origin), jnp.asarray(d)


def stage_A():
    """HBM->SMEM node window DMA + scalar read."""
    tris, bvh = scene()
    nodes = pack_nodes(bvh)

    def kernel(nodes_hbm, out, win, nsem):
        cp = pltpu.make_async_copy(nodes_hbm.at[0], win, nsem)
        cp.start()
        cp.wait()
        out[0, 0] = win[0, 0]
        out[0, 1] = win[0, 5]

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), _F32),
        scratch_shapes=[pltpu.SMEM((NODE_BLOCK_ROWS, LANES), _F32),
                        pltpu.SemaphoreType.DMA(())],
    )(nodes)
    print("A ok:", np.asarray(out), "expect min.x,max.z of root:",
          np.asarray(bvh.mins[0]), np.asarray(bvh.maxs[0]))


def stage_B():
    """Scalar skip-link walk only (no vector phase). Outputs ns, node."""
    tris, bvh = scene()
    nodes = pack_nodes(bvh)
    n_nodes = int(bvh.count)

    def kernel(nodes_hbm, out, win, spans, nsem):
        def fetch_window(block):
            cp = pltpu.make_async_copy(nodes_hbm.at[block], win, nsem)
            cp.start()
            cp.wait()

        def node_scalar(r, k):
            p = r * NODE_COLS + k
            return win[p // LANES, p % LANES]

        fetch_window(0)
        # fixed generous reach bounds (whole root box)
        reach_lo = (win[0, 0] - 10.0, win[0, 1] - 10.0, win[0, 2] - 10.0)
        reach_hi = (win[0, 3] + 10.0, win[0, 4] + 10.0, win[0, 5] + 10.0)

        def walk_cond(state):
            node, w_blk, ns = state
            return (node < n_nodes) & (ns < MAX_SPANS)

        def walk_body(state):
            node, w_blk, ns = state
            blk = node // NODE_WINDOW
            oob = blk != w_blk

            @pl.when(oob)
            def _():
                fetch_window(blk)

            w_blk = jnp.where(oob, blk, w_blk)
            r = node - blk * NODE_WINDOW
            bmin = (node_scalar(r, 0), node_scalar(r, 1), node_scalar(r, 2))
            bmax = (node_scalar(r, 3), node_scalar(r, 4), node_scalar(r, 5))
            miss = node_scalar(r, 6).astype(jnp.int32)
            lo = node_scalar(r, 7).astype(jnp.int32)
            hi = node_scalar(r, 8).astype(jnp.int32)
            overlap = ((bmax[0] >= reach_lo[0]) & (bmin[0] <= reach_hi[0])
                       & (bmax[1] >= reach_lo[1]) & (bmin[1] <= reach_hi[1])
                       & (bmax[2] >= reach_lo[2]) & (bmin[2] <= reach_hi[2]))
            cnt = hi - lo
            emit = overlap & (cnt <= SPAN_MIN)
            lo = lo - jnp.remainder(lo, TRI_CHUNK)
            prev = jnp.maximum(ns - 1, 0)
            prev_hi = spans[prev, 1]
            merge = emit & (ns > 0) & (lo <= prev_hi)

            @pl.when(merge)
            def _():
                spans[prev, 1] = hi

            @pl.when(emit & ~merge)
            def _():
                spans[ns, 0] = lo
                spans[ns, 1] = hi

            ns = ns + jnp.where(emit & ~merge, 1, 0)
            node = jnp.where(overlap & ~emit, node + 1, miss)
            return node, w_blk, ns

        node, w_blk, ns = jax.lax.while_loop(
            walk_cond, walk_body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        out[0, 0] = ns
        out[0, 1] = node

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        scratch_shapes=[pltpu.SMEM((NODE_BLOCK_ROWS, LANES), _F32),
                        pltpu.SMEM((MAX_SPANS, 2), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )(nodes)
    print("B ok: ns,node =", np.asarray(out), "n_nodes:", n_nodes)


def stage_C():
    """Vector sweep only: one fixed span covering the whole table."""
    tris, bvh = scene()
    tris_packed = pack_tris(tris)
    n_tris = int(tris.count)
    n_chunks_total = int(tris_packed.shape[0])
    origin, direction = rays()
    n = origin.shape[0]
    tile = TILE_ROWS * LANES
    rows = n // LANES
    t_min = np.float32(1e-4)

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tris_hbm, t_out, idx_out, tri_buf, tsem):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        t_best = jnp.full_like(ox, 1e9)
        idx_best = jnp.full_like(ox, -1.0)

        def fetch_chunk(slot, blk):
            pltpu.make_async_copy(
                tris_hbm.at[blk], tri_buf.at[slot], tsem.at[slot]).start()

        def wait_chunk(slot):
            pltpu.make_async_copy(
                tris_hbm.at[0], tri_buf.at[slot], tsem.at[slot]).wait()

        def tsc(slot, j, k):
            p = j * TRI_COLS + k
            return tri_buf[slot, p // LANES, p % LANES]

        def chunk_body(c, carry):
            t_best, idx_best = carry
            slot = jnp.remainder(c, 2)

            @pl.when(c == 0)
            def _():
                fetch_chunk(slot, 0)

            @pl.when(c + 1 < n_chunks_total)
            def _():
                fetch_chunk(1 - slot, c + 1)

            wait_chunk(slot)
            base_f32 = (c * TRI_CHUNK).astype(_F32)
            for j in range(TRI_CHUNK):
                ax, ay, az = tsc(slot, j, 0), tsc(slot, j, 1), tsc(slot, j, 2)
                bx, by, bz = tsc(slot, j, 3), tsc(slot, j, 4), tsc(slot, j, 5)
                cx, cy, cz = tsc(slot, j, 6), tsc(slot, j, 7), tsc(slot, j, 8)
                abx, aby, abz = bx - ax, by - ay, bz - az
                acx, acy, acz = cx - ax, cy - ay, cz - az
                nx = aby * acz - abz * acy
                ny = abz * acx - abx * acz
                nz = abx * acy - aby * acx
                det = -(dx * nx + dy * ny + dz * nz)
                aox, aoy, aoz = ox - ax, oy - ay, oz - az
                daox = aoy * dz - aoz * dy
                daoy = aoz * dx - aox * dz
                daoz = aox * dy - aoy * dx
                inv = jnp.reciprocal(det)
                t = (aox * nx + aoy * ny + aoz * nz) * inv
                u = (acx * daox + acy * daoy + acz * daoz) * inv
                v = -(abx * daox + aby * daoy + abz * daoz) * inv
                w = 1.0 - u - v
                ok = ((jnp.abs(det) >= t_min) & (t >= t_min) & (t < t_best)
                      & (u >= t_min) & (v >= t_min) & (w >= t_min))
                t_best = jnp.where(ok, t, t_best)
                idx_best = jnp.where(ok, base_f32 + np.float32(j), idx_best)
            return t_best, idx_best

        t_best, idx_best = jax.lax.fori_loop(
            0, n_chunks_total, chunk_body, (t_best, idx_best))
        t_out[:] = t_best
        idx_out[:] = idx_best

    def plane(x):
        return x.reshape(rows, LANES)

    planes = [plane(origin[:, 0]), plane(origin[:, 1]), plane(origin[:, 2]),
              plane(direction[:, 0]), plane(direction[:, 1]),
              plane(direction[:, 2])]
    lane_spec = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, LANES), _F32)
    t, idx = pl.pallas_call(
        kernel,
        grid=(rows // TILE_ROWS,),
        in_specs=[lane_spec] * 6 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(lane_spec, lane_spec),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[pltpu.SMEM((2, TRI_BLOCK_ROWS, LANES), _F32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(*planes, tris_packed)
    idx = np.asarray(idx).reshape(-1)[:n]
    print("C ok, hits:", (idx >= 0).sum(), "/", n)


def stage_D():
    """Full kernel but reach bounds from SMEM only (no vector reductions
    in scalar control flow)."""
    print("D not implemented yet")


if __name__ == "__main__":
    print("devices:", jax.devices())
    {"A": stage_A, "B": stage_B, "C": stage_C, "D": stage_D}[sys.argv[1]]()
