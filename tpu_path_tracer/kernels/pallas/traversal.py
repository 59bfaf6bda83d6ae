"""Pallas tile-frustum BVH traversal + dense streaming triangle sweep.

Why: XLA lowers per-lane gathers on TPU at ~1 row/cycle — a 262k-ray gather
costs ~0.7 ms *per traversal step*, which puts any per-lane BVH walk (the
GPU-native shape, ``shaders/hitRay.wgsl:42-110``) behind a ~100 ms/frame
floor.  The TPU-native decomposition used here splits the irregular work
(hierarchy culling) from the regular work (intersection math) and gives each
to the unit that is fast at it:

1. **Scalar phase — tile-frustum walk.**  For each tile of ``8x128 = 1024``
   rays, compute conservative origin/direction interval bounds, then walk the
   skip-link BVH *once per tile* with scalar control flow.  A node whose AABB
   cannot be reached by any ray in the tile is skipped via its miss pointer.
   Because the flattened BVH is DFS-preorder, every subtree owns a CONTIGUOUS
   triangle range ``[prim_lo, prim_hi)`` (``accel/bvh.py``), so the walk
   emits *spans* — when an overlapped subtree holds at most ``SPAN_MIN``
   triangles it is appended to a span list (merged with its predecessor when
   contiguous) instead of being descended.  The skip-link walk only ever
   jumps FORWARD (both ``node+1`` and ``miss`` exceed ``node``), so node rows
   stream through a sliding window DMA'd from HBM into SMEM.

2. **Vector phase — dense span sweep.**  The tile's rays are tested against
   every triangle of every span with branch-free Möller-Trumbore on
   ``(8, 128)`` VPU planes (math of ``shaders/common.wgsl:191-242``),
   streaming triangle rows from HBM through double-buffered SMEM chunks.
   No gathers exist anywhere in the kernel.

Correctness does not depend on the culling quality: phase 1 must only be
conservative (never drop a reachable subtree).  An incoherent tile degrades
to one whole-table span — a bounded dense sweep — and on span-list overflow
the kernel appends the remaining-range span ``[prim_lo(node), T)``, which is
conservative because preorder successors only own triangles at or beyond
their ancestors' ``prim_lo``.  Coherent tiles (primary rays, mirror bounces)
cull like a real BVH walk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.types import FlatBVH, Triangles

TILE_ROWS = 8          # rays per tile = TILE_ROWS * 128
LANES = 128
SPAN_MIN = 64          # emit subtrees at or below this many triangles
MAX_SPANS = 64         # span-list capacity per tile (overflow → tail span)
NODE_WINDOW = 64       # sliding node window (rows) DMA'd into SMEM
TRI_CHUNK = 32         # triangles per double-buffered sweep chunk

_F32 = jnp.float32
NODE_COLS = 12         # min3 max3 miss lo hi pad3
TRI_COLS = 12          # a3 b3 c3 pad3
# DMA slices must be 128-lane aligned, so tables are packed as blocks of
# 128-wide rows: one node window = NODE_WINDOW*NODE_COLS/128 rows, one
# triangle chunk = TRI_CHUNK*TRI_COLS/128 rows.
NODE_BLOCK_ROWS = NODE_WINDOW * NODE_COLS // LANES   # 6
TRI_BLOCK_ROWS = TRI_CHUNK * TRI_COLS // LANES       # 3


def _kernel(t_min: float, n_nodes: int, n_tris: int, n_tris_pad: int):
    """Kernel body factory (static shape facts baked in)."""
    t_min = np.float32(t_min)

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tb_ref,
               nodes_hbm, tris_hbm, t_out, idx_out,
               win, tri_buf, spans, nsem, tsem):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        t_best = tb_ref[:]
        idx_best = jnp.full_like(t_best, -1.0)

        # ---- tile bounds (scalars) for the conservative reachability test.
        olo = (jnp.min(ox), jnp.min(oy), jnp.min(oz))
        ohi = (jnp.max(ox), jnp.max(oy), jnp.max(oz))
        dlo = (jnp.min(dx), jnp.min(dy), jnp.min(dz))
        dhi = (jnp.max(dx), jnp.max(dy), jnp.max(dz))

        def fetch_window(block):
            cp = pltpu.make_async_copy(nodes_hbm.at[block], win, nsem)
            cp.start()
            cp.wait()

        def node_scalar(r, k):
            """Field k of the window's r-th node (12 f32 per node packed
            across NODE_BLOCK_ROWS rows of 128 lanes)."""
            p = r * NODE_COLS + k
            return win[p // LANES, p % LANES]

        fetch_window(0)
        # Parametric reach cap: the farthest any ray must travel to exit the
        # root box — |origin box -> far root corner| is conservatively the
        # L2 diameter of the union box (root row just arrived in SMEM).
        rmin = (win[0, 0], win[0, 1], win[0, 2])
        rmax = (win[0, 3], win[0, 4], win[0, 5])  # node 0 fields 3..5
        span2 = np.float32(0.0)
        for k in range(3):
            lo_k = jnp.minimum(rmin[k], olo[k])
            hi_k = jnp.maximum(rmax[k], ohi[k])
            span2 = span2 + (hi_k - lo_k) * (hi_k - lo_k)
        # Directions from the integrator are unit length, so the union-box
        # diameter bounds the parameter of any in-box intersection.
        t_cap = jnp.minimum(jnp.sqrt(span2) * np.float32(1.001),
                            jnp.max(t_best))

        reach_lo = tuple(olo[k] + t_cap * jnp.minimum(dlo[k], 0.0)
                         for k in range(3))
        reach_hi = tuple(ohi[k] + t_cap * jnp.maximum(dhi[k], 0.0)
                         for k in range(3))

        # ---- phase 1: scalar skip-link walk emitting contiguous spans.
        def walk_cond(state):
            node, w_blk, ns, windows = state
            return (node < n_nodes) & (ns < MAX_SPANS)

        def walk_body(state):
            node, w_blk, ns, windows = state
            # Refetch when the walk jumped past the window (forward-only);
            # windows are NODE_WINDOW-aligned blocks.
            blk = node // NODE_WINDOW
            oob = blk != w_blk

            @pl.when(oob)
            def _():
                fetch_window(blk)

            w_blk = jnp.where(oob, blk, w_blk)
            windows = windows + jnp.where(oob, 1, 0)
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
            # Chunk-align the span start so phase-2 DMAs stay aligned; the
            # extra leading rows are real triangles from a sibling subtree —
            # testing them is merely redundant, never wrong.
            lo = lo - jnp.remainder(lo, TRI_CHUNK)
            # Merge with the previous span when contiguous/overlapping.
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
            return node, w_blk, ns, windows

        node0 = jnp.int32(0)
        node, w_blk, ns, _ = jax.lax.while_loop(
            walk_cond, walk_body, (node0, jnp.int32(0), jnp.int32(0),
                                   jnp.int32(0)))

        # Overflow tail: preorder successors only own triangles in
        # [prim_lo(node), T) — cover them with one conservative span.
        @pl.when((node < n_nodes) & (ns >= MAX_SPANS))
        def _():
            spans[MAX_SPANS - 1, 1] = n_tris
        # (lo of the overflow tail is whatever span MAX_SPANS-1 started at —
        # extending its hi to T covers every remaining subtree.)

        # ---- phase 2: dense sweep of the spans, double-buffered chunks.
        def fetch_chunk(slot, blk):
            cp = pltpu.make_async_copy(
                tris_hbm.at[blk], tri_buf.at[slot], tsem.at[slot])
            cp.start()

        def wait_chunk(slot):
            pltpu.make_async_copy(
                tris_hbm.at[0], tri_buf.at[slot], tsem.at[slot]).wait()

        def tsc(slot, j, k):
            p = j * TRI_COLS + k
            return tri_buf[slot, p // LANES, p % LANES]

        def tri_test(slot, j, t_best, idx_best, base_f32, valid):
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
                  & (u >= t_min) & (v >= t_min) & (w >= t_min) & valid)
            t_best = jnp.where(ok, t, t_best)
            idx_best = jnp.where(ok, base_f32 + np.float32(j), idx_best)
            return t_best, idx_best

        def span_body(s, carry):
            t_best, idx_best, chunk_ctr = carry
            lo = spans[s, 0]
            hi = spans[s, 1]
            n_chunks = pl.cdiv(hi - lo, TRI_CHUNK)

            def chunk_body(c, carry):
                t_best, idx_best, chunk_ctr = carry
                row = lo + c * TRI_CHUNK   # TRI_CHUNK-aligned (span lo is)
                blk = row // TRI_CHUNK
                slot = jnp.remainder(chunk_ctr, 2)

                @pl.when(c == 0)
                def _():
                    fetch_chunk(slot, blk)
                # Prefetch the next chunk of this span while testing.

                @pl.when(c + 1 < n_chunks)
                def _():
                    fetch_chunk(1 - slot, blk + 1)

                wait_chunk(slot)
                base_f32 = row.astype(_F32)
                valid_base = row + jnp.int32(0)
                for j in range(TRI_CHUNK):
                    # Rows at or past `hi` belong to other subtrees; testing
                    # them is still correct (their hits are real) but padded
                    # rows past n_tris are degenerate and self-reject.
                    t_best, idx_best = tri_test(
                        slot, j, t_best, idx_best, base_f32,
                        valid_base + j < n_tris)
                return t_best, idx_best, chunk_ctr + 1

            # Waiting on the in-flight prefetch of a finished span is
            # handled by slot reuse: the next span's c==0 fetch targets the
            # same slot only after its previous DMA completed (chunk_ctr
            # parity), and every started DMA is awaited before reuse below.
            t_best, idx_best, chunk_ctr = jax.lax.fori_loop(
                0, n_chunks, chunk_body, (t_best, idx_best, chunk_ctr))
            # Drain a dangling prefetch (started for c+1 when the loop ended
            # exactly after starting it): none — prefetch only starts when
            # c+1 < n_chunks, so the last started DMA was awaited.
            return t_best, idx_best, chunk_ctr

        t_best, idx_best, _ = jax.lax.fori_loop(
            0, ns, span_body, (t_best, idx_best, jnp.int32(0)))

        t_out[:] = t_best
        idx_out[:] = idx_best

    return kernel


def pack_nodes(bvh: FlatBVH) -> jnp.ndarray:
    """[ceil(B/64), 6, 128] f32 block-packed node table (12 f32 per node;
    int fields exact below 2^24), block-padded so window DMAs stay in
    bounds."""
    b = bvh.count
    pad = jnp.zeros((b, 3), _F32)
    rows = jnp.concatenate([
        bvh.mins, bvh.maxs,
        bvh.miss.astype(_F32)[:, None],
        bvh.prim_lo.astype(_F32)[:, None],
        bvh.prim_hi.astype(_F32)[:, None],
        pad], axis=1)
    n_blk = -(-b // NODE_WINDOW)
    rows = jnp.pad(rows, ((0, n_blk * NODE_WINDOW - b), (0, 0)))
    return rows.reshape(n_blk, NODE_BLOCK_ROWS, LANES)


def pack_tris(tris: Triangles) -> jnp.ndarray:
    """[ceil(T/32), 3, 128] f32 block-packed triangles (a, b, c, pad per
    row) — padded rows are degenerate (zero area → |det| < t_min →
    self-rejecting)."""
    t = tris.count
    t_pad = -(-max(t, TRI_CHUNK) // TRI_CHUNK) * TRI_CHUNK
    rows = jnp.concatenate(
        [tris.a, tris.b, tris.c, jnp.zeros((t, 3), _F32)], axis=1)
    rows = jnp.pad(rows, ((0, t_pad - t), (0, 0)))
    return rows.reshape(t_pad // TRI_CHUNK, TRI_BLOCK_ROWS, LANES)


@functools.partial(jax.jit,
                   static_argnames=("t_min", "n_tris", "n_nodes_real",
                                    "interpret"))
def tile_closest_hit(origin, direction, nodes_packed, tris_packed,
                     t_best0, t_min: float, n_tris: int,
                     n_nodes_real: int, interpret: bool = False):
    """Closest triangle hit per ray via the tile-frustum Pallas kernel.

    Args:
      origin, direction: ``[N, 3]`` rays (``N`` padded internally).
      nodes_packed / tris_packed: from :func:`pack_nodes` / :func:`pack_tris`.
      t_best0: ``[N]`` running closest-hit bound (prunes like the
        reference's ``closest_so_far``).
    Returns ``(t [N] f32 — INF-like untouched where no hit, idx [N] i32 —
    -1 for miss)``; only lanes with ``idx >= 0`` have meaningful ``t``.
    """
    n = origin.shape[0]
    tile = TILE_ROWS * LANES
    n_pad = -(-n // tile) * tile
    rows = n_pad // LANES

    def plane(x):
        return jnp.pad(x, (0, n_pad - n)).reshape(rows, LANES)

    planes = [plane(origin[:, 0]), plane(origin[:, 1]), plane(origin[:, 2]),
              plane(direction[:, 0]), plane(direction[:, 1]),
              plane(direction[:, 2]),
              jnp.pad(t_best0, (0, n_pad - n),
                      constant_values=t_min).reshape(rows, LANES)]

    n_nodes = n_nodes_real
    n_tris_pad = int(tris_packed.shape[0]) * TRI_CHUNK
    kernel = _kernel(t_min, n_nodes, n_tris, n_tris_pad)
    lane_spec = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = jax.ShapeDtypeStruct((rows, LANES), _F32)
    t, idx = pl.pallas_call(
        kernel,
        grid=(rows // TILE_ROWS,),
        in_specs=[lane_spec] * 7 + [hbm, hbm],
        out_specs=(lane_spec, lane_spec),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[
            pltpu.SMEM((NODE_BLOCK_ROWS, LANES), _F32),
            pltpu.SMEM((2, TRI_BLOCK_ROWS, LANES), _F32),
            pltpu.SMEM((MAX_SPANS, 2), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*planes, nodes_packed, tris_packed)
    return (t.reshape(-1)[:n],
            idx.reshape(-1)[:n].astype(jnp.int32))
