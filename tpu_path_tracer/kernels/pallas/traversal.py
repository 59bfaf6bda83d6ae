"""Dense chunk-AABB culling (XLA) + MXU matmul triangle sweep (Pallas).

Why: XLA lowers per-lane gathers on TPU at ~1 row/cycle — a 262k-ray gather
costs ~0.7 ms *per traversal step*, which puts any per-ray BVH walk (the
GPU-native shape, ``shaders/hitRay.wgsl:42-110``) behind a ~100 ms/frame
floor.  The TPU-native decomposition splits the irregular work (pruning)
from the regular work (intersection math) and gives each to the engine that
is fast at it:

1. **Cull phase — dense chunk test, plain XLA** (:func:`chunk_cull`).
   Triangles are stored in BVH DFS-preorder (``accel/bvh.py``), so every
   aligned 128-triangle CHUNK of the array is a spatially compact set; at
   pack time each chunk gets an AABB.  For each tile of Morton-sorted rays,
   conservative origin/direction interval bounds define a reach box, and
   ONE vectorized ``[n_tiles, n_chunks]`` broadcast marks surviving chunks
   — no tree walk, no gathers, no ``while_loop``; the hierarchy is
   flattened into a single brute-forceable level, which is exactly what
   the VPU wants (round 2's vectorized skip-link walk spent 23-36 ms in
   gather-bound lock-step iteration; this is sub-ms).  Each surviving
   chunk also gets a conservative ENTRY DISTANCE (origin-box to chunk-box
   Euclidean distance — a lower bound on any hit ``t`` since ray
   directions are unit length), and the per-tile chunk list is sorted
   front-to-back by it: the TPU analog of the reference's ordered
   traversal, its 66 -> 104 fps trick (``shaders/hitRay.wgsl:80-91``).

2. **Sweep phase — K chunks per grid step, MXU matmuls, Pallas**
   (:func:`tile_closest_hit`).  The ray-triangle test is reformulated so
   the per-(ray, triangle) interaction is ONE inner product: a ray is
   ``[d, o×d]`` / ``[o, 1]`` 8-vectors and a triangle contributes three
   Plücker edge columns (``s_e = d·(p×q) + (o×d)·(q−p)`` is the signed
   edge volume, and ``s0+s1+s2 = n·d`` is the Möller-Trumbore determinant
   for free) plus a ``[−n, n·a]`` column for the unnormalized hit
   parameter.  Four matmuls per step replace ~45 VPU flops per pair with
   MXU work; the VPU epilogue (barycentric guards of
   ``shaders/common.wgsl:205-228``, closest-hit select) is ~15 ops/pair.
   One grid step sweeps ``CHUNKS_PER_STEP`` chunks for one tile (round 2
   swept ONE chunk per step; at ~5 µs fixed cost per Mosaic grid step the
   step count, not the math, dominated its 516 ms/call).  Passes iterate
   under an XLA ``while_loop`` with per-tile termination: after each pass
   a tile's remaining front-to-back chunks are counted against its rays'
   max ``t_best`` — a chunk whose entry distance exceeds every ray's
   current best hit can never win, so fully-resolved tiles stop
   contributing passes (they sweep the all-zero dummy chunk, which
   self-rejects, until the global loop ends).

Correctness does not depend on the culling quality: the cull must only be
conservative (never drop a chunk containing a reachable closer hit), which
the reach-box overlap + entry-distance lower bound guarantee.  Incoherent
tiles degrade toward sweeping every chunk front-to-back — still correct,
just more passes.

History: round 1 ran a cull *inside* the kernel with scalar control flow
and a sliding node-window DMA into SMEM; that faults the real TPU
(VERDICT.md round 1).  Hardware probes (``tools/trav_probe2.py``,
``tools/trav_bisect2.py``) isolated the faulting primitives: HBM→SMEM
whole-ref DMA crashes the worker, and fori_loops with SMEM-read trip
counts / DMA indices livelock it, while BlockSpec-pipelined VMEM inputs
and static control flow run clean.  This design uses only the clean set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.types import FlatBVH, Triangles

TILE_ROWS = 4          # rays per tile = TILE_ROWS * 128
LANES = 128
TILE = TILE_ROWS * LANES
TRI_CHUNK = 128        # triangles per chunk (cull granularity)
CHUNKS_PER_STEP = 8    # chunks folded into one Pallas grid step

_F32 = jnp.float32
RAY_K = 8              # matmul contraction dim: [d, o×d] / [o, 1, 0…]
_INF = np.float32(3e38)
_BIG = np.float32(1e30)


def _morton_key(origin, direction, box_lo, box_hi):
    """Coherence sort key: direction-major Morton code.

    Rays arrive in framebuffer order, where a tile is an image strip whose
    frustum spans the whole scene — culling is useless.  Sorting by
    interleaved quantized direction (5 bits/axis, major) then origin within
    the root box (5 bits/axis, minor) groups each tile into a narrow cone
    from a compact origin cell, for primary AND bounce wavefronts alike;
    results are scattered back through the inverse permutation.  (The
    wavefront analog of the reference's implicit screen-tile coherence.)
    """
    def q5(x, lo, hi):
        t = (x - lo) / jnp.maximum(hi - lo, 1e-30)
        return jnp.clip(t * 31.0, 0.0, 31.0).astype(jnp.uint32)

    def spread3(v):
        v = (v | (v << np.uint32(8))) & np.uint32(0x0100F)
        v = (v | (v << np.uint32(4))) & np.uint32(0x10C3)
        v = (v | (v << np.uint32(2))) & np.uint32(0x1249)
        return v

    def morton15(x, y, z):
        return ((spread3(x) << np.uint32(2)) | (spread3(y) << np.uint32(1))
                | spread3(z))

    dm = morton15(q5(direction[:, 0], -1.0, 1.0),
                  q5(direction[:, 1], -1.0, 1.0),
                  q5(direction[:, 2], -1.0, 1.0))
    om = morton15(q5(origin[:, 0], box_lo[0], box_hi[0]),
                  q5(origin[:, 1], box_lo[1], box_hi[1]),
                  q5(origin[:, 2], box_lo[2], box_hi[2]))
    return ((dm << np.uint32(15)) | om).astype(jnp.int32)


def pack_tris(tris: Triangles):
    """Chunked triangle matmul tables + per-chunk AABBs.

    Returns ``(e0, e1, e2, tcol, cmin, cmax)``:

    * ``e0/e1/e2``: ``[C+1, 8, TRI_CHUNK]`` — one table per triangle edge
      ((b,c), (c,a), (a,b)).  Column ``j`` of chunk ``k`` holds, for
      triangle ``k*TC+j``, rows 0-2 ``p×q`` (dotted with ``d``) and rows
      3-5 ``q−p`` (dotted with ``o×d``), so ``[d, o×d]·col`` is the signed
      edge volume ``s_e`` and ``s0+s1+s2 = n·d`` (the Möller-Trumbore
      determinant).  The trailing chunk is all-zero padding used as the
      dummy gather target (self-rejects: every product is 0 so
      ``|den| < t_min``).
    * ``tcol``: ``[C+1, 8, TRI_CHUNK]`` — rows 0-2 ``−n``, row 3 ``n·a``;
      dotted with ``[o, 1]`` gives the unnormalized hit parameter.
    * ``cmin/cmax``: ``[C, 3]`` — AABB of each chunk's real triangles
      (padding lanes masked out).  Chunks are aligned 128-triangle runs of
      the BVH DFS-preorder triangle array, so they are spatially compact —
      the cull level of :func:`chunk_cull`.
    """
    t = tris.count
    assert t < 2 ** 24, (
        f"triangle count {t} >= 2^24: f32 index lanes lose exactness")
    a, b, c = tris.a, tris.b, tris.c
    n = jnp.cross(b - a, c - a)
    na = jnp.sum(n * a, axis=1, keepdims=True)
    t_pad = -(-max(t, TRI_CHUNK) // TRI_CHUNK) * TRI_CHUNK
    n_chunks = t_pad // TRI_CHUNK

    def etbl(p, q):
        col = jnp.concatenate(
            [jnp.cross(p, q), q - p, jnp.zeros((t, 2), _F32)], axis=1)
        col = jnp.pad(col, ((0, t_pad - t), (0, 0)))
        col = col.reshape(n_chunks, TRI_CHUNK, RAY_K).transpose(0, 2, 1)
        return jnp.pad(col, ((0, 1), (0, 0), (0, 0)))

    e0, e1, e2 = etbl(b, c), etbl(c, a), etbl(a, b)
    tcol = jnp.concatenate([-n, na, jnp.zeros((t, 4), _F32)], axis=1)
    tcol = jnp.pad(tcol, ((0, t_pad - t), (0, 0)))
    tcol = tcol.reshape(n_chunks, TRI_CHUNK, RAY_K).transpose(0, 2, 1)
    tcol = jnp.pad(tcol, ((0, 1), (0, 0), (0, 0)))

    tmin = jnp.minimum(jnp.minimum(a, b), c)
    tmax = jnp.maximum(jnp.maximum(a, b), c)
    tmin = jnp.pad(tmin, ((0, t_pad - t), (0, 0)), constant_values=_BIG)
    tmax = jnp.pad(tmax, ((0, t_pad - t), (0, 0)), constant_values=-_BIG)
    cmin = jnp.min(tmin.reshape(n_chunks, TRI_CHUNK, 3), axis=1)
    cmax = jnp.max(tmax.reshape(n_chunks, TRI_CHUNK, 3), axis=1)
    return e0, e1, e2, tcol, cmin, cmax


def chunk_cull(origin, direction, t_best0, cmin, cmax):
    """Front-to-back per-tile chunk lists via one dense broadcast.

    Args:
      origin, direction: ``[n_pad, 3]`` Morton-sorted rays, ``n_pad`` a
        multiple of TILE (padded lanes repeat a real ray).
      t_best0: ``[n_pad]`` running closest-hit bound.
      cmin/cmax: ``[C, 3]`` chunk AABBs from :func:`pack_tris`.

    Returns ``(order [n_tiles, Cp] i32, entry [n_tiles, Cp] f32, count
    [n_tiles] i32)`` where ``Cp`` is ``C`` padded to a CHUNKS_PER_STEP
    multiple, ``order`` lists surviving chunk ids front-to-back (dummy id
    ``C`` past ``count``), and ``entry`` is the sorted conservative entry
    distance (``_INF`` past ``count``) used for pass termination.
    """
    n_tiles = origin.shape[0] // TILE
    n_chunks = cmin.shape[0]

    o = origin.reshape(n_tiles, TILE, 3)
    d = direction.reshape(n_tiles, TILE, 3)
    tb = t_best0.reshape(n_tiles, TILE)

    olo = jnp.min(o, axis=1)
    ohi = jnp.max(o, axis=1)
    dlo = jnp.min(d, axis=1)
    dhi = jnp.max(d, axis=1)

    # Parametric reach cap: the farthest any ray must travel to exit the
    # union of the origin box and the scene box (directions are unit
    # length, so the union-box diameter bounds any in-box hit parameter).
    root_lo = jnp.min(cmin, axis=0)[None]
    root_hi = jnp.max(cmax, axis=0)[None]
    u_lo = jnp.minimum(root_lo, olo)
    u_hi = jnp.maximum(root_hi, ohi)
    diam = jnp.sqrt(jnp.sum((u_hi - u_lo) ** 2, axis=1)) * np.float32(1.001)
    t_cap = jnp.minimum(diam, jnp.max(tb, axis=1))  # [n_tiles]

    reach_lo = olo + t_cap[:, None] * jnp.minimum(dlo, 0.0)
    reach_hi = ohi + t_cap[:, None] * jnp.maximum(dhi, 0.0)

    overlap = jnp.all((cmax[None] >= reach_lo[:, None])
                      & (cmin[None] <= reach_hi[:, None]), axis=2)
    # Entry distance: origin-box to chunk-box gap, a lower bound on any
    # hit t for unit-length directions.
    gap = jnp.maximum(jnp.maximum(cmin[None] - ohi[:, None],
                                  olo[:, None] - cmax[None]), 0.0)
    entry = jnp.sqrt(jnp.sum(gap * gap, axis=2))          # [n_tiles, C]
    entry = jnp.where(overlap & (entry <= t_cap[:, None]), entry, _INF)

    order = jnp.argsort(entry, axis=1).astype(jnp.int32)
    entry_sorted = jnp.take_along_axis(entry, order, axis=1)
    valid = entry_sorted < _INF
    order = jnp.where(valid, order, np.int32(n_chunks))
    count = jnp.sum(valid, axis=1).astype(jnp.int32)

    # Pad the list width to a CHUNKS_PER_STEP multiple so every pass
    # window is in-bounds and disjoint (no clamped re-sweeps).
    pad = -(-n_chunks // CHUNKS_PER_STEP) * CHUNKS_PER_STEP - n_chunks
    if pad:
        order = jnp.pad(order, ((0, 0), (0, pad)),
                        constant_values=n_chunks)
        entry_sorted = jnp.pad(entry_sorted, ((0, 0), (0, pad)),
                               constant_values=_INF)
    return order, entry_sorted, count


def _sweep_kernel(t_min: float):
    t_min = np.float32(t_min)

    def kernel(dm_ref, o1_ref, tb_ref, ib_ref, e0_ref, e1_ref, e2_ref,
               tc_ref, gid_ref, t_out, idx_out):
        t_best = tb_ref[:]                       # [TILE, 1]
        idx_best = ib_ref[:]

        # HIGHEST: geometry needs f32-grade products — the TPU default
        # multiplies f32 matmul inputs in plain bf16, which flips edge/hit
        # tests (Mosaic supports only DEFAULT and HIGHEST).
        def mm(eref):
            return jax.lax.dot_general(
                dm_ref[:], eref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=_F32,
                precision=jax.lax.Precision.HIGHEST)  # [TILE, K*TC]

        s0, s1, s2 = mm(e0_ref), mm(e1_ref), mm(e2_ref)
        tn = jax.lax.dot_general(
            o1_ref[:], tc_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=_F32,
            precision=jax.lax.Precision.HIGHEST)
        den = s0 + s1 + s2                       # = n·d (MT determinant)
        inv = jnp.reciprocal(den)
        tt = tn * inv
        # Guard order mirrors common.wgsl:205-228 including its odd t_min
        # barycentric guards (u,v,w >= t_min); all-zero padding columns
        # give den == 0 and are rejected by the first clause.
        ok = ((jnp.abs(den) >= t_min) & (tt >= t_min) & (tt < t_best)
              & (s0 * inv >= t_min) & (s1 * inv >= t_min)
              & (s2 * inv >= t_min))
        tm = jnp.where(ok, tt, _INF)
        t_chunk = jnp.min(tm, axis=1, keepdims=True)      # [TILE, 1]
        isel = jnp.min(jnp.where(tm == t_chunk, gid_ref[0], _INF),
                       axis=1, keepdims=True)
        upd = t_chunk < t_best
        t_out[:] = jnp.where(upd, t_chunk, t_best)
        idx_out[:] = jnp.where(upd, isel, idx_best)

    return kernel


def _sweep_pass(ray_dm, ray_o1, t_best, idx_best, window, e0, e1, e2, tcol,
                t_min: float, interpret: bool):
    """One Pallas pass: each tile sweeps its next CHUNKS_PER_STEP chunks."""
    n_pad = ray_dm.shape[0]
    n_tiles, k = window.shape
    kc = k * TRI_CHUNK
    flat = window.reshape(-1)

    def gat(tbl):
        g = tbl[flat]                            # [n_tiles*K, 8, TC]
        return g.reshape(n_tiles, k, RAY_K, TRI_CHUNK).transpose(
            0, 2, 1, 3).reshape(n_tiles, RAY_K, kc)

    e0g, e1g, e2g, tcg = gat(e0), gat(e1), gat(e2), gat(tcol)
    lane = jnp.arange(TRI_CHUNK, dtype=jnp.int32)[None]
    gid = (flat[:, None] * TRI_CHUNK + lane).astype(_F32)
    gid = gid.reshape(n_tiles, 1, kc)

    ray_spec = pl.BlockSpec((TILE, RAY_K), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((1, RAY_K, kc), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    gid_spec = pl.BlockSpec((1, 1, kc), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_pad, 1), _F32)
    return pl.pallas_call(
        _sweep_kernel(t_min),
        grid=(n_tiles,),
        in_specs=[ray_spec, ray_spec, col_spec, col_spec,
                  e_spec, e_spec, e_spec, e_spec, gid_spec],
        out_specs=(col_spec, col_spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(ray_dm, ray_o1, t_best, idx_best, e0g, e1g, e2g, tcg, gid)


@functools.partial(jax.jit,
                   static_argnames=("t_min", "n_tris", "interpret"))
def tile_closest_hit(origin, direction, bvh: FlatBVH, tris_packed,
                     t_best0, t_min: float, n_tris: int,
                     interpret: bool = False):
    """Closest triangle hit per ray: dense chunk cull + Pallas matmul sweep.

    Args:
      origin, direction: ``[N, 3]`` rays (``N`` padded internally).
      bvh: flattened BVH — used only for the Morton-sort scene box (the
        chunk AABBs carry the culling; triangle ORDER being BVH preorder is
        what makes chunks spatially compact).
      tris_packed: tables from :func:`pack_tris`.
      t_best0: ``[N]`` running closest-hit bound (prunes like the
        reference's ``closest_so_far``, ``hitRay.wgsl:54``).
    Returns ``(t [N] f32 — untouched where no hit, idx [N] i32 — -1 for
    miss)``; only lanes with ``idx >= 0`` have meaningful ``t``.
    """
    e0, e1, e2, tcol, cmin, cmax = tris_packed
    n_chunks = int(cmin.shape[0])
    n = origin.shape[0]
    n_pad = -(-n // TILE) * TILE

    # Coherence sort (see _morton_key), then pad by *repeating the last
    # ray* so tile bounds stay tight and padded lanes follow a real ray's
    # path (their hits are discarded).
    key = _morton_key(origin, direction, bvh.mins[0], bvh.maxs[0])
    perm = jnp.argsort(key)
    o_s = origin[perm]
    d_s = direction[perm]
    tb_s = t_best0[perm]
    pad = n_pad - n
    o_pad = jnp.concatenate([o_s, jnp.broadcast_to(o_s[-1:], (pad, 3))])
    d_pad = jnp.concatenate([d_s, jnp.broadcast_to(d_s[-1:], (pad, 3))])
    tb_pad = jnp.concatenate([tb_s, jnp.full((pad,), t_min, _F32)])

    order, entry_sorted, count = chunk_cull(o_pad, d_pad, tb_pad,
                                            cmin, cmax)
    n_tiles = n_pad // TILE

    ray_dm = jnp.concatenate(
        [d_pad, jnp.cross(o_pad, d_pad), jnp.zeros((n_pad, 2), _F32)],
        axis=1)
    ray_o1 = jnp.concatenate(
        [o_pad, jnp.ones((n_pad, 1), _F32), jnp.zeros((n_pad, 4), _F32)],
        axis=1)

    k = CHUNKS_PER_STEP

    def cond(state):
        p, _, _, remaining = state
        return jnp.any(p * k < remaining)

    def body(state):
        p, t_best, idx_best, _ = state
        window = jax.lax.dynamic_slice(order, (0, p * k), (n_tiles, k))
        t_new, i_new = _sweep_pass(ray_dm, ray_o1, t_best, idx_best,
                                   window, e0, e1, e2, tcol, t_min,
                                   interpret)
        # Per-tile termination: a chunk whose conservative entry distance
        # exceeds every ray's running best can never win — count the
        # still-competitive front-to-back prefix per tile.
        t_tile = jnp.max(t_new.reshape(n_tiles, TILE), axis=1)
        remaining = jnp.sum(entry_sorted <= t_tile[:, None],
                            axis=1).astype(jnp.int32)
        return p + 1, t_new, i_new, jnp.minimum(remaining, count)

    t0 = tb_pad[:, None]
    i0 = jnp.full((n_pad, 1), -1.0, _F32)
    _, t, idx, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, i0, count))
    # Scatter back through the inverse permutation.
    t_out = jnp.zeros((n,), _F32).at[perm].set(t[:n, 0])
    i_out = jnp.zeros((n,), _F32).at[perm].set(idx[:n, 0])
    return t_out, i_out.astype(jnp.int32)
