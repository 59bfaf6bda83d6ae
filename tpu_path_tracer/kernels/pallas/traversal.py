"""Tile-frustum BVH culling (XLA) + MXU matmul triangle sweep (Pallas).

Why: XLA lowers per-lane gathers on TPU at ~1 row/cycle — a 262k-ray gather
costs ~0.7 ms *per traversal step*, which puts any per-lane BVH walk (the
GPU-native shape, ``shaders/hitRay.wgsl:42-110``) behind a ~100 ms/frame
floor.  The TPU-native decomposition splits the irregular work (hierarchy
culling) from the regular work (intersection math) and gives each to the
engine that is fast at it:

1. **Cull phase — vectorized tile-frustum walk, plain XLA**
   (:func:`tile_cull`).  For each tile of ``8x128 = 1024`` rays, compute
   conservative origin/direction interval bounds, then walk the skip-link
   BVH *once per tile* — vectorized over tiles, so the gathers are
   ``[n_tiles]``-sized (256 lanes for a 262k-ray frame), three orders of
   magnitude cheaper than per-ray gathers.  Because the flattened BVH is
   DFS-preorder, every subtree owns a CONTIGUOUS triangle range
   ``[prim_lo, prim_hi)`` (``accel/bvh.py``), so the walk emits *spans*:
   when an overlapped subtree holds at most ``SPAN_MIN`` triangles it is
   appended to the tile's span list (merged with its predecessor when
   contiguous) instead of being descended.  Spans then expand to per-tile
   CHUNK lists (:func:`_chunk_lists`), and XLA gathers each pass's chunk
   matrices into a dense array — chunk-row-granular gathers (16 KB rows)
   are bandwidth-bound, not row-rate-bound.

2. **Sweep phase — one chunk per grid step, MXU matmuls, Pallas**
   (:func:`tile_closest_hit`).  The ray-triangle test is reformulated so
   the per-(ray, triangle) interaction is ONE inner product: a ray is
   ``[d, o×d]`` / ``[o, 1]`` 8-vectors and a triangle contributes three
   Plücker edge columns (``s_e = d·(p×q) + (o×d)·(q−p)`` is the signed
   edge volume, and ``s0+s1+s2 = n·d`` is the Möller-Trumbore determinant
   for free) plus a ``[−n, n·a]`` column for the unnormalized hit
   parameter.  Two small matmuls per chunk replace ~45 VPU flops per pair
   with MXU work; the VPU epilogue (barycentric guards of
   ``shaders/common.wgsl:205-228``, closest-hit select) is ~15 ops/pair.
   The kernel has NO data-dependent control flow, no loops, and no manual
   DMA: the grid is static ``(n_tiles, MAX_CHUNKS_PER_PASS)``, chunk data
   arrives via BlockSpec pipelining, padded steps consume an all-zero
   chunk whose rows self-reject in the epilogue, and per-tile outputs are
   revisited output blocks accumulated across the chunk axis.  Tiles
   needing more than one pass's chunk budget iterate under an XLA
   ``while_loop`` around the kernel, pruning later passes against the
   running ``t_best``.

Correctness does not depend on the culling quality: the cull must only be
conservative (never drop a reachable subtree).  An incoherent tile degrades
to a bounded dense sweep — on span-list overflow the cull extends the last
span to the end of the table, which is conservative because preorder
successors only own triangles at or beyond their ancestors' ``prim_lo``.
Coherent tiles (primary rays, mirror bounces) cull like a real BVH walk.

History: round 1 ran the cull *inside* the kernel with scalar control flow
and a sliding node-window DMA into SMEM; that faults the real TPU
(VERDICT.md round 1).  Hardware probes (``tools/trav_bisect.py``,
``tools/trav_probe2.py``) isolated the faulting primitives: HBM→SMEM
whole-ref DMA crashes the worker, and fori_loops with SMEM-read trip
counts / DMA indices livelock it, while blocked SMEM scalar inputs used
arithmetically, BlockSpec-pipelined VMEM inputs, and static control flow
all run clean.  This design uses only the clean set.
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
TILE = TILE_ROWS * LANES
SPAN_MIN = 256         # emit subtrees at or below this many triangles
MAX_SPANS = 64         # span-list capacity per tile (overflow → tail span)
TRI_CHUNK = 128        # triangles per sweep chunk (one grid step)
MAX_CHUNKS_PER_PASS = 16   # per-tile chunk budget per kernel pass

_F32 = jnp.float32
RAY_K = 8              # matmul contraction dim: [d, o×d] / [o, 1, 0…]
EDGE_COLS = 3 * TRI_CHUNK
_INF = np.float32(3e38)


def _morton_key(origin, direction, box_lo, box_hi):
    """Coherence sort key: direction-major Morton code.

    Rays arrive in framebuffer order, where a 1024-ray tile is a 512x2
    image strip whose frustum spans the whole scene — culling is useless.
    Sorting by interleaved quantized direction (5 bits/axis, major) then
    origin within the root box (5 bits/axis, minor) groups each tile into
    a narrow cone from a compact origin cell, for primary AND bounce
    wavefronts alike; results are scattered back through the inverse
    permutation.  (The wavefront analog of the reference's implicit
    screen-tile coherence.)
    """
    def q5(x, lo, hi):
        t = (x - lo) / jnp.maximum(hi - lo, 1e-30)
        return jnp.clip(t * 31.0, 0.0, 31.0).astype(jnp.uint32)

    def spread3(v):
        # interleave 5-bit value into every 3rd bit (sufficient for 2 dims
        # of headroom): classic Morton bit spreading, 5 bits.
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


def tile_cull(origin, direction, t_best0, bvh: FlatBVH, n_tris: int):
    """Vectorized-over-tiles skip-link walk emitting dense sweep spans.

    Args:
      origin, direction: ``[n_pad, 3]`` rays, ``n_pad`` a multiple of the
        tile size (padded lanes repeat a real ray so bounds stay tight).
      t_best0: ``[n_pad]`` running closest-hit bound.
      bvh: flattened DFS-preorder BVH.
      n_tris: static triangle count.

    Returns ``(sp_lo, sp_hi, ns)``: ``[n_tiles, MAX_SPANS]`` span bounds
    (``lo`` TRI_CHUNK-aligned) and ``[n_tiles]`` span counts.
    """
    n_tiles = origin.shape[0] // TILE
    n_nodes = bvh.count

    o = origin.reshape(n_tiles, TILE, 3)
    d = direction.reshape(n_tiles, TILE, 3)
    tb = t_best0.reshape(n_tiles, TILE)

    olo = jnp.min(o, axis=1)
    ohi = jnp.max(o, axis=1)
    dlo = jnp.min(d, axis=1)
    dhi = jnp.max(d, axis=1)

    # Parametric reach cap: the farthest any ray must travel to exit the
    # union of the origin box and the root box.  Directions from the
    # integrator are unit length, so the union-box diameter bounds the
    # parameter of any in-box intersection.
    root_lo = bvh.mins[0][None]
    root_hi = bvh.maxs[0][None]
    u_lo = jnp.minimum(root_lo, olo)
    u_hi = jnp.maximum(root_hi, ohi)
    diam = jnp.sqrt(jnp.sum((u_hi - u_lo) ** 2, axis=1)) * np.float32(1.001)
    t_cap = jnp.minimum(diam, jnp.max(tb, axis=1))  # [n_tiles]

    reach_lo = olo + t_cap[:, None] * jnp.minimum(dlo, 0.0)
    reach_hi = ohi + t_cap[:, None] * jnp.maximum(dhi, 0.0)

    sentinel = np.int32(n_nodes)
    span_iota = jnp.arange(MAX_SPANS, dtype=jnp.int32)[None, :]

    def cond(state):
        node, ns, _, _ = state
        return jnp.any((node < sentinel) & (ns < MAX_SPANS))

    def advance(state):
        node, ns, sp_lo, sp_hi = state
        active = (node < sentinel) & (ns < MAX_SPANS)
        ni = jnp.minimum(node, sentinel - 1)
        bmin = bvh.mins[ni]
        bmax = bvh.maxs[ni]
        miss = bvh.miss[ni]
        lo = bvh.prim_lo[ni]
        hi = bvh.prim_hi[ni]
        overlap = active & jnp.all((bmax >= reach_lo) & (bmin <= reach_hi),
                                   axis=1)
        cnt = hi - lo
        emit = overlap & (cnt <= SPAN_MIN)
        # Chunk-align the span start so chunk expansion stays aligned; the
        # extra leading rows are real triangles from a sibling subtree —
        # testing them is merely redundant, never wrong.
        lo = lo - jnp.remainder(lo, TRI_CHUNK)
        prev = jnp.maximum(ns - 1, 0)
        # One-hot row selects instead of gathers/scatters: [n_tiles,
        # MAX_SPANS] masked selects are pure VPU work, while .at[] scatters
        # in a while_loop body lower badly on TPU.
        prev_hi = jnp.sum(jnp.where(span_iota == prev[:, None], sp_hi, 0),
                          axis=1)
        merge = emit & (ns > 0) & (lo <= prev_hi)
        row = jnp.where(merge, prev, jnp.minimum(ns, MAX_SPANS - 1))
        at_row = span_iota == row[:, None]
        sp_lo = jnp.where(at_row & (emit & ~merge)[:, None],
                          lo[:, None], sp_lo)
        sp_hi = jnp.where(at_row & emit[:, None],
                          jnp.maximum(hi[:, None], sp_hi), sp_hi)
        ns = ns + jnp.where(emit & ~merge, 1, 0)
        node = jnp.where(active,
                         jnp.where(overlap & ~emit, node + 1, miss),
                         node)
        return node, ns, sp_lo, sp_hi

    def body(state):
        # 4x unroll amortizes the while_loop's per-iteration dispatch
        # overhead over four node advances.
        for _ in range(4):
            state = advance(state)
        return state

    node0 = jnp.zeros((n_tiles,), jnp.int32)
    ns0 = jnp.zeros((n_tiles,), jnp.int32)
    sp0 = jnp.zeros((n_tiles, MAX_SPANS), jnp.int32)
    node, ns, sp_lo, sp_hi = jax.lax.while_loop(
        cond, body, (node0, ns0, sp0, sp0))

    # Overflow tail: preorder successors only own triangles in
    # [prim_lo(node), T) — extend the last span to cover them all.
    overflow = (node < sentinel) & (ns >= MAX_SPANS)
    sp_hi = sp_hi.at[:, MAX_SPANS - 1].set(
        jnp.where(overflow, n_tris, sp_hi[:, MAX_SPANS - 1]))
    return sp_lo, sp_hi, ns


def _chunk_lists(sp_lo, sp_hi, ns, n_chunks_total: int):
    """Expand span lists to per-tile chunk-id lists.

    Returns ``(chunk_list [n_tiles, n_chunks_total] i32, total [n_tiles])``
    where entries past a tile's total are ``n_chunks_total`` — the index of
    the all-zero padding chunk appended by :func:`pack_tris`.
    """
    n_tiles = sp_lo.shape[0]
    span_idx = jnp.arange(MAX_SPANS, dtype=jnp.int32)
    valid = span_idx[None, :] < ns[:, None]
    counts = jnp.where(valid, -(-(sp_hi - sp_lo) // TRI_CHUNK), 0)
    counts = jnp.maximum(counts, 0)
    cum = jnp.cumsum(counts, axis=1)                    # inclusive
    total = cum[:, -1]
    j = jnp.arange(n_chunks_total, dtype=jnp.int32)

    # Span owning position j: first s with cum[s] > j.
    s = jax.vmap(lambda c: jnp.searchsorted(c, j, side="right"))(cum)
    s = jnp.minimum(s, MAX_SPANS - 1).astype(jnp.int32)
    cum_before = jnp.where(s > 0,
                           jnp.take_along_axis(cum, jnp.maximum(s - 1, 0),
                                               axis=1), 0)
    lo_s = jnp.take_along_axis(sp_lo, s, axis=1)
    ids = lo_s // TRI_CHUNK + (j[None, :] - cum_before)
    dummy = np.int32(n_chunks_total)
    return jnp.where(j[None, :] < total[:, None], ids, dummy), total


def pack_tris(tris: Triangles):
    """Chunked triangle matmul tables ``(edge [C+1, 8, 3·TC], tcol
    [C+1, 8, TC])`` — the trailing chunk is all-zero padding (self-rejects
    via the ``|den| ≥ t_min`` guard since every product is 0).

    Edge column for edge ``(p, q)``: rows 0-2 ``p×q`` (dotted with ``d``),
    rows 3-5 ``q−p`` (dotted with ``o×d``), rows 6-7 zero — so for a ray,
    ``[d, o×d]·col`` is the signed edge volume ``s_e``, and
    ``s_bc + s_ca + s_ab = n·d`` (the Möller-Trumbore determinant).
    T-column: rows 0-2 ``−n``, row 3 ``n·a``, rows 4-7 zero — dotted with
    ``[o, 1]`` gives ``n·a − n·o`` (the unnormalized hit parameter).
    """
    t = tris.count
    assert t < 2 ** 24, (
        f"triangle count {t} >= 2^24: f32 index lanes lose exactness")
    a, b, c = tris.a, tris.b, tris.c
    n = jnp.cross(b - a, c - a)
    na = jnp.sum(n * a, axis=1, keepdims=True)

    def edge_col(p, q):
        return jnp.concatenate(
            [jnp.cross(p, q), q - p, jnp.zeros((t, 2), _F32)], axis=1)

    edges = jnp.stack([edge_col(b, c), edge_col(c, a), edge_col(a, b)])
    tcol = jnp.concatenate([-n, na, jnp.zeros((t, 4), _F32)], axis=1)

    t_pad = -(-max(t, TRI_CHUNK) // TRI_CHUNK) * TRI_CHUNK
    edges = jnp.pad(edges, ((0, 0), (0, t_pad - t), (0, 0)))
    tcol = jnp.pad(tcol, ((0, t_pad - t), (0, 0)))
    n_chunks = t_pad // TRI_CHUNK
    # edge table: [n_chunks, 8, 3*TC]; chunk k lane (g*TC + j) row r =
    # edges[g, k*TC + j, r]; +1 trailing zero chunk (gather dummy target).
    edge_tbl = edges.reshape(3, n_chunks, TRI_CHUNK, RAY_K)
    edge_tbl = edge_tbl.transpose(1, 3, 0, 2).reshape(
        n_chunks, RAY_K, EDGE_COLS)
    tcol_tbl = tcol.reshape(n_chunks, TRI_CHUNK, RAY_K).transpose(0, 2, 1)
    edge_tbl = jnp.pad(edge_tbl, ((0, 1), (0, 0), (0, 0)))
    tcol_tbl = jnp.pad(tcol_tbl, ((0, 1), (0, 0), (0, 0)))
    return edge_tbl, tcol_tbl


def _sweep_kernel(t_min: float, maxc: int):
    t_min = np.float32(t_min)
    tc = TRI_CHUNK

    def kernel(ray_dm_ref, ray_o1_ref, tb_ref, edge_ref, tcol_ref,
               base_ref, t_out, idx_out):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            t_out[:] = tb_ref[:]
            idx_out[:] = jnp.full((TILE, 1), -1.0, _F32)

        t_best = t_out[:]                        # [TILE, 1]
        idx_best = idx_out[:]

        # HIGHEST: geometry needs f32-grade products — the TPU default
        # multiplies f32 matmul inputs in plain bf16, which flips edge/hit
        # tests (Mosaic supports only DEFAULT and HIGHEST).
        s = jax.lax.dot_general(
            ray_dm_ref[:], edge_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=_F32,
            precision=jax.lax.Precision.HIGHEST)  # [TILE, 3*TC]
        tn = jax.lax.dot_general(
            ray_o1_ref[:], tcol_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=_F32,
            precision=jax.lax.Precision.HIGHEST)  # [TILE, TC]
        s0 = s[:, 0 * tc:1 * tc]
        s1 = s[:, 1 * tc:2 * tc]
        s2 = s[:, 2 * tc:3 * tc]
        den = s0 + s1 + s2                       # = n·d (MT determinant)
        inv = jnp.reciprocal(den)
        tt = tn * inv
        # Guard order mirrors common.wgsl:205-228 including its odd t_min
        # barycentric guards (u,v,w ≥ t_min); all-zero padding columns give
        # den == 0 and are rejected by the first clause.
        ok = ((jnp.abs(den) >= t_min) & (tt >= t_min) & (tt < t_best)
              & (s0 * inv >= t_min) & (s1 * inv >= t_min)
              & (s2 * inv >= t_min))
        tm = jnp.where(ok, tt, _INF)
        t_chunk = jnp.min(tm, axis=1, keepdims=True)      # [TILE, 1]
        lane_iota = jax.lax.broadcasted_iota(
            jnp.int32, (TILE, tc), 1).astype(_F32)
        lidx = jnp.min(jnp.where(tm == t_chunk, lane_iota, _INF),
                       axis=1, keepdims=True)
        upd = t_chunk < t_best
        base = base_ref[0, 0, 0].astype(_F32)    # chunk_id * TC (arithmetic
        #                                          use of an SMEM scalar)
        t_out[:] = jnp.where(upd, t_chunk, t_best)
        idx_out[:] = jnp.where(upd, base + lidx, idx_best)

    return kernel


def _sweep_pass(ray_dm, ray_o1, t_best, chunk_ids, edge_tbl, tcol_tbl,
                t_min: float, interpret: bool):
    """One Pallas pass over a ``[n_tiles, maxc]`` chunk-id window."""
    n_pad = ray_dm.shape[0]
    n_tiles, maxc = chunk_ids.shape
    flat = chunk_ids.reshape(-1)
    edge_g = edge_tbl[flat]                   # [n_tiles*maxc, 8, 3*TC]
    tcol_g = tcol_tbl[flat]                   # [n_tiles*maxc, 8, TC]
    base = (flat * TRI_CHUNK)[:, None, None]  # [n_tiles*maxc, 1, 1] i32

    ray_spec = pl.BlockSpec((TILE, RAY_K), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((TILE, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    edge_spec = pl.BlockSpec((1, RAY_K, EDGE_COLS),
                             lambda i, j: (i * maxc + j, 0, 0),
                             memory_space=pltpu.VMEM)
    tcol_spec = pl.BlockSpec((1, RAY_K, TRI_CHUNK),
                             lambda i, j: (i * maxc + j, 0, 0),
                             memory_space=pltpu.VMEM)
    base_spec = pl.BlockSpec((1, 1, 1), lambda i, j: (i * maxc + j, 0, 0),
                             memory_space=pltpu.SMEM)
    out_shape = jax.ShapeDtypeStruct((n_pad, 1), _F32)
    t, idx = pl.pallas_call(
        _sweep_kernel(t_min, maxc),
        grid=(n_tiles, maxc),
        in_specs=[ray_spec, ray_spec, col_spec, edge_spec, tcol_spec,
                  base_spec],
        out_specs=(col_spec, col_spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(ray_dm, ray_o1, t_best, edge_g, tcol_g, base)
    return t, idx


@functools.partial(jax.jit,
                   static_argnames=("t_min", "n_tris", "interpret"))
def tile_closest_hit(origin, direction, bvh: FlatBVH, tris_packed,
                     t_best0, t_min: float, n_tris: int,
                     interpret: bool = False):
    """Closest triangle hit per ray: XLA tile cull + Pallas matmul sweep.

    Args:
      origin, direction: ``[N, 3]`` rays (``N`` padded internally).
      bvh: flattened BVH (culled in XLA — not a kernel input).
      tris_packed: ``(edge_tbl, tcol_tbl)`` from :func:`pack_tris`.
      t_best0: ``[N]`` running closest-hit bound (prunes like the
        reference's ``closest_so_far``, ``hitRay.wgsl:54``).
    Returns ``(t [N] f32 — untouched where no hit, idx [N] i32 — -1 for
    miss)``; only lanes with ``idx >= 0`` have meaningful ``t``.
    """
    assert bvh.count < 2 ** 24, "BVH node count >= 2^24"
    edge_tbl, tcol_tbl = tris_packed
    n_chunks_total = int(edge_tbl.shape[0]) - 1   # minus the zero chunk
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

    sp_lo, sp_hi, ns = tile_cull(o_pad, d_pad, tb_pad, bvh, n_tris)
    chunk_list, total = _chunk_lists(sp_lo, sp_hi, ns, n_chunks_total)
    n_tiles = n_pad // TILE

    ray_dm = jnp.concatenate(
        [d_pad, jnp.cross(o_pad, d_pad), jnp.zeros((n_pad, 2), _F32)],
        axis=1)
    ray_o1 = jnp.concatenate(
        [o_pad, jnp.ones((n_pad, 1), _F32), jnp.zeros((n_pad, 4), _F32)],
        axis=1)

    maxc = min(MAX_CHUNKS_PER_PASS, max(int(n_chunks_total), 1))
    max_total = jnp.max(total)

    def cond(state):
        p, _, _ = state
        return p * maxc < max_total

    def body(state):
        p, t_best, idx_best = state
        window = jax.lax.dynamic_slice(
            chunk_list, (0, p * maxc), (n_tiles, maxc))
        t_p, i_p = _sweep_pass(ray_dm, ray_o1, t_best, window,
                               edge_tbl, tcol_tbl, t_min, interpret)
        upd = t_p < t_best
        return (p + 1, jnp.where(upd, t_p, t_best),
                jnp.where(upd, i_p, idx_best))

    t0 = tb_pad[:, None]
    i0 = jnp.full((n_pad, 1), -1.0, _F32)
    _, t, idx = jax.lax.while_loop(cond, body, (jnp.int32(0), t0, i0))
    # Scatter back through the inverse permutation.
    t_out = jnp.zeros((n,), _F32).at[perm].set(t[:n, 0])
    i_out = jnp.zeros((n,), _F32).at[perm].set(idx[:n, 0])
    return t_out, i_out.astype(jnp.int32)
