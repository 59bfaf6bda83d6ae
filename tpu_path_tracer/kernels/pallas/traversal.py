"""Per-ray chunk culling (XLA) + compacted MXU matmul sweep (Pallas).

Why: XLA lowers per-lane gathers on TPU at ~1 row/cycle — any per-ray BVH
walk (the GPU-native shape, ``shaders/hitRay.wgsl:42-110``) pays that on
every traversal step and lands orders of magnitude off speed-of-light.
The TPU-native decomposition does the irregular work (pruning) as DENSE
vector math and the regular work (intersection) as MXU matmuls:

1. **Cull phase — per-ray slab tests, plain XLA** (:func:`chunk_cull`).
   Triangles are stored in BVH DFS-preorder (``accel/bvh.py``), so every
   aligned 128-triangle CHUNK of the array is spatially compact; at pack
   time each chunk gets an AABB.  Every ray runs the standard slab test
   (``shaders/common.wgsl:245-256``) against every chunk AABB — a dense
   ``[rays, chunks]`` broadcast with no gathers and no tree walk; the
   hierarchy is flattened into one brute-forceable level, which is what
   the VPU is fast at (~25 ops/pair; ~1 ms for 262k rays x 640 chunks).
   Rays are sorted by a *balanced* 6-D Morton key (origin and direction
   bits interleaved evenly — direction-major sorting leaves bounce
   wavefronts with origin spread that destroys tile coherence; measured
   on an 82k-tri scene the balanced key cuts bounce tile-unions from
   ~499/640 chunks to ~117, and per-ray slab precision cuts coherent
   tiles from ~180 to ~4).  Per tile of ``TILE`` sorted rays the per-ray
   hits OR-reduce into the tile's chunk set, front-to-back ordered by the
   minimum slab entry distance — the TPU analog of the reference's
   ordered traversal, its 66 -> 104 fps trick (``hitRay.wgsl:80-91``).

2. **Sweep phase — compacted work queue, Pallas**
   (:func:`tile_closest_hit`).  The ray-triangle test is reformulated so
   the per-(ray, triangle) interaction is ONE inner product: a ray is
   ``[d, o×d]`` / ``[o, 1]`` 8-vectors and a triangle contributes three
   Plücker edge columns (``s_e = d·(p×q) + (o×d)·(q−p)`` is the signed
   edge volume, and ``s0+s1+s2 = n·d`` is the Möller-Trumbore determinant
   for free) plus a ``[−n, n·a]`` column for the unnormalized hit
   parameter.  Each grid step sweeps up to SUBS_PER_STEP predicated
   sub-blocks of CHUNKS_PER_STEP chunks for one tile (measured sweet
   spot ≈ 25-30 Gpair/s at f32-HIGHEST; bigger blocks thrash VMEM,
   smaller ones drown in the ~5-10 us fixed per-step cost).  Work is
   COMPACTED: each round builds a queue of (tile, chunk-group) steps over
   only the tiles that still have competitive chunks — a scalar-prefetched
   tile-id array routes each step's ray/output blocks (steps for a tile
   are consecutive, so its output block stays resident in VMEM across its
   groups) — so no step ever sweeps a finished tile (round 2 ran a
   while_loop to the WORST tile's pass count with every finished tile
   re-sweeping dummy chunks at full step cost).  After each round a
   tile's remaining front-to-back chunks are re-counted against its rays'
   max running ``t_best``: a chunk whose conservative entry distance
   exceeds every ray's best can never win.

Correctness does not depend on the culling quality: the slab test is
exact per (ray, chunk-AABB), entry distances are true lower bounds on hit
``t`` (unit directions), and dummy-padded steps sweep the all-zero chunk
whose columns self-reject.

History: round 1 ran a cull *inside* the kernel with scalar control flow
and a sliding node-window DMA into SMEM; that faults the real TPU
(VERDICT.md round 1).  Hardware probes (``tools/trav_probe2.py``,
``tools/trav_bisect2.py``) isolated the faulting primitives: HBM→SMEM
whole-ref DMA crashes the worker, and fori_loops with SMEM-read trip
counts / DMA indices livelock it, while BlockSpec-pipelined VMEM inputs,
scalar-prefetch index maps, and static control flow run clean.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.types import FlatBVH, Triangles

TILE_ROWS = 1          # rays per tile = TILE_ROWS * 128
LANES = 128
TILE = TILE_ROWS * LANES
TRI_CHUNK = 128        # triangles per chunk (cull granularity)
CHUNKS_PER_STEP = 8    # chunks per sweep sub-block (queue granularity)
SUBS_PER_STEP = 4      # predicated sub-blocks per Pallas grid step
CULL_BLOCK = 64        # tiles per cull-scan iteration (bounds memory)

_F32 = jnp.float32
RAY_K = 8              # matmul contraction dim: [d, o×d] / [o, 1, 0…]
_INF = np.float32(3e38)
_BIG = np.float32(1e30)


def _morton_key6d(origin, direction, box_lo, box_hi):
    """Balanced 6-D Morton key: origin AND direction bits interleaved.

    5 bits per axis, most-significant bits first, cycling through
    (dx, dy, dz, ox, oy, oz) — so a run of sorted rays is compact in BOTH
    origin and direction, which is what tile-level culling needs for
    bounce wavefronts (primary rays share an origin, so their origin bits
    are constant and the key degenerates to a direction sort).
    """
    def q5(x, lo, hi):
        t = (x - lo) / jnp.maximum(hi - lo, 1e-30)
        return jnp.clip(t * 31.0, 0.0, 31.0).astype(jnp.uint32)

    qs = [q5(direction[:, 0], -1.0, 1.0),
          q5(direction[:, 1], -1.0, 1.0),
          q5(direction[:, 2], -1.0, 1.0),
          q5(origin[:, 0], box_lo[0], box_hi[0]),
          q5(origin[:, 1], box_lo[1], box_hi[1]),
          q5(origin[:, 2], box_lo[2], box_hi[2])]
    key = jnp.zeros_like(qs[0])
    for bit in range(4, -1, -1):
        for q in qs:
            key = (key << np.uint32(1)) | ((q >> np.uint32(bit))
                                           & np.uint32(1))
    return key.astype(jnp.int32)


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


def _superchunk_size(n_chunks: int) -> int:
    """Chunks per superchunk: doubles until the coarse level has <= 160
    superchunks, so the dense coarse pass stays flat-cost as meshes grow
    (dragon-scale: 2,560 chunks -> G=16 -> 160 superchunks)."""
    g = 8
    while -(-n_chunks // g) > 160:
        g *= 2
    return g


def _inv_dir(direction):
    sd = jnp.where(direction >= 0.0, 1.0, -1.0)
    return sd / jnp.maximum(jnp.abs(direction), 1e-12)


def _slab_entries(o, iv, tc, bmin, bmax):
    """Exact slab entries ``[*, M]`` for rays ``[*, 3]`` vs boxes
    ``[M, 3]`` (or per-row boxes ``[*, M, 3]``); ``_INF`` where missed.
    f32 on purpose — a bf16 variant needs a conservative box margin
    comparable to the chunk extent, and the resulting union growth
    (measured 3x) costs the sweep far more than bf16 saves here."""
    per_row = bmin.ndim == 3
    rows = o.shape[0]
    m = bmin.shape[-2] if per_row else bmin.shape[0]
    tlo = jnp.full((rows, m), -_INF)
    thi = jnp.full((rows, m), _INF)
    for ax in range(3):
        # SoA per-axis broadcasts keep the minor dim = boxes (a
        # [.., M, 3] compute layout would pad the 3-axis to a full lane).
        lo = bmin[..., ax] if per_row else bmin[None, :, ax]
        hi = bmax[..., ax] if per_row else bmax[None, :, ax]
        t0 = (lo - o[:, ax:ax + 1]) * iv[:, ax:ax + 1]
        t1 = (hi - o[:, ax:ax + 1]) * iv[:, ax:ax + 1]
        tlo = jnp.maximum(tlo, jnp.minimum(t0, t1))
        thi = jnp.minimum(thi, jnp.maximum(t0, t1))
    ent = jnp.maximum(tlo, 0.0)
    hit = (thi >= ent) & (tlo <= tc[:, None])
    return jnp.where(hit, ent, _INF)


def _front_to_back_sort(entry, n_ids: int, diam):
    """Sort each row's (entry, id) pairs front-to-back WITHOUT an argsort:
    quantize the entry distance into the high bits of one i32 key, id in
    the low bits, and value-sort rows — half the data (and comparator
    work) of sorting (key, index) pairs.  Quantization rounds DOWN, so
    the recovered entry stays a lower bound (termination keeps at most a
    few extra chunks competitive; correctness is unaffected).

    ``entry``: ``[T, M]`` with column j the entry of id j (``_INF`` miss).
    Returns ``(order [T, M] i32 — id n_ids past count, entry_sorted
    [T, M] f32 — _INF past count, count [T] i32)``.
    """
    m = entry.shape[1]
    id_bits = max(int(m).bit_length(), 1)
    eb = 30 - id_bits
    q_max = np.int32((1 << eb) - 1)
    scale = (np.float32(q_max - 1) / np.float32(1.001)
             / jnp.maximum(diam, 1e-20))
    qe = jnp.clip((entry * scale).astype(jnp.int32), 0, q_max - 1)
    qe = jnp.where(entry < _BIG, qe, q_max)  # real entries are <= diam
    key = (qe << id_bits) | jnp.arange(m, dtype=jnp.int32)[None]
    key = jnp.sort(key, axis=1)
    qe_s = key >> id_bits
    valid = qe_s < q_max
    order = jnp.where(valid, key & np.int32((1 << id_bits) - 1),
                      np.int32(n_ids))
    entry_sorted = jnp.where(valid, qe_s.astype(_F32) / scale, _INF)
    count = jnp.sum(valid, axis=1).astype(jnp.int32)
    return order, entry_sorted, count


def _pad_lists(order, entry_sorted, n_chunks: int, width: int):
    """Pad per-tile lists to ``width`` columns (dummy id / _INF)."""
    pad = width - order.shape[1]
    if pad > 0:
        order = jnp.pad(order, ((0, 0), (0, pad)),
                        constant_values=n_chunks)
        entry_sorted = jnp.pad(entry_sorted, ((0, 0), (0, pad)),
                               constant_values=_INF)
    return order[:, :width], entry_sorted[:, :width]


def scene_diam(origin, cmin, cmax):
    """Parametric reach cap: the farthest any ray must travel to exit the
    union of its origin and the scene box (unit directions, so the union
    diameter bounds any in-scene hit parameter)."""
    u_lo = jnp.minimum(jnp.min(cmin, axis=0), jnp.min(origin, axis=0))
    u_hi = jnp.maximum(jnp.max(cmax, axis=0), jnp.max(origin, axis=0))
    return jnp.sqrt(jnp.sum((u_hi - u_lo) ** 2)) * np.float32(1.001)


def superchunk_boxes(cmin, cmax, g: int):
    """Group ``g`` consecutive chunks (BVH-preorder-adjacent, so spatially
    compact) into one superchunk AABB.  Returns ``[S, 3]`` min/max."""
    n_chunks = cmin.shape[0]
    s = -(-n_chunks // g)
    pmin = jnp.pad(cmin, ((0, s * g - n_chunks), (0, 0)),
                   constant_values=_BIG)
    pmax = jnp.pad(cmax, ((0, s * g - n_chunks), (0, 0)),
                   constant_values=-_BIG)
    return (jnp.min(pmin.reshape(s, g, 3), axis=1),
            jnp.max(pmax.reshape(s, g, 3), axis=1))


def lead_superchunk(origin, direction, t_cap, smin, smax):
    """Per-ray id of the FRONT-MOST superchunk the ray can touch (``S``
    when it touches none — including retired lanes, whose negative
    ``t_cap`` rejects every box).  Used as the major sort key so rays
    needing the same part of the mesh share tiles, and no-work rays pack
    into tiles the compacted sweep queue never serves."""
    n = origin.shape[0]
    s = smin.shape[0]
    rb = CULL_BLOCK * TILE
    n_blocks = -(-n // rb)
    pad = n_blocks * rb - n
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        direction = jnp.pad(direction, ((0, pad), (0, 0)),
                            constant_values=1.0)
        t_cap = jnp.pad(t_cap, (0, pad), constant_values=-_INF)
    iv = _inv_dir(direction)

    def block(carry, inp):
        o, ivb, tc = inp
        ent = _slab_entries(o, ivb, tc, smin, smax)
        lead = jnp.argmin(ent, axis=1).astype(jnp.int32)
        none = jnp.min(ent, axis=1) >= _BIG
        return carry, jnp.where(none, np.int32(s), lead)

    _, lead = jax.lax.scan(block, None,
                           (origin.reshape(n_blocks, rb, 3),
                            iv.reshape(n_blocks, rb, 3),
                            t_cap.reshape(n_blocks, rb)))
    return lead.reshape(-1)[:n]


def chunk_cull(origin, direction, t_best0, cmin, cmax):
    """Front-to-back per-tile chunk lists from exact per-ray slab tests,
    two-level: a dense coarse pass over superchunk AABBs picks each
    tile's candidate superchunks, then a gathered fine pass slab-tests
    only the candidates' chunks — tier-gated by ``lax.switch`` on the
    worst tile's candidate count, so cull cost tracks survivors rather
    than total chunk count (the reference's analogue is the tree's upper
    levels, ``hitRay.wgsl:42-110``; here the "tree" is two dense levels).

    Args:
      origin, direction: ``[n_pad, 3]`` sorted rays, ``n_pad`` a multiple
        of TILE (padded/retired lanes carry a negative ``t_best0``).
      t_best0: ``[n_pad]`` running per-ray closest-hit bound.
      cmin/cmax: ``[C, 3]`` chunk AABBs from :func:`pack_tris`.

    Returns ``(order [n_tiles, Cp] i32, entry [n_tiles, Cp] f32, count
    [n_tiles] i32)`` where ``Cp`` is ``C`` padded to a CHUNKS_PER_STEP
    multiple, ``order`` lists surviving chunk ids front-to-back (dummy id
    ``C`` past ``count``), and ``entry`` is the sorted conservative entry
    distance (``_INF`` past ``count``) used for round termination.
    """
    n_pad = origin.shape[0]
    n_tiles = n_pad // TILE
    n_chunks = cmin.shape[0]
    g = _superchunk_size(n_chunks)
    n_sc = -(-n_chunks // g)

    diam = scene_diam(origin, cmin, cmax)
    t_cap = jnp.minimum(t_best0, diam)              # [n_pad]
    iv = _inv_dir(direction)

    step_c = CHUNKS_PER_STEP * SUBS_PER_STEP
    cp = -(-n_chunks // step_c) * step_c

    n_blocks = -(-n_tiles // CULL_BLOCK)
    o_b = origin.reshape(n_blocks, CULL_BLOCK * TILE, 3)
    i_b = iv.reshape(n_blocks, CULL_BLOCK * TILE, 3)
    tc_b = t_cap.reshape(n_blocks, CULL_BLOCK * TILE)

    def dense_tile_entries(boxes_min, boxes_max):
        """Per-tile min entry vs every box: ``[n_tiles, M]``."""
        def block(carry, inp):
            o, ivb, tc = inp
            ent = _slab_entries(o, ivb, tc, boxes_min, boxes_max)
            m = ent.shape[1]
            return carry, jnp.min(ent.reshape(CULL_BLOCK, TILE, m), axis=1)

        _, ent = jax.lax.scan(block, None, (o_b, i_b, tc_b))
        return ent.reshape(n_tiles, -1)

    if n_chunks <= 2 * step_c or n_sc < 8:
        # Tiny mesh: the two-level machinery costs more than it saves.
        order, ent_s, count = _front_to_back_sort(
            dense_tile_entries(cmin, cmax), n_chunks, diam)
        return *_pad_lists(order, ent_s, n_chunks, cp), count

    # ---- coarse level: tile candidate superchunks, front-to-back.
    smin, smax = superchunk_boxes(cmin, cmax, g)
    sc_order, _, sc_count = _front_to_back_sort(
        dense_tile_entries(smin, smax), n_sc, diam)
    kmax = jnp.max(sc_count)

    # Dummy boxes at id C / id S self-reject in any slab test.
    cmin_d = jnp.concatenate([cmin, jnp.full((1, 3), _BIG)])
    cmax_d = jnp.concatenate([cmax, jnp.full((1, 3), -_BIG)])

    def fine_sparse(k: int):
        """Fine cull over each tile's first-k candidate superchunks."""
        kg = k * g
        cand = sc_order[:, :k]                       # [T, k], dummy = S
        cids = (jnp.minimum(cand, n_sc - 1)[:, :, None] * g
                + jnp.arange(g, dtype=jnp.int32)[None, None])
        cids = jnp.where(cand[:, :, None] < n_sc,
                         jnp.minimum(cids, n_chunks - 1),
                         np.int32(n_chunks)).reshape(n_tiles, kg)
        bmin = cmin_d[cids]                          # [T, kg, 3]
        bmax = cmax_d[cids]
        # Dummy candidates (id C) carry an INVERTED box (+BIG/-BIG) whose
        # min/max-swapped slab test looks like an infinite box — mask them
        # out explicitly or every tile gains k*g phantom entry-0 chunks.
        valid_c = cids < n_chunks                    # [T, kg]

        # Block the per-ray fine test so the [fb, TILE, kg] broadcast
        # stays memory-bounded; power-of-two fb divides n_tiles (a
        # CULL_BLOCK=64 multiple).
        fb = 1
        while fb < 64 and fb * 2 * TILE * kg <= (1 << 21):
            fb *= 2
        nfb = n_tiles // fb

        def block(carry, inp):
            o, ivb, tc, bmn, bmx, vc = inp  # [fb,TILE,3],[fb,TILE],[fb,kg,3]
            tlo = jnp.full((fb, TILE, kg), -_INF)
            thi = jnp.full((fb, TILE, kg), _INF)
            for ax in range(3):
                t0 = ((bmn[:, None, :, ax] - o[:, :, None, ax])
                      * ivb[:, :, None, ax])
                t1 = ((bmx[:, None, :, ax] - o[:, :, None, ax])
                      * ivb[:, :, None, ax])
                tlo = jnp.maximum(tlo, jnp.minimum(t0, t1))
                thi = jnp.minimum(thi, jnp.maximum(t0, t1))
            ent0 = jnp.maximum(tlo, 0.0)
            hit = (thi >= ent0) & (tlo <= tc[:, :, None]) & vc[:, None, :]
            ent0 = jnp.where(hit, ent0, _INF)
            return carry, jnp.min(ent0, axis=1)      # [fb, kg]

        _, ent = jax.lax.scan(
            block, None,
            (origin.reshape(nfb, fb, TILE, 3),
             iv.reshape(nfb, fb, TILE, 3),
             t_cap.reshape(nfb, fb, TILE),
             bmin.reshape(nfb, fb, kg, 3),
             bmax.reshape(nfb, fb, kg, 3),
             valid_c.reshape(nfb, fb, kg)))
        ent = ent.reshape(n_tiles, kg)
        order_l, ent_s, count = _front_to_back_sort(ent, kg, diam)
        # Local candidate index -> real chunk id.
        cids_d = jnp.concatenate(
            [cids, jnp.full((n_tiles, 1), n_chunks, jnp.int32)], axis=1)
        order = jnp.take_along_axis(cids_d, order_l, axis=1)
        return *_pad_lists(order, ent_s, n_chunks, cp), count

    def fine_dense():
        order, ent_s, count = _front_to_back_sort(
            dense_tile_entries(cmin, cmax), n_chunks, diam)
        return *_pad_lists(order, ent_s, n_chunks, cp), count

    tiers = [k for k in (8, 32) if k < n_sc]
    branches = [functools.partial(fine_sparse, k) for k in tiers]
    branches.append(fine_dense)
    tier_idx = sum(jnp.int32(kmax > k) for k in tiers)
    return jax.lax.switch(tier_idx, branches)


# Largest chunk count whose FOUR matmul tables ((C+1) x 4 KB each) stay
# resident in VMEM (~16 MB/core) with room for ray blocks + scratch: the
# resident sweep kernel does in-kernel dynamic-index chunk lookups instead
# of XLA gathers, so per-step HBM traffic drops to the ray/output blocks.
RESIDENT_MAX_CHUNKS = 640


def _combined_table(e0, e1, e2, tcol):
    """Stack the four per-chunk matmul tables into ONE ``[C+1, 32, TC]``
    block per chunk — rows 0-7 e0, 8-15 e1, 16-23 e2, 24-31 tcol — with
    the triangle GLOBAL INDEX (as f32) planted in tcol's spare row 4
    (``o1 = [o, 1, 0, 0, 0, 0]`` zeroes it out of the tn contraction).
    The resident kernel then fetches a chunk with ONE dynamic-index copy
    instead of five."""
    cp1 = e0.shape[0]
    gid = (jnp.arange(cp1, dtype=jnp.int32)[:, None, None]
           * np.int32(TRI_CHUNK)
           + jnp.arange(TRI_CHUNK, dtype=jnp.int32)[None, None, :]
           ).astype(_F32)
    tcol_g = jnp.concatenate([tcol[:, :4], gid, tcol[:, 5:]], axis=1)
    return jnp.concatenate([e0, e1, e2, tcol_g], axis=1)


def _sweep_kernel_resident(t_min: float):
    """Sweep kernel with the whole chunk-table set resident in VMEM.

    Per grid step: read this step's CHUNKS_PER_STEP x SUBS_PER_STEP chunk
    ids from the scalar-prefetched queue, copy each chunk's combined
    table block (:func:`_combined_table`) out of the resident table into
    a contiguous scratch block (dynamic leading-dim VMEM indexing — the
    embedding-lookup pattern), then run the same predicated MXU sub-block
    sweep as the gather kernel.  No XLA-side gather, no per-step table
    DMA, no dummy-chunk HBM waste — the queue's dummy steps only touch
    VMEM, and each chunk costs ONE [32, 128] copy.
    """
    t_min = np.float32(t_min)
    kc = CHUNKS_PER_STEP * TRI_CHUNK

    def kernel(tos_ref, isf_ref, vg_ref, ids_ref, dm_ref, o1_ref, tb_ref,
               ib_ref, tab_ref, t_out, idx_out, sc):
        s = pl.program_id(0)

        @pl.when(isf_ref[s] == 1)
        def _():
            t_out[:] = tb_ref[:]
            idx_out[:] = ib_ref[:]

        step_c = SUBS_PER_STEP * CHUNKS_PER_STEP
        for j in range(SUBS_PER_STEP):
            @pl.when(j < vg_ref[s])
            def _(j=j):
                for c in range(CHUNKS_PER_STEP):
                    # ids is FLAT [B * step_c]: a 2-D SMEM operand pads
                    # its minor dim to a full 128 lanes (measured: a
                    # [2048, 32] i32 queue = 1 MB, over SMEM's capacity).
                    cid = ids_ref[s * step_c + j * CHUNKS_PER_STEP + c]
                    sc[:, c * TRI_CHUNK:(c + 1) * TRI_CHUNK] = tab_ref[cid]
                t_best = t_out[:]
                idx_best = idx_out[:]

                def mm(rays, rows):
                    # HIGHEST: geometry needs f32-grade products — the TPU
                    # default multiplies f32 matmul inputs in plain bf16,
                    # which flips edge/hit tests.
                    return jax.lax.dot_general(
                        rays, sc[rows * RAY_K:(rows + 1) * RAY_K, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=_F32,
                        precision=jax.lax.Precision.HIGHEST)

                dm = dm_ref[:]
                s0, s1, s2 = mm(dm, 0), mm(dm, 1), mm(dm, 2)
                tn = mm(o1_ref[:], 3)
                den = s0 + s1 + s2               # = n·d (MT determinant)
                inv = jnp.reciprocal(den)
                tt = tn * inv
                ok = ((jnp.abs(den) >= t_min) & (tt >= t_min)
                      & (tt < t_best)
                      & (s0 * inv >= t_min) & (s1 * inv >= t_min)
                      & (s2 * inv >= t_min))
                tm = jnp.where(ok, tt, _INF)
                t_chunk = jnp.min(tm, axis=1, keepdims=True)  # [TILE, 1]
                # gid rides the combined table's row 28 (tcol row 4).
                isel = jnp.min(
                    jnp.where(tm == t_chunk,
                              sc[3 * RAY_K + 4:3 * RAY_K + 5, :], _INF),
                    axis=1, keepdims=True)
                upd = t_chunk < t_best
                t_out[:] = jnp.where(upd, t_chunk, t_best)
                idx_out[:] = jnp.where(upd, isel, idx_best)

    return kernel


def _sweep_round_resident(ray_dm, ray_o1, t_best, idx_best, tos, isf, vg,
                          ids, etab, t_min: float, interpret: bool):
    """One compacted round with VMEM-resident tables (see
    :func:`_sweep_kernel_resident`).  Queue semantics identical to
    :func:`_sweep_round`."""
    n_pad = ray_dm.shape[0]
    b_steps, kd = ids.shape
    kc = CHUNKS_PER_STEP * TRI_CHUNK

    def by_tile(kind):
        return pl.BlockSpec(
            kind, lambda s, tos_ref, isf_ref, vg_ref, ids_ref:
            (tos_ref[s], 0), memory_space=pltpu.VMEM)

    # The table must be a CONSTANT-index block, not a bare whole-array
    # spec: with no index map the pipeline re-DMAs the whole table every
    # grid step (measured: 2048 steps x 10.5 MB = 21 GB ~= the entire
    # sweep time); a constant block index engages the revisited-block
    # logic and the table is fetched once.
    whole = pl.BlockSpec(
        etab.shape, lambda s, tos_ref, isf_ref, vg_ref, ids_ref:
        (0, 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b_steps,),
        in_specs=[by_tile((TILE, RAY_K)), by_tile((TILE, RAY_K)),
                  by_tile((TILE, 1)), by_tile((TILE, 1)), whole],
        out_specs=(by_tile((TILE, 1)), by_tile((TILE, 1))),
        scratch_shapes=[pltpu.VMEM((4 * RAY_K, kc), _F32)],
    )
    out_shape = jax.ShapeDtypeStruct((n_pad, 1), _F32)
    return pl.pallas_call(
        _sweep_kernel_resident(t_min),
        grid_spec=grid_spec,
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(tos, isf, vg, ids.reshape(-1), ray_dm, ray_o1, t_best, idx_best,
      etab)


def _sweep_kernel(t_min: float):
    t_min = np.float32(t_min)
    kc = CHUNKS_PER_STEP * TRI_CHUNK

    def kernel(tos_ref, isf_ref, vg_ref, dm_ref, o1_ref, tb_ref, ib_ref,
               e0_ref, e1_ref, e2_ref, tc_ref, gid_ref, t_out, idx_out):
        s = pl.program_id(0)

        # First step for this tile this round: seed the (revisited) output
        # block from the carried best.  Later groups of the same tile are
        # consecutive steps, so the block stays resident in VMEM.
        @pl.when(isf_ref[s] == 1)
        def _():
            t_out[:] = tb_ref[:]
            idx_out[:] = ib_ref[:]

        # SUBS_PER_STEP predicated sub-blocks amortize the fixed per-step
        # cost over up to 4x the work for heavy tiles, while light tiles
        # skip the MXU work of their empty sub-blocks (vg = valid count).
        # (A single fused 16-row matmul per sub-block was tried and is
        # SLOWER: doubled table DMA + the XLA-side role packing cost more
        # than the three extra MXU launches.)
        for j in range(SUBS_PER_STEP):
            @pl.when(j < vg_ref[s])
            def _(j=j):
                sl = slice(j * kc, (j + 1) * kc)
                t_best = t_out[:]                # [TILE, 1]
                idx_best = idx_out[:]

                # HIGHEST: geometry needs f32-grade products — the TPU
                # default multiplies f32 matmul inputs in plain bf16,
                # which flips edge/hit tests (Mosaic supports only
                # DEFAULT and HIGHEST).
                def mm(eref):
                    return jax.lax.dot_general(
                        dm_ref[:], eref[0][:, sl],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=_F32,
                        precision=jax.lax.Precision.HIGHEST)

                s0, s1, s2 = mm(e0_ref), mm(e1_ref), mm(e2_ref)
                tn = jax.lax.dot_general(
                    o1_ref[:], tc_ref[0][:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=_F32,
                    precision=jax.lax.Precision.HIGHEST)
                den = s0 + s1 + s2               # = n·d (MT determinant)
                inv = jnp.reciprocal(den)
                tt = tn * inv
                # Guard order mirrors common.wgsl:205-228 including its
                # odd t_min barycentric guards (u,v,w >= t_min); all-zero
                # padding columns give den == 0 and are rejected by the
                # first clause.
                ok = ((jnp.abs(den) >= t_min) & (tt >= t_min)
                      & (tt < t_best)
                      & (s0 * inv >= t_min) & (s1 * inv >= t_min)
                      & (s2 * inv >= t_min))
                tm = jnp.where(ok, tt, _INF)
                t_chunk = jnp.min(tm, axis=1, keepdims=True)  # [TILE, 1]
                isel = jnp.min(
                    jnp.where(tm == t_chunk, gid_ref[0][0:1, sl], _INF),
                    axis=1, keepdims=True)
                upd = t_chunk < t_best
                t_out[:] = jnp.where(upd, t_chunk, t_best)
                idx_out[:] = jnp.where(upd, isel, idx_best)

    return kernel


def _sweep_round(ray_dm, ray_o1, t_best, idx_best, tos, isf, vg, ids,
                 e0, e1, e2, tcol, t_min: float, interpret: bool):
    """One compacted round: ``B`` steps routed to tiles by scalar prefetch.

    ``tos [B]``: tile id per step; ``isf [B]``: 1 on a tile's first step
    this round; ``vg [B]``: valid sub-blocks (1..SUBS_PER_STEP) per step;
    ``ids [B, SUBS*K]``: chunk ids per step (dummy = C).
    """
    n_pad = ray_dm.shape[0]
    b_steps, kd = ids.shape
    kdc = kd * TRI_CHUNK
    flat = ids.reshape(-1)

    def gat(tbl):
        g = tbl[flat]                            # [B*KD, 8, TC]
        return g.reshape(b_steps, kd, RAY_K, TRI_CHUNK).transpose(
            0, 2, 1, 3).reshape(b_steps, RAY_K, kdc)

    e0g, e1g, e2g, tcg = gat(e0), gat(e1), gat(e2), gat(tcol)
    lane = jnp.arange(TRI_CHUNK, dtype=jnp.int32)[None]
    gid = (flat[:, None] * TRI_CHUNK + lane).astype(_F32)
    gid = gid.reshape(b_steps, 1, kdc)

    def by_tile(kind):
        return pl.BlockSpec(kind, lambda s, tos_ref, isf_ref, vg_ref:
                            (tos_ref[s], 0), memory_space=pltpu.VMEM)

    def by_step(kind):
        return pl.BlockSpec(kind, lambda s, tos_ref, isf_ref, vg_ref:
                            (s, 0, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b_steps,),
        in_specs=[by_tile((TILE, RAY_K)), by_tile((TILE, RAY_K)),
                  by_tile((TILE, 1)), by_tile((TILE, 1)),
                  by_step((1, RAY_K, kdc)), by_step((1, RAY_K, kdc)),
                  by_step((1, RAY_K, kdc)), by_step((1, RAY_K, kdc)),
                  by_step((1, 1, kdc))],
        out_specs=(by_tile((TILE, 1)), by_tile((TILE, 1))),
    )
    out_shape = jax.ShapeDtypeStruct((n_pad, 1), _F32)
    return pl.pallas_call(
        _sweep_kernel(t_min),
        grid_spec=grid_spec,
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(tos, isf, vg, ray_dm, ray_o1, t_best, idx_best,
      e0g, e1g, e2g, tcg, gid)


@functools.partial(jax.jit,
                   static_argnames=("t_min", "n_tris", "interpret"))
def tile_closest_hit(origin, direction, bvh: FlatBVH, tris_packed,
                     t_best0, t_min: float, n_tris: int,
                     interpret: bool = False):
    """Closest triangle hit per ray: per-ray chunk cull + compacted sweep.

    Args:
      origin, direction: ``[N, 3]`` rays (``N`` padded internally).
      bvh: flattened BVH — used only for the Morton-sort scene box (the
        chunk AABBs carry the culling; triangle ORDER being BVH preorder
        is what makes chunks spatially compact).
      tris_packed: tables from :func:`pack_tris`.
      t_best0: ``[N]`` running closest-hit bound (prunes like the
        reference's ``closest_so_far``, ``hitRay.wgsl:54``).
    Returns ``(t [N] f32 — untouched where no hit, idx [N] i32 — -1 for
    miss)``; only lanes with ``idx >= 0`` have meaningful ``t``.
    """
    e0, e1, e2, tcol, cmin, cmax = tris_packed
    n_chunks = int(cmin.shape[0])
    n = origin.shape[0]
    n_pad = -(-n // (TILE * CULL_BLOCK)) * (TILE * CULL_BLOCK)

    # Coherence sort: major key = per-ray FRONT superchunk (rays needing
    # the same part of the mesh share tiles, so tile chunk-unions track
    # per-ray needs — for bounce wavefronts this is what the 6-D Morton
    # key alone cannot do), minor key = balanced Morton bits.  Rays that
    # touch no superchunk at all — retired lanes (negative t_best0 from
    # kernels/hit.py) and rays aimed off-mesh — get the max key, packing
    # into zero-work tiles the compacted sweep queue never serves.
    g = _superchunk_size(n_chunks)
    smin, smax = superchunk_boxes(cmin, cmax, g)
    diam = scene_diam(origin, cmin, cmax)
    lead = lead_superchunk(origin, direction,
                           jnp.minimum(t_best0, diam), smin, smax)
    morton = _morton_key6d(origin, direction, bvh.mins[0], bvh.maxs[0])
    key = ((lead.astype(jnp.uint32) << np.uint32(24))
           | (morton.astype(jnp.uint32) >> np.uint32(6)))
    perm = jnp.argsort(key)
    o_s = origin[perm]
    d_s = direction[perm]
    tb_s = t_best0[perm]
    pad = n_pad - n
    # Padded lanes repeat the last ray's geometry (tile bounds stay tight)
    # with a negative bound, so they contribute no chunks anywhere.
    o_pad = jnp.concatenate([o_s, jnp.broadcast_to(o_s[-1:], (pad, 3))])
    d_pad = jnp.concatenate([d_s, jnp.broadcast_to(d_s[-1:], (pad, 3))])
    tb_pad = jnp.concatenate([tb_s, jnp.full((pad,), -_INF, _F32)])

    order, entry_sorted, count = chunk_cull(o_pad, d_pad, tb_pad,
                                            cmin, cmax)
    n_tiles = n_pad // TILE

    ray_dm = jnp.concatenate(
        [d_pad, jnp.cross(o_pad, d_pad), jnp.zeros((n_pad, 2), _F32)],
        axis=1)
    ray_o1 = jnp.concatenate(
        [o_pad, jnp.ones((n_pad, 1), _F32), jnp.zeros((n_pad, 4), _F32)],
        axis=1)
    etab = (_combined_table(e0, e1, e2, tcol)
            if n_chunks <= RESIDENT_MAX_CHUNKS else None)

    k = CHUNKS_PER_STEP
    subs = SUBS_PER_STEP
    step_c = k * subs                                 # chunks per step
    kvec = jnp.arange(step_c, dtype=jnp.int32)[None]
    dummy = np.int32(n_chunks)

    def cond(state):
        _, _, pos, limit = state
        return jnp.any(pos < limit)

    def make_round(b_steps):
      svec = jnp.arange(b_steps, dtype=jnp.int32)

      def body(state):
        t_best, idx_best, pos, limit = state
        need = jnp.maximum(limit - pos, 0)
        steps_t = -(-need // step_c)                  # [n_tiles]
        cum = jnp.cumsum(steps_t)
        total = cum[-1]
        served_end = jnp.minimum(total, b_steps)

        # Step -> tile routing (compacted queue, sorted by tile).
        tos = jnp.searchsorted(cum, svec, side="right").astype(jnp.int32)
        real = svec < served_end
        tos_last = tos[jnp.maximum(served_end - 1, 0)]
        tos = jnp.where(real, jnp.minimum(tos, n_tiles - 1), tos_last)
        cum_before = jnp.where(tos > 0, cum[jnp.maximum(tos - 1, 0)], 0)
        local = svec - cum_before                     # step within tile
        start = pos[tos] + local * step_c
        idxs = jnp.minimum(start[:, None] + kvec, order.shape[1] - 1)
        ids = order[tos[:, None], idxs]               # [B, SUBS*K]
        chunk_pos = local[:, None] * step_c + kvec    # within-need offset
        over = chunk_pos >= need[tos][:, None]
        ids = jnp.where(real[:, None] & ~over, ids, dummy)
        isf = (real & ((svec == 0) | (tos != jnp.roll(tos, 1)))
               ).astype(jnp.int32)
        # Valid sub-blocks per step: ceil(remaining-chunks-this-step / K).
        rem = jnp.clip(need[tos] - local * step_c, 0, step_c)
        vg = jnp.where(real, -(-rem // k), 0).astype(jnp.int32)

        if n_chunks <= RESIDENT_MAX_CHUNKS:
            t_new, i_new = _sweep_round_resident(
                ray_dm, ray_o1, t_best, idx_best, tos, isf, vg, ids,
                etab, t_min, interpret)
        else:
            t_new, i_new = _sweep_round(
                ray_dm, ray_o1, t_best, idx_best, tos, isf, vg, ids,
                e0, e1, e2, tcol, t_min, interpret)
        # Per-tile steps actually served this round (a tile queued past
        # the round budget waits for the next round).
        cum_prev = jnp.concatenate([jnp.zeros((1,), cum.dtype), cum[:-1]])
        served = jnp.clip(jnp.minimum(cum, served_end) - cum_prev,
                          0, steps_t)
        # Unserved tiles' output blocks are never written — keep carry.
        touched = jnp.broadcast_to((served > 0)[:, None], (n_tiles, TILE))
        touched = touched.reshape(n_pad, 1)
        t_new = jnp.where(touched, t_new, t_best)
        i_new = jnp.where(touched, i_new, idx_best)
        pos = pos + served * step_c

        # Round termination: drop trailing front-to-back chunks whose
        # entry distance exceeds every ray's current best in the tile.
        t_tile = jnp.max(t_new.reshape(n_tiles, TILE), axis=1)
        competitive = jnp.sum(entry_sorted <= t_tile[:, None],
                              axis=1).astype(jnp.int32)
        limit = jnp.minimum(count, competitive)
        return t_new, i_new, pos, limit

      return body

    t0 = tb_pad[:, None]
    i0 = jnp.full((n_pad, 1), -1.0, _F32)
    pos0 = jnp.zeros((n_tiles,), jnp.int32)
    # Round 1 at full budget (a coherent frame finishes in it), then
    # straggler rounds at 1/8 budget: a full-width round costs its grid's
    # ~3 us/step bookkeeping floor even when nearly every step is a
    # no-op, so leftover tiles must not re-pay the whole width (measured
    # 6.3 ms per 2048-step round at zero work).
    state = (t0, i0, pos0, count)
    state = jax.lax.cond(cond(state), make_round(n_tiles),
                         lambda s: s, state)
    t, idx, _, _ = jax.lax.while_loop(
        cond, make_round(max(n_tiles // 8, 128)), state)
    # Scatter back through the inverse permutation.
    t_out = jnp.zeros((n,), _F32).at[perm].set(t[:n, 0])
    i_out = jnp.zeros((n,), _F32).at[perm].set(idx[:n, 0])
    return t_out, i_out.astype(jnp.int32)
