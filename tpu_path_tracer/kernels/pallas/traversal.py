"""Two-level chunk culling (XLA) + compacted MXU matmul sweep (Pallas).

Why: XLA lowers per-lane gathers on TPU at ~1 row/cycle — any per-ray BVH
walk (the GPU-native shape, ``shaders/hitRay.wgsl:42-110``) pays that on
every traversal step and lands orders of magnitude off speed-of-light.
The TPU-native decomposition does the irregular work (pruning) as DENSE
vector math and the regular work (intersection) as MXU matmuls:

1. **Sort** — rays are ordered by a balanced 6-D Morton key (direction
   bits major — see :func:`_morton_key6d`); retired lanes (negative
   ``t_best0`` sentinel from ``kernels/hit.py``) and rays whose exact
   slab test misses the mesh ROOT box are forced to the max key, packing
   into zero-work tiles at the END that the prefix tiers and the
   compacted queue never serve.  (Round 4 used the per-ray front
   superchunk as the major key; it cost a dense [rays x superchunks]
   pass and measured no better once the cull went tile-granular.)

2. **Cull — two dense levels at TILE granularity, plain XLA**
   (:func:`chunk_cull`).  Triangles are stored in BVH DFS-preorder
   (``accel/bvh.py``), so every aligned 128-triangle CHUNK is spatially
   compact, as is every SUPERCHUNK of 8-16 chunks.  A conservative
   beam-interval slab pass (:func:`_interval_slab_entries` — interval
   arithmetic over each tile's origin box / inverse-direction interval,
   with a position-reach test to stay bounded where the direction
   straddles zero) over the ~80-160 superchunk AABBs picks each tile's
   front-to-back candidates; a fine pass tests only the candidates'
   chunks — beam-interval for coherent tiers, exact per-ray min-reduced
   for incoherent ones — tier-gated by ``lax.switch`` on the worst
   tile's candidate count, so cull cost tracks survivors, not total
   chunks (measured ~3 ms per 512^2 call vs ~11 ms for round 4's
   all-rays-x-all-boxes pass).  Tiles' surviving chunks sort
   front-to-back by conservative entry distance — the TPU analog of the
   reference's ordered traversal, its 66 -> 104 fps trick
   (``hitRay.wgsl:80-91``).

3. **Sweep — compacted work queue, Pallas** (:func:`tile_closest_hit`).
   The ray-triangle test is reformulated so the per-(ray, triangle)
   interaction is ONE inner product: a ray is ``[d, o×d]`` / ``[o, 1]``
   8-vectors and a triangle contributes three Plücker edge columns
   (``s_e = d·(p×q) + (o×d)·(q−p)`` is the signed edge volume, and
   ``s0+s1+s2 = n·d`` is the Möller-Trumbore determinant for free) plus
   a ``[−n, n·a]`` column (with the triangle's global index planted in a
   spare row) for the unnormalized hit parameter.  Each grid step sweeps
   up to SUBS_PER_STEP predicated sub-blocks of CHUNKS_PER_STEP chunks
   for one tile, each sub-block gated by an in-kernel exact slab test
   against every ray's CURRENT running best (skips the copies+matmuls
   for chunk groups no lane can still hit).  For meshes up to
   RESIDENT_MAX_CHUNKS the whole combined table (~10.5 MB) lives in
   VMEM and chunks are fetched by in-kernel dynamic indexing (no XLA
   gathers, no per-step table DMA); larger meshes fall back to per-step
   XLA-gathered tables.  Work is COMPACTED: each round builds a queue
   of (tile, chunk-group) steps over only the tiles that still have
   competitive chunks — a scalar-prefetched tile-id array routes each
   step's ray/output blocks — with the first round's width TIERED to
   the total queue length (incoherent wavefronts finish in one 2x-width
   launch instead of a dozen straggler rounds) and later rounds at 1/4
   width so stragglers don't re-pay the ~1.1 us/step bookkeeping floor
   of a full-width round.  After each round a tile's remaining
   front-to-back chunks are re-counted against its rays' max running
   ``t_best``.

Correctness does not depend on the culling quality: the slab test is
exact per (ray, box), entry distances are true lower bounds on hit ``t``
(unit directions), and dummy-padded steps sweep the all-zero chunk whose
columns self-reject.

Measured dead ends kept for the record: a ray-major pair sweep
(:func:`pair_closest_hit` — wins ~15x in slot count on incoherent
wavefronts but loses to XLA per-round data-movement costs; see
:func:`closest_hit`), TPG>1 span grouping (serializes on the shared
chunk scratch), and bf16 culling (needs chunk-extent margins that grow
unions ~3x).

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
from ..intersect import DET_EPS as _DET_EPS_SHARED

# Rays per tile = TILE_ROWS * 128.  Tunable (env TPT_TILE_ROWS) because
# the optimum is a measured trade: bigger tiles amortize the sweep
# grid's ~3 us/step bookkeeping floor and widen the MXU matmuls
# ([TILE, 8] x [8, 1024] rows), but loosen the per-tile beam bounds so
# the cull's candidate tiers and the sweep's chunk unions grow.
TILE_ROWS = int(__import__("os").environ.get("TPT_TILE_ROWS", "1"))
LANES = 128
TILE = TILE_ROWS * LANES
TRI_CHUNK = 128        # triangles per chunk (cull granularity)
CHUNKS_PER_STEP = 8    # chunks per sweep sub-block (queue granularity)
SUBS_PER_STEP = 4      # predicated sub-blocks per Pallas grid step
CULL_BLOCK = 64        # tiles per cull-scan iteration (bounds memory)

_F32 = jnp.float32
RAY_K = 8              # matmul contraction dim: [d, o×d] / [o, 1, 0…]
_INF = np.float32(3e38)
# Parallel-ray det cull — see kernels.intersect.DET_EPS (the reference's
# |det| < t_min guard rejects every triangle of a finely tessellated mesh).
_DET_EPS = _DET_EPS_SHARED
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
    """Exact slab entries ``[rows, M]`` for rays ``[rows, 3]`` vs boxes
    ``[M, 3]``; ``_INF`` where missed.  f32 on purpose — a bf16 variant
    needs a conservative box margin comparable to the chunk extent, and
    the resulting union growth (measured 3x) costs the sweep far more
    than bf16 saves here."""
    rows = o.shape[0]
    m = bmin.shape[0]
    tlo = jnp.full((rows, m), -_INF)
    thi = jnp.full((rows, m), _INF)
    for ax in range(3):
        # SoA per-axis broadcasts keep the minor dim = boxes (a
        # [.., M, 3] compute layout would pad the 3-axis to a full lane).
        t0 = (bmin[None, :, ax] - o[:, ax:ax + 1]) * iv[:, ax:ax + 1]
        t1 = (bmax[None, :, ax] - o[:, ax:ax + 1]) * iv[:, ax:ax + 1]
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


def _tile_entries(origin, iv, t_cap, boxes_min, boxes_max, n_tiles: int):
    """Per-tile min slab entry vs every box (``[n_tiles, M]``), block-
    scanned so the ``[rays, M]`` broadcast stays memory-bounded."""
    n_blocks = n_tiles // CULL_BLOCK
    o_b = origin.reshape(n_blocks, CULL_BLOCK * TILE, 3)
    i_b = iv.reshape(n_blocks, CULL_BLOCK * TILE, 3)
    tc_b = t_cap.reshape(n_blocks, CULL_BLOCK * TILE)

    def block(carry, inp):
        o, ivb, tc = inp
        ent = _slab_entries(o, ivb, tc, boxes_min, boxes_max)
        m = ent.shape[1]
        return carry, jnp.min(ent.reshape(CULL_BLOCK, TILE, m), axis=1)

    _, ent = jax.lax.scan(block, None, (o_b, i_b, tc_b))
    return ent.reshape(n_tiles, -1)


def _tile_ray_bounds(origin, direction, iv, t_cap, n_tiles: int):
    """Per-tile conservative BEAM bounds over live lanes (t_cap >= 0):
    origin box, inverse-direction interval, max parametric reach.  Dead
    lanes (negative cap) are excluded so a tile's beam is shaped only by
    rays whose result is consumed; an all-dead tile gets inverted bounds
    and a negative reach, which :func:`_interval_slab_entries` rejects."""
    live = (t_cap >= 0.0).reshape(n_tiles, TILE, 1)
    o = origin.reshape(n_tiles, TILE, 3)
    i = iv.reshape(n_tiles, TILE, 3)
    o_lo = jnp.min(jnp.where(live, o, _BIG), axis=1)
    o_hi = jnp.max(jnp.where(live, o, -_BIG), axis=1)
    i_lo = jnp.min(jnp.where(live, i, _BIG), axis=1)
    i_hi = jnp.max(jnp.where(live, i, -_BIG), axis=1)
    # Raw direction interval as well: when a tile's direction straddles
    # zero on an axis its INVERSE interval is unbounded and the slab
    # times constrain nothing, but position reach o + t*d with t <=
    # t_cap stays tight (d is small where iv is huge) — see
    # :func:`_interval_slab_entries`.
    d = direction.reshape(n_tiles, TILE, 3)
    d_lo = jnp.min(jnp.where(live, d, _BIG), axis=1)
    d_hi = jnp.max(jnp.where(live, d, -_BIG), axis=1)
    tc = jnp.max(t_cap.reshape(n_tiles, TILE), axis=1)
    return o_lo, o_hi, i_lo, i_hi, d_lo, d_hi, tc


def _interval_slab_entries(bounds, bmin, bmax, valid=None):
    """Conservative beam-vs-box slab test at TILE granularity.

    Interval arithmetic over the per-ray slab test: with the tile's
    origins in ``[o_lo, o_hi]`` and inverse directions in ``[i_lo,
    i_hi]``, each axis's near-slab time is bounded below by the interval
    product's minimum and the far-slab time above by its maximum, so the
    returned entry is a LOWER bound on every member ray's exact entry and
    a box is dropped only when NO ray in the beam can hit it.  This is
    the round-5 answer to the cull being ~100% of a coherent traversal
    call: the old coarse pass slab-tested every RAY against every box and
    min-reduced to tiles — 128x more work than the per-tile lists it
    produced (round-4 verdict, Next #1).  Correctness never depends on
    tightness: the sweep is exact, entries only gate/order it.

    The inverse-direction slab intervals alone blow up whenever a tile's
    direction straddles zero on an axis (the inverse interval spans
    ``[-1/eps, 1/eps]`` and the axis constrains nothing — measured: the
    image-center tiles of a coherent 512^2 wavefront matched ALL
    superchunks, kmax 80/80, pushing the cull to its dense fallback and
    the dispatch to the pair path).  The fix is a second, independent
    interval test on POSITION reach: every live ray's position on axis
    ``ax`` at parameter ``t <= tc`` lies in ``[o_lo + tc*min(d_lo, 0),
    o_hi + tc*max(d_hi, 0)]`` (raw direction interval, which is SMALL
    exactly where the inverse interval is huge), so a box strictly
    outside that reach box is rejected even when the slab times are
    unbounded.

    ``bmin/bmax``: ``[M, 3]`` (dense, shared across tiles) or
    ``[T, M, 3]`` (gathered per tile).  Returns ``[T, M]`` entries
    (``_INF`` where certainly missed).
    """
    o_lo, o_hi, i_lo, i_hi, d_lo, d_hi, tc = bounds
    dense = bmin.ndim == 2
    tc_pos = jnp.maximum(tc, 0.0)
    tlo, thi = None, None
    reach_ok = None
    for ax in range(3):
        bl, bh = bmin[..., ax], bmax[..., ax]
        if dense:
            bl, bh = bl[None, :], bh[None, :]
        ol, oh = o_lo[:, ax][:, None], o_hi[:, ax][:, None]
        il, ih = i_lo[:, ax][:, None], i_hi[:, ax][:, None]

        def iprod(xl, xh, il=il, ih=ih):
            p1, p2, p3, p4 = xl * il, xl * ih, xh * il, xh * ih
            return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                    jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))

        t0_lo, t0_hi = iprod(bl - oh, bl - ol)
        t1_lo, t1_hi = iprod(bh - oh, bh - ol)
        near_lo = jnp.minimum(t0_lo, t1_lo)
        far_hi = jnp.maximum(t0_hi, t1_hi)
        tlo = near_lo if tlo is None else jnp.maximum(tlo, near_lo)
        thi = far_hi if thi is None else jnp.minimum(thi, far_hi)

        r_lo = (o_lo[:, ax] + tc_pos * jnp.minimum(d_lo[:, ax], 0.0))
        r_hi = (o_hi[:, ax] + tc_pos * jnp.maximum(d_hi[:, ax], 0.0))
        r = (bh >= r_lo[:, None]) & (bl <= r_hi[:, None])
        reach_ok = r if reach_ok is None else (reach_ok & r)
    ent = jnp.maximum(tlo, 0.0)
    ok = ((thi >= ent) & (tlo <= tc[:, None]) & (tc[:, None] >= 0.0)
          & reach_ok)
    if valid is not None:
        ok &= valid
    return jnp.where(ok, ent, _INF)


def chunk_cull(origin, direction, t_best0, cmin, cmax):
    """Front-to-back per-tile chunk lists from TILE-granularity interval
    slab tests (:func:`_interval_slab_entries`), two-level: a dense
    coarse pass over superchunk AABBs picks each tile's candidate
    superchunks, then a gathered fine pass interval-tests only the
    candidates' chunks — tier-gated by ``lax.switch`` on the worst
    tile's candidate count, so cull cost tracks survivors rather than
    total chunk count (the reference's analogue is the tree's upper
    levels, ``hitRay.wgsl:42-110``; here the "tree" is two dense levels
    at beam granularity).

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
    bounds = _tile_ray_bounds(origin, direction, iv, t_cap, n_tiles)

    step_c = CHUNKS_PER_STEP * SUBS_PER_STEP
    cp = -(-n_chunks // step_c) * step_c

    if n_chunks <= 2 * step_c or n_sc < 8:
        # Tiny mesh: the two-level machinery costs more than it saves.
        order, ent_s, count = _front_to_back_sort(
            _interval_slab_entries(bounds, cmin, cmax), n_chunks, diam)
        return *_pad_lists(order, ent_s, n_chunks, cp), count

    # ---- coarse level: tile candidate superchunks, front-to-back.
    smin, smax = superchunk_boxes(cmin, cmax, g)
    sc_order, _, sc_count = _front_to_back_sort(
        _interval_slab_entries(bounds, smin, smax), n_sc, diam)
    kmax = jnp.max(sc_count)

    # Chunk boxes grouped by superchunk: the fine gather is then [T, k]
    # ROWS (one per candidate superchunk) instead of [T, k*g] — gathers
    # cost ~14-20 ns/row on this hardware, so row count matters.
    pad_sg = n_sc * g - n_chunks
    gmin = jnp.pad(cmin, ((0, pad_sg), (0, 0)),
                   constant_values=_BIG).reshape(n_sc, g, 3)
    gmax = jnp.pad(cmax, ((0, pad_sg), (0, 0)),
                   constant_values=-_BIG).reshape(n_sc, g, 3)

    def _gather_cand(k: int):
        """Gathered candidate-chunk ids/boxes for the first-k candidate
        superchunks of each tile.  Dummy candidates (id S) and padding
        chunks carry INVERTED (+BIG/-BIG) boxes whose min/max-swapped
        slab test looks like an infinite box — the returned ``real``
        mask must exclude them or every tile gains phantom entry-0
        chunks."""
        kg = k * g
        cand = sc_order[:, :k]                       # [T, k], dummy = S
        cand_c = jnp.minimum(cand, n_sc - 1)
        cids = (cand_c[:, :, None] * g
                + jnp.arange(g, dtype=jnp.int32)[None, None])
        real = (cand[:, :, None] < n_sc) & (cids < n_chunks)
        cids = jnp.where(real, cids, np.int32(n_chunks))
        cids = cids.reshape(n_tiles, kg)
        bmin = gmin[cand_c].reshape(n_tiles, kg, 3)
        bmax = gmax[cand_c].reshape(n_tiles, kg, 3)
        return cids, bmin, bmax, real.reshape(n_tiles, kg)

    def _finish(ent, cids, kg):
        order_l, ent_s, count = _front_to_back_sort(ent, kg, diam)
        # Local candidate index -> real chunk id.
        cids_d = jnp.concatenate(
            [cids, jnp.full((n_tiles, 1), n_chunks, jnp.int32)], axis=1)
        order = jnp.take_along_axis(cids_d, order_l, axis=1)
        return *_pad_lists(order, ent_s, n_chunks, cp), count

    def fine_sparse(k: int):
        """Interval (beam) fine cull over each tile's first-k candidate
        superchunks — the cheap path for COHERENT tiles, whose beams are
        tight (measured ~2x union growth vs the exact per-ray cull on
        primary rays, vs ~4x+ on diffuse bounces)."""
        cids, bmin, bmax, real = _gather_cand(k)
        ent = _interval_slab_entries(bounds, bmin, bmax, real)
        return _finish(ent, cids, k * g)

    def fine_sparse_exact(k: int):
        """Exact per-ray fine cull over each tile's first-k candidate
        superchunks, min-reduced to tiles — for INCOHERENT tiles, where
        a beam interval covers most of the mesh and the tile-union sweep
        would drown in phantom chunks (measured: interval fine at the
        bounce tier grew unions 72 -> 272 chunks/tile)."""
        kg = k * g
        cids, bmin, bmax, real = _gather_cand(k)
        # Block the per-ray test so the [fb, TILE, kg] broadcast stays
        # memory-bounded; power-of-two fb divides n_tiles (a
        # CULL_BLOCK=64 multiple).
        fb = 1
        while fb < 64 and fb * 2 * TILE * kg <= (1 << 21):
            fb *= 2
        nfb = n_tiles // fb

        def block(carry, inp):
            o, ivb, tc, bmn, bmx, vc = inp
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
             real.reshape(nfb, fb, kg)))
        return _finish(ent.reshape(n_tiles, kg), cids, kg)

    def fine_dense():
        """Exact per-ray pass over ALL chunks, min-reduced to tiles —
        the unbounded fallback when tiles' candidate lists overflow the
        largest sparse tier."""
        order, ent_s, count = _front_to_back_sort(
            _tile_entries(origin, iv, t_cap, cmin, cmax, n_tiles),
            n_chunks, diam)
        return *_pad_lists(order, ent_s, n_chunks, cp), count

    tiers = [k for k in (8, 16, 32) if k < n_sc]
    branches = [(functools.partial(fine_sparse, k) if k <= 8 else
                 functools.partial(fine_sparse_exact, k)) for k in tiers]
    branches.append(fine_dense)
    tier_idx = sum(jnp.int32(kmax > k) for k in tiers)
    return jax.lax.switch(tier_idx, branches)


# Largest chunk count whose FOUR matmul tables ((C+1) x 4 KB each) stay
# resident in VMEM (~16 MB/core) with room for ray blocks + scratch: the
# resident sweep kernel does in-kernel dynamic-index chunk lookups instead
# of XLA gathers, so per-step HBM traffic drops to the ray/output blocks.
RESIDENT_MAX_CHUNKS = 640
# Tiles served per resident-sweep grid step.  The grid has a fixed
# ~3 us/step bookkeeping floor, and TPG > 1 was built to amortize it —
# but measured SLOWER (TPG=4: ~50 us/step vs 5.1 at TPG=1): the
# TPG x SUBS predicated bodies serialize on the shared chunk scratch and
# multiply the scalar-branch overhead past what the floor costs.  TPG=1
# reduces to one tile per step, the measured optimum.
TPG = 1


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
    ids from the scalar-prefetched queue, and for each chunk FIRST run an
    in-kernel exact slab test of the chunk's AABB (scalar-prefetched box
    table) against the tile's rays at their CURRENT running best — only
    when some ray can still hit does the chunk's combined table block
    (:func:`_combined_table`) get copied out of the resident table
    (dynamic leading-dim VMEM indexing — the embedding-lookup pattern)
    and swept with per-chunk MXU matmuls.  The gate is the within-round
    analogue of the between-round recount, but per CHUNK and per RAY
    (exact slab x per-lane ``t_cur``, not beam interval x tile max): on
    incoherent wavefronts the tile union averages ~16x the mean per-ray
    need, and every union chunk past a lane's hit dies here at the cost
    of six scalar-broadcast compares instead of a copy + 4 matmuls.
    Dummy queue slots point at the box table's degenerate ``+BIG`` row
    and self-gate.  Sweep cost was measured ~linear in swept columns
    (tools/trav_kbench.py: vg1 5.1 us, vg4 18.2 us per step), so
    per-chunk matmuls cost what the former 8-chunk batch did — the gate
    is pure win.
    """
    t_min = np.float32(t_min)
    kc = CHUNKS_PER_STEP * TRI_CHUNK

    def kernel(sos_ref, isf_ref, vg_ref, ids_ref, bx_ref, dm_ref, o1_ref,
               tb_ref, ib_ref, tab_ref, t_out, idx_out, sc):
        s = pl.program_id(0)

        @pl.when(isf_ref[s] == 1)
        def _():
            t_out[:] = tb_ref[:]
            idx_out[:] = ib_ref[:]

        step_c = SUBS_PER_STEP * CHUNKS_PER_STEP
        # TPG tiles per grid step amortize the per-step bookkeeping
        # floor; each tile's sub-blocks are predicated independently.
        for p in range(TPG):
            rows = slice(p * TILE, (p + 1) * TILE)
            dm = dm_ref[rows, :]
            o1 = o1_ref[rows, :]
            ivs = []
            for ax in range(3):
                dax = dm[:, ax:ax + 1]
                ivs.append(jnp.where(dax >= 0.0, 1.0, -1.0)
                           / jnp.maximum(jnp.abs(dax), np.float32(1e-12)))
            for j in range(SUBS_PER_STEP):
                @pl.when(j < vg_ref[s * TPG + p])
                def _(p=p, j=j, rows=rows, dm=dm, o1=o1, ivs=ivs):
                    # Sub-block gate: exact slab of the 8 chunk AABBs
                    # (scalar-prefetched box table) against every ray at
                    # its CURRENT best — the within-round analogue of
                    # the between-round recount, per 8-chunk group and
                    # per LANE.  Skips the copies + matmuls whenever no
                    # ray can still hit any of the group's chunks
                    # (oracle ceiling on bounce wavefronts: ~37% of the
                    # tile-union sweep volume; a per-CHUNK gate saves
                    # slightly more in volume but serializes the MXU
                    # pipeline on t_out and measured net-slower).  Gate
                    # granularity is deliberately the matmul batch.
                    t_cur = t_out[rows, :]
                    any_live = None
                    for c in range(CHUNKS_PER_STEP):
                        cid = ids_ref[(s * TPG + p) * step_c
                                      + j * CHUNKS_PER_STEP + c]
                        tlo = jnp.full_like(t_cur, -_INF)
                        thi = jnp.full_like(t_cur, _INF)
                        for ax in range(3):
                            bmn = bx_ref[cid * 6 + ax]
                            bmx = bx_ref[cid * 6 + 3 + ax]
                            t0 = (bmn - o1[:, ax:ax + 1]) * ivs[ax]
                            t1 = (bmx - o1[:, ax:ax + 1]) * ivs[ax]
                            tlo = jnp.maximum(tlo, jnp.minimum(t0, t1))
                            thi = jnp.minimum(thi, jnp.maximum(t0, t1))
                        live = ((thi >= jnp.maximum(tlo, 0.0))
                                & (tlo <= t_cur))
                        any_live = live if any_live is None \
                            else (any_live | live)

                    @pl.when(jnp.any(any_live))
                    def _(p=p, j=j, rows=rows, dm=dm, o1=o1):
                        for c in range(CHUNKS_PER_STEP):
                            # ids is FLAT: a 2-D SMEM operand pads its
                            # minor dim to a full 128 lanes (measured: a
                            # [2048, 32] i32 queue = 1 MB, over SMEM's
                            # capacity).
                            cid = ids_ref[(s * TPG + p) * step_c
                                          + j * CHUNKS_PER_STEP + c]
                            sc[:, c * TRI_CHUNK:(c + 1) * TRI_CHUNK] = \
                                tab_ref[cid]
                        t_best = t_out[rows, :]
                        idx_best = idx_out[rows, :]

                        def mm(rays, r):
                            # HIGHEST: geometry needs f32-grade products
                            # — the TPU default multiplies f32 matmul
                            # inputs in plain bf16, which flips edge/hit
                            # tests.
                            return jax.lax.dot_general(
                                rays, sc[r * RAY_K:(r + 1) * RAY_K, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=_F32,
                                precision=jax.lax.Precision.HIGHEST)

                        s0, s1, s2 = mm(dm, 0), mm(dm, 1), mm(dm, 2)
                        tn = mm(o1, 3)
                        den = s0 + s1 + s2       # = n·d (MT determinant)
                        inv = jnp.reciprocal(den)
                        tt = tn * inv
                        ok = ((jnp.abs(den) >= _DET_EPS) & (tt >= t_min)
                              & (tt < t_best)
                              & (s0 * inv >= t_min) & (s1 * inv >= t_min)
                              & (s2 * inv >= t_min))
                        tm = jnp.where(ok, tt, _INF)
                        t_chunk = jnp.min(tm, axis=1, keepdims=True)
                        # gid rides the combined table's row 28 (tcol
                        # row 4).
                        isel = jnp.min(
                            jnp.where(tm == t_chunk,
                                      sc[3 * RAY_K + 4:3 * RAY_K + 5, :],
                                      _INF),
                            axis=1, keepdims=True)
                        upd = t_chunk < t_best
                        t_out[rows, :] = jnp.where(upd, t_chunk, t_best)
                        idx_out[rows, :] = jnp.where(upd, isel, idx_best)

    return kernel


def _sweep_round_resident(ray_dm, ray_o1, t_best, idx_best, sos, isf, vg,
                          ids, bx, etab, t_min: float, interpret: bool):
    """One compacted SPAN round with VMEM-resident tables (see
    :func:`_sweep_kernel_resident`).  ``sos [B]`` routes each grid step
    to a span of TPG consecutive tiles; ``vg [B*TPG]`` and ``ids
    [B*TPG*step_c]`` carry per-tile sub-block counts / chunk ids; ``bx
    [(C+1)*6]`` is the flat chunk AABB table (min xyz, max xyz per
    chunk, degenerate +BIG for the dummy row) for the in-kernel gate."""
    n_pad = ray_dm.shape[0]
    b_steps = sos.shape[0]
    kc = CHUNKS_PER_STEP * TRI_CHUNK

    def by_span(kind):
        return pl.BlockSpec(
            kind, lambda s, sos_ref, isf_ref, vg_ref, ids_ref, bx_ref:
            (sos_ref[s], 0), memory_space=pltpu.VMEM)

    # The table must be a CONSTANT-index block, not a bare whole-array
    # spec: with no index map the pipeline re-DMAs the whole table every
    # grid step (measured: 2048 steps x 10.5 MB = 21 GB ~= the entire
    # sweep time); a constant block index engages the revisited-block
    # logic and the table is fetched once.
    whole = pl.BlockSpec(
        etab.shape, lambda s, sos_ref, isf_ref, vg_ref, ids_ref, bx_ref:
        (0, 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b_steps,),
        in_specs=[by_span((TPG * TILE, RAY_K)),
                  by_span((TPG * TILE, RAY_K)),
                  by_span((TPG * TILE, 1)), by_span((TPG * TILE, 1)),
                  whole],
        out_specs=(by_span((TPG * TILE, 1)), by_span((TPG * TILE, 1))),
        scratch_shapes=[pltpu.VMEM((4 * RAY_K, kc), _F32)],
    )
    out_shape = jax.ShapeDtypeStruct((n_pad, 1), _F32)
    return pl.pallas_call(
        _sweep_kernel_resident(t_min),
        grid_spec=grid_spec,
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(sos, isf, vg.reshape(-1), ids.reshape(-1), bx, ray_dm, ray_o1,
      t_best, idx_best, etab)


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
                ok = ((jnp.abs(den) >= _DET_EPS) & (tt >= t_min)
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

    # Coherence sort: balanced 6-D Morton key (direction-major), with
    # rays that can do no work — retired lanes (negative t_best0 from
    # kernels/hit.py) and rays that miss the mesh ROOT box — forced to
    # the max key, packing into zero-work tiles at the END so the prefix
    # tiers and the compacted sweep queue never serve them.  Round 4 used
    # the per-ray FRONT superchunk as the major key; that cost a dense
    # [rays x superchunks] slab pass (~3-4 ms of the ~11 ms flat cull the
    # round-4 verdict flagged) and measured no better than Morton+root
    # once the cull itself went tile-granular, because the interval cull
    # only needs tiles to be COMPACT, not need-aligned.  The root test is
    # ONE exact slab per ray, so the "provably all-miss" tail contract of
    # the prefix tiers is unchanged.
    diam = scene_diam(origin, cmin, cmax)
    t_cap0 = jnp.minimum(t_best0, diam)
    root_lo, root_hi = jnp.min(cmin, axis=0), jnp.max(cmax, axis=0)
    iv0 = _inv_dir(direction)
    rlo = jnp.full((n,), -_INF)
    rhi = jnp.full((n,), _INF)
    for ax in range(3):
        t0 = (root_lo[ax] - origin[:, ax]) * iv0[:, ax]
        t1 = (root_hi[ax] - origin[:, ax]) * iv0[:, ax]
        rlo = jnp.maximum(rlo, jnp.minimum(t0, t1))
        rhi = jnp.minimum(rhi, jnp.maximum(t0, t1))
    live = (rhi >= jnp.maximum(rlo, 0.0)) & (rlo <= t_cap0)
    morton = _morton_key6d(origin, direction, bvh.mins[0], bvh.maxs[0])
    key = jnp.where(live, morton.astype(jnp.uint32),
                    np.uint32(0xFFFFFFFF))
    # Apply the sort by riding the ray data through lax.sort as payload
    # operands: a [N] gather-by-permutation costs ~14 ns/row on this
    # hardware (measured 4.3 ms per [262k] column — the three gathers
    # were ~38 ms of a 143 ms frame) while the multi-operand sort is
    # ~0.3 ms.  The carried iota IS the permutation, used only for the
    # final scatter-back.
    (_, ox, oy, oz, dx_, dy_, dz_, tb_s, perm) = jax.lax.sort(
        [key, origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2], t_best0,
         jnp.arange(n, dtype=jnp.int32)], num_keys=1)
    o_s = jnp.stack([ox, oy, oz], axis=1)
    d_s = jnp.stack([dx_, dy_, dz_], axis=1)
    pad = n_pad - n
    # Padded lanes repeat the last ray's geometry (tile bounds stay tight)
    # with a negative bound, so they contribute no chunks anywhere.
    o_pad = jnp.concatenate([o_s, jnp.broadcast_to(o_s[-1:], (pad, 3))])
    d_pad = jnp.concatenate([d_s, jnp.broadcast_to(d_s[-1:], (pad, 3))])
    tb_pad = jnp.concatenate([tb_s, jnp.full((pad,), -_INF, _F32)])

    etab = (_combined_table(e0, e1, e2, tcol)
            if n_chunks <= RESIDENT_MAX_CHUNKS else None)

    # Sweep-width tiers for the pair-bin path: ABSOLUTE sizes shared by
    # every ray-prefix branch, so the pair kernel compiles a bounded
    # number of grid variants no matter which prefix runs.
    blk_pb = PAIRBIN_SLOT * PAIRBIN_SEGS
    pb_pad = PAIRBIN_SLOT * (-(-n_chunks // PAIR_G))
    pad_tiers = sorted({
        -(-(n_pad * PAIRBIN_K // f + pb_pad) // blk_pb) * blk_pb
        for f in (64, 16, 8, 4, 2, 1)})

    def cull_and_sweep(p: int):
        """Cull + sweep the first ``p`` SORTED rays; the tail is carried
        through untouched.

        The sort key forces every no-work ray (root-box miss / retired)
        to the max key, so a prefix covering ``n_live`` rays is exact —
        the tail is provably all-miss.  Tiering the whole cull+sweep
        onto the prefix is the frame-level win: deep bounces have most
        lanes retired or aimed off-mesh, yet the cull/emission passes
        otherwise still run at full width.

        Within a prefix, resident meshes dispatch between the tile-major
        sweep (coherent wavefronts — tight beams, small tile unions) and
        the single-shot pair-bin sweep (incoherent — per-ray candidates
        beat tile unions ~27x in slot count), judged by the worst tile's
        candidate count in the cheap beam-interval coarse pass.
        """
        o_p, d_p, tb_p = o_pad[:p], d_pad[:p], tb_pad[:p]
        ray_dm = jnp.concatenate(
            [d_p, jnp.cross(o_p, d_p), jnp.zeros((p, 2), _F32)], axis=1)
        ray_o1 = jnp.concatenate(
            [o_p, jnp.ones((p, 1), _F32), jnp.zeros((p, 4), _F32)],
            axis=1)

        def tile_branch():
            order, entry_sorted, count = chunk_cull(o_p, d_p, tb_p,
                                                    cmin, cmax)
            return _tile_sweep_rounds(order, entry_sorted, count, ray_dm,
                                      ray_o1, tb_p, e0, e1, e2, tcol,
                                      etab, cmin, cmax, t_min, interpret,
                                      n_chunks)

        if etab is not None and PAIR_DISPATCH_KMAX is not None:
            g = _superchunk_size(n_chunks)
            smin, smax = superchunk_boxes(cmin, cmax, g)
            iv_p = _inv_dir(d_p)
            t_cap_p = jnp.minimum(tb_p, diam)
            bounds = _tile_ray_bounds(o_p, d_p, iv_p, t_cap_p, p // TILE)
            ent_sc = _interval_slab_entries(bounds, smin, smax)
            kmax = jnp.max(jnp.sum(ent_sc < _BIG, axis=1))

            def pair_branch():
                return _pairbin_path(o_p, d_p, tb_p, ray_dm, ray_o1,
                                     etab, cmin, cmax, diam, t_min,
                                     pad_tiers, tile_branch, interpret)

            t_p, i_p = jax.lax.cond(
                kmax <= jnp.int32(PAIR_DISPATCH_KMAX),
                tile_branch, pair_branch)
        else:
            t_p, i_p = tile_branch()
        t_full = jnp.concatenate([t_p, tb_pad[p:, None]])
        i_full = jnp.concatenate(
            [i_p, jnp.full((n_pad - p, 1), -1.0, _F32)])
        return t_full, i_full

    step = TILE * CULL_BLOCK
    prefixes = [p for p in (n_pad // 8, n_pad // 4, n_pad // 2)
                if p >= step and p % step == 0]
    prefixes.append(n_pad)
    if len(prefixes) > 1:
        # Rays whose root-box slab test passed (retired lanes' negative
        # bound already fails it, so they never count).
        n_live = jnp.sum(live)
        branches = [functools.partial(cull_and_sweep, p)
                    for p in prefixes]
        tier = sum(jnp.int32(n_live > p) for p in prefixes[:-1])
        t, idx = jax.lax.switch(tier, branches)
    else:
        t, idx = cull_and_sweep(n_pad)
    # Scatter back through the inverse permutation.
    t_out = jnp.zeros((n,), _F32).at[perm].set(t[:n, 0])
    i_out = jnp.zeros((n,), _F32).at[perm].set(idx[:n, 0])
    return t_out, i_out.astype(jnp.int32)


def _tile_sweep_rounds(order, entry_sorted, count, ray_dm, ray_o1, tb_pad,
                       e0, e1, e2, tcol, etab, cmin, cmax, t_min: float,
                       interpret: bool, n_chunks: int):
    """Tile-major compacted-queue sweep rounds (the v2 sweep): serve each
    tile's front-to-back chunk list in grid steps routed by scalar
    prefetch, with per-round entry-vs-t_best termination.  The resident
    variant (tables in VMEM) routes SPANS of TPG consecutive tiles per
    grid step to amortize the ~3 us/step bookkeeping floor; the gather
    variant (big meshes) keeps one tile per step.  Returns
    ``(t [n_pad, 1], idx [n_pad, 1] f32)``."""
    n_pad = ray_dm.shape[0]
    n_tiles = n_pad // TILE
    resident = n_chunks <= RESIDENT_MAX_CHUNKS

    k = CHUNKS_PER_STEP
    subs = SUBS_PER_STEP
    step_c = k * subs                                 # chunks per tile-step
    kvec = jnp.arange(step_c, dtype=jnp.int32)
    dummy = np.int32(n_chunks)
    n_spans = n_tiles // TPG

    # Flat chunk AABB table for the resident kernel's in-kernel gate:
    # [min x,y,z, max x,y,z] per chunk plus a degenerate +BIG dummy row
    # (id n_chunks) whose slab test self-rejects.
    bx = jnp.concatenate(
        [jnp.concatenate([cmin, cmax], axis=1),
         jnp.full((1, 6), _BIG, _F32)]).reshape(-1)

    def cond(state):
        _, _, pos, limit = state
        return jnp.any(pos < limit)

    def recount(t_new, count_):
        """Round termination: drop trailing front-to-back chunks whose
        entry distance exceeds every ray's current best in the tile."""
        t_tile = jnp.max(t_new.reshape(n_tiles, TILE), axis=1)
        competitive = jnp.sum(entry_sorted <= t_tile[:, None],
                              axis=1).astype(jnp.int32)
        return jnp.minimum(count_, competitive)

    def make_round_span(b_steps):
      svec = jnp.arange(b_steps, dtype=jnp.int32)

      def body(state):
        t_best, idx_best, pos, limit = state
        need = jnp.maximum(limit - pos, 0)
        steps_t = -(-need // step_c)                  # [n_tiles]
        span_steps = jnp.max(steps_t.reshape(n_spans, TPG), axis=1)
        scum = jnp.cumsum(span_steps)
        served_end = jnp.minimum(scum[-1], b_steps)

        sos = jnp.searchsorted(scum, svec, side="right").astype(jnp.int32)
        real = svec < served_end
        sos_last = sos[jnp.maximum(served_end - 1, 0)]
        sos = jnp.where(real, jnp.minimum(sos, n_spans - 1), sos_last)
        scum_before = jnp.where(sos > 0, scum[jnp.maximum(sos - 1, 0)], 0)
        local = svec - scum_before                    # round within span
        tids = sos[:, None] * TPG + jnp.arange(TPG, dtype=jnp.int32)[None]
        start = pos[tids] + local[:, None] * step_c   # [B, TPG]
        idxs = jnp.minimum(start[..., None] + kvec[None, None],
                           order.shape[1] - 1)        # [B, TPG, step_c]
        ids = order[tids[..., None], idxs]
        chunk_pos = local[:, None, None] * step_c + kvec[None, None]
        over = chunk_pos >= need[tids][..., None]
        ids = jnp.where(real[:, None, None] & ~over, ids, dummy)
        isf = (real & ((svec == 0) | (sos != jnp.roll(sos, 1)))
               ).astype(jnp.int32)
        rem = jnp.clip(need[tids] - local[:, None] * step_c, 0, step_c)
        vg = jnp.where(real[:, None], -(-rem // k), 0).astype(jnp.int32)

        t_new, i_new = _sweep_round_resident(
            ray_dm, ray_o1, t_best, idx_best, sos, isf, vg, ids, bx,
            etab, t_min, interpret)

        scum_prev = jnp.concatenate([jnp.zeros((1,), scum.dtype),
                                     scum[:-1]])
        span_served = jnp.clip(jnp.minimum(scum, served_end) - scum_prev,
                               0, span_steps)         # [n_spans]
        served_tile = jnp.minimum(jnp.repeat(span_served, TPG), steps_t)
        pos = pos + served_tile * step_c
        # Unserved spans' output blocks are never written — keep carry.
        touched = jnp.broadcast_to(
            (span_served > 0)[:, None], (n_spans, TPG * TILE)
        ).reshape(n_pad, 1)
        t_new = jnp.where(touched, t_new, t_best)
        i_new = jnp.where(touched, i_new, idx_best)
        return t_new, i_new, pos, recount(t_new, count)

      return body

    def make_round_tile(b_steps):
      svec = jnp.arange(b_steps, dtype=jnp.int32)

      def body(state):
        t_best, idx_best, pos, limit = state
        need = jnp.maximum(limit - pos, 0)
        steps_t = -(-need // step_c)                  # [n_tiles]
        cum = jnp.cumsum(steps_t)
        served_end = jnp.minimum(cum[-1], b_steps)

        # Step -> tile routing (compacted queue, sorted by tile).
        tos = jnp.searchsorted(cum, svec, side="right").astype(jnp.int32)
        real = svec < served_end
        tos_last = tos[jnp.maximum(served_end - 1, 0)]
        tos = jnp.where(real, jnp.minimum(tos, n_tiles - 1), tos_last)
        cum_before = jnp.where(tos > 0, cum[jnp.maximum(tos - 1, 0)], 0)
        local = svec - cum_before                     # step within tile
        start = pos[tos] + local * step_c
        idxs = jnp.minimum(start[:, None] + kvec[None],
                           order.shape[1] - 1)
        ids = order[tos[:, None], idxs]               # [B, SUBS*K]
        chunk_pos = local[:, None] * step_c + kvec[None]
        over = chunk_pos >= need[tos][:, None]
        ids = jnp.where(real[:, None] & ~over, ids, dummy)
        isf = (real & ((svec == 0) | (tos != jnp.roll(tos, 1)))
               ).astype(jnp.int32)
        # Valid sub-blocks per step: ceil(remaining-chunks-this-step / K).
        rem = jnp.clip(need[tos] - local * step_c, 0, step_c)
        vg = jnp.where(real, -(-rem // k), 0).astype(jnp.int32)

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
        return t_new, i_new, pos, recount(t_new, count)

      return body

    make_round = make_round_span if resident else make_round_tile
    width = n_spans if resident else n_tiles

    t0 = tb_pad[:, None]
    i0 = jnp.full((n_pad, 1), -1.0, _F32)
    pos0 = jnp.zeros((n_tiles,), jnp.int32)
    # Round 1 width is TIERED on the total queue length: an incoherent
    # wavefront needs several steps per tile, and serving it through one
    # width-n_tiles round plus narrow straggler rounds re-paid the
    # per-round XLA queue/recount cost and the grid floor every time
    # (measured: the resident bounce-like probe spent most of its 127 ms
    # in ~14 straggler rounds; the 327k GATHER bounce probe needed ~13k
    # steps = ~44 rounds at the old 1/8 straggler width, 330 ms).  A
    # 2x-width round serves most of the queue in ONE launch — the widest
    # tier is capped by SMEM: the scalar-prefetched chunk queue costs
    # b_steps x 32 x 4 B and SMEM is 1 MB/core (a 4x width at 512^2 =
    # 8192 steps = a 1 MB ids array alone).  Gather-path rounds also
    # materialize per-step tables XLA-side (width x 128 KB HBM — ~512 MB
    # at the 2x tier, a few ms of traffic, well under HBM capacity).
    state = (t0, i0, pos0, count)
    steps_needed = jnp.sum(-(-count // step_c))
    widths = [width, 2 * width]
    branches = [make_round(w) for w in widths]
    tier = sum(jnp.int32(steps_needed > w) for w in widths[:-1])
    state = jax.lax.cond(
        cond(state),
        lambda s: jax.lax.switch(tier, branches, s),
        lambda s: s, state)
    # Straggler rounds at reduced budget: a full-width round costs its
    # grid's ~1.1 us/step bookkeeping floor even when nearly every step
    # is a no-op, so leftover tiles must not re-pay the whole width.
    # The gather path stragglers at width/2, not width/4: big-mesh
    # incoherent wavefronts carry several steps/tile past round 1.
    straggler = max(width // 4 if resident else width // 2, 64)
    t, idx, _, _ = jax.lax.while_loop(cond, make_round(straggler), state)
    return t, idx


# ------------------------------------------------------------ pair-bin sweep
# Ray-major single-shot traversal for INCOHERENT wavefronts (the round-5
# production path; round-4's round-looped pair sweep below is kept as the
# recorded earlier experiment).  Measured motivation (tools/trav_stats.py,
# 82k tris, diffuse bounce): a ray needs mean 4.9 / p99 13 candidate
# chunks, while the tile-major sweep's 128-ray tile UNIONS average 72
# chunks — ~27x slot waste.  Design:
#
#   1. Per-ray hit BITMAP vs ~160 "pair-bin" AABBs (PAIR_G=4 consecutive
#      chunks per bin) — one dense exact slab pass, the only per-ray
#      full-width cost.
#   2. Fixed-width emission: pop the first PAIRBIN_K set bits per ray
#      (front-to-back order is NOT needed — the shot is single-pass, so
#      order only affects in-sweep t_best tightening, not correctness;
#      rays with more candidates than the budget fall back to the dense
#      tile path, checked exactly).
#   3. ONE payload sort by (bin, slot) — ray data rides as sort payloads
#      (gathers cost ~14 ns/row here; multi-operand sorts ~0.3 ms/M).
#   4. Gather-free padded-bin layout: the sorted bin column is
#      non-decreasing, so each pair's bin-start (cummax over boundary
#      positions) and the padding inserted before it (cumsum over
#      per-boundary pad) are pure vector ops — no searchsorted, no
#      small-table gathers (both measured expensive on this stack).
#   5. Pallas sweep: each 128-pair segment serves ONE bin = PAIR_G
#      chunks; an in-kernel per-chunk slab test against the segment's
#      128 rays skips chunks no ray needs, so bin granularity costs
#      little over exact chunk pairs while avoiding a second (8x wider)
#      emission sort.
#   6. Scatter back to [rays, K] slots (unique), reduce by row-min.
#
# Round-4's failure mode (45-70 ms/round of while-loop-resident XLA
# sort/scatter fusions) is structurally avoided: there is no round loop —
# every op runs exactly once per call at standalone fusion rates.
PAIR_G = 4        # chunks per pair-bin (candidate granularity)
PAIRBIN_K = 16    # candidate bins per ray (overflow -> dense fallback)
PAIRBIN_SLOT = 128   # pair rows per segment (one matmul row block)
PAIRBIN_SEGS = 4     # segments per pair-kernel grid step
# Tile-vs-pair dispatch threshold (worst tile's candidate-superchunk
# count in the beam-interval coarse pass).  ``None`` disables the pair
# branch entirely (the cond is not even traced): measured on a v5e chip
# at 512^2 / 82k tris, the single-shot pair-bin path runs 187 ms
# (coherent) to 427 ms (bounce-like) against the tile sweep's 13-105 ms —
# the K-wide emission sort (n*K rows x 11 operands) plus the per-segment
# predicated table copies dominate.  Kept as a tested, forced-dispatch
# API (tests/test_pallas.py::test_pairbin_traversal_matches_jnp_walk)
# and a documented negative result, like :func:`pair_closest_hit`.
PAIR_DISPATCH_KMAX = None


def _popcount(bits):
    """Per-row popcount of a ``[n, W]`` u32 bitmap."""
    x = bits
    c55 = np.uint32(0x55555555)
    c33 = np.uint32(0x33333333)
    c0f = np.uint32(0x0F0F0F0F)
    x = x - ((x >> np.uint32(1)) & c55)
    x = (x & c33) + ((x >> np.uint32(2)) & c33)
    x = (x + (x >> np.uint32(4))) & c0f
    per_word = (x * np.uint32(0x01010101)) >> np.uint32(24)
    return jnp.sum(per_word.astype(jnp.int32), axis=1)


def _ray_bits_dense(origin, iv, t_cap, bmin, bmax):
    """Per-ray hit bitmap ``[n_pad, M//32]`` vs a dense box set (M a
    multiple of 32; padding boxes must be degenerate ``+BIG`` points,
    which the slab test rejects).  Blocked so the ``[rows, M]``
    broadcast stays memory-bounded."""
    n_pad = origin.shape[0]
    rb = TILE * CULL_BLOCK // 2
    nb = n_pad // rb

    def block(carry, inp):
        o, ivb, tc = inp
        ent = _slab_entries(o, ivb, tc, bmin, bmax)
        return carry, _pack_bits(ent < _BIG)

    _, bits = jax.lax.scan(
        block, None, (origin.reshape(nb, rb, 3), iv.reshape(nb, rb, 3),
                      t_cap.reshape(nb, rb)))
    return bits.reshape(n_pad, bmin.shape[0] // 32)


def _pairbin_kernel(t_min: float, n_pb: int):
    """Binned pair sweep, one bin of PAIR_G chunks per 128-pair segment.

    Per segment: read the bin id from the scalar-prefetched queue
    (dummy = n_pb -> skip; the slots scatter to the overflow row so
    unwritten outputs are never consumed), seed each slot's running best
    with its ray's cap (dm column 6), then for each of the bin's PAIR_G
    chunks run an in-kernel slab test of the 128 rays against the chunk
    AABB (scalar-prefetched SMEM box table) and, only when some ray can
    still hit it, copy the chunk's combined table out of the resident
    VMEM table and run the Plücker MXU sweep.  Zero-initialized padding
    slots self-reject via cap = 0 < t_min.
    """
    t_min = np.float32(t_min)

    def kernel(bid_ref, bx_ref, dm_ref, o1_ref, tab_ref, t_out, i_out, sc):
        s = pl.program_id(0)
        for kseg in range(PAIRBIN_SEGS):
            bid = bid_ref[s * PAIRBIN_SEGS + kseg]

            @pl.when(bid < n_pb)
            def _(kseg=kseg, bid=bid):
                rows = slice(kseg * PAIRBIN_SLOT,
                             (kseg + 1) * PAIRBIN_SLOT)
                dm = dm_ref[rows, :]
                o1 = o1_ref[rows, :]
                tb = dm[:, 6:7]
                t_out[rows, :] = tb
                i_out[rows, :] = jnp.full_like(tb, _INF)
                ivs = []
                for ax in range(3):
                    dax = dm[:, ax:ax + 1]
                    ivs.append(jnp.where(dax >= 0.0, 1.0, -1.0)
                               / jnp.maximum(jnp.abs(dax),
                                             np.float32(1e-12)))
                for c in range(PAIR_G):
                    cid = bid * PAIR_G + c
                    t_cur0 = t_out[rows, :]
                    tlo = jnp.full_like(tb, -_INF)
                    thi = jnp.full_like(tb, _INF)
                    for ax in range(3):
                        bmn = bx_ref[cid * 6 + ax]
                        bmx = bx_ref[cid * 6 + 3 + ax]
                        t0 = (bmn - o1[:, ax:ax + 1]) * ivs[ax]
                        t1 = (bmx - o1[:, ax:ax + 1]) * ivs[ax]
                        tlo = jnp.maximum(tlo, jnp.minimum(t0, t1))
                        thi = jnp.minimum(thi, jnp.maximum(t0, t1))
                    hit = ((thi >= jnp.maximum(tlo, 0.0))
                           & (tlo <= t_cur0))

                    @pl.when(jnp.any(hit))
                    def _(cid=cid, rows=rows, dm=dm, o1=o1):
                        sc[:, :] = tab_ref[cid]

                        def mm(rays, r):
                            return jax.lax.dot_general(
                                rays, sc[r * RAY_K:(r + 1) * RAY_K, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=_F32,
                                precision=jax.lax.Precision.HIGHEST)

                        s0, s1, s2 = mm(dm, 0), mm(dm, 1), mm(dm, 2)
                        tn = mm(o1, 3)
                        den = s0 + s1 + s2
                        inv = jnp.reciprocal(den)
                        tt = tn * inv
                        t_cur = t_out[rows, :]
                        ok = ((jnp.abs(den) >= _DET_EPS) & (tt >= t_min)
                              & (tt < t_cur)
                              & (s0 * inv >= t_min) & (s1 * inv >= t_min)
                              & (s2 * inv >= t_min))
                        tm = jnp.where(ok, tt, _INF)
                        tc_ = jnp.min(tm, axis=1, keepdims=True)
                        isel = jnp.min(
                            jnp.where(tm == tc_,
                                      sc[3 * RAY_K + 4:3 * RAY_K + 5, :],
                                      _INF),
                            axis=1, keepdims=True)
                        upd = tc_ < t_cur
                        t_out[rows, :] = jnp.where(upd, tc_, t_cur)
                        i_out[rows, :] = jnp.where(upd, isel,
                                                   i_out[rows, :])

    return kernel


def _pairbin_sweep(pair_dm, pair_o1, seg_bid, boxes_flat, etab,
                   t_min: float, n_pb: int, interpret: bool):
    p_pad = pair_dm.shape[0]
    blk = PAIRBIN_SLOT * PAIRBIN_SEGS
    grid = (p_pad // blk,)

    def lane():
        return pl.BlockSpec((blk, RAY_K), lambda i, b_ref, x_ref: (i, 0),
                            memory_space=pltpu.VMEM)

    out = pl.BlockSpec((blk, 1), lambda i, b_ref, x_ref: (i, 0),
                       memory_space=pltpu.VMEM)
    tab = pl.BlockSpec(etab.shape, lambda i, b_ref, x_ref: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[lane(), lane(), tab],
        out_specs=(out, out),
        scratch_shapes=[pltpu.VMEM((4 * RAY_K, TRI_CHUNK), _F32)],
    )
    osh = jax.ShapeDtypeStruct((p_pad, 1), _F32)
    return pl.pallas_call(
        _pairbin_kernel(t_min, n_pb),
        grid_spec=grid_spec,
        out_shape=(osh, osh),
        interpret=interpret,
    )(seg_bid, boxes_flat, pair_dm, pair_o1, etab)


def _pairbin_path(o_pad, d_pad, tb_pad, ray_dm, ray_o1, etab, cmin, cmax,
                  diam, t_min: float, pad_tiers, fallback, interpret):
    """Single-shot ray-major pair-bin traversal (module comment above).

    ``pad_tiers``: static padded-pair-array sizes for the sweep's
    ``lax.switch`` (absolute, shared across ray-prefix tiers so the
    kernel compiles a bounded number of grid variants).  ``fallback``:
    thunk returning the dense tile-path result, taken when some ray's
    candidate-bin count exceeds PAIRBIN_K (exact check).  Returns
    ``(t [n_pad, 1], idx [n_pad, 1] f32)`` like
    :func:`_tile_sweep_rounds`.
    """
    n_pad = o_pad.shape[0]
    n_chunks = cmin.shape[0]
    n_pb = -(-n_chunks // PAIR_G)
    k = PAIRBIN_K
    iv = _inv_dir(d_pad)
    t_cap = jnp.minimum(tb_pad, diam)

    # Bin AABBs (+BIG/-BIG padding keeps partial bins tight); the bitmap
    # width pads to a 32-multiple with degenerate +BIG point boxes the
    # slab test rejects outright.
    pbmin, pbmax = superchunk_boxes(cmin, cmax, PAIR_G)
    w32 = -(-n_pb // 32) * 32
    pbmin_p = jnp.pad(pbmin, ((0, w32 - n_pb), (0, 0)),
                      constant_values=_BIG)
    pbmax_p = jnp.pad(pbmax, ((0, w32 - n_pb), (0, 0)),
                      constant_values=_BIG)
    bits = _ray_bits_dense(o_pad, iv, t_cap, pbmin_p, pbmax_p)
    overflow = jnp.max(_popcount(bits)) > k

    def emit():
        cands = []
        b = bits
        for _ in range(k):
            p, b = _pop_first_bit(b)
            cands.append(p)
        cand = jnp.stack(cands, axis=1)              # [n_pad, K]
        valid = cand < n_pb

        slot_bits = max((n_pad * k - 1).bit_length(), 1)
        bin_bits = max(int(n_pb).bit_length(), 1)
        assert slot_bits + bin_bits <= 31, (
            f"pair-bin key overflow: {n_pad} rays x {k} x {n_pb} bins")
        slot = (jnp.arange(n_pad, dtype=jnp.uint32)[:, None]
                * np.uint32(k)
                + jnp.arange(k, dtype=jnp.uint32)[None])
        key_max = np.uint32(0xFFFFFFFF)
        keys = jnp.where(
            valid,
            (cand.astype(jnp.uint32) << np.uint32(slot_bits)) | slot,
            key_max).reshape(-1)

        def bc(col):
            return jnp.broadcast_to(col[:, None], (n_pad, k)).reshape(-1)

        pay = ([bc(ray_dm[:, c]) for c in range(6)] + [bc(t_cap)]
               + [bc(o_pad[:, c]) for c in range(3)])
        sorted_ops = jax.lax.sort([keys] + pay, num_keys=1)
        ks = sorted_ops[0]
        p0 = ks.shape[0]
        validk = ks != key_max
        b_sorted = (ks >> np.uint32(slot_bits)).astype(jnp.int32)

        # Gather-free padded-bin layout: b_sorted is non-decreasing over
        # the valid prefix, so each pair's bin start and the padding
        # accumulated before its bin are cummax/cumsum over boundary
        # flags — no searchsorted, no index lookups.
        pos = jnp.arange(p0, dtype=jnp.int32)
        first = validk & ((pos == 0)
                          | (b_sorted != jnp.roll(b_sorted, 1)))
        start_self = jax.lax.cummax(jnp.where(first, pos, 0))
        prev_start = jnp.where(pos > 0, jnp.roll(start_self, 1), 0)
        pad_here = jnp.where(
            first & (pos > 0),
            (-(pos - prev_start)) % PAIRBIN_SLOT, 0)
        dest0 = pos + jnp.cumsum(pad_here)
        counts = jnp.zeros((n_pb + 1,), jnp.int32).at[
            jnp.minimum(b_sorted, n_pb)].add(validk.astype(jnp.int32))
        padded_total = jnp.sum(
            -(-counts[:n_pb] // PAIRBIN_SLOT) * PAIRBIN_SLOT)

        slot_mask = np.uint32((1 << slot_bits) - 1)
        nk = n_pad * k

        def tier(p_pad: int):
            dest = jnp.where(validk & (dest0 < p_pad), dest0, p_pad)

            def scat(col, init):
                return jnp.full((p_pad + 1,), init,
                                col.dtype).at[dest].set(col)[:p_pad]

            cols = [scat(sorted_ops[1 + c], np.float32(0.0))
                    for c in range(10)]
            zero_p = jnp.zeros((p_pad,), _F32)
            one_p = jnp.ones((p_pad,), _F32)
            pair_dm = jnp.stack(cols[:7] + [zero_p], axis=1)
            pair_o1 = jnp.stack(cols[7:10] + [one_p] + [zero_p] * 4,
                                axis=1)
            slot_col = jnp.where(validk,
                                 (ks & slot_mask).astype(jnp.int32),
                                 np.int32(nk))
            pslot = scat(slot_col, np.int32(nk))
            binp = scat(jnp.where(validk, b_sorted, np.int32(n_pb)),
                        np.int32(n_pb))
            seg_bid = binp[::PAIRBIN_SLOT]

            cpb = n_pb * PAIR_G
            bx = jnp.pad(cmin, ((0, cpb - n_chunks), (0, 0)),
                         constant_values=_BIG)
            bX = jnp.pad(cmax, ((0, cpb - n_chunks), (0, 0)),
                         constant_values=_BIG)
            boxes_flat = jnp.concatenate([bx, bX], axis=1).reshape(-1)

            t_sl, i_sl = _pairbin_sweep(pair_dm, pair_o1, seg_bid,
                                        boxes_flat, etab, t_min, n_pb,
                                        interpret)
            t_nk = jnp.full((nk + 1,), _INF).at[pslot].set(
                t_sl[:, 0])[:nk].reshape(n_pad, k)
            i_nk = jnp.full((nk + 1,), _INF).at[pslot].set(
                i_sl[:, 0])[:nk].reshape(n_pad, k)
            j = jnp.argmin(t_nk, axis=1)
            t_new = jnp.take_along_axis(t_nk, j[:, None], axis=1)[:, 0]
            i_new = jnp.take_along_axis(i_nk, j[:, None], axis=1)[:, 0]
            # A pair slot with no triangle hit returns its seed cap
            # (min(t_best0, diam)) with isel = INF — the id check is
            # what distinguishes "found nothing" from a real hit below
            # the caller's bound.
            win = (i_new < _BIG) & (t_new < tb_pad)
            return (jnp.where(win, t_new, tb_pad)[:, None],
                    jnp.where(win, i_new, -1.0)[:, None])

        tiers = [t for t in pad_tiers if t < p0 + PAIRBIN_SLOT * n_pb]
        tiers.append(-(-(p0 + PAIRBIN_SLOT * n_pb)
                       // (PAIRBIN_SLOT * PAIRBIN_SEGS))
                     * (PAIRBIN_SLOT * PAIRBIN_SEGS))
        branches = [functools.partial(tier, t) for t in tiers]
        t_idx = sum(jnp.int32(padded_total > t) for t in tiers[:-1])
        return jax.lax.switch(t_idx, branches)

    return jax.lax.cond(overflow, fallback, emit)

PAIR_TIERS = (16, 64)  # candidate-superchunk budgets (lax.switch tiers)
PAIR_E = 2       # pairs emitted per ray per round
PAIR_SLOT = 128  # pair rows per chunk segment (one matmul row block)
PAIR_SEGS = 4    # chunk segments per pair-kernel grid step


def _pack_bits(hit):
    """``[n, kg]`` bool -> ``[n, kg//32]`` u32 (bit j of word w =
    candidate w*32+j)."""
    kg = hit.shape[-1]
    w = kg // 32
    weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    h = hit.reshape(hit.shape[0], w, 32).astype(jnp.uint32)
    return jnp.sum(h * weights[None, None, :], axis=-1, dtype=jnp.uint32)


def _pop_first_bit(bits):
    """Lowest set bit per row of ``[n, W]`` u32 words -> ``(pos [n] i32
    — W*32 when empty, bits with that bit cleared)``."""
    n, w = bits.shape
    nz = bits != 0
    anyb = jnp.any(nz, axis=1)
    wi = jnp.argmax(nz, axis=1).astype(jnp.int32)
    word = jnp.take_along_axis(bits, wi[:, None], axis=1)[:, 0]
    low = word & (jnp.uint32(0) - word)
    # Bit index via the f32 exponent field: u32->f32 of a single-bit
    # value is exact, and (bits >> 23) - 127 is pure integer math.
    # (jnp.log2 is NOT exact for powers of two on some backends —
    # 13 -> 12.9999 -> trunc 12 — which silently double-pops bits.)
    fbits = jax.lax.bitcast_convert_type(
        jnp.maximum(low, np.uint32(1)).astype(jnp.float32), jnp.uint32)
    bitpos = ((fbits >> np.uint32(23)).astype(jnp.int32) - 127)
    pos = jnp.where(anyb, wi * 32 + bitpos, np.int32(w * 32))
    cleared = word ^ low
    bits = jnp.where(jnp.arange(w, dtype=jnp.int32)[None, :] == wi[:, None],
                     cleared[:, None], bits)
    return pos, bits


def _fine_bits(origin, iv, t_cap, bmin, bmax, valid_c, n_tiles):
    """Per-ray candidate pass bitmaps ``[n_pad, kg//32]`` u32 — the same
    per-ray fine slab test as the tile cull, kept per ray instead of
    tile-reduced."""
    kg = bmin.shape[1]
    fb = 1
    while fb < 64 and fb * 2 * TILE * kg <= (1 << 21):
        fb *= 2
    nfb = n_tiles // fb

    def block(carry, inp):
        o, ivb, tc, bmn, bmx, vc = inp
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
        return carry, _pack_bits(hit.reshape(fb * TILE, kg))

    n_pad = origin.shape[0]
    _, bits = jax.lax.scan(
        block, None,
        (origin.reshape(nfb, fb, TILE, 3),
         iv.reshape(nfb, fb, TILE, 3),
         t_cap.reshape(nfb, fb, TILE),
         bmin.reshape(nfb, fb, kg, 3),
         bmax.reshape(nfb, fb, kg, 3),
         valid_c.reshape(nfb, fb, kg)))
    return bits.reshape(n_pad, kg // 32)


def _pair_kernel(t_min: float):
    """Binned pair sweep: each grid step serves PAIR_SEGS segments of
    PAIR_SLOT pair rows, every segment against ONE chunk's resident
    table.  No per-tile routing, no revisited outputs — a plain blocked
    pipeline (the per-step floor of the scalar-routed tile kernel came
    from exactly that machinery)."""
    t_min = np.float32(t_min)

    def kernel(cid_ref, dm_ref, o1_ref, tab_ref, t_out, i_out, sc):
        s = pl.program_id(0)

        def segment(kseg, cid):
            sc[:, :] = tab_ref[cid]
            rows = slice(kseg * PAIR_SLOT, (kseg + 1) * PAIR_SLOT)
            dm = dm_ref[rows, :]
            o1 = o1_ref[rows, :]

            def mm(rays, r):
                return jax.lax.dot_general(
                    rays, sc[r * RAY_K:(r + 1) * RAY_K, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=_F32,
                    precision=jax.lax.Precision.HIGHEST)

            s0, s1, s2 = mm(dm, 0), mm(dm, 1), mm(dm, 2)
            tn = mm(o1, 3)
            den = s0 + s1 + s2
            inv = jnp.reciprocal(den)
            tt = tn * inv
            # Per-slot t_best rides the ray vector's spare column 6 (the
            # e-tables' rows 6-7 are zero, so it never enters a product).
            tb = dm[:, 6:7]
            ok = ((jnp.abs(den) >= _DET_EPS) & (tt >= t_min) & (tt < tb)
                  & (s0 * inv >= t_min) & (s1 * inv >= t_min)
                  & (s2 * inv >= t_min))
            tm = jnp.where(ok, tt, _INF)
            tsl = jnp.min(tm, axis=1, keepdims=True)
            isel = jnp.min(
                jnp.where(tm == tsl,
                          sc[3 * RAY_K + 4:3 * RAY_K + 5, :], _INF),
                axis=1, keepdims=True)
            t_out[rows, :] = tsl
            i_out[rows, :] = isel

        for kseg in range(PAIR_SEGS):
            cid = cid_ref[s * PAIR_SEGS + kseg]

            # Dummy segments (padding slots / drained rounds) carry the
            # dummy chunk id: skip them outright — their slots scatter
            # to the overflow row, so unwritten outputs are never
            # consumed.
            @pl.when(cid < tab_ref.shape[0] - 1)
            def _(kseg=kseg, cid=cid):
                segment(kseg, cid)

    return kernel


def _pair_sweep(pair_dm, pair_o1, seg_cid, etab, t_min: float,
                interpret: bool):
    p_pad = pair_dm.shape[0]
    blk = PAIR_SLOT * PAIR_SEGS
    grid = (p_pad // blk,)

    def lane():
        return pl.BlockSpec((blk, RAY_K), lambda i, c_ref: (i, 0),
                            memory_space=pltpu.VMEM)

    out = pl.BlockSpec((blk, 1), lambda i, c_ref: (i, 0),
                       memory_space=pltpu.VMEM)
    tab = pl.BlockSpec(etab.shape, lambda i, c_ref: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[lane(), lane(), tab],
        out_specs=(out, out),
        scratch_shapes=[pltpu.VMEM((4 * RAY_K, TRI_CHUNK), _F32)],
    )
    osh = jax.ShapeDtypeStruct((p_pad, 1), _F32)
    return pl.pallas_call(
        _pair_kernel(t_min),
        grid_spec=grid_spec,
        out_shape=(osh, osh),
        interpret=interpret,
    )(seg_cid, pair_dm, pair_o1, etab)


@functools.partial(jax.jit,
                   static_argnames=("t_min", "n_tris", "interpret"))
def pair_closest_hit(origin, direction, bvh: FlatBVH, tris_packed,
                     t_best0, t_min: float, n_tris: int,
                     interpret: bool = False):
    """Closest triangle hit per ray via the ray-major pair sweep.

    Same contract as :func:`tile_closest_hit`.  Tier-gated by
    ``lax.switch`` on the worst tile's candidate-superchunk count
    (PAIR_TIERS budgets); past the last tier it falls back to the
    tile-major dense sweep, whose lists are unbounded.

    Status: measured NEGATIVE result on v5e — see :func:`closest_hit`
    for the numbers; kept with parity tests as the recorded experiment.
    """
    e0, e1, e2, tcol, cmin, cmax = tris_packed
    n_chunks = int(cmin.shape[0])
    n = origin.shape[0]
    n_pad = -(-n // (TILE * CULL_BLOCK)) * (TILE * CULL_BLOCK)
    n_tiles = n_pad // TILE
    g = _superchunk_size(n_chunks)
    n_sc = -(-n_chunks // g)

    # --- shared prep: lead-superchunk sort (see tile_closest_hit).
    smin, smax = superchunk_boxes(cmin, cmax, g)
    diam = scene_diam(origin, cmin, cmax)
    lead = lead_superchunk(origin, direction,
                           jnp.minimum(t_best0, diam), smin, smax)
    morton = _morton_key6d(origin, direction, bvh.mins[0], bvh.maxs[0])
    key = ((lead.astype(jnp.uint32) << np.uint32(24))
           | (morton.astype(jnp.uint32) >> np.uint32(6)))
    # Payload sort, not argsort+gather — see tile_closest_hit.
    (_, ox, oy, oz, dx_, dy_, dz_, tb_s, perm) = jax.lax.sort(
        [key, origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2], t_best0,
         jnp.arange(n, dtype=jnp.int32)], num_keys=1)
    o_s = jnp.stack([ox, oy, oz], axis=1)
    d_s = jnp.stack([dx_, dy_, dz_], axis=1)
    pad = n_pad - n
    o_pad = jnp.concatenate([o_s, jnp.broadcast_to(o_s[-1:], (pad, 3))])
    d_pad = jnp.concatenate([d_s, jnp.broadcast_to(d_s[-1:], (pad, 3))])
    tb_pad = jnp.concatenate([tb_s, jnp.full((pad,), -_INF, _F32)])
    iv = _inv_dir(d_pad)
    t_cap = jnp.minimum(tb_pad, diam)

    # --- coarse: per-tile candidate superchunks, front-to-back.
    sc_ent = _tile_entries(o_pad, iv, t_cap, smin, smax, n_tiles)
    sc_order, sc_ent_sorted, sc_count = _front_to_back_sort(
        sc_ent, n_sc, diam)
    kmax = jnp.max(sc_count)

    ray_dm = jnp.concatenate(
        [d_pad, jnp.cross(o_pad, d_pad), jnp.zeros((n_pad, 2), _F32)],
        axis=1)
    ray_o1 = jnp.concatenate(
        [o_pad, jnp.ones((n_pad, 1), _F32), jnp.zeros((n_pad, 4), _F32)],
        axis=1)
    etab = _combined_table(e0, e1, e2, tcol)

    # Candidate budgets: lax.switch tiers so coherent workloads (few
    # candidate superchunks per tile) pay a narrow per-ray fine-bits
    # pass while incoherent ones get a wide-enough candidate list; the
    # dense tile-major sweep remains the fallback past the last tier.
    # Pair tiers need the whole combined table resident in VMEM — past
    # RESIDENT_MAX_CHUNKS the ~(C+1)*16KB table would fail to fit at
    # compile time, so large meshes go straight to the dense fallback.
    tiers = ([k for k in PAIR_TIERS if k < n_sc + 4]
             if n_chunks <= RESIDENT_MAX_CHUNKS else [])

    cmin_d = jnp.concatenate([cmin, jnp.full((1, 3), _BIG)])
    cmax_d = jnp.concatenate([cmax, jnp.full((1, 3), -_BIG)])

    n_pairs = n_pad * PAIR_E
    slot_bits = max((n_pairs - 1).bit_length(), 1)
    assert slot_bits + max(int(n_chunks).bit_length(), 1) <= 32, (
        "pair key overflow: too many rays x chunks for one u32 key")
    slot_mask = np.uint32((1 << slot_bits) - 1)
    blk = PAIR_SLOT * PAIR_SEGS
    p_pad_pairs = -(-(n_pairs + PAIR_SLOT * n_chunks) // blk) * blk
    tile_of = (jnp.arange(n_pad, dtype=jnp.int32) // TILE)
    key_max = np.uint32(0xFFFFFFFF)

    def pair_branch(k_budget):
        # Round k_budget so the bitmap width k_pair*g is a 32-multiple.
        k_pair = min(k_budget, -(-n_sc // 4) * 4)
        kg = k_pair * g
        assert kg % 32 == 0

        cand = sc_order[:, :k_pair]                   # [T, k], dummy = S
        if cand.shape[1] < k_pair:                    # n_sc < k_pair
            cand = jnp.pad(cand, ((0, 0), (0, k_pair - cand.shape[1])),
                           constant_values=n_sc)
        cids = (jnp.minimum(cand, n_sc - 1)[:, :, None] * g
                + jnp.arange(g, dtype=jnp.int32)[None, None])
        cids = jnp.where(cand[:, :, None] < n_sc,
                         jnp.minimum(cids, n_chunks - 1),
                         np.int32(n_chunks)).reshape(n_tiles, kg)
        bmin = cmin_d[cids]
        bmax = cmax_d[cids]
        valid_c = cids < n_chunks
        bits0 = _fine_bits(o_pad, iv, t_cap, bmin, bmax, valid_c, n_tiles)
        # Monotone per-position entry bound: the candidate's SUPERCHUNK
        # coarse entry (repeated g times) — non-decreasing along the
        # list, so "next entry > t_best" is an exact front-to-back stop.
        ent_sc = sc_ent_sorted[:, :k_pair]
        if ent_sc.shape[1] < k_pair:
            ent_sc = jnp.pad(ent_sc,
                             ((0, 0), (0, k_pair - ent_sc.shape[1])),
                             constant_values=_INF)
        ent_flat = jnp.repeat(ent_sc, g, axis=1).reshape(-1)
        cids_flat = cids.reshape(-1)

        def cond(state):
            bits, _, _ = state
            return jnp.any(bits != 0)

        def body(state):
            bits, t_best, ibest = state
            pos0, bits1 = _pop_first_bit(bits)
            gidx = tile_of * kg + jnp.minimum(pos0, kg - 1)
            ent0 = ent_flat[gidx]
            act = (pos0 < kg) & (ent0 <= t_best)
            poss = [pos0]
            b = bits1
            for _ in range(PAIR_E - 1):
                p_e, b = _pop_first_bit(b)
                poss.append(p_e)
            bits = jnp.where(act[:, None], b, jnp.uint32(0))
            pos_arr = jnp.stack(poss, axis=1)         # [n_pad, E]
            valid = act[:, None] & (pos_arr < kg)
            cid_e = cids_flat[tile_of[:, None] * kg
                              + jnp.minimum(pos_arr, kg - 1)]
            slot = (jnp.arange(n_pad, dtype=jnp.uint32)[:, None]
                    * np.uint32(PAIR_E)
                    + jnp.arange(PAIR_E, dtype=jnp.uint32)[None])
            keys = jnp.where(
                valid,
                (cid_e.astype(jnp.uint32) << np.uint32(slot_bits)) | slot,
                key_max).reshape(-1)

            # Sort with the ray data riding along as payload operands —
            # a gather permutation costs ~10x a multi-operand sort +
            # scatter on this hardware (measured: 1M x 8 gather 14 ms,
            # 1M sort 0.09 ms, 1M scatter 0.2 ms).
            dm2 = ray_dm.at[:, 6].set(t_best)         # t_best -> col 6
            pay = [jnp.broadcast_to(dm2[:, c:c + 1],
                                    (n_pad, PAIR_E)).reshape(-1)
                   for c in range(7)]
            pay += [jnp.broadcast_to(o_pad[:, c:c + 1],
                                     (n_pad, PAIR_E)).reshape(-1)
                    for c in range(3)]
            sorted_ops = jax.lax.sort([keys] + pay, num_keys=1)
            keys_sorted = sorted_ops[0]

            # Padded-bin layout: bins (one per chunk) rounded up to
            # PAIR_SLOT rows so every kernel segment is single-chunk.
            probes = (jnp.arange(n_chunks + 1, dtype=jnp.uint32)
                      << np.uint32(slot_bits))
            bounds = jnp.searchsorted(keys_sorted, probes).astype(
                jnp.int32)                            # [C+1]
            counts = jnp.diff(bounds)
            pcounts = -(-counts // PAIR_SLOT) * PAIR_SLOT
            pstart = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(pcounts)])
            shift = pstart[:-1] - bounds[:-1]         # pad before bin c
            cid_s = (keys_sorted >> np.uint32(slot_bits)).astype(
                jnp.int32)
            validk = keys_sorted != key_max
            dest = jnp.where(
                validk,
                jnp.arange(n_pairs, dtype=jnp.int32)
                + shift[jnp.clip(cid_s, 0, n_chunks - 1)],
                np.int32(p_pad_pairs))                # overflow row

            def scat(col, init):
                return jnp.full((p_pad_pairs + 1,), init,
                                col.dtype).at[dest].set(col)[:p_pad_pairs]

            pcols = [scat(sorted_ops[1 + c], np.float32(0.0))
                     for c in range(10)]
            slot_col = jnp.where(
                validk, (keys_sorted & slot_mask).astype(jnp.int32),
                np.int32(n_pairs))
            pslot = scat(slot_col, np.int32(n_pairs))
            zero_p = jnp.zeros((p_pad_pairs,), _F32)
            one_p = jnp.ones((p_pad_pairs,), _F32)
            pair_dm = jnp.stack(pcols[:7] + [zero_p], axis=1)
            pair_o1 = jnp.stack(pcols[7:10] + [one_p] + [zero_p] * 4,
                                axis=1)
            seg_p = (jnp.arange(p_pad_pairs // PAIR_SLOT,
                                dtype=jnp.int32) * PAIR_SLOT)
            sb = jnp.searchsorted(pstart, seg_p, side="right") - 1
            seg_cid = jnp.where(
                seg_p < pstart[-1],
                jnp.clip(sb, 0, n_chunks - 1),
                np.int32(n_chunks)).astype(jnp.int32)

            t_sl, i_sl = _pair_sweep(pair_dm, pair_o1, seg_cid, etab,
                                     t_min, interpret)
            # Unique slots per round: plain scatter back to (ray, e).
            t_e = jnp.full((n_pairs + 1,), _INF).at[pslot].set(
                t_sl[:, 0])[:n_pairs].reshape(n_pad, PAIR_E)
            i_e = jnp.full((n_pairs + 1,), _INF).at[pslot].set(
                i_sl[:, 0])[:n_pairs].reshape(n_pad, PAIR_E)
            e_best = jnp.argmin(t_e, axis=1)
            t_new = jnp.take_along_axis(t_e, e_best[:, None], axis=1)[:, 0]
            i_new = jnp.take_along_axis(i_e, e_best[:, None], axis=1)[:, 0]
            win = t_new < t_best
            t_best = jnp.where(win, t_new, t_best)
            ibest = jnp.where(win, i_new, ibest)
            return bits, t_best, ibest

        ib0 = jnp.full((n_pad,), -1.0, _F32)
        bits, t_best, ibest = jax.lax.while_loop(
            cond, body, (bits0, tb_pad, ib0))
        return t_best[:, None], ibest[:, None]

    def dense_branch():
        order, ent_s, count = chunk_cull(o_pad, d_pad, tb_pad, cmin, cmax)
        return _tile_sweep_rounds(order, ent_s, count, ray_dm, ray_o1,
                                  tb_pad, e0, e1, e2, tcol, etab, cmin,
                                  cmax, t_min, interpret, n_chunks)

    branches = [functools.partial(pair_branch, kb) for kb in tiers]
    branches.append(dense_branch)
    tier_idx = sum(jnp.int32(kmax > min(kb, -(-n_sc // 4) * 4))
                   for kb in tiers)
    t, idx = jax.lax.switch(tier_idx, branches)
    t_out = jnp.zeros((n,), _F32).at[perm].set(t[:n, 0])
    i_out = jnp.zeros((n,), _F32).at[perm].set(idx[:n, 0])
    return t_out, i_out.astype(jnp.int32)


def closest_hit(origin, direction, bvh: FlatBVH, tris_packed, t_best0,
                t_min: float, n_tris: int, interpret: bool = False):
    """Dispatch to the production traversal.

    The tile-major sweep wins on this hardware.  The ray-major pair
    sweep above (:func:`pair_closest_hit`) eliminates ~15x of the
    tile-union slot waste on incoherent wavefronts IN SLOT COUNT, but
    measured end-to-end it LOSES: every emission round moves the pair
    set through XLA sort/scatter/broadcast fusions that cost ~45-70 ms
    per round at 512^2 on a v5e chip (vs 0.2-0.4 ms for the same ops in
    isolation at 1M elements — the while-loop-resident fusion forms are
    element-rate-bound), and the candidate gate's conservative tile-level
    entries keep rays alive for ~10 rounds.  Kept (with parity tests) as
    a documented negative result; a future fused Pallas
    emission/binning kernel could revive it."""
    return tile_closest_hit(origin, direction, bvh, tris_packed, t_best0,
                            t_min=t_min, n_tris=n_tris,
                            interpret=interpret)
