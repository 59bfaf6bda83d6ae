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


def chunk_cull(origin, direction, t_best0, cmin, cmax):
    """Front-to-back per-tile chunk lists from exact per-ray slab tests.

    Args:
      origin, direction: ``[n_pad, 3]`` Morton-sorted rays, ``n_pad`` a
        multiple of TILE (padded lanes repeat a real ray).
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

    # Parametric reach cap: the farthest any ray must travel to exit the
    # union of its origin and the scene box (unit directions, so the
    # union diameter bounds any in-scene hit parameter).
    root_lo = jnp.min(cmin, axis=0)
    root_hi = jnp.max(cmax, axis=0)
    u_lo = jnp.minimum(root_lo, jnp.min(origin, axis=0))
    u_hi = jnp.maximum(root_hi, jnp.max(origin, axis=0))
    diam = jnp.sqrt(jnp.sum((u_hi - u_lo) ** 2)) * np.float32(1.001)
    t_cap = jnp.minimum(t_best0, diam)              # [n_pad]

    sd = jnp.where(direction >= 0.0, 1.0, -1.0)
    inv = sd / jnp.maximum(jnp.abs(direction), 1e-12)

    n_blocks = -(-n_tiles // CULL_BLOCK)
    o_b = origin.reshape(n_blocks, CULL_BLOCK * TILE, 3)
    i_b = inv.reshape(n_blocks, CULL_BLOCK * TILE, 3)
    tc_b = t_cap.reshape(n_blocks, CULL_BLOCK * TILE)

    def block(carry, inp):
        o, iv, tc = inp                             # [BT, 3], [BT], …
        # SoA slab test: per-axis broadcasts keep the minor dim = chunks
        # (a [.., C, 3] layout would pad the 3-axis to a full 128 lane).
        # f32 on purpose — a bf16 variant needs a conservative box margin
        # comparable to the chunk extent, and the resulting union growth
        # (measured 3x) costs the sweep far more than bf16 saves here.
        tlo = jnp.full((o.shape[0], n_chunks), -_INF)
        thi = jnp.full((o.shape[0], n_chunks), _INF)
        for ax in range(3):
            t0 = (cmin[None, :, ax] - o[:, ax:ax + 1]) * iv[:, ax:ax + 1]
            t1 = (cmax[None, :, ax] - o[:, ax:ax + 1]) * iv[:, ax:ax + 1]
            tlo = jnp.maximum(tlo, jnp.minimum(t0, t1))
            thi = jnp.minimum(thi, jnp.maximum(t0, t1))
        ent = jnp.maximum(tlo, 0.0)
        hit = (thi >= ent) & (tlo <= tc[:, None])   # [BT, C]
        ent = jnp.where(hit, ent, _INF)
        ent = jnp.min(ent.reshape(CULL_BLOCK, TILE, n_chunks), axis=1)
        return carry, ent                           # [CULL_BLOCK, C]

    _, entry = jax.lax.scan(block, None, (o_b, i_b, tc_b))
    entry = entry.reshape(n_tiles, n_chunks)

    # Front-to-back order WITHOUT an argsort: quantize the entry distance
    # into the high bits of one i32 key, chunk id in the low bits, and
    # value-sort rows — half the data (and comparator work) of sorting
    # (key, index) pairs.  Quantization rounds DOWN, so the recovered
    # entry stays a lower bound (termination keeps at most a few extra
    # chunks competitive; correctness is unaffected).
    id_bits = max(int(n_chunks).bit_length(), 1)
    eb = 30 - id_bits
    q_max = np.int32((1 << eb) - 1)
    scale = (np.float32(q_max - 1) / np.float32(1.001)
             / jnp.maximum(diam, 1e-20))
    qe = jnp.clip((entry * scale).astype(jnp.int32), 0, q_max - 1)
    qe = jnp.where(entry < _BIG, qe, q_max)  # real entries are <= diam
    key = (qe << id_bits) | jnp.arange(n_chunks, dtype=jnp.int32)[None]
    key = jnp.sort(key, axis=1)
    qe_s = key >> id_bits
    valid = qe_s < q_max
    order = jnp.where(valid, key & np.int32((1 << id_bits) - 1),
                      np.int32(n_chunks))
    entry_sorted = jnp.where(valid, qe_s.astype(_F32) / scale, _INF)
    count = jnp.sum(valid, axis=1).astype(jnp.int32)

    step_c = CHUNKS_PER_STEP * SUBS_PER_STEP
    pad = -(-n_chunks // step_c) * step_c - n_chunks
    if pad:
        order = jnp.pad(order, ((0, 0), (0, pad)),
                        constant_values=n_chunks)
        entry_sorted = jnp.pad(entry_sorted, ((0, 0), (0, pad)),
                               constant_values=_INF)
    return order, entry_sorted, count


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

    # Coherence sort (see _morton_key6d), then pad by *repeating the last
    # ray* so tile bounds stay tight and padded lanes follow a real ray's
    # path (their hits are discarded).
    key = _morton_key6d(origin, direction, bvh.mins[0], bvh.maxs[0])
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
    b_steps = n_tiles        # round budget: one coherent frame = 1 round

    ray_dm = jnp.concatenate(
        [d_pad, jnp.cross(o_pad, d_pad), jnp.zeros((n_pad, 2), _F32)],
        axis=1)
    ray_o1 = jnp.concatenate(
        [o_pad, jnp.ones((n_pad, 1), _F32), jnp.zeros((n_pad, 4), _F32)],
        axis=1)

    k = CHUNKS_PER_STEP
    subs = SUBS_PER_STEP
    step_c = k * subs                                 # chunks per step
    svec = jnp.arange(b_steps, dtype=jnp.int32)
    kvec = jnp.arange(step_c, dtype=jnp.int32)[None]
    dummy = np.int32(n_chunks)

    def cond(state):
        _, _, pos, limit = state
        return jnp.any(pos < limit)

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

        t_new, i_new = _sweep_round(ray_dm, ray_o1, t_best, idx_best,
                                    tos, isf, vg, ids, e0, e1, e2, tcol,
                                    t_min, interpret)
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

    t0 = tb_pad[:, None]
    i0 = jnp.full((n_pad, 1), -1.0, _F32)
    pos0 = jnp.zeros((n_tiles,), jnp.int32)
    t, idx, _, _ = jax.lax.while_loop(cond, body, (t0, i0, pos0, count))
    # Scatter back through the inverse permutation.
    t_out = jnp.zeros((n,), _F32).at[perm].set(t[:n, 0])
    i_out = jnp.zeros((n,), _F32).at[perm].set(idx[:n, 0])
    return t_out, i_out.astype(jnp.int32)
