"""Gather strategies tuned for TPU.

The integrator's per-lane table lookups (material params by ``material_id``,
winning-primitive fields by index — the WGSL code's ``materials[id]`` /
``spheres[i]`` subscripts, e.g. ``shaders/scatterRay.wgsl:2-9``,
``shaders/common.wgsl:239``) are *small-table, huge-index-vector* gathers:
a handful of rows indexed by millions of ray lanes.  XLA's generic gather
lowering on TPU serializes these (measured ~3 ms per gathered field per
bounce at 512x512 on v5e — 100x the elementwise cost of the whole bounce).

The TPU-native formulation is a one-hot contraction: build ``one_hot(idx)``
``[N, M]`` once per index vector and read every field as an ``[N, M] @
[M, C]`` matmul — dense MXU work with perfect lane utilization.  For small
``M`` this is orders of magnitude faster than the gather lowering; above
``ONE_HOT_MAX_ROWS`` we fall back to ``jnp.take`` (big tables like triangle
buffers want real gathers).

Integer fields ride the same matmul in f32 — exact for values < 2^24
(material ids, type enums), verified by tests.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

ONE_HOT_MAX_ROWS = 256


class TableGather:
    """Reusable one-hot gather for several fields sharing one index vector.

    >>> g = TableGather(idx, num_rows)     # idx: [N] int
    >>> centers = g(table_3)               # [M, 3] -> [N, 3]
    >>> radius = g(radius_1)               # [M]    -> [N]
    >>> mat_id = g(mat_id_int)             # int field, exact round-trip
    """

    def __init__(self, idx: jnp.ndarray, num_rows: int):
        self.num_rows = int(num_rows)
        self.use_one_hot = 0 < self.num_rows <= ONE_HOT_MAX_ROWS
        self.idx = idx
        if self.use_one_hot:
            rows = jnp.arange(self.num_rows, dtype=idx.dtype)
            self.one_hot = (idx[:, None] == rows[None, :]).astype(jnp.float32)

    def __call__(self, table: jnp.ndarray) -> jnp.ndarray:
        if not self.use_one_hot:
            return jnp.take(table, self.idx, axis=0)
        squeeze = table.ndim == 1
        t2 = table[:, None] if squeeze else table
        if jnp.issubdtype(t2.dtype, jnp.integer):
            out = jnp.dot(self.one_hot, t2.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
            out = jnp.round(out).astype(table.dtype)
        else:
            out = jnp.dot(self.one_hot, t2.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
            out = out.astype(table.dtype)
        return out[:, 0] if squeeze else out


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """One-shot convenience wrapper around :class:`TableGather`."""
    return TableGather(idx, table.shape[0])(table)
