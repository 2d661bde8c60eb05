"""TPU-friendly row gathers.

Dynamic gathers of [R] indices into small tables lower to slow scalar loads on
TPU; a one-hot matmul ([R,N] @ [N,K]) runs on the MXU instead and is an order
of magnitude faster for small N. The threshold keeps the one-hot matrix within
a reasonable HBM footprint for large R.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ONE_HOT_MAX = 128


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray, one_hot_max: int = ONE_HOT_MAX):
    """table [N, ...], idx [R] int32 (pre-clipped) -> [R, ...].

    Uses a one-hot MXU matmul when N <= one_hot_max, else a dynamic gather.
    XLA CSEs the one-hot across multiple gathers with the same indices.
    """
    n = table.shape[0]
    if n > one_hot_max:
        return table[idx]
    oh = jax.nn.one_hot(idx, n, dtype=jnp.float32)  # [R, N]
    flat = table.reshape(n, -1)
    # HIGHEST: default TPU matmul truncates the table values to bf16
    hi = jax.lax.Precision.HIGHEST
    if jnp.issubdtype(table.dtype, jnp.floating):
        out = jnp.matmul(oh, flat, precision=hi)
    else:
        out = jnp.rint(jnp.matmul(oh, flat.astype(jnp.float32),
                                  precision=hi)).astype(table.dtype)
    return out.reshape((idx.shape[0],) + table.shape[1:])
