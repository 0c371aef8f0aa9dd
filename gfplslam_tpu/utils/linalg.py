"""Tiny fused linear-algebra helpers for hot device loops.

``jnp.linalg.solve`` on a 6x6 system lowers to a general LU composite that
XLA schedules as its own kernel; inside a per-frame GN loop (15 unrolled
iterations, models/pose_opt.py) that fixed per-op cost dominates the ~100
flops of actual work. The unrolled scalar Cholesky below fuses completely
into the surrounding elementwise graph.

Failure semantics match the LDLT-equivalent it replaces (the reference's
Eigen LDLT at stereoFrameHandler.cpp:2045): an indefinite/singular normal
matrix produces NaN/Inf in the solution, which the caller's ``is_finite``
pose gate rejects (stereoFrameHandler.cpp:1959-1981) — no silent clamping.
"""

from __future__ import annotations

import jax.numpy as jnp


def chol_solve_small(h, g):
    """Solve ``h x = g`` for small SPD ``h`` ([n, n], n static and tiny)
    by fully unrolled scalar Cholesky. Returns NaN/Inf on indefinite input
    (same contract as an unpivoted LDLT)."""
    n = h.shape[0]
    low = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = h[i, j]
            for k in range(j):
                s = s - low[i][k] * low[j][k]
            if i == j:
                low[i][j] = jnp.sqrt(s)
            else:
                low[i][j] = s / low[j][j]
    y = [None] * n
    for i in range(n):
        s = g[i]
        for k in range(i):
            s = s - low[i][k] * y[k]
        y[i] = s / low[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - low[k][i] * x[k]
        x[i] = s / low[i][i]
    return jnp.stack(x)
