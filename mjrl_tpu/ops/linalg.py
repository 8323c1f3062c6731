"""Small-matrix linear algebra tuned for TPU.

The joint-space solves in the physics engine are tiny (nv <= ~20) but run
once per sub-step per environment across huge vmap batches.  XLA's batched
LU (``jnp.linalg.solve``) uses pivoting control flow that is ~7x slower on
TPU than a fully unrolled Cholesky, which compiles to straight-line VPU
code (measured: 4096x7x7 solve, 8.2 ms LU vs 1.2 ms unrolled).

``spd_solve`` dispatches: unrolled Cholesky for static n <= MAX_UNROLL,
stock solve otherwise.  Mass matrices are SPD by construction (+armature).
"""

import jax.numpy as jnp

MAX_UNROLL = 20


def chol_solve_unrolled(a, b):
    """Solve a x = b for SPD ``a`` (..., n, n), b (..., n) with a fully
    unrolled Cholesky + triangular solves (static small n)."""
    n = a.shape[-1]
    low = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = a[..., i, j]
            for k in range(j):
                s = s - low[i][k] * low[j][k]
            if i == j:
                # pivot floor: an ill-conditioned SPD matrix (e.g. the
                # constraint-solver Hessian M + J^T S J in f32) can round
                # to a slightly negative pivot under XLA's reassociation,
                # and sqrt(neg) = NaN poisons the whole rollout.  Flooring
                # at a tiny positive fraction of the diagonal keeps the
                # solve finite; the Newton line search absorbs the error.
                floor = 1e-10 * jnp.abs(a[..., i, i]) + 1e-30
                low[i][j] = jnp.sqrt(jnp.maximum(s, floor))
            else:
                low[i][j] = s / low[j][j]
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - low[i][k] * y[k]
        y[i] = s / low[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - low[k][i] * x[k]
        x[i] = s / low[i][i]
    return jnp.stack(x, axis=-1)


def spd_solve(a, b):
    """Solve SPD system; b is (..., n).

    Large n uses XLA's native Cholesky + triangular solves (ONE HLO op
    each): at nv=36 (Adroit hand) the unrolled factor alone lowers to
    ~1.2M HLO chars and one control step to 13.5M — which the TPU
    compiler effectively never finishes — while the native path keeps
    the program compact and is plenty fast at that size."""
    if a.shape[-1] <= MAX_UNROLL:
        return chol_solve_unrolled(a, b)
    from jax.scipy.linalg import cho_solve
    low = jnp.linalg.cholesky(a)
    return cho_solve((low, True), b)


def spd_solve_rows(a, rows):
    """Solve a X^T = rows^T for many right-hand sides: rows (C, n) ->
    (C, n).  Small n: the unrolled Cholesky vmapped over rows (XLA
    hoists the loop-invariant factor).  Large n: one native factor +
    batched triangular solves."""
    import jax
    if a.shape[-1] <= MAX_UNROLL:
        return jax.vmap(lambda r: chol_solve_unrolled(a, r))(rows)
    from jax.scipy.linalg import cho_solve
    low = jnp.linalg.cholesky(a)
    return cho_solve((low, True), rows.T).T
