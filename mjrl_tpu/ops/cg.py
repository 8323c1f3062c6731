"""Conjugate-gradient solve on parameter pytrees, jit-safe.

Same algorithm as the reference textbook CG (mjrl/utils/cg_solve.py:3-22)
but (a) operates directly on pytrees so the Fisher-vector product never
leaves device, and (b) honors ``x0`` (the reference accepted ``x_0`` and
silently ignored it — cg_solve.py:4-5; capability-parity, not bug-parity).

Runs a fixed number of iterations under ``lax.fori_loop`` with a ``done``
flag emulating the residual-tolerance early exit without host sync —
iterations after convergence are no-ops, keeping the trace static.
"""

import jax
import jax.numpy as jnp

from mjrl_tpu.ops.flat import tree_add_scaled, tree_dot, tree_zeros_like


def cg_solve(f_Ax, b, x0=None, cg_iters=10, residual_tol=1e-10):
    """Solve A x = b where ``f_Ax`` maps a pytree to a pytree.

    Returns the solution pytree.  ``b`` can be any pytree (including a bare
    array).  Fixed ``cg_iters`` iterations; updates freeze once the squared
    residual drops below ``residual_tol``.
    """
    if x0 is None:
        x = tree_zeros_like(b)
        r = b
    else:
        x = x0
        r = jax.tree_util.tree_map(lambda bi, ax: bi - ax, b, f_Ax(x0))
    p = r
    rdotr = tree_dot(r, r)

    def body(_, state):
        x, r, p, rdotr, done = state
        z = f_Ax(p)
        pz = tree_dot(p, z)
        # Guard divide-by-zero once converged/degenerate.
        v = jnp.where(done | (pz == 0.0), 0.0, rdotr / jnp.where(pz == 0.0, 1.0, pz))
        x = tree_add_scaled(x, p, v)
        r = tree_add_scaled(r, z, -v)
        newrdotr = tree_dot(r, r)
        mu = jnp.where(done | (rdotr == 0.0), 0.0,
                       newrdotr / jnp.where(rdotr == 0.0, 1.0, rdotr))
        p = jax.tree_util.tree_map(lambda ri, pi: ri + mu * pi, r, p)
        new_done = done | (newrdotr < residual_tol)
        rdotr = jnp.where(done, rdotr, newrdotr)
        return x, r, p, rdotr, new_done

    done0 = rdotr < residual_tol
    x, *_ = jax.lax.fori_loop(0, cg_iters, body, (x, r, p, rdotr, done0))
    return x
