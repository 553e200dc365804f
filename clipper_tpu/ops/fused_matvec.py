"""Pallas fused dual matvec: (M @ u, C @ u) from ONE read of M.

The PGA solver's per-probe work is the pair of matvecs M u and C u
(reference: src/clipper.cpp:219,238-241). In the standard pipeline C is
exactly the 0/1 nonzero pattern of M (reference: src/clipper.cpp:63-64), so
C u is computable from M's tiles in registers: Cu_i = sum_j (M_ij > 0) u_j.
The matvec is HBM-bandwidth bound (reading M dominates); fusing both products
into one pass halves the traffic vs a stacked [M; C] matmul.

Kernel layout: grid (B, m / TI); each program streams one (TI, m) row tile of
one problem's M through VMEM, forms the masked 0/1 tile in registers, and
contracts both against the replicated u. Accumulation is always f32
(preferred_element_type) so M may be stored in bf16 for another 2x bandwidth
saving (the iterate precision is decoupled from rounding precision: callers
can re-evaluate the final objective in f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dual_matvec_kernel(M_ref, u_ref, Mu_ref, Cu_ref):
    # multiply + row-reduce on the VPU: a matvec's (m, 1) matmul operand is
    # lane-misaligned for the MXU and the op is HBM-bandwidth bound anyway
    Mt = M_ref[0].astype(jnp.float32)  # (TI, m) tile
    u = u_ref[0]                       # (1, m)
    Mu_ref[0, 0, :] = jnp.sum(Mt * u, axis=1)
    Cu_ref[0, 0, :] = jnp.sum(jnp.where(Mt > 0, u, 0.0), axis=1)


def _use_interpret() -> bool:
    # CPU (tests / virtual meshes) runs the kernel in interpreter mode
    return jax.default_backend() != "tpu"


def _auto_row_tile(m: int, itemsize: int) -> int:
    # row_tile must be a multiple of 128 (it is the last dim of the output
    # blocks) and small enough that a double-buffered (row_tile, m) tile fits
    # the ~16 MB VMEM budget
    budget = 4 * 1024 * 1024
    rt = min(256, budget // max(1, m * itemsize) // 128 * 128)
    rt = max(rt, 128)
    while m % rt:
        rt //= 2
    return max(rt, 128)


@functools.partial(jax.jit, static_argnames=("row_tile",))
def pattern_dual_matvec(M: jnp.ndarray, u: jnp.ndarray,
                        row_tile: int = 0):
    """(Mu, Cu) with C = pattern(M). M: (B, m, m); u: (B, m). f32 outputs."""
    B, m, m2 = M.shape
    if not row_tile:
        row_tile = _auto_row_tile(m, M.dtype.itemsize)
    assert m == m2 and m % row_tile == 0, (m, row_tile)
    grid = (B, m // row_tile)
    # singleton row dims keep the last-two block dims TPU-tileable:
    # blocks must have last two dims divisible by (8, 128) or equal to the
    # array's — (1, row_tile) over a (B, m) array violates that.
    u3 = u[:, None, :]
    out_shape = [jax.ShapeDtypeStruct((B, 1, m), jnp.float32)] * 2
    Mu, Cu = pl.pallas_call(
        _dual_matvec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, row_tile, m), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, row_tile), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, row_tile), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * m * m,
            bytes_accessed=B * m * m * M.dtype.itemsize + 2 * B * m * 4,
            transcendentals=0,
        ),
        interpret=_use_interpret(),
    )(M, u3)
    return Mu[:, 0, :], Cu[:, 0, :]


def make_pattern_dual_matvec(M_row: jnp.ndarray, row_tile: int = 0):
    """Single-problem closure u -> (M u, C u) for use inside vmapped solvers.

    M_row: (m, m). Under vmap the leading batch axis reassembles and the
    kernel runs over the whole (B, m, m) batch.
    """

    def mv(u):
        Mu, Cu = pattern_dual_matvec(M_row[None], u[None], row_tile=row_tile)
        return Mu[0].astype(u.dtype), Cu[0].astype(u.dtype)

    return mv
