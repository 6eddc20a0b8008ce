"""Weight-only int4 group-wise matmul kernel for TPU (Pallas).

QA decode is weight-HBM-bound: int8 weights stream 7.7 GB/token and
measure 86 tok/s (~80% of roofline, BASELINE.md). int4 halves that read,
but ALL THREE XLA-level expressions of the group-wise dequant matmul
measured WORSE than int8 on chip (BASELINE.md r5): the nibble-unpack +
contraction-axis group scales cannot fuse into a dot operand, so XLA
either materializes ~13 GB of dequantized bf16 weights per decode step
(30 tok/s) or shatters the contraction into MXU-hostile per-group dots
(14 tok/s). This kernel does what XLA cannot: stream the PACKED nibbles
through VMEM, sign-extend + scale per 128-row group in-register, and
feed the MXU per-group [M, 128] x [128, N_blk] dots with f32
accumulation — HBM reads only K*N/2 packed bytes + the tiny group
scales.

Layout contract matches quant.quantize_kernel_int4's split-half pack:
``packed[k, n]`` holds row ``k``'s LOW nibble (rows [0, K/2)) and row
``K/2 + k``'s HIGH nibble; group ``j`` covers input rows
[j*g, (j+1)*g), so the low half owns groups [0, n_g/2).

Replaces the decode-loop matmuls of the reference's HF generate path
(/root/reference/vgqa/inference/qa.py:236-245) for int4-converted
weights; numerics verified against the explicit dequant matmul in
tests/test_pallas_int4.py (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _int4_kernel(xlo_ref, xhi_ref, packed_ref, slo_ref, shi_ref,
                 o_ref, acc_ref, *, group: int, n_k2: int):
    """One (n-block, k2-block) program: unpack + per-group dots.

    The packed tile is read ONCE; each 128-row group contributes two
    [M, group] x [group, N_blk] MXU dots (low/high nibble halves) whose
    f32 partial sums are scaled by that group's [N_blk] scale row —
    scales on partial sums are exact (the dot is linear per group), and
    nothing bf16-sized ever round-trips HBM.

    The scale refs carry their FULL group axis (a per-k2-block scale
    BlockSpec would need a sublane block of K2_blk/group = 4 rows, which
    violates Mosaic's 8-row block rule); each program slices its G rows
    by program id — the whole array is ~100 KB of VMEM."""
    k2 = pl.program_id(1)

    @pl.when(k2 == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p32 = packed_ref[...].astype(jnp.int32)        # [K2_blk, N_blk]
    # low nibble sign-extends via <<28 >>28; high via arithmetic >>4
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    hi = jnp.right_shift(p32, 4)
    xl = xlo_ref[...]                               # [M, K2_blk] bf16
    xh = xhi_ref[...]
    acc = acc_ref[...]
    n_g = lo.shape[0] // group
    for g in range(n_g):                            # static unroll
        rows = slice(g * group, (g + 1) * group)
        wl = lo[rows].astype(xl.dtype)              # [group, N_blk]
        wh = hi[rows].astype(xh.dtype)
        part_l = jax.lax.dot_general(
            xl[:, rows], wl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # [M, N_blk] f32
        part_h = jax.lax.dot_general(
            xh[:, rows], wh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sl = slo_ref[pl.ds(k2 * n_g + g, 1), :]     # [1, N_blk]
        sh = shi_ref[pl.ds(k2 * n_g + g, 1), :]
        acc = acc + part_l * sl + part_h * sh
    acc_ref[...] = acc

    @pl.when(k2 == n_k2 - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def int4_matmul_kernel_applicable(m: int, k: int, n: int, n_g: int) -> bool:
    """Static-shape gate for the kernel path (wrapper falls back to the
    XLA half-matmul form otherwise — toy test dims mostly)."""
    if k % 2 or n_g % 2:
        return False
    k2 = k // 2
    g = k // n_g
    k2_blk = min(512, k2)
    n_blk = min(512, n)
    return (
        g >= 1 and k2 % k2_blk == 0 and n % n_blk == 0
        and k2_blk % g == 0 and (k2 // g) * 2 == n_g
        # decode matvecs / lockstep batches only: the compute-bound
        # chunked prefill stays on the XLA half-matmul form (7.3k tok/s
        # measured — healthy), keeping the unrolled 9-chunk prefill
        # program free of 2k extra pallas custom-calls
        and m <= 64
    )


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _int4_matmul_2d(x2, packed, scale, out_dtype, interpret=False):
    m, k = x2.shape
    half, n = packed.shape
    n_g = scale.shape[0]
    g = k // n_g
    n2 = n_g // 2
    k2_blk = min(512, half)
    n_blk = min(512, n)
    n_k2 = half // k2_blk
    grid = (n // n_blk, n_k2)
    # pad M to one f32 sublane tile so the dot's output layout is legal
    m_pad = max(8, m)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    xlo, xhi = x2[:, :k // 2], x2[:, k // 2:]
    out = pl.pallas_call(
        functools.partial(_int4_kernel, group=g, n_k2=n_k2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, k2_blk), lambda ni, ki: (0, ki)),
            pl.BlockSpec((m_pad, k2_blk), lambda ni, ki: (0, ki)),
            pl.BlockSpec((k2_blk, n_blk), lambda ni, ki: (ki, ni)),
            # full group axis per program (see kernel docstring)
            pl.BlockSpec((n2, n_blk), lambda ni, ki: (0, ni)),
            pl.BlockSpec((n2, n_blk), lambda ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((m_pad, n_blk), lambda ni, ki: (0, ni)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((m_pad, n_blk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xlo, xhi, packed, scale[:n2], scale[n2:])
    return out[:m]


def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """x [..., K] @ dequant4(packed [K/2, N], scale [n_g, N]) -> [..., N].

    Leading axes fold into M. Callers must check
    :func:`int4_matmul_kernel_applicable` first."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    y = _int4_matmul_2d(x2, packed, scale, out_dtype=x.dtype,
                        interpret=interpret)
    return y.reshape(*lead, packed.shape[1])
