"""Numerics of the int4 weight-only Pallas matmul (interpret mode).

The kernel (ops/pallas/int4_matmul.py) exists because every XLA-level
expression of the group-wise dequant matmul measured worse than int8 on
chip (BASELINE.md r5); correctness here is checked against the explicit
dequantized matmul, which tests/test_quant.py ties to the RTN ground
truth."""

import numpy as np
import pytest

import jax.numpy as jnp

from vgqa_tpu.ops.pallas.int4_matmul import (int4_matmul,
                                             int4_matmul_kernel_applicable)
from vgqa_tpu.qa.quant import dequantize_kernel_int4, quantize_kernel_int4


def _check(m, k, n, dtype, seed=0, group=128):
    rng = np.random.RandomState(seed)
    w = rng.randn(k, n).astype(np.float32) * 0.1
    x = rng.randn(m, k).astype(np.float32)
    qp = quantize_kernel_int4(jnp.asarray(w), group_size=group)
    if m <= 64:  # the routing gate restricts to decode-sized M
        assert int4_matmul_kernel_applicable(m, k, n, qp["scale4"].shape[0])
    ref = np.asarray(x, np.float32) @ np.asarray(
        dequantize_kernel_int4(qp), np.float32)
    out = np.asarray(int4_matmul(jnp.asarray(x, dtype), qp["kernel_q4"],
                                 qp["scale4"], interpret=True))
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-3
    rel = np.abs(out.astype(np.float32) - ref).max() / np.abs(ref).max()
    assert rel < tol, (m, k, n, dtype, rel)


@pytest.mark.parametrize("m", [1, 3, 8])
def test_int4_kernel_matvec_and_small_batch(m):
    """decode shapes: matvec / small lockstep batches, f32 and bf16."""
    _check(m, 1024, 512, jnp.float32)
    _check(m, 1024, 512, jnp.bfloat16)


def test_int4_kernel_multi_kblock_accumulation():
    """K spanning several k2 blocks exercises the grid accumulation."""
    _check(2, 4096, 512, jnp.float32)


def test_int4_kernel_wide_n():
    """N spanning several n blocks (gate/up-proj-like aspect)."""
    _check(1, 1024, 1536, jnp.float32)


def test_int4_kernel_large_m():
    """The kernel itself handles large M (the routing gate keeps prefill
    on the XLA form, but the kernel must not silently be matvec-only)."""
    _check(256, 1024, 512, jnp.bfloat16)


def test_int4_kernel_applicability_gate():
    # toy dims that straddle the pack halves must be rejected
    assert not int4_matmul_kernel_applicable(1, 512, 64, 3)   # odd n_g
    assert not int4_matmul_kernel_applicable(1, 501, 64, 4)   # odd K
    # K/2 not divisible by the 512-row block
    assert not int4_matmul_kernel_applicable(1, 1536, 512, 12)
    assert int4_matmul_kernel_applicable(1, 1024, 512, 8)
    # every production decode shape rides the kernel
    for k, n in ((4096, 4096), (4096, 1024), (4096, 14336),
                 (14336, 4096)):
        assert int4_matmul_kernel_applicable(1, k, n, k // 128), (k, n)


def test_int4_quant_matmul_routes_to_kernel(monkeypatch):
    """quant_matmul_int4 under VGQA_PALLAS_INTERPRET must ride the kernel
    and agree with the XLA half-matmul form it replaces."""
    from vgqa_tpu.qa.quant import quant_matmul_int4

    rng = np.random.RandomState(1)
    k, n = 1024, 512
    w = rng.randn(k, n).astype(np.float32) * 0.1
    x = rng.randn(2, k).astype(np.float32)
    qp = quantize_kernel_int4(jnp.asarray(w))
    monkeypatch.setenv("VGQA_INT4_KERNEL", "0")
    xla = np.asarray(quant_matmul_int4(jnp.asarray(x), qp))
    monkeypatch.setenv("VGQA_INT4_KERNEL", "1")
    monkeypatch.setenv("VGQA_PALLAS_INTERPRET", "1")
    ker = np.asarray(quant_matmul_int4(jnp.asarray(x), qp))
    rel = np.abs(ker - xla).max() / np.abs(xla).max()
    assert rel < 2e-3, rel
