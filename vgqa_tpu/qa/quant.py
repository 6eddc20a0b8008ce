"""Weight-only int8 quantization for the QA LLM.

InternVideo2.5-Chat-8B in bf16 is ~15 GB of weights — it does not fit a
single v5e's 16 GB HBM with activations and KV cache. Per-output-channel
int8 weight quantization (absmax / 127) stores the seven big projection
matrices per layer as int8 (+ one f32 scale row), halving weight memory;
matmuls upcast tile-wise (XLA fuses the convert into the operand load) and
apply the scale to the output, so quality loss is the usual <0.5% of
weight-only int8.

The reference has no quantization path (it shards the fp16 model across
GPUs with device_map="auto", /root/reference/vgqa/inference/qa.py:176-182);
this is the TPU-native single-chip serving answer.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

QUANT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj", "lm_head",
)


def quantize_llm_params(llm_params: Dict[str, Any]) -> Dict[str, Any]:
    """Replace each target Dense kernel [in, out] with
    {kernel_q int8 [in, out], scale f32 [out]}."""

    def quantize_kernel(kernel):
        absmax = jnp.max(jnp.abs(kernel), axis=0)  # per output channel
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
        return {"kernel_q": q, "scale": scale.astype(jnp.float32)}

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if k in QUANT_TARGETS and "kernel" in v:
                    out[k] = quantize_kernel(v["kernel"])
                else:
                    out[k] = walk(v)
            else:
                out[k] = v
        return out

    return walk(llm_params)


def quant_matmul(x: jnp.ndarray, qparams: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """x [..., in] @ dequant(kernel) -> [..., out]."""
    w = qparams["kernel_q"].astype(x.dtype)
    y = jnp.einsum("...i,io->...o", x, w, preferred_element_type=jnp.float32)
    return (y * qparams["scale"]).astype(x.dtype)


def quant_matmul_w8a8(
    x: jnp.ndarray, qparams: Dict[str, jnp.ndarray]
) -> jnp.ndarray:
    """W8A8: per-row dynamic int8 activations x int8 weights -> int32.

    Each activation row is absmax-quantized on the fly (one scale per
    token), the matmul runs with BOTH operands int8 accumulating int32 —
    on TPU this hits the MXU's int8 path at ~2x the bf16 macs — and the
    output is rescaled by (row_scale x per-channel weight scale).
    Worth it only for compute-bound prefill-sized L (serving decode with
    L=1 stays on the memory-bound bf16-activation path, which is exact in
    the activations)."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    x_scale = jnp.maximum(ax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / x_scale.astype(x.dtype)),
                  -127, 127).astype(jnp.int8)
    y = jnp.einsum("...i,io->...o", xq, qparams["kernel_q"],
                   preferred_element_type=jnp.int32)
    return (
        y.astype(jnp.float32) * x_scale * qparams["scale"]
    ).astype(x.dtype)


def is_quantized(llm_params: Dict[str, Any]) -> bool:
    layer0 = llm_params.get("layer_0", {})
    return "kernel_q" in layer0.get("q_proj", {})
