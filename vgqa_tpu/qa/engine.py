"""TPU serving engine for the multimodal QA model: batched prefill +
KV-cache autoregressive decode.

Replaces the reference's remote-code ``model.chat(...)`` generation loop
(/root/reference/vgqa/inference/qa.py:236-245) with a native engine:

* the prompt (text ids with IMG_CONTEXT placeholder spans) is embedded and
  the placeholder positions are overwritten with vision-tower tokens,
* prefill runs one static-shape causal program over the padded prompt and
  fills the KV cache,
* generation runs fully on device: lax.scan loops for both greedy and
  temperature/top-p sampling (per-token host round-trips cost ~50 ms
  through remote tunnels — BASELINE.md),
* prompt lengths are bucketed to powers of two so repeat calls reuse
  compiled programs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .llm import (LLM, LLMConfig, TokenEmbedding, init_kv_cache,
                  kv_cache_quantized, kv_cache_stacked, kv_seq_len,
                  quantize_kv, quantize_kv_cache, quantize_kv_cache_stacked)
from .vit import ViTConfig, VisionTower


# -- minimal reversible tokenizer -------------------------------------------
class ByteTokenizer:
    """Byte-level reversible tokenizer with chat special tokens.

    Used when no converted tokenizer assets exist (hermetic mode); real
    checkpoints supply a SentencePiece model (qa/sp_tokenizer.py)."""

    PAD, BOS, EOS, IM_START, IM_END, IMG_CONTEXT = 0, 1, 2, 3, 4, 5
    IMG_START, IMG_END = 6, 7
    OFFSET = 16

    vocab_size = 256 + OFFSET

    def encode(self, text: str) -> List[int]:
        return [b + self.OFFSET for b in text.encode("utf-8")]

    def decode(self, ids: List[int]) -> str:
        data = bytes(
            i - self.OFFSET for i in ids if self.OFFSET <= i < self.OFFSET + 256
        )
        return data.decode("utf-8", errors="ignore")


@dataclass
class GenerationConfig:
    max_new_tokens: int = 128
    temperature: float = 0.2
    top_p: float = 0.9
    do_sample: bool = True
    # benchmarking: decode exactly max_new_tokens even if EOS fires (the
    # while_loop decode exits early on EOS, which is right for serving but
    # makes tok/s measurements depend on where a random model happens to
    # emit EOS)
    ignore_eos: bool = False


def _bucket(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class YUVTiles:
    """I420-plane tile batch for the vision tower.

    ``planes`` is [n_tiles, S*S*3//2] uint8 (Y then U then V per tile,
    S = the ViT image size); ``full_range`` selects JPEG- vs MPEG-range
    BT.601 coefficients for the on-device conversion. HALF the bytes of
    RGB uint8 tiles — the QA vision phase is host-serialization-bound on
    remote links (BASELINE.md r4: 0.733 s at 32 tiles of which only
    0.402 s is device compute), so the upload byte count is the lever.
    Mirrors the grounding path's I420 serving upload
    (inference/grounding.py fwd_yuv). Produced by
    ``qa.preprocess.load_video_tiles_yuv`` (native decoder emits scaled
    I420 directly); replaces the reference's host RGB tiling for the
    max_num=1 video protocol (/root/reference/vgqa/inference/qa.py:70-120,
    one stretched SxS tile per frame)."""

    __slots__ = ("planes", "full_range")

    def __init__(self, planes, full_range: bool = False):
        self.planes = planes
        self.full_range = bool(full_range)

    @property
    def shape(self):
        return self.planes.shape

    @property
    def dtype(self):
        return self.planes.dtype


class QAEngine:
    def __init__(
        self,
        llm_cfg: LLMConfig,
        vit_cfg: ViTConfig,
        params: Dict[str, Any],
        tokenizer=None,
        max_seq_len: int = 8192,
        dtype=jnp.float32,
    ):
        self.llm_cfg = llm_cfg
        self.vit_cfg = vit_cfg
        self.params = params
        self.tokenizer = tokenizer or ByteTokenizer()
        self.max_seq_len = min(max_seq_len, llm_cfg.max_seq_len)
        self.dtype = dtype
        # real checkpoints need the published template verbatim; the debug
        # byte-level tokenizer spends ~3 ids per CJK char, so small test
        # engines get a compact prompt to stay inside their short KV caches
        self.system_prompt = (
            self.SYSTEM_PROMPT
            if tokenizer is not None
            else "You are a helpful video assistant."
        )

        import dataclasses as _dc
        import os as _os

        self.llm = LLM(llm_cfg)
        self.embed = TokenEmbedding(llm_cfg)
        # ViT attention runs the Pallas flash kernel on TPU (default since
        # r4): with bf16 MXU operands + 384-blocks it beats XLA's einsum
        # at the ViT shape (vision phase 0.643 s flash vs 0.690 s XLA at
        # 32 tiles, bench_qa --ab-vit-flash 2026-08-19). The r3 "flash
        # loses 2.8x at L=1025/hd=64" result was the old kernel forcing
        # f32 matmuls. VGQA_VIT_FLASH=0 restores XLA einsum; interpret
        # mode exercises the kernel in CPU parity tests. The flag changes
        # no parameters, only the attention op.
        import jax as _jax

        vit_flash = _os.environ.get("VGQA_VIT_FLASH")
        if vit_flash is None:
            use_vit_flash = (
                _jax.default_backend() == "tpu"
                or _os.environ.get("VGQA_PALLAS_INTERPRET") == "1"
            )
        else:
            use_vit_flash = vit_flash != "0" or (
                _os.environ.get("VGQA_PALLAS_INTERPRET") == "1"
            )
        if use_vit_flash:
            vit_cfg = _dc.replace(vit_cfg, flash=True)
            self.vit_cfg = vit_cfg
        self.vision = VisionTower(vit_cfg)

        g = vit_cfg.grid
        self.num_image_token = int((g * vit_cfg.downsample_ratio) ** 2)

        self._vision_fn = jax.jit(self._vision_apply)
        self._vision_yuv_fn = jax.jit(self._vision_apply_yuv)
        # VGQA_VISION_CHUNKS>0: split the tile batch into fixed-size
        # chunks, interleaving put and dispatch (put c0, dispatch c0,
        # put c1, ...) so chunk k+1's host-side upload serialization runs
        # under chunk k's ViT compute. Measured on-chip at the 32-frame
        # protocol (2026-08-19, tools/bench_qa.py --ab-vision-chunks 8):
        # 0.733 s chunked vs 0.797 s single-shot. (r3's zero-gain result
        # enqueued every upload before the first dispatch — on this
        # submission-ordered link that admits no overlap.) Chunk shapes
        # cost one extra ViT compile at startup. Default ON at 8;
        # VGQA_VISION_CHUNKS=0 restores single-shot.
        self._vision_chunk = int(_os.environ.get("VGQA_VISION_CHUNKS", "8"))
        # I420 batches carry HALF the bytes per chunk, so the interleave
        # optimum shifts finer: measured r5 at 32 tiles on the YUV path —
        # ck=4: 0.548 s, ck=8: 0.681, ck=16: 0.670 (BASELINE.md).
        # VGQA_VISION_CHUNKS_YUV overrides; an explicit
        # VGQA_VISION_CHUNKS also applies to YUV when the former is unset.
        _ck_yuv = _os.environ.get(
            "VGQA_VISION_CHUNKS_YUV",
            _os.environ.get("VGQA_VISION_CHUNKS", "4"),
        )
        self._vision_chunk_yuv = int(_ck_yuv)

        # causal GQA flash prefill: native on TPU; interpret mode for CPU
        # parity testing (VGQA_PALLAS_INTERPRET=1); plain XLA otherwise
        self._flash_interpret = (
            _os.environ.get("VGQA_PALLAS_INTERPRET") == "1"
        )
        self.use_flash_prefill = (
            jax.default_backend() == "tpu" or self._flash_interpret
        )
        # W8A8 prefill (ON by default, VGQA_W8A8_PREFILL=0 disables):
        # per-token dynamic int8 activations in the compute-bound prefill
        # matmuls (int8 x int8 hits the MXU's double-rate path — measured
        # 1.36x, BASELINE.md); decode keeps exact bf16 activations. Only
        # engages when the weights are int8-quantized; shipped behind the
        # SmoothQuant fold + greedy-match accuracy gate
        # (tools/gate_w8a8.py, tests/test_quant.py) — convert with
        # tools/convert_weights.py qa --quantize (smoothing on by default).
        self._w8a8_prefill = (
            _os.environ.get("VGQA_W8A8_PREFILL", "1") != "0"
        )
        # VGQA_STACKED_KV=1: one [nL, B, KVH, S, hd] buffer per KV side
        # instead of 2*num_layers separate buffers (llm.init_kv_cache).
        # Bit-identical math (static layer indices); shrinks the decode
        # while_loop's carried-buffer count 32x. MEASURED r4 (BASELINE.md):
        # decode 81.5 vs 82.4 tok/s — no throughput change — and the
        # remote-compile batch=4 failure it targeted reproduces identically
        # on the stacked layout too. Kept off: a layout knob with no
        # measured win.
        self._stacked_kv = _os.environ.get("VGQA_STACKED_KV", "0") == "1"
        # VGQA_KV_INT8=1: int8-quantized KV cache (llm.init_kv_cache
        # quant="int8") — per-token absmax scales written alongside int8
        # K/V, scales factored out of the attention dots at read time
        # (llm_functional). Halves the per-step KV HBM read and the cache
        # footprint: at the 32-frame protocol a bf16 cache row is ~1.2 GB,
        # so batch=8 rows (9.7 GB) + 7.7 GB int8 weights exceed one v5e's
        # HBM — int8 rows (4.9 GB) fit. MEASURED r4 (BASELINE.md "int8 KV
        # cache" row): decode 86.2 vs 82.9 tok/s AND it unlocks batch=4
        # lockstep decode (44.4 tok/s aggregate, 1.40x) — the bf16
        # 64-buffer [4,8,9216,128] decode program failed deterministically
        # in the remote compile service. Prefill stays on the bf16 path;
        # the cache is quantized ONCE post-prefill (llm.quantize_kv_cache
        # — write-time int8 cost the chunked flash prefill ~0.15 s/call).
        # Default ON, accuracy-gated by tools/gate_w8a8.py --wq kv8;
        # VGQA_KV_INT8=0 reverts.
        kv8_env = _os.environ.get("VGQA_KV_INT8", "")
        kv8_requested = kv8_env.strip().lower() not in ("0", "false", "off")
        kv8_explicit = kv8_requested and kv8_env != ""
        if self._stacked_kv and kv8_explicit:
            raise ValueError(
                "VGQA_STACKED_KV and VGQA_KV_INT8 are mutually exclusive "
                "(int8 KV uses the per-layer list layout)"
            )
        # int8 by default; an explicit stacked opt-in implies bf16
        self._kv_quant = (
            "int8" if kv8_requested and not self._stacked_kv else None
        )
        # VGQA_SCAN_DECODE=1: decode as ONE lax.scan over layers against
        # stacked params (llm_functional.stack_llm_layers) and the stacked
        # int8 KV dict — ~num_layers-fold smaller decode program, aimed at
        # the remote-compile-service ceiling that deterministically
        # rejected the unrolled batch>=8 decode (BASELINE.md r4/r5).
        # Implies the int8 KV cache; params are stacked in place on first
        # use (stack big models on HOST before upload — bench_qa
        # --scan-decode does; a device-side stack of 8B weights would
        # transiently double weight HBM leaf-by-leaf).
        self._scan_decode = (
            _os.environ.get("VGQA_SCAN_DECODE", "0") == "1"
        )
        if self._scan_decode:
            if self._stacked_kv:
                raise ValueError(
                    "VGQA_SCAN_DECODE uses the stacked INT8 cache; unset "
                    "VGQA_STACKED_KV"
                )
            self._kv_quant = "int8"
        self._prefill = jax.jit(self._prefill_impl, donate_argnums=(3,))
        self._prefill_chunked = jax.jit(self._prefill_chunked_impl,
                                        donate_argnums=(3,))
        # donate the KV cache so each decode step updates it in place
        self._decode_step = jax.jit(self._decode_impl, donate_argnums=(1,))
        self._greedy_loop = jax.jit(
            self._greedy_loop_impl, static_argnums=(5,), donate_argnums=(1,)
        )
        self._sample_loop = jax.jit(
            self._sample_loop_impl, static_argnums=(5,), donate_argnums=(1,)
        )
        self._greedy_batch = jax.jit(
            self._greedy_batch_impl, static_argnums=(5,), donate_argnums=(1,)
        )
        # one-pass bf16 -> int8 cache conversion, run between prefill and
        # decode (prefill itself always rides the fast bf16-KV path; the
        # donated bf16 cache is freed as the int8 layout is written).
        # Scan mode converts to the stacked dict in the same single pass.
        self._quantize_cache = jax.jit(
            quantize_kv_cache_stacked if self._scan_decode
            else quantize_kv_cache,
            donate_argnums=(0,),
        )
        # move one prefilled [1, ...] cache into row `i` of the [B, ...]
        # batch cache in place (batch donated; the row can't alias a
        # [B, ...] output, so donating it would only warn): chat_batch's
        # peak KV memory stays batch + one row instead of 2x batch at the
        # concat
        self._build_insert_cache_row()
        self._sample_batch = jax.jit(
            self._sample_batch_impl, static_argnums=(5,), donate_argnums=(1,)
        )

    def _build_insert_cache_row(self):
        # stacked layouts (bf16 tuple or scanned int8 dict): [nL, B, ...]
        _row_axis = 1 if (self._stacked_kv or self._scan_decode) else 0
        self._insert_cache_row = jax.jit(
            lambda batch, row, i: jax.tree.map(
                lambda b, r: jax.lax.dynamic_update_slice_in_dim(
                    b, r.astype(b.dtype), i, axis=_row_axis),
                batch, row,
            ),
            donate_argnums=(0,),
        )

    def set_stacked_kv(self, flag: bool):
        """Switch the KV-cache layout in process (bench A/Bs). The
        prefill/decode jits retrace automatically on the new cache pytree;
        only the row-insert's axis is baked into a closure and rebuilt.
        Stacked is bf16-only, so it clears the int8-KV flag."""
        self._stacked_kv = bool(flag)
        if flag:
            self._kv_quant = None
        self._build_insert_cache_row()

    def set_kv_int8(self, flag: bool):
        """Switch the int8-KV cache on/off in process (bench A/Bs). The
        prefill/decode jits retrace automatically on the new cache pytree
        (int8 entries are dicts, bf16 entries tuples). int8 uses the
        per-layer list layout, so it clears the stacked flag."""
        self._kv_quant = "int8" if flag else None
        self._scan_decode = False
        self._quantize_cache = jax.jit(quantize_kv_cache,
                                       donate_argnums=(0,))
        if flag and self._stacked_kv:
            self._stacked_kv = False
        self._build_insert_cache_row()

    def set_scan_decode(self, flag: bool):
        """Switch the layer-scanned decode on/off in process (bench
        A/Bs). On: decode runs llm_decode_scanned against stacked params
        + the stacked int8 cache (params are stacked in place on first
        use); off: the unrolled per-layer int8-KV path. The decode jits
        retrace automatically on the new cache pytree; note stacked
        params persist once built (llm_forward reads either storage)."""
        self._scan_decode = bool(flag)
        self._kv_quant = "int8"
        if flag:
            self._stacked_kv = False
        self._quantize_cache = jax.jit(
            quantize_kv_cache_stacked if flag else quantize_kv_cache,
            donate_argnums=(0,),
        )
        self._build_insert_cache_row()

    def _ensure_scan_params(self):
        """Stack ``layer_i`` params into the ``layers`` tree in place
        (idempotent). Leaf-by-leaf with progressive frees, so the
        transient overhead is ONE stacked leaf (e.g. 32 down_proj kernels
        ~1.8 GB int8 at 8B scale), not a full second weight copy."""
        llm = self.params["llm"]
        if "layers" in llm:
            return
        keys = [f"layer_{i}" for i in range(self.llm_cfg.num_layers)]
        # int4 trees keep DUAL storage (per-layer for the unrolled
        # prefill, stacked for the decode scan): two packed copies cost
        # what one int8 copy does, and prefill slicing the stacked tree
        # re-materializes weight copies on-chip (llm_functional.
        # stack_llm_layers docstring — the r5 B=1 OOM)
        keep = "kernel_q4" in llm[keys[0]].get("q_proj", {})
        trees = ([llm[k] for k in keys] if keep
                 else [llm.pop(k) for k in keys])
        flats, treedef = zip(*(jax.tree_util.tree_flatten(t)
                               for t in trees))
        flats = [list(f) for f in flats]
        stacked_leaves = []
        for j in range(len(flats[0])):
            stacked_leaves.append(jnp.stack([f[j] for f in flats]))
            if not keep:
                for f in flats:
                    f[j] = None  # drop per-layer buffer refs as we go
        llm["layers"] = jax.tree_util.tree_unflatten(
            treedef[0], stacked_leaves)

    # -- params init (random; converters fill real weights) ----------------
    @classmethod
    def init_random(cls, llm_cfg, vit_cfg, rng=None, **kw) -> "QAEngine":
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r1, r2, r3 = jax.random.split(rng, 3)
        llm = LLM(llm_cfg)
        embed = TokenEmbedding(llm_cfg)
        vision = VisionTower(vit_cfg)
        L = 8
        dummy_embeds = jnp.zeros((1, L, llm_cfg.hidden_size))
        pos = jnp.zeros((1, L), jnp.int32)
        mask = jnp.ones((1, L, L), bool)
        params = {
            "llm": llm.init(r1, dummy_embeds, pos, mask)["params"],
            "embed": embed.init(r2, jnp.zeros((1, L), jnp.int32))["params"],
            "vision": vision.init(
                r3, jnp.zeros((1, vit_cfg.image_size, vit_cfg.image_size, 3))
            )["params"],
        }
        return cls(llm_cfg, vit_cfg, params, **kw)

    # -- jitted internals ---------------------------------------------------
    def _prefill_impl(self, params, embeds, length, cache):
        """embeds [1, Lp, D]; causal mask limited to `length` real tokens."""
        from .llm_functional import llm_forward

        Lp = embeds.shape[1]
        pos = jnp.arange(Lp)[None]
        idx = jnp.arange(Lp)
        causal = idx[None, :, None] >= idx[None, None, :]
        valid = idx[None, None, :] < length
        mask = causal & valid  # prefill attends over the Lp prompt tokens only
        logits, new_cache = llm_forward(
            params["llm"], self.llm_cfg, embeds, pos, mask,
            cache=None, cache_index=None,
            lm_head_rows=jnp.asarray(length - 1)[None],
            flash_prefill=(
                {"q_offset": 0, "length": length,
                 "interpret": self._flash_interpret}
                if self.use_flash_prefill else None
            ),
            w8a8=self._w8a8_prefill,
        )
        # copy prefill kv into the persistent cache
        if kv_cache_quantized(cache):
            filled = []
            for ent, (nk, nv) in zip(cache, new_cache):
                kq, ks = quantize_kv(nk)
                vq, vs = quantize_kv(nv)
                filled.append({
                    "kq": jax.lax.dynamic_update_slice(
                        ent["kq"], kq, (0, 0, 0, 0)),
                    "ks": jax.lax.dynamic_update_slice(
                        ent["ks"], ks, (0, 0, 0)),
                    "vq": jax.lax.dynamic_update_slice(
                        ent["vq"], vq, (0, 0, 0, 0)),
                    "vs": jax.lax.dynamic_update_slice(
                        ent["vs"], vs, (0, 0, 0)),
                })
            return logits[:, 0], filled
        if kv_cache_stacked(cache):
            nk = jnp.stack([k for k, _ in new_cache]).astype(cache[0].dtype)
            nv = jnp.stack([v for _, v in new_cache]).astype(cache[1].dtype)
            zeros = (0, 0, 0, 0, 0)
            filled = (
                jax.lax.dynamic_update_slice(cache[0], nk, zeros),
                jax.lax.dynamic_update_slice(cache[1], nv, zeros),
            )
            return logits[:, 0], filled
        filled = []
        for (ck, cv), (nk, nv) in zip(cache, new_cache):
            ck = jax.lax.dynamic_update_slice(
                ck, nk.astype(ck.dtype), (0, 0, 0, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cv, nv.astype(cv.dtype), (0, 0, 0, 0)
            )
            filled.append((ck, cv))
        last = logits[:, 0]  # lm_head computed on the final row only
        return last, filled

    PREFILL_CHUNK = 1024

    def _prefill_chunked_impl(self, params, embeds, length, cache):
        """Long-prompt prefill in fixed chunks against the KV cache.

        A one-shot prefill materializes [heads, Lp, Lp] attention logits —
        34 GB at Lp=16k (the 32-frame production QA prompt is ~8.7k
        tokens) — so long prompts stream through the cache in
        ``PREFILL_CHUNK``-sized causal chunks: each chunk writes its kv at
        offset i*CK and attends over everything written so far, bounding
        transient logits at [heads, CK, S]."""
        from .llm_functional import llm_forward

        CK = self.PREFILL_CHUNK
        Lp = embeds.shape[1]
        assert Lp % CK == 0, (Lp, CK)
        S = kv_seq_len(cache)
        key_idx = jnp.arange(S)
        last = None
        for i in range(Lp // CK):
            emb_i = jax.lax.dynamic_slice_in_dim(embeds, i * CK, CK, axis=1)
            pos = (i * CK + jnp.arange(CK))[None]
            mask = (key_idx[None, None, :] <= pos[:, :, None]) & (
                key_idx[None, None, :] < length
            )
            # the prompt's final real token lands in exactly one chunk
            li = jnp.clip(length - 1 - i * CK, 0, CK - 1)
            logits, cache = llm_forward(
                params["llm"], self.llm_cfg, emb_i, pos, mask,
                cache=cache, cache_index=i * CK,
                lm_head_rows=li[None],
                flash_prefill=(
                    {"q_offset": i * CK, "length": length,
                     "interpret": self._flash_interpret}
                    if self.use_flash_prefill else None
                ),
                w8a8=self._w8a8_prefill,
            )
            cand = logits[:, 0]
            if last is None:
                last = cand
            else:
                in_chunk = (length - 1 >= i * CK) & (length - 1 < (i + 1) * CK)
                last = jnp.where(in_chunk, cand, last)
        return last, cache

    def _plan_prefill(self, length: int):
        """Pick the padded prefill length and whether to chunk it.

        Short prompts pad to a power-of-two bucket and prefill one-shot;
        long prompts (> 4 chunks) pad to chunk granularity and stream
        through ``_prefill_chunked_impl``, which requires ``Lp`` to be a
        ``PREFILL_CHUNK`` multiple — so the ``max_seq_len`` cap is rounded
        DOWN to a chunk multiple, and a prompt that only fits in the
        unaligned remainder falls back to one-shot prefill."""
        Lp = min(_bucket(length), self.max_seq_len)
        chunked = Lp > 4 * self.PREFILL_CHUNK
        if chunked:
            CK = self.PREFILL_CHUNK
            cap = (self.max_seq_len // CK) * CK
            if length <= cap:
                Lp = min(-(-length // CK) * CK, cap)
            else:
                chunked = False
        return Lp, chunked

    def _decode_impl(self, params, cache, token, position):
        """token [1] int32; position [] int32."""
        from .llm_functional import embed_tokens, llm_forward

        embeds = embed_tokens(params["embed"], self.llm_cfg, token[:, None])
        S = kv_seq_len(cache)
        mask = (jnp.arange(S)[None, None, :] <= position)
        logits, new_cache = llm_forward(
            params["llm"], self.llm_cfg, embeds,
            position[None, None] if position.ndim == 0 else position[None],
            mask,
            cache=cache,
            cache_index=position,
        )
        return logits[:, 0], new_cache

    # the exact system message InternVL2.5/InternVideo2.5 ship in their
    # "internvl2_5" conversation template — real checkpoints are trained
    # against this wording, so it must match verbatim
    SYSTEM_PROMPT = (
        "你是书生·万象，英文名"
        "是InternVL，是由上海人工智能"
        "实验室、清华大学及多家"
        "合作单位联合开发的多模"
        "态大语言模型。"
    )

    def _greedy_loop_impl(self, params, cache, first_logits, start_position,
                          stop_ids, max_new_tokens):
        """Whole greedy generation as ONE device program: no per-token
        host round-trips (~50 ms each through this environment's tunnel —
        BASELINE.md). A while_loop (not scan) so generation STOPS at the
        stop token instead of riding the full max_new_tokens budget — a
        20-token answer costs 20 decode steps, not 128 (r4; the emitted
        buffer stays [max_new_tokens] with -1 past the stop, so callers
        are unchanged)."""
        from .llm_functional import embed_tokens, llm_forward

        S = kv_seq_len(cache)
        tokens0 = jnp.full((max_new_tokens,), -1, jnp.int32)

        def cond(state):
            _, _, _, done, t, _ = state
            return (t < max_new_tokens) & ~done

        def body(state):
            cache, logits, position, done, t, tokens = state
            next_id = jnp.argmax(logits[0]).astype(jnp.int32)
            is_stop = jnp.any(next_id == stop_ids) | (position >= S - 1)
            emit = jnp.where(done | is_stop, -1, next_id)
            tokens = jax.lax.dynamic_update_index_in_dim(tokens, emit, t, 0)
            embeds = embed_tokens(params["embed"], self.llm_cfg, emit[None, None])
            mask = (jnp.arange(S)[None, None, :] <= position)
            new_logits, new_cache = llm_forward(
                params["llm"], self.llm_cfg, embeds,
                position[None, None], mask, cache=cache, cache_index=position,
            )
            return (new_cache, new_logits[:, 0], position + 1,
                    done | is_stop, t + 1, tokens)

        state = (cache, first_logits, start_position, jnp.asarray(False),
                 jnp.asarray(0, jnp.int32), tokens0)
        *_, tokens = jax.lax.while_loop(cond, body, state)
        return tokens  # [max_new_tokens], -1 past the stop

    def _greedy_batch_impl(self, params, cache, first_logits, positions,
                           stop_ids, max_new_tokens, limits):
        """Lockstep batched greedy decode: B concurrent requests share one
        device program, each owning one KV-cache row and advancing its own
        position (prompt lengths differ per request). A finished row keeps
        riding the batch (its emits are -1) until every row stops — decode
        throughput scales with B while latency stays one scan. ``limits``
        [B] caps each row at ITS OWN requested max_new_tokens (the scan
        length is the batch max).

        Net-new vs the reference, which serves strictly one request at a
        time (/root/reference/app/server.py's single-flight lock around
        model.chat). The while_loop exits when EVERY row has stopped, so
        a batch of short answers does not ride the full token budget."""
        from .llm_functional import embed_tokens, llm_forward

        S = kv_seq_len(cache)
        B = first_logits.shape[0]
        tokens0 = jnp.full((max_new_tokens, B), -1, jnp.int32)

        def cond(state):
            _, _, _, done, t, _ = state
            return (t < max_new_tokens) & ~jnp.all(done)

        def body(state):
            cache, logits, position, done, t, tokens = state
            next_id = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # [B]
            is_stop = jnp.any(
                next_id[:, None] == stop_ids[None, :], axis=-1
            ) | (position >= S - 1) | (t >= limits)
            emit = jnp.where(done | is_stop, -1, next_id)
            tokens = jax.lax.dynamic_update_index_in_dim(tokens, emit, t, 0)
            embeds = embed_tokens(
                params["embed"], self.llm_cfg, emit[:, None]
            )
            mask = (jnp.arange(S)[None, None, :] <= position[:, None, None])
            new_logits, new_cache = llm_forward(
                params["llm"], self.llm_cfg, embeds,
                position[:, None], mask, cache=cache, cache_index=position,
            )
            return (new_cache, new_logits[:, 0], position + 1,
                    done | is_stop, t + 1, tokens)

        done0 = jnp.zeros(B, bool)
        state = (cache, first_logits, positions, done0,
                 jnp.asarray(0, jnp.int32), tokens0)
        *_, tokens = jax.lax.while_loop(cond, body, state)
        return tokens  # [max_new_tokens, B]

    def _sample_batch_impl(self, params, cache, first_logits, positions,
                           stop_ids, max_new_tokens, limits, keys, temps,
                           top_ps):
        """Lockstep batched decode with PER-ROW nucleus sampling.

        Each row owns an independent RNG stream (``keys`` [B]), its own
        temperature/top_p, and its own token cap (``limits``); a row with
        ``temps[b] <= 0`` decodes greedily. The per-row split chain matches
        :meth:`_sample_loop_impl` exactly, so a batched row reproduces the
        solo sampled answer for the same rng — coalesced serving is
        behavior-identical to solo serving (tests/test_qa.py)."""
        from .llm_functional import embed_tokens, llm_forward

        S = kv_seq_len(cache)

        def pick_row(logits, key, temperature, top_p):
            scaled = logits.astype(jnp.float32) / jnp.maximum(
                temperature, 0.01)
            sorted_logits = jnp.sort(scaled)[::-1]
            probs = jax.nn.softmax(sorted_logits)
            cum = jnp.cumsum(probs)
            cutoff_idx = jnp.sum(cum < top_p)
            cutoff = sorted_logits[
                jnp.minimum(cutoff_idx, scaled.shape[0] - 1)]
            masked = jnp.where(scaled >= cutoff, scaled, -jnp.inf)
            sampled = jax.random.categorical(key, masked).astype(jnp.int32)
            greedy = jnp.argmax(logits).astype(jnp.int32)
            return jnp.where(temperature > 0, sampled, greedy)

        pick = jax.vmap(pick_row)
        B = first_logits.shape[0]
        tokens0 = jnp.full((max_new_tokens, B), -1, jnp.int32)

        def cond(state):
            _, _, _, done, _, t, _ = state
            return (t < max_new_tokens) & ~jnp.all(done)

        def body(state):
            cache, logits, position, done, keys, t, tokens = state
            splits = jax.vmap(jax.random.split)(keys)      # [B, 2, key]
            new_keys, subs = splits[:, 0], splits[:, 1]
            next_id = pick(logits, subs, temps, top_ps)    # [B]
            is_stop = jnp.any(
                next_id[:, None] == stop_ids[None, :], axis=-1
            ) | (position >= S - 1) | (t >= limits)
            emit = jnp.where(done | is_stop, -1, next_id)
            tokens = jax.lax.dynamic_update_index_in_dim(tokens, emit, t, 0)
            embeds = embed_tokens(
                params["embed"], self.llm_cfg, emit[:, None]
            )
            mask = (jnp.arange(S)[None, None, :] <= position[:, None, None])
            new_logits, new_cache = llm_forward(
                params["llm"], self.llm_cfg, embeds,
                position[:, None], mask, cache=cache, cache_index=position,
            )
            return (new_cache, new_logits[:, 0], position + 1,
                    done | is_stop, new_keys, t + 1, tokens)

        done0 = jnp.zeros(B, bool)
        state = (cache, first_logits, positions, done0, keys,
                 jnp.asarray(0, jnp.int32), tokens0)
        *_, tokens = jax.lax.while_loop(cond, body, state)
        return tokens  # [max_new_tokens, B]

    def _sample_loop_impl(self, params, cache, first_logits, start_position,
                          stop_ids, max_new_tokens, rng, temperature, top_p):
        """Temperature + nucleus sampling as one device program."""
        from .llm_functional import embed_tokens, llm_forward

        S = kv_seq_len(cache)

        def pick(logits, key):
            scaled = logits.astype(jnp.float32) / jnp.maximum(temperature, 0.01)
            sorted_logits = jnp.sort(scaled)[::-1]
            probs = jax.nn.softmax(sorted_logits)
            cum = jnp.cumsum(probs)
            # smallest logit still inside the nucleus
            cutoff_idx = jnp.sum(cum < top_p)
            cutoff = sorted_logits[jnp.minimum(cutoff_idx, scaled.shape[0] - 1)]
            masked = jnp.where(scaled >= cutoff, scaled, -jnp.inf)
            return jax.random.categorical(key, masked).astype(jnp.int32)

        tokens0 = jnp.full((max_new_tokens,), -1, jnp.int32)

        def cond(state):
            _, _, _, done, _, t, _ = state
            return (t < max_new_tokens) & ~done

        def body(state):
            cache, logits, position, done, key, t, tokens = state
            key, sub = jax.random.split(key)
            next_id = pick(logits[0], sub)
            is_stop = jnp.any(next_id == stop_ids) | (position >= S - 1)
            emit = jnp.where(done | is_stop, -1, next_id)
            tokens = jax.lax.dynamic_update_index_in_dim(tokens, emit, t, 0)
            embeds = embed_tokens(params["embed"], self.llm_cfg, emit[None, None])
            mask = (jnp.arange(S)[None, None, :] <= position)
            new_logits, new_cache = llm_forward(
                params["llm"], self.llm_cfg, embeds,
                position[None, None], mask, cache=cache, cache_index=position,
            )
            return (new_cache, new_logits[:, 0], position + 1,
                    done | is_stop, key, t + 1, tokens)

        state = (cache, first_logits, start_position, jnp.asarray(False),
                 rng, jnp.asarray(0, jnp.int32), tokens0)
        *_, tokens = jax.lax.while_loop(cond, body, state)
        return tokens

    # -- prompt assembly ----------------------------------------------------
    def build_prompt_ids(self, question: str, num_patches_list: List[int]):
        """InternVL2.5 "internvl2_5" chat template with per-frame
        IMG_CONTEXT spans. Canonical layout (conversation.py of the
        published InternVL2.5 release; sep = "<|im_end|>\\n"):

            <s><|im_start|>system\\n{SYSTEM_PROMPT}<|im_end|>\\n
            <|im_start|>user\\nFrame1: <img>{IMG_CONTEXT x n}</img>\\n...
            {question}<|im_end|>\\n<|im_start|>assistant\\n

        The "FrameN: <image>\\n" prefixes are the reference's prompt
        (qa.py:221-222); model.chat substitutes each <image> with
        <img> + IMG_CONTEXT*num_image_token*tiles + </img>."""
        tok = self.tokenizer
        enc = tok.encode
        img_s = getattr(tok, "IMG_START", tok.IM_START)
        img_e = getattr(tok, "IMG_END", tok.IM_END)

        ids: List[int] = [tok.BOS]
        ids += [tok.IM_START] + enc("system\n" + self.system_prompt)
        ids += [tok.IM_END] + enc("\n")
        ids += [tok.IM_START] + enc("user\n")
        img_positions: List[int] = []
        for i, n_tiles in enumerate(num_patches_list):
            ids += enc(f"Frame{i + 1}: ") + [img_s]
            for _ in range(n_tiles * self.num_image_token):
                img_positions.append(len(ids))
                ids.append(tok.IMG_CONTEXT)
            ids += [img_e] + enc("\n")
        ids += enc(question) + [tok.IM_END] + enc("\n")
        ids += [tok.IM_START] + enc("assistant\n")
        return ids, img_positions

    def _vision_apply(self, p, tiles):
        # uint8 tiles are normalized ON DEVICE (x/255 - mean)/std folded
        # to one multiply-add, so the host->device upload is 1 byte per
        # channel (4x less than the reference's float pixel_values;
        # uploads are host-serialization-bound on remote links)
        if tiles.dtype == jnp.uint8:
            from .preprocess import IMAGENET_MEAN, IMAGENET_STD

            scale = jnp.asarray(1.0 / (255.0 * IMAGENET_STD), self.dtype)
            bias = jnp.asarray(-IMAGENET_MEAN / IMAGENET_STD, self.dtype)
            tiles = tiles.astype(self.dtype) * scale + bias
        return self.vision.apply({"params": p["vision"]}, tiles)

    def _vision_apply_yuv(self, p, planes, full_range):
        """I420 planes [n, S*S*3//2] uint8 -> vision tokens.

        BT.601 conversion (nearest 2x2 chroma upsample, matching
        swscale's unscaled yuv420p->rgb block sharing) + ImageNet
        normalization run FUSED on device, so the host uploads half the
        RGB bytes. Same coefficient structure as the grounding serving
        path (inference/grounding.py fwd_yuv); ``full_range`` is a traced
        0-d bool selecting limited (MPEG) vs full (JPEG) range, so one
        compiled program serves both source types."""
        S = self.vit_cfg.image_size
        npx, nc = S * S, (S // 2) * (S // 2)
        n = planes.shape[0]
        y = planes[:, :npx].reshape(n, S, S).astype(jnp.float32)
        u = planes[:, npx:npx + nc].reshape(
            n, S // 2, S // 2).astype(jnp.float32)
        v = planes[:, npx + nc:].reshape(
            n, S // 2, S // 2).astype(jnp.float32)
        u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2) - 128.0
        v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2) - 128.0
        fr = full_range
        yl = jnp.where(fr, y, 1.1643835616 * (y - 16.0))
        r = yl + jnp.where(fr, 1.402, 1.5960267857) * v
        g = (yl - jnp.where(fr, 0.344136, 0.3917622768) * u
             - jnp.where(fr, 0.714136, 0.8129676339) * v)
        b = yl + jnp.where(fr, 1.772, 2.0172321429) * u
        rgb = jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)

        from .preprocess import IMAGENET_MEAN, IMAGENET_STD

        scale = jnp.asarray(1.0 / (255.0 * IMAGENET_STD), jnp.float32)
        bias = jnp.asarray(-IMAGENET_MEAN / IMAGENET_STD, jnp.float32)
        tiles = (rgb * scale + bias).astype(self.dtype)
        return self.vision.apply({"params": p["vision"]}, tiles)

    def set_vit_flash(self, flash: bool) -> None:
        """Swap the ViT attention op (XLA einsum <-> Pallas flash kernel)
        in place and re-jit the vision fn. Parameters are untouched — the
        flag only changes the attention implementation — so A/B benchmarks
        can flip it inside one chip session (tools/bench_qa.py
        --ab-vit-flash)."""
        import dataclasses as _dc

        self.vit_cfg = _dc.replace(self.vit_cfg, flash=flash)
        self.vision = VisionTower(self.vit_cfg)
        self._vision_fn = jax.jit(self._vision_apply)
        self._vision_yuv_fn = jax.jit(self._vision_apply_yuv)

    def _encode_vision(self, tiles) -> jnp.ndarray:
        """Upload host tiles and run the vision tower -> [n_tiles, tok, D].

        uint8 batches larger than ``_vision_chunk`` are uploaded
        chunk-wise with the ViT dispatched per chunk, pipelining device
        compute under the host-side upload serialization (see __init__).
        The put and dispatch INTERLEAVE (put c0, dispatch c0, put c1, ...):
        r3 enqueued every upload before the first dispatch, which measured
        zero gain — this link executes in submission order, so all
        serialization finished before any compute started; interleaved,
        chunk k+1's host serialization runs under chunk k's ViT compute.
        A batch that does not divide evenly chunks the divisible prefix
        and runs the remainder as a final (smaller) part — one extra
        compiled shape, but the knob never silently no-ops (advisor r3).

        ``YUVTiles`` batches ride the same chunked interleave with the
        I420 planes (half the upload bytes) and the fused on-device
        BT.601 conversion (:meth:`_vision_apply_yuv`)."""
        if isinstance(tiles, YUVTiles):
            planes = tiles.planes
            fr = jnp.asarray(tiles.full_range)
            n = planes.shape[0]
            ck = self._vision_chunk_yuv
            if ck <= 0 or n <= ck:
                return self._vision_yuv_fn(
                    self.params, jnp.asarray(planes), fr)
            outs = []
            for i in range(0, n, ck):
                part = jnp.asarray(planes[i:i + ck])
                outs.append(self._vision_yuv_fn(self.params, part, fr))
            return jnp.concatenate(outs, axis=0)
        n = tiles.shape[0]
        ck = self._vision_chunk
        if tiles.dtype != np.uint8 or ck <= 0 or n <= ck:
            dev = (jnp.asarray(tiles) if tiles.dtype == np.uint8
                   else jnp.asarray(tiles, self.dtype))
            return self._vision_fn(self.params, dev)
        outs = []
        for i in range(0, n, ck):
            part = jnp.asarray(tiles[i:i + ck])
            outs.append(self._vision_fn(self.params, part))
        return jnp.concatenate(outs, axis=0)

    # -- public chat API ----------------------------------------------------
    def chat(
        self,
        tiles: np.ndarray,              # [n_tiles, S, S, 3] uint8 (device-
                                        # normalized) or pre-normalized float
        question: str,
        gen: Optional[GenerationConfig] = None,
        num_patches_list: Optional[List[int]] = None,
        rng: Optional[jax.Array] = None,
        return_stats: bool = False,
    ):
        """Returns the answer string; with ``return_stats`` a
        ``(answer, stats)`` tuple where stats carries the per-phase wall
        times and token rates (vision encode / prefill / decode). Phase
        boundaries are forced with scalar host fetches — on remote-device
        links ``block_until_ready`` does not await execution, so each
        fetch both completes and fences the phase (the fence costs a
        sub-ms sync locally, ~0.3 s through a tunnel; serving calls leave
        ``return_stats`` off and keep the phases pipelined)."""
        import time as _time

        gen = gen or GenerationConfig()
        if num_patches_list is None:
            num_patches_list = [tiles.shape[0]]
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        stats = {}
        if self._scan_decode:
            self._ensure_scan_params()

        t0 = _time.time()
        vision_tokens = self._encode_vision(tiles)  # [n_tiles, tok, D]
        vision_tokens = vision_tokens.reshape(-1, vision_tokens.shape[-1])
        if return_stats:
            float(vision_tokens[0, 0])  # fence
            stats["vision_s"] = _time.time() - t0
            stats["vision_tiles"] = int(tiles.shape[0])
            t0 = _time.time()

        ids, img_positions = self.build_prompt_ids(question, num_patches_list)
        assert len(img_positions) == vision_tokens.shape[0], (
            len(img_positions), vision_tokens.shape)
        length = len(ids)
        if length > self.max_seq_len:
            raise ValueError(
                f"prompt is {length} tokens but the model's context is "
                f"{self.max_seq_len}; reduce num_frames or tiles "
                f"({len(num_patches_list)} frames x {self.num_image_token} "
                "image tokens per tile)"
            )
        Lp, chunked = self._plan_prefill(length)
        max_total = min(self.max_seq_len, Lp + gen.max_new_tokens)

        from .llm_functional import embed_tokens

        ids_arr = np.zeros((1, Lp), np.int32)
        ids_arr[0, :length] = ids
        embeds = embed_tokens(
            self.params["embed"], self.llm_cfg, jnp.asarray(ids_arr)
        ).astype(self.dtype)
        if img_positions:
            embeds = embeds.at[0, jnp.asarray(img_positions)].set(
                vision_tokens.astype(self.dtype)
            )

        # prefill always rides the bf16-KV path (write-time int8 cost the
        # chunked flash prefill ~0.15 s: per-chunk dequant of the whole
        # cache for the kernel + quantize-at-write); int8 decode caches
        # are produced by ONE post-prefill conversion pass instead
        cache = init_kv_cache(self.llm_cfg, 1, max_total, self.dtype,
                              stacked=self._stacked_kv)
        if chunked:
            # long prompts (e.g. 32-frame QA, ~8.7k tokens): chunked
            # prefill bounds transient attention logits at [H, CK, S]
            logits, cache = self._prefill_chunked(
                self.params, embeds, jnp.asarray(length), cache
            )
        else:
            logits, cache = self._prefill(
                self.params, embeds, jnp.asarray(length), cache
            )
        if self._kv_quant == "int8":
            cache = self._quantize_cache(cache)
        if return_stats:
            float(logits[0, 0])  # fence
            stats["prefill_s"] = _time.time() - t0
            stats["prefill_tokens"] = length
            stats["prefill_tok_s"] = length / stats["prefill_s"]
            stats["prefill_chunked"] = bool(chunked)
            t0 = _time.time()

        tok = self.tokenizer
        if not gen.do_sample or gen.temperature <= 0:
            # greedy: one device program for the whole generation
            stop_ids = (jnp.asarray([-1, -1], jnp.int32) if gen.ignore_eos
                    else jnp.asarray([tok.EOS, tok.IM_END], jnp.int32))
            tokens = self._greedy_loop(
                self.params, cache, logits,
                jnp.asarray(length, jnp.int32), stop_ids, gen.max_new_tokens,
            )
            out_ids = [int(t) for t in np.asarray(tokens) if t >= 0]
            text = self.tokenizer.decode(out_ids)
            if return_stats:
                stats["decode_s"] = _time.time() - t0
                stats["decode_tokens"] = len(out_ids)
                stats["decode_tok_s"] = (
                    max(len(out_ids), 1) / stats["decode_s"])
                return text, stats
            return text

        # temperature/top-p sampling, also as one device program
        stop_ids = (jnp.asarray([-1, -1], jnp.int32) if gen.ignore_eos
                    else jnp.asarray([tok.EOS, tok.IM_END], jnp.int32))
        tokens = self._sample_loop(
            self.params, cache, logits, jnp.asarray(length, jnp.int32),
            stop_ids, gen.max_new_tokens, rng,
            jnp.asarray(gen.temperature, jnp.float32),
            jnp.asarray(gen.top_p, jnp.float32),
        )
        out_ids = [int(t) for t in np.asarray(tokens) if t >= 0]
        text = self.tokenizer.decode(out_ids)
        if return_stats:
            stats["decode_s"] = _time.time() - t0
            stats["decode_tokens"] = len(out_ids)
            stats["decode_tok_s"] = max(len(out_ids), 1) / stats["decode_s"]
            return text, stats
        return text

    def chat_batch(
        self,
        requests,
        gen: Optional[GenerationConfig] = None,
        gens: Optional[List[GenerationConfig]] = None,
        rng: Optional[jax.Array] = None,
        return_stats: bool = False,
    ):
        """Serve B requests concurrently with one lockstep batched decode.

        ``requests``: list of ``(tiles, question)`` or
        ``(tiles, question, num_patches_list)`` tuples. Vision encode and
        (flash/chunked) prefill run per request — each into its own row of
        a shared [B, ...] KV cache — then every row decodes together in a
        single scan program, so aggregate decode throughput scales with B.
        ``gens`` (one GenerationConfig per request) gives each row its own
        max_new_tokens / temperature / top_p; sampled rows draw from
        independent per-row RNG streams (``fold_in(rng, row)``) whose split
        chain matches the solo sampler, so batching does not change any
        row's answer. ``gen`` applies one config to every row. Returns a
        list of answers (plus a stats dict with ``return_stats``).

        Net-new vs the reference, which serves strictly one request at a
        time (its server wraps ``model.chat`` in a single-flight lock)."""
        import time as _time

        if gens is not None:
            if len(gens) != len(requests):
                raise ValueError(
                    f"{len(gens)} generation configs for "
                    f"{len(requests)} requests"
                )
        else:
            gens = [gen or GenerationConfig()] * len(requests)
        if not requests:
            return ([], {}) if return_stats else []
        if self._scan_decode:
            self._ensure_scan_params()

        from .llm_functional import embed_tokens

        t0 = _time.time()
        prepped = []
        for req in requests:
            tiles, question = req[0], req[1]
            npl = list(req[2]) if len(req) > 2 else [tiles.shape[0]]
            vision_tokens = self._encode_vision(tiles)
            vision_tokens = vision_tokens.reshape(-1, vision_tokens.shape[-1])
            ids, img_positions = self.build_prompt_ids(question, npl)
            if len(img_positions) != vision_tokens.shape[0]:
                raise ValueError(
                    f"{len(img_positions)} image-token slots vs "
                    f"{vision_tokens.shape[0]} vision tokens"
                )
            if len(ids) > self.max_seq_len:
                raise ValueError(
                    f"prompt is {len(ids)} tokens but the model's context "
                    f"is {self.max_seq_len}"
                )
            prepped.append((vision_tokens, ids, img_positions, len(ids)))

        # plan ONE prefill shape from the longest prompt so every row runs
        # the same jitted program (shorter rows pad; their cache rows are
        # masked by per-row positions during decode)
        Lp, chunked = self._plan_prefill(max(p[3] for p in prepped))
        max_new = max(g.max_new_tokens for g in gens)
        max_total = min(self.max_seq_len, Lp + max_new)

        # the [B, ...] decode cache is allocated ONCE and each row's prefill
        # cache is moved into it with a donated dynamic_update_slice — a
        # concatenate here would transiently hold 2x the batch cache (at the
        # 32-frame protocol a cache row is ~1.2 GB, so B=4 concat + the four
        # row caches + the 7.7 GB int8 weights would exceed one v5e's HBM)
        batch_cache = init_kv_cache(
            self.llm_cfg, len(prepped), max_total, self.dtype,
            stacked=self._stacked_kv or self._scan_decode,
            quant=self._kv_quant,
        )
        first_rows, lengths = [], []
        for i, (vision_tokens, ids, img_positions, length) in enumerate(
                prepped):
            ids_arr = np.zeros((1, Lp), np.int32)
            ids_arr[0, :length] = ids
            embeds = embed_tokens(
                self.params["embed"], self.llm_cfg, jnp.asarray(ids_arr)
            ).astype(self.dtype)
            if img_positions:
                embeds = embeds.at[0, jnp.asarray(img_positions)].set(
                    vision_tokens.astype(self.dtype)
                )
            # row prefill on the bf16 path; convert to int8 only when
            # moving the row into the int8 batch cache (see chat())
            cache = init_kv_cache(self.llm_cfg, 1, max_total, self.dtype,
                                  stacked=self._stacked_kv)
            fn = self._prefill_chunked if chunked else self._prefill
            logits, cache = fn(self.params, embeds, jnp.asarray(length),
                               cache)
            if self._kv_quant == "int8":
                cache = self._quantize_cache(cache)
            batch_cache = self._insert_cache_row(
                batch_cache, cache, jnp.asarray(i, jnp.int32)
            )
            first_rows.append(logits)
            lengths.append(length)

        first_logits = jnp.concatenate(first_rows, axis=0)
        positions = jnp.asarray(lengths, jnp.int32)
        tok = self.tokenizer
        stop_ids = (jnp.asarray([-1, -1], jnp.int32)
                    if all(g.ignore_eos for g in gens)
                    else jnp.asarray([tok.EOS, tok.IM_END], jnp.int32))
        limits = jnp.asarray([g.max_new_tokens for g in gens], jnp.int32)
        sampled = [bool(g.do_sample and g.temperature > 0) for g in gens]
        if any(sampled):
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            keys = jax.vmap(lambda b: jax.random.fold_in(rng, b))(
                jnp.arange(len(gens))
            )
            temps = jnp.asarray(
                [g.temperature if s else 0.0
                 for g, s in zip(gens, sampled)], jnp.float32)
            top_ps = jnp.asarray([g.top_p for g in gens], jnp.float32)
            tokens = self._sample_batch(
                self.params, batch_cache, first_logits, positions, stop_ids,
                max_new, limits, keys, temps, top_ps,
            )
        else:
            tokens = self._greedy_batch(
                self.params, batch_cache, first_logits, positions, stop_ids,
                max_new, limits,
            )
        tokens = np.asarray(tokens)                   # [max_new, B]
        answers = [
            tok.decode([int(t) for t in tokens[:, b] if t >= 0])
            for b in range(tokens.shape[1])
        ]
        if return_stats:
            dt = _time.time() - t0
            stats = {
                "batch": len(requests),
                "total_s": dt,
                # aggregate tokens over the FULL batch call (vision +
                # prefill + lockstep decode) — not comparable to chat()'s
                # decode-phase-only decode_tok_s
                "agg_tok_s_e2e": sum(
                    g.max_new_tokens for g in gens) / dt,
            }
            return answers, stats
        return answers
