"""QA decode throughput benchmark: bf16 vs int8 weight-only quantization.

Measures vision encode + prefill + on-device greedy decode (the lax.scan
loop — per-token host round trips cost ~50 ms through remote tunnels) at a
configurable LLM scale, then prints a tok/s table. Not part of the driver
contract (bench.py is the headline); feeds the BASELINE.md table.

Usage:
  python tools/bench_qa.py                 # 1B-class LLM, 8 frames
  python tools/bench_qa.py --layers 32 --hidden 2048   # larger
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vgqa_tpu.utils.platform import apply_platform_env

apply_platform_env()


def _as_tiles(tiles):
    import numpy as np

    from vgqa_tpu.qa import YUVTiles

    return tiles if isinstance(tiles, YUVTiles) else np.asarray(tiles)


def run(engine, tiles, n_frames, max_new, label):
    import numpy as np

    from vgqa_tpu.qa import GenerationConfig

    # ignore_eos: the while_loop decode exits at EOS (right for serving);
    # benchmarks pin the decode length for comparable tok/s
    gen = GenerationConfig(max_new_tokens=max_new, do_sample=False,
                           ignore_eos=True)
    patches = [1] * n_frames
    t0 = time.time()
    engine.chat(_as_tiles(tiles), "what happens in the video?", gen,
                num_patches_list=patches)
    compile_s = time.time() - t0

    iters = 3
    t0 = time.time()
    for i in range(iters):
        out = engine.chat(
            _as_tiles(tiles), f"what happens in the video {i}?", gen,
            num_patches_list=patches,
        )
    dt = (time.time() - t0) / iters
    toks = max_new / dt
    print(f"{label}: {toks:.1f} tok/s  ({dt:.2f} s e2e for {max_new} tokens; "
          f"compile {compile_s:.0f}s; sample answer len {len(out)})",
          flush=True)

    # per-phase split (vision / prefill / decode) over `iters` fenced runs
    acc = {}
    for i in range(iters):
        _, st = engine.chat(
            _as_tiles(tiles), f"what happens in the video {i}?", gen,
            num_patches_list=patches, return_stats=True,
        )
        for k, v in st.items():
            acc[k] = acc.get(k, 0.0) + v / iters
    print(
        f"{label} phases: vision {acc['vision_s']:.2f}s "
        f"({acc['vision_tiles']:.0f} tiles) | "
        f"prefill {acc['prefill_s']:.2f}s = {acc['prefill_tok_s']:.0f} tok/s "
        f"({acc['prefill_tokens']:.0f} tokens, "
        f"chunked={acc['prefill_chunked'] > 0}) | "
        f"decode {acc['decode_s']:.2f}s = {acc['decode_tok_s']:.1f} tok/s",
        flush=True,
    )
    return toks


def bench_batches(engine, tiles, n_frames, max_new, sizes):
    """chat_batch lockstep serving at each batch size vs sequential chats."""
    from vgqa_tpu.qa import GenerationConfig

    gen = GenerationConfig(max_new_tokens=max_new, do_sample=False,
                           ignore_eos=True)
    seq_1 = None
    for B in sizes:
        if B < 1:
            continue
        reqs = [
            (tiles, f"what happens in the video {i}?", [1] * n_frames)
            for i in range(B)
        ]
        try:
            engine.chat_batch(reqs, gen)  # compile
            t0 = time.time()
            engine.chat_batch(reqs, gen)
            bt = time.time() - t0
        except Exception as e:  # document the HBM ceiling, keep going
            msg = str(e).splitlines()[0][:160]
            print(f"batch={B}: FAILED ({type(e).__name__}: {msg})",
                  flush=True)
            continue
        if seq_1 is None:
            t0 = time.time()
            engine.chat(reqs[0][0], reqs[0][1], gen,
                        num_patches_list=reqs[0][2])
            seq_1 = time.time() - t0
        st = B * seq_1
        agg = B * max_new / bt
        print(
            f"batch={B}: {bt:.2f}s batched vs ~{st:.2f}s sequential "
            f"({st / bt:.2f}x) | aggregate {agg:.1f} tok/s e2e | "
            f"per-request latency {bt:.2f}s",
            flush=True,
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--inter", type=int, default=5504)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--max-new", type=int, default=32)
    ap.add_argument("--vit-layers", type=int, default=12)
    ap.add_argument("--max-seq", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=1,
                    help="also bench chat_batch with B concurrent requests")
    ap.add_argument("--batch-sweep", default="",
                    help="comma list of batch sizes (e.g. 1,2,4,8); "
                         "implies --batch > 1 behavior per size")
    ap.add_argument("--ab-w8a8", action="store_true",
                    help="after the int8 run, A/B the W8A8 prefill "
                         "(dynamic int8 activations) in-process")
    ap.add_argument("--ab-vision-chunks", type=int, default=0,
                    help="A/B the vision phase only: single-shot vs this "
                         "chunk size, one process (comparable timings)")
    ap.add_argument("--ab-yuv-tiles", action="store_true",
                    help="A/B the vision-phase tile upload: RGB uint8 "
                         "tiles vs I420 planes (half the bytes) with "
                         "on-device BT.601, one process (engine.YUVTiles)")
    ap.add_argument("--ab-vit-flash", action="store_true",
                    help="A/B the ViT attention op in the vision phase: "
                         "XLA einsum vs the Pallas flash kernel, one "
                         "process (engine.set_vit_flash)")
    ap.add_argument("--ab-stacked-kv", action="store_true",
                    help="A/B the KV-cache layout in-process: per-layer "
                         "list vs one stacked [nL, ...] buffer per side "
                         "(engine.set_stacked_kv). Runs e2e both arms; "
                         "--batch-sweep sizes run on the STACKED arm (the "
                         "list-layout batch numbers are in BASELINE.md)")
    ap.add_argument("--ab-kv-int8", action="store_true",
                    help="A/B the int8 KV cache in-process: bf16 cache vs "
                         "int8+per-token-scale cache (engine.set_kv_int8). "
                         "Runs e2e both arms; --batch-sweep sizes run on "
                         "the INT8 arm (bf16-cache batch numbers are in "
                         "BASELINE.md; int8 rows halve the KV footprint "
                         "— measured r5: batch=4 unlocked, batch=8 still "
                         "rejected by the remote compile service unless "
                         "--scan-decode, then HBM-bound)")
    ap.add_argument("--yuv-tiles", action="store_true",
                    help="run the MAIN e2e pass with I420-plane tiles "
                         "(engine.YUVTiles) — the serving transport "
                         "(inference.qa gets planes free from the native "
                         "decoder); default RGB keeps rounds comparable")
    ap.add_argument("--scan-decode", action="store_true",
                    help="layer-scanned decode (VGQA_SCAN_DECODE): one "
                         "lax.scan over host-stacked params + the stacked "
                         "int8 KV cache — ~32x smaller decode program, "
                         "targets the remote-compile batch>=8 ceiling")
    ap.add_argument("--quant-only", action="store_true",
                    help="skip the bf16 pass (8B-class bf16 exceeds one "
                         "v5e's 16 GB HBM; int8 fits)")
    ap.add_argument("--wq", choices=("int8", "int4"), default="int8",
                    help="weight-only quantization for the quant pass: "
                         "int8 per-channel (default) or int4 group-128 "
                         "(lm_head stays int8) — decode is weight-HBM-"
                         "bound, int4 halves the per-token weight read")
    args = ap.parse_args()

    import os

    if args.scan_decode:
        os.environ["VGQA_SCAN_DECODE"] = "1"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vgqa_tpu.qa import LLMConfig, QAEngine, ViTConfig
    from vgqa_tpu.qa.quant import (quantize_llm_params,
                                   quantize_llm_params_int4)

    def quantize(tree):
        if args.wq == "int4":
            return quantize_llm_params_int4(tree)
        return quantize_llm_params(tree)

    llm_cfg = LLMConfig(
        vocab_size=92553, hidden_size=args.hidden, num_layers=args.layers,
        num_heads=args.heads, num_kv_heads=args.kv_heads,
        intermediate_size=args.inter, max_seq_len=args.max_seq,
    )
    vit_cfg = ViTConfig(
        image_size=448, patch_size=14, hidden_size=1024,
        num_layers=args.vit_layers,
        num_heads=16, intermediate_size=4096, llm_hidden_size=args.hidden,
    )
    n_params = (
        args.layers * (
            args.hidden * (args.heads + 2 * args.kv_heads)
            * (args.hidden // args.heads)
            + args.hidden * args.hidden
            + 3 * args.hidden * args.inter
        )
        + 2 * 92553 * args.hidden
    )
    print(f"LLM: {args.layers}L x {args.hidden}d (~{n_params/1e9:.2f}B params), "
          f"{args.frames} frames, bf16 base", flush=True)

    if args.quant_only:
        # 8B-class: init + quantize on host CPU (an f32 device init would
        # need 4 bytes/param of HBM), then upload the int8 tree
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            engine = QAEngine.init_random(llm_cfg, vit_cfg, dtype=jnp.bfloat16,
                                          max_seq_len=args.max_seq)
            engine.params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x,
                engine.params,
            )
            engine.params["llm"] = quantize(engine.params["llm"])
            if args.scan_decode:
                # stack on HOST (engine._ensure_scan_params then no-ops);
                # int4 keeps dual storage — see stack_llm_layers
                from vgqa_tpu.qa.llm_functional import stack_llm_layers

                engine.params["llm"] = stack_llm_layers(
                    engine.params["llm"], args.layers,
                    keep_layers=(args.wq == "int4"))
        dev = jax.devices()[0]
        engine.params = jax.device_put(engine.params, dev)
    else:
        engine = QAEngine.init_random(llm_cfg, vit_cfg, dtype=jnp.bfloat16,
                                      max_seq_len=args.max_seq)
        engine.params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            engine.params,
        )
    # uint8 tiles, matching the serving path: load_video_tiles returns
    # uint8 and chat() normalizes on device (1-byte upload per channel)
    tiles = np.random.RandomState(0).randint(
        0, 256, (args.frames, 448, 448, 3), dtype=np.uint8
    )
    if args.yuv_tiles:
        import cv2

        from vgqa_tpu.qa import YUVTiles

        tiles = YUVTiles(np.stack([
            cv2.cvtColor(t, cv2.COLOR_RGB2YUV_I420).reshape(-1)
            for t in tiles
        ]), full_range=True)

    if args.ab_yuv_tiles:
        # in-process A/B of the tile upload format: the same source tiles
        # ride (a) RGB uint8 [n, S, S, 3] and (b) I420 planes
        # [n, S*S*3//2] with the fused on-device BT.601 + normalize
        # (engine.YUVTiles). Half the upload bytes; the vision phase is
        # host-serialization-bound (BASELINE.md r4: 0.733 s at 32 tiles,
        # 0.402 s device compute).
        import cv2

        from vgqa_tpu.qa import GenerationConfig, YUVTiles

        planes = np.stack([
            cv2.cvtColor(t, cv2.COLOR_RGB2YUV_I420).reshape(-1)
            for t in tiles
        ])
        gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                               ignore_eos=True)
        patches = [1] * args.frames
        for label, arg in (("rgb", tiles),
                           ("i420", YUVTiles(planes, full_range=True))):
            engine.chat(arg, "warm", gen, num_patches_list=patches)
            vs = 0.0
            for i in range(4):
                _, st = engine.chat(
                    arg, f"q{i}?", gen, num_patches_list=patches,
                    return_stats=True,
                )
                vs += st["vision_s"] / 4
            print(f"vision tiles={label}: {vs:.3f} s "
                  f"({args.frames} tiles)", flush=True)
        return

    if args.ab_vit_flash:
        # in-process A/B of the ViT attention op (identical params; the
        # flash flag only swaps the attention implementation). Chunked
        # upload stays at the configured default for both arms.
        from vgqa_tpu.qa import GenerationConfig

        gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                               ignore_eos=True)
        patches = [1] * args.frames
        for flash in (False, True):
            engine.set_vit_flash(flash)
            engine.chat(tiles, "warm", gen, num_patches_list=patches)
            vs = 0.0
            for i in range(4):
                _, st = engine.chat(
                    tiles, f"q{i}?", gen, num_patches_list=patches,
                    return_stats=True,
                )
                vs += st["vision_s"] / 4
            print(f"vision vit_flash={flash}: {vs:.3f} s "
                  f"({args.frames} tiles)", flush=True)
        return

    if args.ab_vision_chunks:
        # in-process A/B of the chunked vision-upload pipeline (one chip
        # session -> comparable numbers): fenced vision phase, chunked vs
        # single-shot, same engine/params
        from vgqa_tpu.qa import GenerationConfig

        gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                               ignore_eos=True)
        patches = [1] * args.frames
        for ck in (0, args.ab_vision_chunks):
            engine._vision_chunk = ck
            engine._vision_chunk_yuv = ck  # A/B covers both transports
            engine.chat(tiles, "warm", gen, num_patches_list=patches)
            vs = 0.0
            for i in range(4):
                _, st = engine.chat(
                    tiles, f"q{i}?", gen, num_patches_list=patches,
                    return_stats=True,
                )
                vs += st["vision_s"] / 4
            print(f"vision chunks={ck}: {vs:.3f} s "
                  f"({args.frames} tiles)", flush=True)
        return

    if args.ab_kv_int8:
        # in-process KV-dtype A/B (one chip session -> comparable): the
        # prefill/decode jits retrace on the new cache pytree (int8
        # entries are dicts); params untouched
        for kv8 in (False, True):
            engine.set_kv_int8(kv8)
            run(engine, tiles, args.frames, args.max_new,
                f"{args.wq} kv_int8={int(kv8)} ")
        if args.batch_sweep:
            sizes = [int(b) for b in args.batch_sweep.split(",")]
            print("batch sweep on the int8-KV cache:", flush=True)
            bench_batches(engine, tiles, args.frames, args.max_new, sizes)
        return

    if args.ab_stacked_kv:
        # in-process KV-layout A/B (one chip session -> comparable):
        # decode jits retrace on the new cache pytree; params untouched
        for stacked in (False, True):
            engine.set_stacked_kv(stacked)
            run(engine, tiles, args.frames, args.max_new,
                f"int8 stacked_kv={int(stacked)} ")
        if args.batch_sweep:
            sizes = [int(b) for b in args.batch_sweep.split(",")]
            print("batch sweep on the stacked layout:", flush=True)
            bench_batches(engine, tiles, args.frames, args.max_new, sizes)
        return

    bf16 = None
    if not args.quant_only:
        bf16 = run(engine, tiles, args.frames, args.max_new, "bf16 ")
        engine.params["llm"] = quantize(engine.params["llm"])
    int8 = run(engine, tiles, args.frames, args.max_new, f"{args.wq} ")
    if bf16:
        print(f"{args.wq}/bf16 speedup: {int8 / bf16:.2f}x", flush=True)

    if args.ab_w8a8:
        # A/B the W8A8 prefill in-process: the flag is frozen into the
        # jitted prefill at trace time, so flip it and rebuild the jit
        # wrappers to force a retrace (same params, one chip session)
        from vgqa_tpu.qa import GenerationConfig

        gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                               ignore_eos=True)
        patches = [1] * args.frames
        flag0 = engine._w8a8_prefill
        wrap0 = (engine._prefill, engine._prefill_chunked)
        for flag in (False, True):
            engine._w8a8_prefill = flag
            engine._prefill = jax.jit(
                engine._prefill_impl, donate_argnums=(3,))
            engine._prefill_chunked = jax.jit(
                engine._prefill_chunked_impl, donate_argnums=(3,))
            engine.chat(tiles, "warm", gen, num_patches_list=patches)
            ps, toks = 0.0, None
            for i in range(4):
                _, st = engine.chat(
                    tiles, f"q{i}?", gen, num_patches_list=patches,
                    return_stats=True,
                )
                ps += st["prefill_s"] / 4
                toks = st.get("prefill_tokens", toks)
            print(f"prefill w8a8={flag}: {ps:.3f} s"
                  + (f" = {toks / ps:.0f} tok/s" if toks else ""),
                  flush=True)
        # restore the configured flag and the ORIGINAL compiled wrappers so
        # later blocks (e.g. --batch) measure the default path without a
        # retrace
        engine._w8a8_prefill = flag0
        engine._prefill, engine._prefill_chunked = wrap0

    if args.batch > 1 or args.batch_sweep:
        # concurrent serving: B requests through chat_batch (per-row KV
        # rows, lockstep decode) vs B sequential chats. --batch accepts a
        # single B or a {1,2,4,8}-style sweep via --batch-sweep.
        sizes = ([int(b) for b in args.batch_sweep.split(",")]
                 if args.batch_sweep else [args.batch])
        bench_batches(engine, tiles, args.frames, args.max_new, sizes)


if __name__ == "__main__":
    main()
