import numpy as np
import pytest

from vgqa_tpu.qa import GenerationConfig, LLMConfig, QAEngine, ViTConfig
from vgqa_tpu.qa.engine import ByteTokenizer
from vgqa_tpu.qa.preprocess import dynamic_tile, find_closest_aspect_ratio


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    text = "What color is the square? répondez"
    assert tok.decode(tok.encode(text)) == text


def test_dynamic_tile_shapes():
    img = np.zeros((100, 300, 3), np.uint8)  # 3:1 aspect
    tiles = dynamic_tile(img, image_size=32, max_num=6)
    # 3x1 tiling + thumbnail
    assert tiles.shape == (4, 32, 32, 3)
    square = np.zeros((64, 64, 3), np.uint8)
    tiles = dynamic_tile(square, image_size=32, max_num=1)
    assert tiles.shape == (1, 32, 32, 3)  # single tile -> no thumbnail


def test_closest_aspect_ratio():
    ratios = [(1, 1), (2, 1), (1, 2)]
    assert find_closest_aspect_ratio(2.0, ratios, 200, 100, 32) == (2, 1)
    assert find_closest_aspect_ratio(0.5, ratios, 100, 200, 32) == (1, 2)


@pytest.fixture(scope="module")
def tiny_engine():
    return QAEngine.init_random(LLMConfig.tiny(), ViTConfig.tiny())


def test_llm_kv_cache_decode_matches_prefill(tiny_engine):
    """Decoding token-by-token through the cache must match a full forward."""
    import jax
    import jax.numpy as jnp

    from vgqa_tpu.qa.llm import init_kv_cache

    eng = tiny_engine
    ids = np.array([[7, 20, 33, 90, 17]], np.int32)
    L = ids.shape[1]
    embeds = eng.embed.apply({"params": eng.params["embed"]}, jnp.asarray(ids))

    # full causal forward
    pos = jnp.arange(L)[None]
    causal = jnp.tril(jnp.ones((1, L, L), bool))
    full_logits, _ = eng.llm.apply(
        {"params": eng.params["llm"]}, embeds, pos, causal
    )

    # prefill 2 tokens, decode the rest one by one
    cache = init_kv_cache(eng.llm_cfg, 1, L + 4, jnp.float32)
    last, cache = eng._prefill(eng.params, embeds[:, :2], jnp.asarray(2), cache)
    np.testing.assert_allclose(
        np.asarray(last[0]), np.asarray(full_logits[0, 1]), atol=2e-4
    )
    for t in range(2, L):
        last, cache = eng._decode_step(
            eng.params, cache, jnp.asarray([ids[0, t]]), jnp.asarray(t, jnp.int32)
        )
        np.testing.assert_allclose(
            np.asarray(last[0]), np.asarray(full_logits[0, t]), atol=2e-4,
            err_msg=f"mismatch at position {t}",
        )


def test_chat_generates_text(tiny_engine):
    eng = tiny_engine
    s = eng.vit_cfg.image_size
    tiles = np.random.RandomState(0).rand(2, s, s, 3).astype(np.float32)
    answer = eng.chat(
        tiles,
        "what is moving?",
        GenerationConfig(max_new_tokens=8, do_sample=False),
        num_patches_list=[1, 1],
    )
    assert isinstance(answer, str)
    assert len(answer) <= 8 * 4  # byte tokenizer: each token <= 1 char


def test_chat_deterministic_greedy(tiny_engine):
    eng = tiny_engine
    s = eng.vit_cfg.image_size
    tiles = np.random.RandomState(1).rand(1, s, s, 3).astype(np.float32)
    g = GenerationConfig(max_new_tokens=6, do_sample=False)
    a1 = eng.chat(tiles, "question", g)
    a2 = eng.chat(tiles, "question", g)
    assert a1 == a2


def test_chat_uint8_tiles_match_float(tiny_engine):
    """uint8 tiles (device-side normalize) must produce the same greedy
    answer as the pre-normalized float path (same pixels both ways)."""
    from vgqa_tpu.qa.preprocess import normalize_tiles

    eng = tiny_engine
    s = eng.vit_cfg.image_size
    raw = np.random.RandomState(3).randint(
        0, 256, (2, s, s, 3), dtype=np.uint8
    )
    g = GenerationConfig(max_new_tokens=6, do_sample=False)
    a_float = eng.chat(normalize_tiles(raw), "what?", g,
                       num_patches_list=[1, 1])
    a_uint8 = eng.chat(raw, "what?", g, num_patches_list=[1, 1])
    assert a_uint8 == a_float


def test_encode_vision_chunked_matches_single_shot(tiny_engine):
    """Chunked vision-upload pipelining (VGQA_VISION_CHUNKS) is a pure
    perf transform: the per-chunk ViT dispatch must yield the same tokens
    as the one-shot path on the same uint8 tiles."""
    eng = tiny_engine
    s = eng.vit_cfg.image_size
    raw = np.random.RandomState(7).randint(
        0, 256, (4, s, s, 3), dtype=np.uint8
    )
    ragged = raw[:3]  # 3 % 2 != 0: prefix chunk + remainder part
    old = eng._vision_chunk
    try:
        eng._vision_chunk = 0
        one = np.asarray(eng._encode_vision(raw))
        one_ragged = np.asarray(eng._encode_vision(ragged))
        eng._vision_chunk = 2
        chunked = np.asarray(eng._encode_vision(raw))
        chunked_ragged = np.asarray(eng._encode_vision(ragged))
    finally:
        eng._vision_chunk = old
    np.testing.assert_allclose(chunked, one, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(chunked_ragged, one_ragged,
                               rtol=1e-6, atol=1e-6)


def test_vit_flash_matches_einsum():
    """ViT with flash (interpret-mode Pallas) attention matches the einsum
    path on identical params/inputs."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vgqa_tpu.qa.vit import VisionTower

    cfg = ViTConfig.tiny()
    tower = VisionTower(cfg)
    tiles = jnp.asarray(
        np.random.RandomState(4).rand(2, cfg.image_size, cfg.image_size, 3),
        jnp.float32,
    )
    params = tower.init(jax.random.PRNGKey(0), tiles)
    ref = tower.apply(params, tiles)

    import os

    os.environ["VGQA_PALLAS_INTERPRET"] = "1"
    try:
        flash_tower = VisionTower(dataclasses.replace(cfg, flash=True))
        out = flash_tower.apply(params, tiles)
    finally:
        del os.environ["VGQA_PALLAS_INTERPRET"]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3
    )


def _prefill_rows(eng, ids, S, rows=1):
    """Prefill the same prompt into a fresh [rows, ...] KV cache — each row
    through the [1, ...] prefill then the in-place row insert, exactly as
    chat_batch assembles its batch cache. Returns ([rows, V] last-token
    logits, cache)."""
    import jax.numpy as jnp

    from vgqa_tpu.qa.llm import init_kv_cache

    embeds = eng.embed.apply({"params": eng.params["embed"]}, jnp.asarray(ids))
    length = jnp.asarray(ids.shape[1])
    batch = init_kv_cache(eng.llm_cfg, rows, S, jnp.float32)
    lasts = []
    for i in range(rows):
        row = init_kv_cache(eng.llm_cfg, 1, S, jnp.float32)
        last, row = eng._prefill(eng.params, embeds, length, row)
        batch = eng._insert_cache_row(batch, row, jnp.asarray(i))
        lasts.append(last)
    return jnp.concatenate(lasts, axis=0), batch


def test_greedy_loop_early_exit_emits_minus_one_after_stop(tiny_engine):
    """r4 while_loop decode: generation stops at the stop id instead of
    riding max_new_tokens. The emitted buffer keeps its [max_new_tokens]
    shape with -1 from the stop onward, and the prefix matches the
    unstopped run token-for-token (greedy determinism)."""
    import jax.numpy as jnp

    eng = tiny_engine
    ids = np.array([[5, 9, 42, 3]], np.int32)
    start = jnp.asarray(ids.shape[1], jnp.int32)
    no_stop = jnp.asarray([-1, -1], jnp.int32)

    logits, cache = _prefill_rows(eng, ids, S=32)
    free = np.asarray(
        eng._greedy_loop(eng.params, cache, logits, start, no_stop, 8)
    )
    assert free.shape == (8,) and (free >= 0).all()

    # stop on the first token whose first occurrence is at index k >= 1
    # (a tiny random model can be an argmax attractor — fall back to k=0,
    # where the whole buffer must come back -1)
    k = next((i for i in range(1, 8) if free[i] not in free[:i]), 0)
    logits, cache = _prefill_rows(eng, ids, S=32)
    stopped = np.asarray(
        eng._greedy_loop(
            eng.params, cache, logits, start,
            jnp.asarray([int(free[k]), -1], jnp.int32), 8,
        )
    )
    np.testing.assert_array_equal(stopped[:k], free[:k])
    assert (stopped[k:] == -1).all()


def test_greedy_batch_per_row_limits(tiny_engine):
    """Lockstep batched decode caps each row at ITS OWN max_new_tokens
    (``limits``): the short row emits -1 past its cap while the long row
    reproduces the solo greedy answer from the same prompt."""
    import jax.numpy as jnp

    eng = tiny_engine
    ids = np.array([[5, 9, 42, 3]], np.int32)
    start = ids.shape[1]
    no_stop = jnp.asarray([-1, -1], jnp.int32)

    logits, cache = _prefill_rows(eng, ids, S=32)
    solo = np.asarray(
        eng._greedy_loop(
            eng.params, cache, logits, jnp.asarray(start, jnp.int32),
            no_stop, 6,
        )
    )

    logits2, batch = _prefill_rows(eng, ids, S=32, rows=2)
    toks = np.asarray(
        eng._greedy_batch(
            eng.params, batch, logits2,
            jnp.asarray([start, start], jnp.int32), no_stop, 6,
            jnp.asarray([2, 6], jnp.int32),
        )
    )  # [max_new_tokens, B]
    np.testing.assert_array_equal(toks[:2, 0], solo[:2])
    assert (toks[2:, 0] == -1).all()
    np.testing.assert_array_equal(toks[:, 1], solo)


def test_stacked_kv_cache_matches_list(monkeypatch, tiny_engine):
    """VGQA_STACKED_KV=1 packs the KV cache into one [nL, B, KVH, S, hd]
    buffer per side, so the decode while_loop carries 2 buffers instead of
    2*num_layers (aimed at the remote compile service's deterministic
    batch=4 failure, BASELINE.md r4). Layer access uses static indices —
    greedy answers must match the per-layer-list layout exactly, solo and
    batched, and the chunked prefill must fill identical cache contents."""
    import jax.numpy as jnp

    from vgqa_tpu.qa.llm import init_kv_cache

    s = tiny_engine.vit_cfg.image_size
    rng = np.random.RandomState(11)
    reqs = [
        (rng.randint(0, 256, (1, s, s, 3), dtype=np.uint8), "what moves?"),
        (rng.randint(0, 256, (2, s, s, 3), dtype=np.uint8),
         "describe the scene", [1, 1]),
    ]
    g = GenerationConfig(max_new_tokens=6, do_sample=False)
    # the bit-identity claim is vs the bf16 per-layer LIST layout — pin
    # the base engine to it (int8 KV is the default otherwise)
    monkeypatch.setenv("VGQA_KV_INT8", "0")
    base = QAEngine.init_random(LLMConfig.tiny(), ViTConfig.tiny())
    base_solo = base.chat(reqs[0][0], reqs[0][1], g)
    base_batch = base.chat_batch(reqs, g)

    monkeypatch.setenv("VGQA_STACKED_KV", "1")
    monkeypatch.delenv("VGQA_KV_INT8", raising=False)
    eng = QAEngine.init_random(LLMConfig.tiny(), ViTConfig.tiny())
    assert eng._stacked_kv and eng._kv_quant is None
    assert eng.chat(reqs[0][0], reqs[0][1], g) == base_solo
    assert eng.chat_batch(reqs, g) == base_batch

    # chunked prefill writes the same KV into the stacked layout
    eng.PREFILL_CHUNK = 8
    ids = np.random.RandomState(0).randint(8, 200, (1, 32)).astype(np.int32)
    embeds = eng.embed.apply(
        {"params": eng.params["embed"]}, jnp.asarray(ids)
    )
    length = 27
    list_cache = init_kv_cache(eng.llm_cfg, 1, 40, jnp.float32)
    _, list_cache = eng._prefill_impl(
        eng.params, embeds, jnp.asarray(length), list_cache
    )
    stk = init_kv_cache(eng.llm_cfg, 1, 40, jnp.float32, stacked=True)
    _, stk = eng._prefill_chunked_impl(
        eng.params, embeds, jnp.asarray(length), stk
    )
    for i, (k1, v1) in enumerate(list_cache):
        np.testing.assert_allclose(
            np.asarray(k1)[:, :, :length],
            np.asarray(stk[0])[i][:, :, :length], atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(v1)[:, :, :length],
            np.asarray(stk[1])[i][:, :, :length], atol=2e-4,
        )


def test_kv_int8_quantize_roundtrip():
    """quantize_kv/dequantize_kv: one absmax scale per K/V vector bounds
    the reconstruction error at scale/2 = absmax/254 per element, and
    all-zero (unwritten cache) rows stay exactly zero."""
    import jax.numpy as jnp

    from vgqa_tpu.qa.llm import dequantize_kv, quantize_kv

    rng = np.random.RandomState(0)
    t = jnp.asarray(rng.randn(2, 3, 5, 16).astype(np.float32) * 3.0)
    q, s = quantize_kv(t)
    assert q.dtype == jnp.int8 and s.shape == (2, 3, 5)
    back = np.asarray(dequantize_kv(q, s, jnp.float32))
    amax = np.max(np.abs(np.asarray(t)), axis=-1, keepdims=True)
    assert np.all(np.abs(back - np.asarray(t)) <= amax / 254.0 + 1e-6)
    zq, zs = quantize_kv(jnp.zeros((1, 4)))
    assert np.all(np.asarray(dequantize_kv(zq, zs, jnp.float32)) == 0)


def test_kv_int8_decode_logits_close(tiny_engine):
    """A decode step reading the int8 KV cache must track the full-
    precision-cache logits closely (per-token absmax scales, factored out
    of the attention dots in llm_functional). The prefill logits
    themselves are computed BEFORE the cache write, so they must match
    exactly."""
    import jax.numpy as jnp

    from vgqa_tpu.qa.llm import init_kv_cache

    eng = tiny_engine
    ids = np.array([[7, 20, 33, 90, 17, 3, 56, 2]], np.int32)
    L = ids.shape[1]
    embeds = eng.embed.apply(
        {"params": eng.params["embed"]}, jnp.asarray(ids)
    )
    ref_cache = init_kv_cache(eng.llm_cfg, 1, L + 4, jnp.float32)
    ref_last, ref_cache = eng._prefill(
        eng.params, embeds, jnp.asarray(L), ref_cache
    )
    q_cache = init_kv_cache(eng.llm_cfg, 1, L + 4, quant="int8")
    q_last, q_cache = eng._prefill(
        eng.params, embeds, jnp.asarray(L), q_cache
    )
    np.testing.assert_allclose(
        np.asarray(q_last), np.asarray(ref_last), atol=2e-4
    )

    tok = jnp.asarray([5], jnp.int32)
    pos = jnp.asarray(L, jnp.int32)
    r_logits, _ = eng._decode_step(eng.params, ref_cache, tok, pos)
    q_logits, _ = eng._decode_step(eng.params, q_cache, tok, pos)
    r, q = np.asarray(r_logits, np.float64), np.asarray(q_logits, np.float64)
    rel = np.linalg.norm(q - r) / np.linalg.norm(r)
    assert rel < 0.02, f"int8-KV decode logits diverge: rel L2 {rel:.4f}"


def test_kv_int8_chat_and_batch(monkeypatch):
    """VGQA_KV_INT8=1: solo chat and lockstep batched chat run end-to-end
    on the int8 cache; a batched row reproduces the int8 solo answer
    (identical per-row quantized write/read math); the cache footprint
    shrinks (1 + 4/hd bytes per element vs 2 — at the production hd=128
    that is 0.52x, which is what lets batch=8 KV rows fit one v5e's HBM
    next to the 7.7 GB int8 weights)."""
    import jax
    import jax.numpy as jnp

    from vgqa_tpu.qa.llm import init_kv_cache

    monkeypatch.setenv("VGQA_KV_INT8", "1")
    eng = QAEngine.init_random(LLMConfig.tiny(), ViTConfig.tiny())
    assert eng._kv_quant == "int8"
    s = eng.vit_cfg.image_size
    rng = np.random.RandomState(3)
    reqs = [
        (rng.randint(0, 256, (1, s, s, 3), dtype=np.uint8), "what moves?"),
        (rng.randint(0, 256, (2, s, s, 3), dtype=np.uint8),
         "describe the scene", [1, 1]),
    ]
    g = GenerationConfig(max_new_tokens=6, do_sample=False)
    solo = [
        eng.chat(r[0], r[1], g,
                 num_patches_list=list(r[2]) if len(r) > 2 else None)
        for r in reqs
    ]
    assert all(isinstance(a, str) for a in solo)
    assert eng.chat_batch(reqs, g) == solo

    nbytes = lambda c: sum(  # noqa: E731
        x.size * x.dtype.itemsize for x in jax.tree.leaves(c)
    )
    bf16 = init_kv_cache(eng.llm_cfg, 8, 256, jnp.bfloat16)
    q8 = init_kv_cache(eng.llm_cfg, 8, 256, quant="int8")
    # tiny hd=16 -> 0.625x; production hd=128 -> 0.52x
    assert nbytes(q8) < 0.7 * nbytes(bf16)


def test_kv_int8_chunked_prefill_fills_same_cache(tiny_engine):
    """Chunked prefill writes the int8 cache through llm_forward's
    in-forward write path (each chunk quantizes at its offset); one-shot
    prefill through the engine's copy path. Both must place the same
    values at the same positions — compared dequantized against the
    full-precision reference cache (later layers drift slightly because
    chunked attention READS quantized earlier chunks, so the bound is
    loose; misplaced writes or swapped scales would blow it up)."""
    import copy

    import jax.numpy as jnp

    from vgqa_tpu.qa.llm import dequantize_kv, init_kv_cache

    eng = copy.copy(tiny_engine)
    eng.PREFILL_CHUNK = 8
    ids = np.random.RandomState(0).randint(8, 200, (1, 32)).astype(np.int32)
    embeds = eng.embed.apply(
        {"params": eng.params["embed"]}, jnp.asarray(ids)
    )
    length = 27
    ref = init_kv_cache(eng.llm_cfg, 1, 40, jnp.float32)
    _, ref = eng._prefill_impl(eng.params, embeds, jnp.asarray(length), ref)
    q = init_kv_cache(eng.llm_cfg, 1, 40, quant="int8")
    _, q = eng._prefill_chunked_impl(
        eng.params, embeds, jnp.asarray(length), q
    )
    for (rk, rv), ent in zip(ref, q):
        dk = np.asarray(dequantize_kv(ent["kq"], ent["ks"], jnp.float32))
        dv = np.asarray(dequantize_kv(ent["vq"], ent["vs"], jnp.float32))
        np.testing.assert_allclose(
            dk[:, :, :length], np.asarray(rk)[:, :, :length], atol=0.05
        )
        np.testing.assert_allclose(
            dv[:, :, :length], np.asarray(rv)[:, :, :length], atol=0.05
        )
        # positions past the PADDED prompt remain unwritten zeros (the
        # pad rows length..Lp are written by the chunked pass but masked
        # at read, exactly like the bf16 layouts)
        assert np.all(dk[:, :, embeds.shape[1]:] == 0)


def test_chat_batch_matches_sequential(tiny_engine):
    """Lockstep batched decode must reproduce each request's solo greedy
    answer (per-row cache positions, per-row stop) even with different
    prompt lengths and tile counts in one batch."""
    eng = tiny_engine
    s = eng.vit_cfg.image_size
    rng = np.random.RandomState(5)
    reqs = [
        (rng.randint(0, 256, (1, s, s, 3), dtype=np.uint8), "what moves?"),
        (rng.randint(0, 256, (2, s, s, 3), dtype=np.uint8),
         "describe the scene in the video", [1, 1]),
    ]
    g = GenerationConfig(max_new_tokens=6, do_sample=False)
    solo = [
        eng.chat(r[0], r[1], g,
                 num_patches_list=list(r[2]) if len(r) > 2 else None)
        for r in reqs
    ]
    batched, stats = eng.chat_batch(reqs, g, return_stats=True)
    assert batched == solo
    assert stats["batch"] == 2


def test_chat_batch_sampled_matches_solo():
    """Per-row sampled batched decode: row b's RNG stream is
    fold_in(rng, b) with the same split chain as the solo sampler, so a
    sampled request answers identically whether it was coalesced or not —
    including mixed batches where another row is greedy or has a different
    max_new_tokens."""
    import jax

    eng = QAEngine.init_random(LLMConfig.tiny(), ViTConfig.tiny())
    s = eng.vit_cfg.image_size
    rng = np.random.RandomState(7)
    reqs = [
        (rng.randint(0, 256, (1, s, s, 3), dtype=np.uint8), "what moves?"),
        (rng.randint(0, 256, (1, s, s, 3), dtype=np.uint8), "what color?"),
        (rng.randint(0, 256, (2, s, s, 3), dtype=np.uint8),
         "describe the scene", [1, 1]),
    ]
    gens = [
        GenerationConfig(max_new_tokens=8, do_sample=True, temperature=0.9,
                         top_p=0.95),
        GenerationConfig(max_new_tokens=4, do_sample=False),
        GenerationConfig(max_new_tokens=6, do_sample=True, temperature=0.5,
                         top_p=0.8),
    ]
    base = jax.random.PRNGKey(42)
    solo = [
        eng.chat(r[0], r[1], g,
                 num_patches_list=list(r[2]) if len(r) > 2 else None,
                 rng=jax.random.fold_in(base, b))
        for b, (r, g) in enumerate(zip(reqs, gens))
    ]
    batched = eng.chat_batch(reqs, gens=gens, rng=base)
    assert batched == solo
    # per-row token caps hold despite the shared scan length (byte
    # tokenizer: <= 1 char per token)
    assert len(batched[1]) <= 4


def test_qa_predict_api(tmp_path):
    from vgqa_tpu.data.synthetic import write_synthetic_video
    from vgqa_tpu.inference.qa import predict

    video = str(tmp_path / "v.mp4")
    write_synthetic_video(video, 20, (64, 48), seed=0)
    result = predict(
        video, "what moves?", model_dir="__tiny__", num_frames=4,
        max_new_tokens=4, temperature=0.0,
    )
    assert set(result.keys()) == {"answer"}
    assert isinstance(result["answer"], str)


def test_qa_predict_many_isolates_bad_slot(tmp_path):
    """Batched serving: a bad video fails its own slot only, and good
    slots come back as answers aligned with the request order."""
    from vgqa_tpu.data.synthetic import write_synthetic_video
    from vgqa_tpu.inference.qa import predict_many

    video = str(tmp_path / "v.mp4")
    write_synthetic_video(video, 20, (64, 48), seed=0)
    results = predict_many(
        [
            {"video_path": video, "question": "what moves?",
             "num_frames": 2, "max_new_tokens": 4},
            {"video_path": str(tmp_path / "missing.mp4"), "question": "?"},
            {"video_path": video, "question": "what color?",
             "num_frames": 2, "max_new_tokens": 4},
        ],
        model_dir="__tiny__",
    )
    assert len(results) == 3
    assert set(results[0].keys()) == {"answer"}
    assert isinstance(results[1], FileNotFoundError)
    assert set(results[2].keys()) == {"answer"}


def test_qa_predict_many_isolates_overlong_prompt(tmp_path):
    """A request whose prompt exceeds the model context fails its OWN slot
    (pre-validated before chat_batch), not every coalesced request."""
    from vgqa_tpu.data.synthetic import write_synthetic_video
    from vgqa_tpu.inference.qa import predict_many

    video = str(tmp_path / "v.mp4")
    write_synthetic_video(video, 20, (64, 48), seed=0)
    results = predict_many(
        [
            {"video_path": video, "question": "what moves?",
             "num_frames": 2, "max_new_tokens": 4},
            # the tiny engine's context is 512 tokens and its tiny ViT
            # emits 4 tokens/tile; 200 frames of image+template tokens
            # blow past it
            {"video_path": video, "question": "?", "num_frames": 200},
        ],
        model_dir="__tiny__",
    )
    assert set(results[0].keys()) == {"answer"}
    assert isinstance(results[1], ValueError)
    assert "context" in str(results[1])


def test_qa_predict_quantized_model_dir(tmp_path):
    """A --quantize converted dir (kernel_q4/kernel_q + scales instead of
    kernel) must load through the CLI path: the restore follows the
    checkpoint's own structure, not the raw-params template (regression —
    template-driven restore rejected every quantized dir), and quant
    scales stay f32 while float weights cast to the engine dtype."""
    import dataclasses
    import json

    from vgqa_tpu.data.synthetic import write_synthetic_video
    from vgqa_tpu.inference.qa import _load_engine, predict
    from vgqa_tpu.qa import LLMConfig, QAEngine, ViTConfig
    from vgqa_tpu.qa.quant import quantize_llm_params_int4
    from vgqa_tpu.training.checkpoint import CheckpointManager

    llm_cfg, vit_cfg = LLMConfig.tiny(), ViTConfig.tiny()
    eng = QAEngine.init_random(llm_cfg, vit_cfg)
    tree = dict(eng.params)
    tree["llm"] = quantize_llm_params_int4(eng.params["llm"], group_size=32)
    mdl = tmp_path / "model"
    CheckpointManager(str(mdl)).save("params", tree)
    with open(mdl / "vgqa_tpu_config.json", "w") as f:
        json.dump({"llm": dataclasses.asdict(llm_cfg),
                   "vit": dataclasses.asdict(vit_cfg)}, f)

    video = str(tmp_path / "v.mp4")
    write_synthetic_video(video, 8, (64, 48), seed=0)
    result = predict(video, "what moves?", model_dir=str(mdl),
                     num_frames=2, max_new_tokens=4, temperature=0.0)
    assert isinstance(result["answer"], str)

    import jax.numpy as jnp

    loaded = _load_engine(str(mdl))
    l0 = loaded.params["llm"]["layer_0"]
    assert "kernel_q4" in l0["q_proj"]
    assert l0["q_proj"]["scale4"].dtype == jnp.float32      # scales stay f32
    emb = loaded.params["embed"]["tok_embeddings"]["embedding"]
    assert emb.dtype == jnp.bfloat16                        # floats cast
    _load_engine.cache_clear()


def test_qa_predict_missing_model_dir(tmp_path):
    from vgqa_tpu.data.synthetic import write_synthetic_video
    from vgqa_tpu.inference.qa import predict

    video = str(tmp_path / "v.mp4")
    write_synthetic_video(video, 5, (32, 32), seed=0)
    with pytest.raises(FileNotFoundError):
        predict(video, "?", model_dir=str(tmp_path / "nope"))


def test_prompt_template_structure(tiny_engine):
    eng = tiny_engine
    tok = eng.tokenizer
    ids, img_pos = eng.build_prompt_ids("why?", [2, 1])
    # one IMG_CONTEXT slot per tile per image token
    assert len(img_pos) == 3 * eng.num_image_token
    assert all(ids[p] == tok.IMG_CONTEXT for p in img_pos)
    # template: BOS, system turn, user turn, assistant cue
    assert ids[0] == tok.BOS
    assert ids.count(tok.IM_START) == 3  # system, user, assistant
    assert ids[-1] != tok.IM_END  # ends mid-assistant turn (generation point)


def test_byte_tokenizer_decode_out_of_range_ids():
    """Big-vocab models sample ids past the byte range; decode must skip
    them instead of raising (regression: ValueError in bytes())."""
    from vgqa_tpu.qa.engine import ByteTokenizer

    tok = ByteTokenizer()
    assert tok.decode([50000, tok.OFFSET + ord("h"), 90000, tok.OFFSET + ord("i")]) == "hi"


def test_sampling_loop_generates(tiny_engine):
    """The on-device sampling loop must produce a valid generation and be
    reproducible for a fixed rng."""
    import jax

    eng = tiny_engine
    s = eng.vit_cfg.image_size
    tiles = np.random.RandomState(2).rand(1, s, s, 3).astype(np.float32)
    g = GenerationConfig(max_new_tokens=8, do_sample=True, temperature=0.8,
                        top_p=0.9)
    a1 = eng.chat(tiles, "hm?", g, rng=jax.random.PRNGKey(7))
    a2 = eng.chat(tiles, "hm?", g, rng=jax.random.PRNGKey(7))
    assert isinstance(a1, str) and a1 == a2


def test_prompt_template_golden_internvl25():
    """The detokenized prompt must match the published InternVL2.5
    "internvl2_5" conversation template character-for-character
    (system message verbatim, sep = "<|im_end|>\\n", <image> expanded to
    <img>IMG_CONTEXT*n</img>)."""
    from vgqa_tpu.qa.engine import QAEngine

    class RecordingTok:
        """Maps each encode() call to one synthetic id and remembers the
        text, so the id stream reconstructs the exact prompt string."""

        BOS, EOS = 1, 2
        IM_START, IM_END = 3, 4
        IMG_CONTEXT, IMG_START, IMG_END = 5, 6, 7

        def __init__(self):
            self.texts = {}
            self.next_id = 100

        def encode(self, text):
            ids = []
            self.next_id += 1
            self.texts[self.next_id] = text
            ids.append(self.next_id)
            return ids

        def render(self, ids):
            out = []
            special = {
                self.BOS: "<s>", self.EOS: "</s>",
                self.IM_START: "<|im_start|>", self.IM_END: "<|im_end|>",
                self.IMG_CONTEXT: "<IMG_CONTEXT>",
                self.IMG_START: "<img>", self.IMG_END: "</img>",
            }
            for i in ids:
                out.append(special.get(i) or self.texts[i])
            return "".join(out)

    eng = QAEngine.__new__(QAEngine)  # template only; no weights needed
    eng.tokenizer = RecordingTok()
    eng.num_image_token = 2
    # a supplied (real) tokenizer selects the published template
    eng.system_prompt = QAEngine.SYSTEM_PROMPT

    ids, img_pos = eng.build_prompt_ids("What happens?", [2, 1])
    rendered = eng.tokenizer.render(ids)

    sys_msg = QAEngine.SYSTEM_PROMPT
    expected = (
        "<s>"
        "<|im_start|>system\n" + sys_msg + "<|im_end|>\n"
        "<|im_start|>user\n"
        "Frame1: <img>" + "<IMG_CONTEXT>" * 4 + "</img>\n"
        "Frame2: <img>" + "<IMG_CONTEXT>" * 2 + "</img>\n"
        "What happens?<|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    assert rendered == expected
    assert all(ids[p] == eng.tokenizer.IMG_CONTEXT for p in img_pos)
    # published system message is pinned verbatim
    assert sys_msg.startswith("你是书生·万象")
    assert "InternVL" in sys_msg


def test_chunked_prefill_matches_one_shot(tiny_engine):
    """Chunked long-prompt prefill must produce the same final logits and
    KV cache as the one-shot prefill."""
    import jax
    import jax.numpy as jnp

    from vgqa_tpu.qa.llm import init_kv_cache

    eng = tiny_engine
    eng.PREFILL_CHUNK = 8  # force several chunks at test scale
    rng = np.random.RandomState(0)
    Lp, length = 32, 27  # padded power-of-two bucket, 27 real tokens
    ids = rng.randint(8, 200, (1, Lp)).astype(np.int32)
    embeds = eng.embed.apply({"params": eng.params["embed"]}, jnp.asarray(ids))

    S = Lp + 8
    c1 = init_kv_cache(eng.llm_cfg, 1, S, jnp.float32)
    last1, c1 = eng._prefill(eng.params, embeds, jnp.asarray(length), c1)
    c2 = init_kv_cache(eng.llm_cfg, 1, S, jnp.float32)
    last2, c2 = eng._prefill_chunked_impl(
        eng.params, embeds, jnp.asarray(length), c2
    )
    np.testing.assert_allclose(np.asarray(last1), np.asarray(last2), atol=2e-4)
    for (k1, v1), (k2, v2) in zip(c1, c2):
        # compare the filled region (first `length` positions)
        np.testing.assert_allclose(
            np.asarray(k1)[:, :, :length], np.asarray(k2)[:, :, :length],
            atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(v1)[:, :, :length], np.asarray(v2)[:, :, :length],
            atol=2e-4,
        )

def test_plan_prefill_chunk_alignment(tiny_engine):
    """A max_seq_len that is not a PREFILL_CHUNK multiple must never send a
    non-chunk-aligned Lp down the chunked path (engine.py asserts
    Lp % CK == 0 at trace time)."""
    eng = tiny_engine
    eng.PREFILL_CHUNK = 8
    eng.max_seq_len = 100  # deliberately not a multiple of 8

    # _bucket's 64 minimum exceeds 4 chunks here, so even short prompts
    # take the chunked path with chunk-granular padding
    Lp, chunked = eng._plan_prefill(20)
    assert (Lp, chunked) == (24, True)

    # long prompt: chunk-granular padding, capped at 96 (100 rounded down)
    Lp, chunked = eng._plan_prefill(70)
    assert chunked and Lp == 72 and Lp % 8 == 0

    Lp, chunked = eng._plan_prefill(95)
    assert chunked and Lp == 96

    # fits only in the unaligned remainder -> one-shot fallback
    Lp, chunked = eng._plan_prefill(98)
    assert not chunked and Lp == 100

    for length in range(33, 101):
        Lp, chunked = eng._plan_prefill(length)
        assert Lp >= length and Lp <= eng.max_seq_len
        if chunked:
            assert Lp % eng.PREFILL_CHUNK == 0


# -- I420 (YUV) tile upload path ---------------------------------------------
def _i420_to_rgb_host(planes, s, full_range):
    """Reference BT.601 conversion, numpy f32 — the same arithmetic
    engine._vision_apply_yuv runs fused on device."""
    npx, nc = s * s, (s // 2) * (s // 2)
    n = planes.shape[0]
    y = planes[:, :npx].reshape(n, s, s).astype(np.float32)
    u = planes[:, npx:npx + nc].reshape(n, s // 2, s // 2).astype(np.float32)
    v = planes[:, npx + nc:].reshape(n, s // 2, s // 2).astype(np.float32)
    u = np.repeat(np.repeat(u, 2, 1), 2, 2) - 128.0
    v = np.repeat(np.repeat(v, 2, 1), 2, 2) - 128.0
    if full_range:
        yl, cr, gu, gv, bu = y, 1.402, 0.344136, 0.714136, 1.772
    else:
        yl = 1.1643835616 * (y - 16.0)
        cr, gu, gv, bu = 1.5960267857, 0.3917622768, 0.8129676339, 2.0172321429
    r = yl + cr * v
    g = yl - gu * u - gv * v
    b = yl + bu * u
    return np.clip(np.stack([r, g, b], -1), 0.0, 255.0)


@pytest.mark.parametrize("full_range", [False, True])
def test_yuv_tiles_match_host_conversion(tiny_engine, full_range):
    """YUVTiles through _encode_vision must equal the vision tower fed
    the host-converted + normalized float tiles (the conversion is a pure
    upload-format transform; both ranges ride ONE compiled program via the
    traced full_range scalar)."""
    from vgqa_tpu.qa import YUVTiles
    from vgqa_tpu.qa.preprocess import IMAGENET_MEAN, IMAGENET_STD

    eng = tiny_engine
    s = eng.vit_cfg.image_size
    n = 3
    planes = np.random.RandomState(11).randint(
        0, 256, (n, s * s * 3 // 2), dtype=np.uint8
    )
    rgb = _i420_to_rgb_host(planes, s, full_range)
    ref_tiles = (rgb / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    want = np.asarray(eng._vision_fn(eng.params, ref_tiles.astype(np.float32)))
    got = np.asarray(eng._encode_vision(YUVTiles(planes, full_range)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_yuv_tiles_chunked_matches_single_shot(tiny_engine):
    """The chunked put/dispatch interleave must be a pure perf transform
    on the I420 path too (prefix chunks + ragged remainder)."""
    from vgqa_tpu.qa import YUVTiles

    eng = tiny_engine
    s = eng.vit_cfg.image_size
    planes = np.random.RandomState(13).randint(
        0, 256, (5, s * s * 3 // 2), dtype=np.uint8
    )
    tiles = YUVTiles(planes, full_range=False)
    old = eng._vision_chunk_yuv
    try:
        eng._vision_chunk_yuv = 0
        one = np.asarray(eng._encode_vision(tiles))
        eng._vision_chunk_yuv = 2
        chunked = np.asarray(eng._encode_vision(tiles))
    finally:
        eng._vision_chunk_yuv = old
    np.testing.assert_allclose(chunked, one, rtol=1e-6, atol=1e-6)


def test_chat_yuv_tiles_generates(tiny_engine):
    """chat() accepts a YUVTiles batch end-to-end (stats shape plumbing
    included) and answers deterministically under greedy decoding."""
    from vgqa_tpu.qa import YUVTiles

    eng = tiny_engine
    s = eng.vit_cfg.image_size
    planes = np.random.RandomState(17).randint(
        0, 256, (2, s * s * 3 // 2), dtype=np.uint8
    )
    tiles = YUVTiles(planes, full_range=False)
    g = GenerationConfig(max_new_tokens=6, do_sample=False)
    a1, st = eng.chat(tiles, "what?", g, num_patches_list=[1, 1],
                      return_stats=True)
    a2 = eng.chat(tiles, "what?", g, num_patches_list=[1, 1])
    assert a1 == a2
    assert st["vision_tiles"] == 2


def test_load_video_tiles_yuv_close_to_rgb(tmp_path):
    """The native scaled-I420 loader must agree with the RGB tile loader
    up to colorspace/chroma rounding and the YUV-vs-RGB resize trade
    (documented in load_video_tiles_yuv)."""
    from vgqa_tpu.data.synthetic import write_synthetic_video
    from vgqa_tpu.data.video_io import _load_native
    from vgqa_tpu.qa.preprocess import load_video_tiles, load_video_tiles_yuv

    if _load_native() is None:
        pytest.skip("native decoder not built")
    video = str(tmp_path / "v.mp4")
    write_synthetic_video(video, 40, (64, 48), seed=5)
    out = load_video_tiles_yuv(video, input_size=32, num_segments=4)
    assert out is not None
    tiles_yuv, npl = out
    assert npl == [1, 1, 1, 1]
    assert tiles_yuv.shape == (4, 32 * 32 * 3 // 2)
    rgb_from_yuv = _i420_to_rgb_host(
        np.asarray(tiles_yuv.planes), 32, tiles_yuv.full_range)
    tiles_rgb, npl_rgb = load_video_tiles(video, input_size=32, max_num=1,
                                          num_segments=4)
    assert npl_rgb == npl
    diff = np.abs(rgb_from_yuv - tiles_rgb.astype(np.float32)).mean()
    assert diff < 12.0, diff  # same content, different scaler + 4:2:0


# -- layer-scanned decode ----------------------------------------------------
def test_scan_decode_matches_unrolled_kv8(monkeypatch):
    """VGQA_SCAN_DECODE collapses the unrolled per-layer decode into one
    lax.scan over stacked params + the stacked int8 cache — it must be a
    pure program-shape transform: identical greedy, sampled, and batched
    answers vs the unrolled int8-KV path (same quantization at every
    step)."""
    import jax

    g = GenerationConfig(max_new_tokens=10, do_sample=False,
                         ignore_eos=True)
    gs = GenerationConfig(max_new_tokens=10, do_sample=True,
                          temperature=0.8, top_p=0.9)

    monkeypatch.setenv("VGQA_KV_INT8", "1")
    monkeypatch.delenv("VGQA_SCAN_DECODE", raising=False)
    base = QAEngine.init_random(LLMConfig.tiny(), ViTConfig.tiny())
    s = base.vit_cfg.image_size
    tiles = np.random.RandomState(3).randint(
        0, 256, (2, s, s, 3), dtype=np.uint8
    )
    reqs = [(tiles, "what?", [1, 1]), (tiles, "and?", [1, 1])]
    a_base = base.chat(tiles, "what?", g, num_patches_list=[1, 1])
    sm_base = base.chat(tiles, "what?", gs, num_patches_list=[1, 1],
                        rng=jax.random.PRNGKey(7))
    b_base = base.chat_batch(reqs, g)

    monkeypatch.setenv("VGQA_SCAN_DECODE", "1")
    scan = QAEngine.init_random(LLMConfig.tiny(), ViTConfig.tiny())
    assert scan._scan_decode and scan._kv_quant == "int8"
    a_scan = scan.chat(tiles, "what?", g, num_patches_list=[1, 1])
    sm_scan = scan.chat(tiles, "what?", gs, num_patches_list=[1, 1],
                        rng=jax.random.PRNGKey(7))
    b_scan = scan.chat_batch(reqs, g)
    assert a_base, "greedy answer must be non-empty for a real comparison"
    assert a_scan == a_base
    assert sm_scan == sm_base
    assert b_scan == b_base
    # params were stacked in place: layer_i entries gone, one layers tree
    assert "layers" in scan.params["llm"]
    assert "layer_0" not in scan.params["llm"]


def test_stacked_params_prefill_matches_per_layer():
    """llm_forward must read stacked storage (stack_llm_layers) through
    static slices with identical results to the per-layer tree — one
    device weight copy serves both the unrolled prefill and the scanned
    decode."""
    import jax
    import jax.numpy as jnp

    from vgqa_tpu.qa.llm import init_kv_cache
    from vgqa_tpu.qa.llm_functional import llm_forward, stack_llm_layers

    cfg = LLMConfig.tiny()
    eng = QAEngine.init_random(cfg, ViTConfig.tiny())
    params = eng.params["llm"]
    stacked = stack_llm_layers(params, cfg.num_layers)

    rng = np.random.RandomState(5)
    L, S = 8, 32
    embeds = jnp.asarray(rng.randn(1, L, cfg.hidden_size), jnp.float32)
    positions = jnp.arange(L)[None]
    mask = (jnp.arange(S)[None, None, :] <= jnp.arange(L)[None, :, None])
    cache = init_kv_cache(cfg, 1, S, jnp.float32)
    lo_a, ca = llm_forward(params, cfg, embeds, positions, mask,
                           cache=cache, cache_index=jnp.asarray(0))
    cache = init_kv_cache(cfg, 1, S, jnp.float32)
    lo_b, cb = llm_forward(stacked, cfg, embeds, positions, mask,
                           cache=cache, cache_index=jnp.asarray(0))
    np.testing.assert_array_equal(np.asarray(lo_a), np.asarray(lo_b))
    for (ka, va), (kb, vb) in zip(ca, cb):
        np.testing.assert_array_equal(np.asarray(ka), np.asarray(kb))
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_scan_decode_int4_dual_storage(monkeypatch):
    """int4 trees under scan mode keep DUAL param storage (per-layer for
    the unrolled prefill + stacked for the decode scan — the r5 B=1 OOM
    fix) and must answer identically to the unrolled int4+kv8 path."""
    from vgqa_tpu.qa.quant import quantize_llm_params_int4

    g = GenerationConfig(max_new_tokens=8, do_sample=False,
                         ignore_eos=True)

    def build():
        eng = QAEngine.init_random(LLMConfig.tiny(), ViTConfig.tiny())
        eng.params["llm"] = quantize_llm_params_int4(
            eng.params["llm"], group_size=32)
        return eng

    monkeypatch.setenv("VGQA_KV_INT8", "1")
    monkeypatch.delenv("VGQA_SCAN_DECODE", raising=False)
    base = build()
    s = base.vit_cfg.image_size
    tiles = np.random.RandomState(9).randint(
        0, 256, (2, s, s, 3), dtype=np.uint8
    )
    a_base = base.chat(tiles, "what?", g, num_patches_list=[1, 1])

    monkeypatch.setenv("VGQA_SCAN_DECODE", "1")
    scan = build()
    a_scan = scan.chat(tiles, "what?", g, num_patches_list=[1, 1])
    assert a_base and a_scan == a_base
    # dual storage: per-layer entries retained NEXT TO the stacked tree
    assert "layers" in scan.params["llm"]
    assert "layer_0" in scan.params["llm"]
    # batched path over the stacked int8 cache
    b_base = base.chat_batch([(tiles, "what?", [1, 1]),
                              (tiles, "and?", [1, 1])], g)
    b_scan = scan.chat_batch([(tiles, "what?", [1, 1]),
                              (tiles, "and?", [1, 1])], g)
    assert b_scan == b_base
