import jax
import jax.numpy as jnp
import numpy as np

from vgqa_tpu.data.tokenizer import (
    BOS_ID,
    EOS_ID,
    PAD_ID,
    HashTokenizer,
    batch_encode,
    build_tokenizer,
)
from vgqa_tpu.models.roberta import RobertaConfig, RobertaModel, TextEncoder


def test_hash_tokenizer_deterministic_and_padded():
    tok = HashTokenizer(1000)
    ids1 = tok.encode("a person walks left")
    ids2 = tok.encode("a person walks left")
    assert ids1 == ids2
    assert ids1[0] == BOS_ID and ids1[-1] == EOS_ID
    batch_ids, mask = batch_encode(tok, ["hi there", "a"], max_len=8)
    assert batch_ids.shape == (2, 8)
    assert batch_ids[1, -1] == PAD_ID
    assert mask[0, :4].all() and not mask[1, 3]


def test_batch_encode_truncates_with_eos():
    tok = HashTokenizer(1000)
    ids, mask = batch_encode(tok, ["w " * 50], max_len=10)
    assert mask[0].all()
    assert ids[0, -1] == EOS_ID


def test_bpe_tokenizer_from_assets(tmp_path):
    """Build a miniature vocab/merges pair and check the BPE algorithm."""
    import json

    # byte-level symbols for 'h','e','l','o',' l' etc.
    from vgqa_tpu.data.tokenizer import _bytes_to_unicode

    b2u = _bytes_to_unicode()
    sym = lambda s: "".join(b2u[b] for b in s.encode())  # noqa: E731
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    pieces = [sym("h"), sym("e"), sym("l"), sym("o"), sym("he"), sym("ll"), sym("hell"), sym("hello")]
    for p in pieces:
        vocab[p] = len(vocab)
    merges = [
        (sym("h"), sym("e")),
        (sym("l"), sym("l")),
        (sym("he"), sym("ll")),
        (sym("hell"), sym("o")),
    ]
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges)
    )
    tok = build_tokenizer(str(tmp_path))
    ids = tok.encode("hello")
    assert ids == [BOS_ID, vocab[sym("hello")], EOS_ID]
    # unseen byte -> unk
    assert tok.encode("z")[1] == 3


def test_pretokenize_matches_canonical_gpt2_pattern():
    """Our stdlib-re split must agree with HF's canonical \\p{L}/\\p{N}
    pattern (regex module) — including mixed alphanumerics and underscores."""
    import regex

    from vgqa_tpu.data.tokenizer import _GPT2_SPLIT

    canonical = regex.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+"
        r"| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
    )
    cases = [
        "the 2nd person in room2 waves",
        "covid19 spread in 2020-2021!",
        "snake_case_name and __dunder__",
        "it's, they're; we'll do 3.14 things",
        "  leading and trailing  ",
        "a1b2c3 100% #tag @user",
        "naïve café über 中文 テスト",
        "price is $5.99 (was $10)",
    ]
    for text in cases:
        assert _GPT2_SPLIT.findall(text) == canonical.findall(text), text


def test_roberta_shapes_and_mask_invariance():
    cfg = RobertaConfig.tiny()
    model = RobertaModel(cfg)
    ids = jnp.array([[0, 5, 6, 2, 1, 1]], dtype=jnp.int32)
    mask = jnp.array([[1, 1, 1, 1, 0, 0]], dtype=bool)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    hidden, pooled = model.apply(params, ids, mask)
    assert hidden.shape == (1, 6, cfg.hidden_size)
    assert pooled.shape == (1, cfg.hidden_size)

    # changing pad token content must not change valid-token outputs
    ids2 = ids.at[0, 4].set(77)
    hidden2, pooled2 = model.apply(params, ids2, mask)
    np.testing.assert_allclose(
        np.asarray(hidden[:, :4]), np.asarray(hidden2[:, :4]), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled2), atol=1e-5)


def test_text_encoder_output_dims():
    cfg = RobertaConfig.tiny()
    enc = TextEncoder(cfg, out_dim=16)
    ids = jnp.zeros((2, 6), dtype=jnp.int32)
    mask = jnp.ones((2, 6), dtype=bool)
    params = enc.init(jax.random.PRNGKey(0), ids, mask)
    tokens, cls = enc.apply(params, ids, mask)
    assert tokens.shape == (2, 6, 16)
    assert cls.shape == (2, 16)
