import jax
import jax.numpy as jnp
import numpy as np

from vgqa_tpu.models.lstm_text import LSTMTextEncoder, LSTMTextTower


def test_lstm_shapes_and_last_state():
    model = LSTMTextEncoder(hidden_size=8, vocab_size=50, embed_dim=16,
                            num_layers=1, bidirectional=True)
    ids = jnp.asarray([[3, 4, 5, 0, 0], [7, 8, 9, 10, 11]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    tokens, sent = model.apply(params, ids, mask)
    assert tokens.shape == (2, 5, 16)  # 8 per direction x 2
    assert sent.shape == (2, 16)
    # sentence = last *valid* step of the sequence outputs
    np.testing.assert_allclose(np.asarray(sent[0]), np.asarray(tokens[0, 2]))
    np.testing.assert_allclose(np.asarray(sent[1]), np.asarray(tokens[1, 4]))


def test_lstm_padding_invariance():
    """Changing pad token content must not change outputs."""
    model = LSTMTextEncoder(hidden_size=8, vocab_size=50, embed_dim=16,
                            num_layers=1, bidirectional=True)
    ids = jnp.asarray([[3, 4, 5, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0, 0]], bool)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    _, s1 = model.apply(params, ids, mask)
    _, s2 = model.apply(params, ids.at[0, 3].set(42), mask)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_lstm_tower_interface():
    tower = LSTMTextTower(out_dim=12, hidden_size=8, vocab_size=30)
    ids = jnp.zeros((1, 6), jnp.int32)
    mask = jnp.ones((1, 6), bool)
    params = tower.init(jax.random.PRNGKey(0), ids, mask)
    tokens, cls = tower.apply(params, ids, mask)
    assert tokens.shape == (1, 6, 12) and cls.shape == (1, 12)


def test_pretrained_vectors_frozen():
    vecs = np.random.RandomState(0).randn(20, 16).astype(np.float32)
    model = LSTMTextEncoder(hidden_size=4, pretrained_vectors=vecs,
                            num_layers=1)
    ids = jnp.zeros((1, 3), jnp.int32)
    mask = jnp.ones((1, 3), bool)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    np.testing.assert_allclose(
        np.asarray(params["params"]["embedding"]), vecs, atol=1e-6
    )

    def loss(p):
        tokens, _ = model.apply(p, ids, mask)
        return jnp.sum(tokens**2)

    grads = jax.grad(loss)(params)
    # stop_gradient keeps GloVe frozen
    assert float(jnp.abs(grads["params"]["embedding"]).max()) == 0.0
