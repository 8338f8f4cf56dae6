"""GRU encoder parity against torch nn.GRU + pack_padded_sequence."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from laff_tpu.models import GruEncoder, GruSpec


def _torch_gru_mean(ids, lengths, we, gru, pooling="mean"):
    x = torch.from_numpy(we)[torch.from_numpy(ids)]
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x, torch.from_numpy(lengths), batch_first=True, enforce_sorted=False
    )
    out, _ = gru(packed)
    padded, _ = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True)
    res = []
    for i, ln in enumerate(lengths):
        if pooling == "mean":
            res.append(padded[i, :ln].mean(0))
        else:
            res.append(padded[i, ln - 1])
    return torch.stack(res).detach().numpy()


def test_gru_matches_torch(rng):
    vocab, we_dim, rnn_size, t = 30, 12, 16, 7
    we = rng.standard_normal((vocab, we_dim)).astype(np.float32)
    lengths = np.array([7, 3, 5, 1], dtype=np.int32)
    ids = np.zeros((4, t), dtype=np.int32)
    for i, ln in enumerate(lengths):
        ids[i, :ln] = rng.integers(1, vocab, ln)

    gru = torch.nn.GRU(we_dim, rnn_size, 1, batch_first=True)

    spec = GruSpec(vocab_size=vocab, we_dim=we_dim, rnn_size=rnn_size, pooling="mean")
    mod = GruEncoder(spec, word_embeddings=we)
    variables = mod.init(jax.random.key(0), jnp.asarray(ids), jnp.asarray(lengths))

    params = dict(variables["params"])
    params["w_ih_l0"] = jnp.asarray(gru.weight_ih_l0.detach().numpy())
    params["w_hh_l0"] = jnp.asarray(gru.weight_hh_l0.detach().numpy())
    params["b_ih_l0"] = jnp.asarray(gru.bias_ih_l0.detach().numpy())
    params["b_hh_l0"] = jnp.asarray(gru.bias_hh_l0.detach().numpy())

    for pooling in ("mean", "last"):
        mod_p = GruEncoder(
            GruSpec(vocab_size=vocab, we_dim=we_dim, rnn_size=rnn_size, pooling=pooling),
            word_embeddings=we,
        )
        ours = np.asarray(
            mod_p.apply({"params": params}, jnp.asarray(ids), jnp.asarray(lengths))
        )
        theirs = _torch_gru_mean(ids, lengths, we, gru, pooling)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_gru_mean_last_concat(rng):
    vocab, we_dim, rnn_size = 10, 6, 8
    we = rng.standard_normal((vocab, we_dim)).astype(np.float32)
    ids = rng.integers(0, vocab, (3, 5)).astype(np.int32)
    lengths = np.array([5, 2, 4], np.int32)
    spec = GruSpec(vocab_size=vocab, we_dim=we_dim, rnn_size=rnn_size, pooling="mean_last")
    mod = GruEncoder(spec, word_embeddings=we)
    variables = mod.init(jax.random.key(1), jnp.asarray(ids), jnp.asarray(lengths))
    out = mod.apply(variables, jnp.asarray(ids), jnp.asarray(lengths))
    assert out.shape == (3, 2 * rnn_size)


def test_bigru_shape(rng):
    spec = GruSpec(vocab_size=10, we_dim=6, rnn_size=8, pooling="mean", bidirectional=True)
    mod = GruEncoder(spec)
    ids = jnp.asarray(rng.integers(0, 10, (3, 5)).astype(np.int32))
    lengths = jnp.asarray(np.array([5, 2, 4], np.int32))
    variables = mod.init(jax.random.key(2), ids, lengths)
    out = mod.apply(variables, ids, lengths)
    assert out.shape == (3, 16)


def test_bigru_matches_torch(rng):
    """Bidirectional GRU with mean pooling vs torch, including reverse
    direction semantics on padded batches."""
    vocab, we_dim, rnn_size, t = 20, 10, 12, 6
    we = rng.standard_normal((vocab, we_dim)).astype(np.float32)
    lengths = np.array([6, 2, 4], dtype=np.int32)
    ids = np.zeros((3, t), dtype=np.int32)
    for i, ln in enumerate(lengths):
        ids[i, :ln] = rng.integers(1, vocab, ln)

    gru = torch.nn.GRU(we_dim, rnn_size, 1, batch_first=True, bidirectional=True)
    theirs = _torch_gru_mean(ids, lengths, we, gru, pooling="mean")

    spec = GruSpec(vocab_size=vocab, we_dim=we_dim, rnn_size=rnn_size,
                   pooling="mean", bidirectional=True)
    mod = GruEncoder(spec, word_embeddings=we)
    variables = mod.init(jax.random.key(0), jnp.asarray(ids), jnp.asarray(lengths))
    params = dict(variables["params"])
    params["w_ih_l0"] = jnp.asarray(gru.weight_ih_l0.detach().numpy())
    params["w_hh_l0"] = jnp.asarray(gru.weight_hh_l0.detach().numpy())
    params["b_ih_l0"] = jnp.asarray(gru.bias_ih_l0.detach().numpy())
    params["b_hh_l0"] = jnp.asarray(gru.bias_hh_l0.detach().numpy())
    params["w_ih_l0_rev"] = jnp.asarray(gru.weight_ih_l0_reverse.detach().numpy())
    params["w_hh_l0_rev"] = jnp.asarray(gru.weight_hh_l0_reverse.detach().numpy())
    params["b_ih_l0_rev"] = jnp.asarray(gru.bias_ih_l0_reverse.detach().numpy())
    params["b_hh_l0_rev"] = jnp.asarray(gru.bias_hh_l0_reverse.detach().numpy())
    ours = np.asarray(
        mod.apply({"params": params}, jnp.asarray(ids), jnp.asarray(lengths))
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
