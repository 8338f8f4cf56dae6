"""GRU text encoder as a ``lax.scan`` over time with explicit torch-layout
parameters.

Parity target: reference GruTxtEncoder (``model/model.py:322-396``): learned
embedding (optionally word2vec-initialized when we_dim==500), a (bi)GRU,
then mean / last / mean_last pooling over the valid timesteps.

The gate parameters use PyTorch's packed (r, z, n) ordering and separate
input/hidden biases, so reference ``rnn.weight_ih_l0`` etc. import with a
pure reshape — no permutation table needed. The scan carries (B, H) hidden
state; padding steps are masked so arbitrary right-padded batches give
identical results to the reference's pack_padded_sequence path.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .initializers import torch_linear_init
from .spec import GruSpec


def _gru_scan(x, lengths, w_ih, w_hh, b_ih, b_hh, reverse: bool = False):
    """x: (B, T, D) -> outputs (B, T, H). Torch gate order r, z, n."""
    b, t, _ = x.shape
    h_dim = w_hh.shape[1]

    # precompute input projections for all steps: (B, T, 3H)
    xi = jnp.einsum("btd,gd->btg", x, w_ih) + b_ih

    steps = jnp.arange(t)
    if reverse:
        step_order = steps[::-1]
    else:
        step_order = steps

    def cell(h, step):
        gates_x = xi[:, step]  # (B, 3H)
        gates_h = h @ w_hh.T + b_hh  # (B, 3H)
        xr, xz, xn = jnp.split(gates_x, 3, axis=-1)
        hr, hz, hn = jnp.split(gates_h, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        # freeze state on padding steps so 'last' pooling reads the true
        # final state and reverse scans start correctly
        valid = (step < lengths)[:, None].astype(h.dtype)
        h_new = valid * h_new + (1.0 - valid) * h
        return h_new, h_new

    h0 = jnp.zeros((b, h_dim), x.dtype)
    _, outs = jax.lax.scan(cell, h0, step_order)
    outs = outs.transpose(1, 0, 2)  # (B, T, H)
    if reverse:
        outs = outs[:, ::-1, :]
    return outs


class GruEncoder(nn.Module):
    spec: GruSpec
    word_embeddings: Optional[jnp.ndarray] = None  # (V, we_dim) w2v init

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        """token_ids: (B, T) int32 right-padded; lengths: (B,).

        Returns pooled text features:
          mean      -> (B, rnn_size)         [x2 if bidirectional]
          last      -> (B, rnn_size)
          mean_last -> (B, 2 * rnn_size)
        """
        sp = self.spec
        if self.word_embeddings is not None:
            init = lambda *_: jnp.asarray(self.word_embeddings, jnp.float32)
        else:
            init = nn.initializers.normal(1.0)
        we = self.param("we", init, (sp.vocab_size, sp.we_dim))
        x = we[token_ids]  # (B, T, we_dim)

        h_dim = sp.rnn_size

        def layer_params(tag, in_dim):
            # torch nn.GRU defaults: EVERY weight/bias ~ U(+-1/sqrt(hidden))
            # (see initializers.py for the measured from-scratch basin gap
            # vs the earlier xavier/orthogonal/zero-bias choice)
            init = torch_linear_init(h_dim)
            w_ih = self.param(f"w_ih_{tag}", init, (3 * h_dim, in_dim))
            w_hh = self.param(f"w_hh_{tag}", init, (3 * h_dim, h_dim))
            b_ih = self.param(f"b_ih_{tag}", init, (3 * h_dim,))
            b_hh = self.param(f"b_hh_{tag}", init, (3 * h_dim,))
            return w_ih, w_hh, b_ih, b_hh

        outs = x
        for layer in range(sp.rnn_layer):
            in_dim = outs.shape[-1]
            fwd = _gru_scan(outs, lengths, *layer_params(f"l{layer}", in_dim))
            if sp.bidirectional:
                bwd = _gru_scan(
                    outs, lengths, *layer_params(f"l{layer}_rev", in_dim),
                    reverse=True,
                )
                outs = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                outs = fwd

        t = outs.shape[1]
        mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(outs.dtype)

        def mean_pool():
            total = jnp.sum(outs * mask[:, :, None], axis=1)
            return total / jnp.clip(lengths[:, None].astype(outs.dtype), min=1.0)

        def last_pool():
            idx = jnp.clip(lengths - 1, min=0)
            return jnp.take_along_axis(outs, idx[:, None, None], axis=1)[:, 0]

        if sp.pooling == "mean":
            return mean_pool()
        if sp.pooling == "last":
            return last_pool()
        if sp.pooling == "mean_last":
            return jnp.concatenate([mean_pool(), last_pool()], axis=-1)
        raise ValueError(f"pooling {sp.pooling}")
