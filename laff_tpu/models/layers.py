"""Projection heads: the TransformNet family.

Reference semantics (``model/model.py:211-308``): Linear (xavier-uniform,
zero bias) -> activation (tanh default) -> dropout -> BatchNorm1d.
``fc=False`` / ``activation=None`` give the BN-only passthrough used for
pre-aligned CLIP features (``vis_no_transform`` / ``txt_no_transform``).

BatchNorm runs over the (possibly mesh-sharded) batch axis; under jit with
sharded inputs, the batch mean/var reductions become global collectives
automatically (GSPMD), which is the sync-BN the reference never had.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

_ACTIVATIONS = {
    "tanh": nn.tanh,
    "relu": nn.relu,
    "sigmoid": nn.sigmoid,
}


class TransformNet(nn.Module):
    dim_out: int
    fc: bool = True
    activation: Optional[str] = "tanh"
    dropout: float = 0.2
    batch_norm: bool = False
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 on TPU); params f32
    # externally owned Dense replacing fc1 (cross-tower weight tying,
    # txt_fc_same_with_vis_fc): the linear map is shared, while dropout and
    # BatchNorm statistics stay per-tower
    shared_fc: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.fc:
            dense = self.shared_fc or nn.Dense(
                self.dim_out,
                kernel_init=nn.initializers.xavier_uniform(),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="fc1",
            )
            x = dense(x)
        if self.activation and self.activation in _ACTIVATIONS:
            x = _ACTIVATIONS[self.activation](x)
        if self.dropout and self.dropout > 1e-3:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        if self.batch_norm:
            # torch BatchNorm1d(momentum=0.1) == flax momentum 0.9
            # (batch statistics always reduce in f32 via flax defaults)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn1",
            )(x)
        return x.astype(jnp.float32) if self.dtype is not None else x
