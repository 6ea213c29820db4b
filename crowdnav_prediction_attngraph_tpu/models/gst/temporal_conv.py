"""Temporal-convolution readout decoder (reference
gst_updated/src/gumbel_social_transformer/temporal_convolution_net.py).

Alternative to the recursive LSTM decoder; unused by the shipped checkpoints
(SURVEY.md section 2.6) but part of the GST model family: stacked residual
time-convolutions over the observation window, a time-expansion linear pair
(obs_len -> pred_len), and a per-node output MLP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class TemporalConvolutionNet(nn.Module):
    in_channels: int
    out_channels: int
    dim_hidden: int
    nconv: int = 2
    obs_seq_len: int = 8
    pred_seq_len: int = 12
    kernel_size: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: (batch, obs_len, node, C) -> (batch, pred_len, node, out_channels)
        assert self.kernel_size % 2 == 1 and self.nconv >= 2
        for i in range(self.nconv):
            h = nn.LayerNorm(name=f"norm_{i}")(x)
            # conv over the time axis only, per node ((k, 1) torch Conv2d)
            h = nn.relu(nn.Conv(self.in_channels,
                                kernel_size=(self.kernel_size, 1),
                                padding=((self.kernel_size // 2,) * 2, (0, 0)),
                                name=f"timeconv_{i}")(h))
            x = x + h
        # (batch, node, C, obs_len) -> time expansion to pred_len
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nn.relu(nn.Dense(self.pred_seq_len, name="timelinear1")(x))
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.relu(nn.Dense(self.pred_seq_len, name="timelinear2")(x))
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = jnp.transpose(x, (0, 3, 1, 2))        # (batch, pred_len, node, C)
        x = nn.relu(nn.Dense(self.dim_hidden, name="linear1")(x))
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.out_channels, name="linear2")(x)
