"""Standalone offset/direction regressor.

TPU-native rebuild of /root/reference/models/offset_regression.py:13-35:
a LanguageEncoder followed by an offset head; output vectors are
L2-normalized (the module predicts *directions*).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from text2pos_tpu.models.blocks import HeadMLP, l2_normalize
from text2pos_tpu.models.language import LanguageEncoder


class OffsetRegressor(nn.Module):
    vocab_size: int
    regressor_dim: int = 128

    @nn.compact
    def __call__(self, hint_tokens: jnp.ndarray, hint_lengths: jnp.ndarray,
                 train: bool = True) -> jnp.ndarray:
        """Args:
            hint_tokens:  [B, H, T]
            hint_lengths: [B, H]

        Returns:
            [B, H, 2] unit direction vectors.
        """
        B, H, T = hint_tokens.shape
        enc = LanguageEncoder(self.vocab_size, self.regressor_dim,
                              name="language_encoder")(
            hint_tokens.reshape(B * H, T), hint_lengths.reshape(B * H)
        )
        out = HeadMLP((self.regressor_dim // 2, 2), name="mlp_offsets")(enc)
        out = out.reshape(B, H, 2)
        return l2_normalize(out)
