"""Language encoder: word embedding + masked bidirectional LSTM.

TPU-native equivalent of the reference LanguageEncoder
(/root/reference/models/modules.py:39-96): word-index embedding with index
0 (= ``<unk>`` = padding) pinned to the zero vector, a 1-layer
bidirectional LSTM over the padded token sequence, and the mean of the two
directions' final hidden states as the sentence encoding.

Tokenization happens on the host (text2pos_tpu.data.hints.Vocabulary); this
module consumes integer token ids + lengths, so the whole encoder jits.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from text2pos_tpu.ops.lstm import LSTMParams, bilstm_final_hidden


class LanguageEncoder(nn.Module):
    vocab_size: int
    embed_dim: int
    bi_dir: bool = True

    def _lstm_params(self, name: str) -> LSTMParams:
        e = self.embed_dim
        # torch LSTM init: U(−1/√H, 1/√H)
        bound = 1.0 / (e ** 0.5)
        init = nn.initializers.uniform(scale=2 * bound)

        def shifted(key, shape):
            return init(key, shape) - bound

        return LSTMParams(
            w_ih=self.param(f"{name}_w_ih", shifted, (e, 4 * e)),
            w_hh=self.param(f"{name}_w_hh", shifted, (e, 4 * e)),
            b=self.param(f"{name}_b", shifted, (4 * e,)),
        )

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        """Encode token batches.

        Args:
            tokens:  [B, T] int32 ids, 0 = unk/pad
            lengths: [B] int32 true lengths (≥ 1)

        Returns:
            [B, embed_dim] sentence encodings (not L2-normalized; callers
            norm where the reference does).
        """
        embed = nn.Embed(self.vocab_size, self.embed_dim, name="word_embedding")
        x = embed(tokens)
        # padding_idx=0 semantics: token 0 contributes a zero vector and
        # receives no gradient.
        x = x * (tokens != 0)[..., None].astype(x.dtype)

        fwd = self._lstm_params("lstm_fwd")
        if self.bi_dir:
            bwd = self._lstm_params("lstm_bwd")
            return bilstm_final_hidden(x, lengths, fwd, bwd)
        # Unidirectional fallback: forward final state only.
        from text2pos_tpu.ops.lstm import _lstm_scan  # local to avoid API noise

        xt = jnp.swapaxes(x, 0, 1)
        proj = xt @ fwd.w_ih + fwd.b
        valid = (jnp.arange(tokens.shape[1])[None, :] < lengths[:, None])
        h, _ = _lstm_scan(proj, fwd, jnp.swapaxes(valid, 0, 1))
        return h
