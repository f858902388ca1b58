"""Fast constructor-level validation of LocalizationServer's cascade
arguments (no models built — the checks fire before checkpoint loading)."""

import pytest

from text2pos_tpu.serving import LocalizationServer


class TestCascadeArgValidation:
    @pytest.mark.parametrize("prune_m,rerank_k", [
        (10, 128),   # prune_m == top_k
        (5, 128),    # prune_m < top_k
        (128, 128),  # prune_m == rerank_k
        (200, 128),  # prune_m > rerank_k
        (24, 0),     # cascade without re-ranking pool
    ])
    def test_invalid_prune_bounds_raise(self, prune_m, rerank_k):
        with pytest.raises(ValueError, match="top_k < prune_m < rerank_k"):
            LocalizationServer("nope_coarse.msgpack", "nope_fine.msgpack",
                               cells=[], top_k=10, rerank_k=rerank_k,
                               prune_m=prune_m)

    def test_prune_zero_is_always_allowed(self):
        # prune_m=0 disables the cascade; the constructor proceeds to
        # checkpoint loading, which fails on the bogus path — proving the
        # bounds check passed.
        with pytest.raises(Exception, match="(?i)no such file|not found"):
            LocalizationServer("nope_coarse.msgpack", "nope_fine.msgpack",
                               cells=[], top_k=10, rerank_k=128, prune_m=0)
