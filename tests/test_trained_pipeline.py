"""Capstone integration: a briefly-TRAINED pipeline must beat random.

The oracle tests bracket the pipeline from above with perfect positions
and the overfit tests show gradients flow; this test closes the remaining
gap — it trains both stages for real epochs on a synthetic scene and
asserts the full coarse→fine pipeline localizes better than the
--coarse_random / --fine_random baselines (reference evaluation oracle
modes, evaluation/args.py:44-50). This is the regression net that keeps
the benchmark from silently shipping untrained-quality accuracy.
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy integration tier (conftest --slow)

import dataclasses

import jax
import numpy as np

from text2pos_tpu.config import EvalConfig, TrainConfig
from text2pos_tpu.data.hints import (Vocabulary, build_vocabulary,
                                     create_hint_description)
from text2pos_tpu.data.loaders import CoarseLoader
from text2pos_tpu.data.synthetic import make_synthetic_dataset
from text2pos_tpu.evaluation.pipeline import LocalizationPipeline

CFG = dict(batch_size=16, embed_dim=128, num_layers=2, sinkhorn_iters=20,
           pointnet_numpoints=32, coarse_max_objects=16, pad_size=16,
           num_mentioned=6, max_text_len=64, max_hint_len=12,
           learning_rate=1e-3, lr_gamma=0.97, epochs=15, fused=True,
           no_cell_augment=True)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train coarse+fine on a 16-cell synthetic scene (device-resident
    fused epochs; ~4 min of CPU per stage). embed_dim 128 matters: at 32
    the retrieval tower plateaus at random accuracy within this step
    budget (measured), at 128 it reaches top-5 ≈ 2× random by epoch 15."""
    from text2pos_tpu.train import coarse as coarse_mod
    from text2pos_tpu.train import fine as fine_mod

    cells, poses = make_synthetic_dataset(seed=5, scene_name="5555",
                                          extent=120.0, poses_per_cell=8)
    ckdir = str(tmp_path_factory.mktemp("ckpts"))

    ccfg = TrainConfig(**CFG)
    cstate, cres = coarse_mod.train(ccfg, cells, poses, cells, poses,
                                    checkpoint_dir=ckdir,
                                    log=lambda *a, **k: None)
    fcfg = TrainConfig(**{**CFG, "learning_rate": 3e-4})
    fstate, fres = fine_mod.train(fcfg, cells, poses, cells, poses,
                                  checkpoint_dir=ckdir,
                                  log=lambda *a, **k: None)
    vocab = cres["vocab"]
    return cells, poses, ccfg, vocab, cres["trainer"], cstate, \
        fres["trainer"], fstate


class TestTrainedPipelineBeatsRandom:
    def test_end_to_end(self, trained):
        (cells, poses, cfg, vocab, coarse_tr, cstate, fine_tr,
         fstate) = trained
        ecfg = EvalConfig(top_k=(1, 3, 5), threshs=(5, 10, 15),
                          pad_size=cfg.pad_size,
                          num_mentioned=cfg.num_mentioned,
                          max_hint_len=cfg.max_hint_len,
                          max_text_len=cfg.max_text_len,
                          pointnet_numpoints=cfg.pointnet_numpoints)
        pipe = LocalizationPipeline(coarse_tr, cstate, fine_tr, fstate, ecfg)
        loader = CoarseLoader(cells, poses, vocab, cfg.batch_size,
                              cfg.coarse_max_objects, cfg.pointnet_numpoints,
                              cfg.max_text_len)

        top_idx, coarse_accs = pipe.run_coarse(loader, poses)
        rand_pipe = LocalizationPipeline(
            coarse_tr, cstate, fine_tr, fstate,
            dataclasses.replace(ecfg, coarse_random=True))
        rand_idx, rand_accs = rand_pipe.run_coarse(loader, poses)

        # Trained retrieval must clearly beat random retrieval (16 cells →
        # random top-5@15m ≈ 0.31; the trained model separates by a margin).
        assert coarse_accs[5][15] > rand_accs[5][15] + 0.15, (
            coarse_accs[5][15], rand_accs[5][15])

        # Fine stage with trained matcher + offsets vs random in-cell
        # positions on the SAME retrievals.
        accs_mean, accs_offsets, _ = pipe.run_fine(loader, poses, top_idx,
                                                   vocab, chunk=8)
        accs_fine_random = pipe.run_fine_oracle(loader, poses, top_idx,
                                                random_oracle=True)
        accs_fine_oracle = pipe.run_fine_oracle(loader, poses, top_idx)
        # At the tightest threshold the trained matcher must beat random
        # positions and stay below the perfect-position oracle.
        assert accs_offsets[5][5] >= accs_fine_random[5][5], (
            accs_offsets[5][5], accs_fine_random[5][5])
        assert accs_offsets[5][15] <= accs_fine_oracle[5][15] + 1e-9
        # And the full trained pipeline must beat random retrieval with
        # random positions end-to-end at every k.
        for k in (1, 3, 5):
            assert accs_offsets[k][15] > rand_accs[k][15], k
