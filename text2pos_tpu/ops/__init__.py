"""Jittable kernel library: TPU-native replacements for the reference's
CUDA/C++ dependencies (SURVEY.md §2.2)."""

from text2pos_tpu.ops.fps import farthest_point_sampling
from text2pos_tpu.ops.lstm import LSTMParams, bilstm_final_hidden
from text2pos_tpu.ops.neighbors import ball_query, masked_knn, pairwise_sqdist
from text2pos_tpu.ops.pooling import gather_neighbors, masked_max, masked_mean
from text2pos_tpu.ops.retrieval import topk_retrieval
from text2pos_tpu.ops.sinkhorn import (
    extract_matches,
    log_optimal_transport,
    log_sinkhorn,
)
from text2pos_tpu.ops.transforms import (
    fixed_points,
    normalize_scale,
    prepare_object_points,
    random_rotate_z,
)

__all__ = [
    "farthest_point_sampling", "LSTMParams", "bilstm_final_hidden",
    "ball_query", "masked_knn", "pairwise_sqdist", "gather_neighbors",
    "masked_max", "masked_mean", "topk_retrieval", "extract_matches",
    "log_optimal_transport", "log_sinkhorn", "fixed_points",
    "normalize_scale", "prepare_object_points", "random_rotate_z",
]
