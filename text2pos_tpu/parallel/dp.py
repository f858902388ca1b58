"""Data-parallel training over a JAX device mesh.

The reference has no distributed machinery at all — every job is
single-GPU (SURVEY.md §2.3; /root/reference/slurm/train_coarse.sh:5). Data
parallelism is therefore the only multi-chip strategy this framework needs
(model sizes are <10M params; TP/PP/SP/CP/EP are deliberately out of scope),
and it is an additive capability:

 - a 1-D ``('dp',)`` mesh over ICI;
 - batches are stacked as [D, local, ...] microbatches (the flat-packed
   object buffers are packed per shard so no object crosses a device);
 - gradients and BatchNorm statistics are averaged with ``lax.pmean``;
 - optionally the contrastive ranking loss all-gathers both embedding
   towers for *global* in-batch negatives (the default keeps the reference's
   single-device loss semantics per shard).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax.shard_map is the stable home since 0.8 (check_rep → check_vma)
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=True):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from text2pos_tpu.train.losses import (
    hardest_ranking_loss,
    matching_loss,
    pairwise_ranking_loss,
    triplet_margin_loss,
)
from text2pos_tpu.ops.transforms import prepare_object_points
from text2pos_tpu.train.state import TrainState


def make_mesh(num_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    mesh_devices = mesh_utils.create_device_mesh((n,), devices=devices[:n])
    return Mesh(mesh_devices, (axis,))


def stack_microbatches(batches: List[Dict[str, np.ndarray]],
                       skip=("num_real", "pose_idx")) -> Dict[str, np.ndarray]:
    """Stack D per-device batches into [D, ...] arrays for shard_map."""
    out = {}
    for key in batches[0]:
        if key in skip:
            continue
        out[key] = np.stack([b[key] for b in batches])
    return out


def dp_coarse_train_step(trainer, mesh: Mesh, global_negatives: bool = False):
    """Build a jitted DP train step for the coarse retrieval model.

    Returns ``step(state, stacked_batch, rng) -> (state, loss)`` where
    ``stacked_batch`` holds [D, local, ...] arrays.
    """
    cfg = trainer.cfg
    model = trainer.model

    def per_device(params, batch_stats, batch, rng):
        # Each device sees a [1, ...] shard of the stacked [D, ...] batch.
        batch = jax.tree.map(lambda a: a[0], batch)
        rng = rng[0]
        pts, cols = prepare_object_points(
            batch["points_xyz"], batch["points_rgb"], batch["point_count"],
            cfg.pointnet_numpoints, rng, augment=True,
            no_pc_augment=cfg.no_pc_augment,
        )

        def loss_fn(p):
            (text, cells), updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["tokens"], batch["lengths"], pts, cols,
                batch["centers"], batch["colors"], batch["class_idx"],
                batch["color_idx"], batch["flat_valid"], batch["cell_idx"],
                batch["slot_idx"], batch["tokens"].shape[0],
                cfg.coarse_max_objects, train=True, mutable=["batch_stats"],
            )
            if global_negatives:
                # All-gather both towers over ICI: every device scores the
                # full global batch (negatives from all shards).
                text = jax.lax.all_gather(text, "dp", tiled=True)
                cells = jax.lax.all_gather(cells, "dp", tiled=True)
            if cfg.ranking_loss == "hardest":
                loss = hardest_ranking_loss(text, cells, cfg.margin)
            elif cfg.ranking_loss == "triplet":
                # In-batch rolled negatives (see train/coarse.py).
                loss = triplet_margin_loss(
                    text, cells, jnp.roll(cells, 1, axis=0), cfg.margin)
            else:
                loss = pairwise_ranking_loss(text, cells, cfg.margin)
            return loss, updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        loss = jax.lax.pmean(loss, "dp")
        grads = jax.lax.pmean(grads, "dp")
        new_bs = jax.lax.pmean(new_bs, "dp")
        return loss, grads, new_bs

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp")),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )

    @jax.jit
    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        rngs = jax.random.split(rng, mesh.devices.size)
        loss, grads, new_bs = sharded(state.params, state.batch_stats, batch, rngs)
        return state.apply_gradients(grads, new_bs), loss

    return step


def dp_fine_train_step(trainer, mesh: Mesh):
    """Build a jitted DP train step for the fine matching model."""
    cfg = trainer.cfg
    model = trainer.model

    def per_device(params, batch_stats, batch, rng):
        # Each device sees a [1, ...] shard of the stacked [D, ...] batch.
        batch = jax.tree.map(lambda a: a[0], batch)
        rng = rng[0]
        pts, cols = prepare_object_points(
            batch["points_xyz"], batch["points_rgb"], batch["point_count"],
            cfg.pointnet_numpoints, rng, augment=True,
            no_pc_augment=cfg.no_pc_augment,
        )

        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["hint_tokens"], batch["hint_lengths"], pts, cols,
                batch["centers"], batch["colors"], batch["class_idx"],
                batch["color_idx"], train=True, mutable=["batch_stats"],
            )
            loss = matching_loss(out["log_P"], batch["all_matches"],
                                 batch["all_matches_count"])
            loss = loss + 5.0 * jnp.mean((out["offsets"] - batch["offsets"]) ** 2)
            return loss, updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return (jax.lax.pmean(loss, "dp"), jax.lax.pmean(grads, "dp"),
                jax.lax.pmean(new_bs, "dp"))

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp")),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )

    @jax.jit
    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        rngs = jax.random.split(rng, mesh.devices.size)
        loss, grads, new_bs = sharded(state.params, state.batch_stats, batch, rngs)
        return state.apply_gradients(grads, new_bs), loss

    return step


def dp_train_epoch(step, trainer, state: TrainState, loader, epoch: int,
                   rng: jax.Array, num_devices: int):
    """Drive one DP epoch: group the loader's per-device batches into
    [D, local, ...] stacks and run the given DP ``step`` on each group.

    The trailing group smaller than D devices is dropped (static shapes),
    matching the drop-last semantics of the single-device epoch.
    """
    losses = []
    micro, i = [], 0
    for batch in loader.epoch(seed=trainer.cfg.seed * 10_000 + epoch):
        micro.append(batch)
        if len(micro) == num_devices:
            step_rng = jax.random.fold_in(rng, i)
            i += 1
            state, loss = step(state, stack_microbatches(micro), step_rng)
            losses.append(float(loss))
            micro = []
        if trainer.cfg.max_batches is not None and i >= trainer.cfg.max_batches:
            break
    return state, float(np.mean(losses)) if losses else float("nan")


def dp_encode_all_cells(trainer, state: TrainState, bank, mesh: Mesh,
                        rng: jax.Array) -> np.ndarray:
    """Encode every DB cell with the retrieval model, cells sharded over the
    mesh (SURVEY.md §2.3 eval sharding). Returns [C, E] like
    ``CoarseTrainer.encode_all_cells``."""
    from text2pos_tpu.data.dense import flatten_bank_slice

    D = mesh.devices.size
    B = trainer.cfg.batch_size          # cells per device per step
    flat_cap = B * trainer.cfg.coarse_max_objects
    encode = dp_encode_cells(trainer, mesh, B)
    out = []
    group = B * D
    for i in range(0, bank.num_cells, group):
        idx = np.arange(i, min(i + group, bank.num_cells))
        real = len(idx)
        if real < group:
            idx = np.concatenate([idx, np.zeros(group - real, np.int64)])
        micro = [flatten_bank_slice(bank, idx[d * B:(d + 1) * B], flat_cap)
                 for d in range(D)]
        stacked = {k: jnp.asarray(v)
                   for k, v in stack_microbatches(micro).items()}
        enc = encode(state, stacked, jax.random.fold_in(rng, i))
        out.append(np.asarray(enc)[:real])
    return np.concatenate(out)


def dp_serve_batch(pipe, mesh: Mesh, top_k: int, rerank_k: int = 0,
                   rerank_lambda: float = 0.0, rerank_gamma: float = 0.0,
                   prune_m: int = 0, prune_layers: int = 1,
                   prune_sinkhorn: int = 10, prune_soft: bool = False):
    """Shard end-to-end serving over the mesh: queries split across
    devices, the (small) retrieval DB and fine bank replicated. Serving is
    embarrassingly parallel — no collectives beyond the output gather.

    Requires a CALIBRATED pipeline (``calibrated_for_serving``): with the
    reference's batch-statistics BN, each shard would normalize by its own
    sub-batch and results would depend on the device count. With frozen
    population statistics the sharded outputs equal the single-device ones
    exactly (tested on the 8-device virtual mesh).

    Returns ``serve(cstate, fstate, cell_enc, bank0, bank1, tokens,
    lengths, hint_tokens, hint_lengths) -> (top_idx, pos_mean,
    pos_offsets, confidences)`` with query-sharded inputs/outputs gathered
    on the leading axis. The query count must divide by the mesh size.
    """

    def per_device(cstate, fstate, cell_enc, bank0, bank1,
                   tokens, lengths, hint_tokens, hint_lengths):
        return pipe.serve_batch(cstate, fstate, tokens, lengths,
                                hint_tokens, hint_lengths, cell_enc, top_k,
                                bank0, bank1, rerank_k, rerank_lambda,
                                rerank_gamma, prune_m, prune_layers,
                                prune_sinkhorn, prune_soft)

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(),
                  P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        check_rep=False,
    )

    @jax.jit
    def serve(cstate, fstate, cell_enc, bank0, bank1,
              tokens, lengths, hint_tokens, hint_lengths):
        return sharded(cstate, fstate, cell_enc, bank0, bank1,
                       tokens, lengths, hint_tokens, hint_lengths)

    return serve


def dp_serve_batch_dbsharded(pipe, mesh: Mesh, top_k: int,
                             rerank_k: int = 0,
                             num_real_cells: Optional[int] = None,
                             rerank_lambda: float = 0.0,
                             rerank_gamma: float = 0.0,
                             prune_m: int = 0, prune_layers: int = 1,
                             prune_sinkhorn: int = 10,
                             prune_soft: bool = False):
    """Serving with BOTH queries and the map sharded over the mesh — for
    city-scale DBs larger than one chip's HBM (the replicated-DB
    ``dp_serve_batch`` above is preferable whenever the map fits).

    Layout: queries split over ``dp``; the coarse cell encodings [C, E]
    and the fine bank ([C, pad, E], [C, pad, 2]) sharded over the same
    axis. Two ring passes over ICI (``lax.ppermute``), the distributed-
    MIPS pattern:

     1. **ring retrieval** — DB shards rotate around the ring; each
        device scores its local queries against the visiting shard on
        the MXU and keeps a running top-k_all (scores + global indices).
        Only [q_local, C/D] scores ever exist at once.
     2. **ring gather** — fine-bank shards rotate; each device picks out
        the encodings of its winning candidates as their home shard
        passes by (masked clamp-gather, no host indices).

    The fine matcher then runs purely locally on [q_local · k_all]
    pose-cell pairs — the same total fine compute as the replicated-DB
    mode, balanced across the mesh. Requires a CALIBRATED pipeline
    (frozen BN statistics) like dp_serve_batch, for the same reason.

    Returns ``serve(cstate, fstate, cell_enc, bank0, bank1, tokens,
    lengths, hint_tokens, hint_lengths)`` over GLOBAL arrays; query
    count and cell count must divide the mesh size. Pad the DB arrays
    with zero rows and pass the true count as ``num_real_cells`` — the
    dummies are masked to -inf by global index and can never win.
    """
    D = mesh.devices.size
    axis = mesh.axis_names[0]
    coarse_model = pipe.coarse.model
    k_all = rerank_k if rerank_k > top_k else top_k

    def per_device(cstate, fstate, cell_enc_l, bank0_l, bank1_l,
                   tokens_l, lengths_l, hint_tokens_l, hint_lengths_l,
                   num_cells: int):
        q = tokens_l.shape[0]
        Cs = cell_enc_l.shape[0]
        text_enc = coarse_model.apply(
            {"params": cstate.params, "batch_stats": cstate.batch_stats},
            tokens_l, lengths_l, method=type(coarse_model).encode_text)

        d0 = jax.lax.axis_index(axis).astype(jnp.int32)
        perm_fwd = [(i, (i + 1) % D) for i in range(D)]
        k_loc = min(k_all, num_cells)

        # ---- ring pass 1: rotating retrieval with running top-k ----
        def ret_step(carry, _):
            best_v, best_i, cells, src = carry
            scores = jnp.einsum("qe,ce->qc", text_enc, cells,
                                preferred_element_type=jnp.float32)
            gidx = src * Cs + jnp.arange(Cs, dtype=jnp.int32)
            scores = jnp.where(gidx[None, :] < num_cells, scores, -jnp.inf)
            cat_v = jnp.concatenate([best_v, scores], axis=1)
            cat_i = jnp.concatenate(
                [best_i, jnp.broadcast_to(gidx[None, :], (q, Cs))], axis=1)
            # Two-key sort (score desc, global index asc) instead of
            # lax.top_k: the ring visits shards in (d0, d0-1, …) order, so
            # top_k's positional tie-break would prefer the incumbent /
            # visit order, while single-device lax.top_k over the global
            # score matrix prefers the LOWEST GLOBAL INDEX on exact ties.
            # Sorting on (−score, gidx) reproduces that order exactly —
            # keeping the "bit-identical to the replicated-DB mode" claim
            # (and dryrun_multichip's exact-equality asserts) true even
            # when coarse scores tie.
            sv, si = jax.lax.sort((-cat_v, cat_i), dimension=1, num_keys=2)
            best_v, best_i = -sv[:, :k_loc], si[:, :k_loc]
            cells = jax.lax.ppermute(cells, axis, perm_fwd)
            return (best_v, best_i, cells, (src + D - 1) % D), None

        init = (jnp.full((q, k_loc), -jnp.inf, jnp.float32),
                jnp.zeros((q, k_loc), jnp.int32), cell_enc_l, d0)
        (sims, top_idx, _, _), _ = jax.lax.scan(ret_step, init, None,
                                                length=D)

        # ---- ring pass 2: gather the winners' fine-bank entries ----
        def gather_step(carry, _):
            g0, g1, b0, b1, src = carry
            loc = top_idx - src * Cs                       # [q, k]
            inside = (loc >= 0) & (loc < Cs)
            locc = jnp.clip(loc, 0, Cs - 1)
            g0 = jnp.where(inside[..., None, None], b0[locc], g0)
            g1 = jnp.where(inside[..., None, None], b1[locc], g1)
            b0 = jax.lax.ppermute(b0, axis, perm_fwd)
            b1 = jax.lax.ppermute(b1, axis, perm_fwd)
            return (g0, g1, b0, b1, (src + D - 1) % D), None

        init = (jnp.zeros((q, k_loc) + bank0_l.shape[1:], bank0_l.dtype),
                jnp.zeros((q, k_loc) + bank1_l.shape[1:], bank1_l.dtype),
                bank0_l, bank1_l, d0)
        (obj_enc, centers_xy, _, _, _), _ = jax.lax.scan(
            gather_step, init, None, length=D)

        # ---- optional cascaded prune on the gathered candidates ----
        # Cheap truncated-matcher pass over all k_loc ring-gathered
        # candidates, keep the top prune_m by the blended cheap score,
        # full fine pass only on those (pipeline.serve_batch's cascade,
        # on already-gathered encodings — no second ring needed).
        eff_rerank = rerank_k if k_loc > top_k else 0
        model = pipe.fine.model
        hint_enc = model.apply(
            {"params": fstate.params, "batch_stats": fstate.batch_stats},
            hint_tokens_l, hint_lengths_l, method=type(model).encode_hints)
        if prune_m and top_k < prune_m < k_loc:
            cheap = pipe._cheap_matcher(prune_layers, prune_sinkhorn)
            if prune_soft:
                from text2pos_tpu.train.losses import soft_mass_and_spread

                qn, kn, padn = obj_enc.shape[:3]
                hint_rep = jnp.repeat(hint_enc, kn, axis=0)
                out = cheap.apply(
                    {"params": fstate.params,
                     "batch_stats": fstate.batch_stats},
                    obj_enc.reshape(qn * kn, padn, -1), hint_rep,
                    train=False, method=type(cheap).match_encoded)
                c_conf, c_spread = soft_mass_and_spread(
                    out["P"].reshape(qn, kn, padn + 1, -1),
                    centers_xy,
                    out["offsets"].reshape(qn, kn, -1, 2))
            else:
                _, _, _, _, c_conf, c_spread = pipe._match_from_enc(
                    fstate, obj_enc, centers_xy, hint_enc, model=cheap)
            score = c_conf.astype(jnp.float32)
            if rerank_lambda:
                score = score + rerank_lambda * sims.astype(jnp.float32)
            if rerank_gamma:
                score = score - rerank_gamma * c_spread.astype(jnp.float32)
            keep = jnp.argsort(-score, axis=1, stable=True)[:, :prune_m]
            top_idx = jnp.take_along_axis(top_idx, keep, axis=1)
            sims = jnp.take_along_axis(sims, keep, axis=1)
            obj_enc = jnp.take_along_axis(obj_enc, keep[..., None, None],
                                          axis=1)
            centers_xy = jnp.take_along_axis(centers_xy,
                                             keep[..., None, None], axis=1)
            eff_rerank = prune_m

        # ---- local fine matching + shared rerank/compact tail ----
        _, pos_mean, pos_offsets, confidences, conf_scores, spreads = (
            pipe._match_from_enc(fstate, obj_enc, centers_xy, hint_enc))
        return pipe._compact_results(
            top_idx, pos_mean, pos_offsets, confidences, conf_scores,
            min(top_k, num_cells), eff_rerank,
            num_cells, sims=sims, rerank_lambda=rerank_lambda,
            spreads=spreads, rerank_gamma=rerank_gamma)

    @jax.jit
    def serve(cstate, fstate, cell_enc, bank0, bank1,
              tokens, lengths, hint_tokens, hint_lengths):
        C = cell_enc.shape[0]
        assert C % D == 0, f"pad the DB to a multiple of {D} cells ({C})"
        C_real = num_real_cells or C
        assert C_real <= C
        body = shard_map(
            lambda cs, fs, ce, b0, b1, tk, ln, htk, hln: per_device(
                cs, fs, ce, b0, b1, tk, ln, htk, hln, C_real),
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis),
                      P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P(axis)),
            check_rep=False,
        )
        return body(cstate, fstate, cell_enc, bank0, bank1,
                    tokens, lengths, hint_tokens, hint_lengths)

    return serve


def dp_encode_cells(trainer, mesh: Mesh, cells_per_device: int):
    """DP evaluation sharding: encode DB cells sharded over devices and
    all-gather the (small) [C, E] embedding matrix (SURVEY.md §2.3).

    The returned function takes stacked [D, ...] flat-packed cell batches
    (``cells_per_device`` cells per device, via ``flatten_bank_slice`` +
    ``stack_microbatches``) and returns [D · cells_per_device, E].
    """
    cfg = trainer.cfg
    model = trainer.model

    def per_device(params, batch_stats, batch, rng):
        # Each device sees a [1, ...] shard of the stacked [D, ...] batch.
        batch = jax.tree.map(lambda a: a[0], batch)
        rng = rng[0]
        pts, cols = prepare_object_points(
            batch["points_xyz"], batch["points_rgb"], batch["point_count"],
            cfg.pointnet_numpoints, rng, augment=False,
            no_pc_augment=cfg.no_pc_augment,
        )
        enc = model.apply(
            {"params": params, "batch_stats": batch_stats},
            pts, cols, batch["centers"], batch["colors"], batch["class_idx"],
            batch["color_idx"], batch["flat_valid"], batch["cell_idx"],
            batch["slot_idx"], cells_per_device,
            cfg.coarse_max_objects, train=False,
            method=type(model).encode_objects,
        )
        return jax.lax.all_gather(enc, "dp", tiled=True)

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp")),
        out_specs=P(),
        check_rep=False,
    )

    @jax.jit
    def encode(state: TrainState, batch, rng):
        rngs = jax.random.split(rng, mesh.devices.size)
        return sharded(state.params, state.batch_stats, batch, rngs)

    return encode
