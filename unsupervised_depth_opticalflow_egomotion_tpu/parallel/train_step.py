"""The compiled training step: loss graph -> grads -> Adam, under a mesh.

Replaces the reference's eager loop body (/root/reference/train.py:135-219):
one jit-compiled function takes (state, batch, rng) and returns (state,
metrics). Parameters are replicated, the batch is sharded along the ``data``
mesh axis, and XLA emits the ICI all-reduce for gradients during sharding
propagation.

Parameter freezing (train.py:64-80's substring matching on pwc/fpyramid/
depth/pose) is expressed as an optax.multi_transform mask, so frozen subtrees
get zero updates but still participate in the forward (and BatchNorm stats
still update, matching the reference's requires_grad_=False behaviour).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh

from ..config import Config, loss_weights
from ..models.joint import JointModel
from .mesh import batch_sharding, replicated


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def build_model(cfg: Config) -> JointModel:
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    # trace-time op-implementation selection (module-level: ssim is called
    # from ops.losses, not through the model tree)
    from ..ops.ssim import set_ssim_impl
    from ..ops.warp import set_warp_impl

    set_ssim_impl(cfg.ssim_impl)
    set_warp_impl(cfg.warp_impl, bf16=cfg.warp_bf16, guard=cfg.warp_guard)
    return JointModel(
        num_scales=cfg.num_scales,
        num_input_frames=cfg.num_input_frames,
        flow_consist_alpha=cfg.flow_consist_alpha,
        flow_consist_beta=cfg.flow_consist_beta,
        geometric_ratio=cfg.geometric_ratio,
        geometric_num=cfg.geometric_num,
        pose_beta=cfg.pose_beta,
        enable_depth_ssim=cfg.enable_depth_ssim,
        enable_depth_consis=cfg.enable_depth_consis,
        enable_triangle=cfg.enable_triangle,
        enable_pnp=cfg.enable_pnp,
        enable_eight_point=cfg.enable_eight_point,
        ransac_iters=cfg.ransac_iters,
        remat=cfg.remat,
        packed_convs=cfg.packed_convs,
        packed_encoder=cfg.packed_encoder,
        packed_stem=cfg.packed_stem,
        encoder_int8=cfg.encoder_int8,
        depth_smooth_norm=cfg.depth_smooth_norm,
        corr_impl=cfg.pwc_corr,
        flow_occ_impl=cfg.flow_occ_impl,
        loss_base_scale=cfg.loss_base_scale,
        dyna_photo_weight=cfg.dyna_photo_weight,
        dtype=dtype,
    )


def _freeze_label_fn(cfg: Config) -> Callable[[tuple], str]:
    """Map a param path to 'train'/'frozen' (train.py:64-80 semantics)."""

    def label(path: tuple) -> str:
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        if cfg.fix_flow and ("pwc" in names or "fpyramid" in names):
            return "frozen"
        if cfg.fix_depth and "depth" in names:
            return "frozen"
        if cfg.fix_pose and "pose" in names:
            return "frozen"
        return "train"

    return label


def make_optimizer(cfg: Config, params) -> optax.GradientTransformation:
    adam = optax.adam(cfg.lr)
    if cfg.grad_clip_norm > 0:
        adam = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), adam)
    if not (cfg.fix_flow or cfg.fix_depth or cfg.fix_pose):
        # optax.flatten: run Adam over ONE raveled vector instead of ~300
        # small leaves -- the per-leaf form costs ~14 ms/step on TPU (tile
        # padding + per-tensor loop overhead for 3x3x16-sized kernels).
        # Incompatible with multi_transform's masked nodes, so the staged
        # (frozen-subtree) configurations keep the per-leaf form.
        return optax.flatten(adam)
    label = _freeze_label_fn(cfg)
    labels = jax.tree_util.tree_map_with_path(lambda p, _: label(p), params)
    return optax.multi_transform(
        {"train": adam, "frozen": optax.set_to_zero()}, labels
    )


def init_state(cfg: Config, rng: jax.Array) -> tuple[JointModel, TrainState]:
    """Initialize model variables and optimizer state on host-side zeros."""
    model = build_model(cfg)
    h, w = cfg.img_hw
    images = jnp.zeros((1, 3 * h, w, 3), jnp.float32)
    K_ms = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (1, cfg.num_scales, 3, 3))

    # jit the initializer: eager (op-by-op) init of this graph is orders of
    # magnitude slower than one fused compile.
    @jax.jit
    def _init(rng):
        # forward_geom demands an explicit sampling rng when the RANSAC-based
        # losses (triangle/pnp/eight_point) are enabled; thread one at init
        # too so init works under any loss configuration.
        k_params, k_sample = jax.random.split(rng)
        return model.init(
            k_params,
            images,
            K_ms,
            K_ms,
            rng=k_sample,
            train=False,
            method=model.forward_geom,
        )

    variables = _init(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )
    return model, state


def _merge_stats(old, new):
    """Overlay mutated batch_stats onto the full state collection.

    A mode that exercises only a subset of the networks (flow mode calls no
    BN module today) gets back a partial/empty mutated collection from flax;
    returning it verbatim would wipe the other networks' BN statistics out of
    the train state (and break checkpoint tree structure). Unvisited subtrees
    keep their old values.
    """
    if not new:
        return old
    merged = {k: v for k, v in old.items()}
    for k, v in new.items():
        if k in merged and hasattr(v, "items") and hasattr(merged[k], "items"):
            merged[k] = _merge_stats(merged[k], v)
        else:
            merged[k] = v
    return FrozenDict(merged) if isinstance(old, FrozenDict) else merged


def _forward(model: JointModel, cfg: Config, variables, batch, rng, train: bool):
    images, K_ms, K_inv_ms = batch
    if cfg.mode == "flow":
        # mutable batch_stats mirrors the depth/geom branches: the flow nets
        # are BN-free today, but if BN ever lands there its statistics must
        # update rather than silently freeze (round-2 review finding)
        out = model.apply(
            variables,
            images,
            K_ms,
            K_inv_ms,
            rng=rng,
            train=train,
            method=model.forward_flow,
            mutable=["batch_stats"] if train else False,
        )
        old_stats = variables.get("batch_stats", FrozenDict())
        if train:
            loss_pack, updates = out
            return loss_pack, _merge_stats(old_stats, updates.get("batch_stats", {}))
        return out, old_stats
    if cfg.mode == "depth":
        out = model.apply(
            variables,
            images,
            K_ms,
            K_inv_ms,
            train=train,
            method=model.forward_depth,
            mutable=["batch_stats"] if train else False,
        )
        if train:
            loss_pack, updates = out
            return loss_pack, updates["batch_stats"]
        return out, variables.get("batch_stats", FrozenDict())
    # geom
    out = model.apply(
        variables,
        images,
        K_ms,
        K_inv_ms,
        rng=rng,
        train=train,
        method=model.forward_geom,
        mutable=["batch_stats"] if train else False,
    )
    if train:
        (loss_pack, _aux), updates = out
        return loss_pack, updates["batch_stats"]
    loss_pack, _aux = out
    return loss_pack, variables.get("batch_stats", FrozenDict())


def make_train_step(
    model: JointModel,
    cfg: Config,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    unjitted: bool = False,
):
    """Build the jitted train step. With a mesh, shards batch over 'data'.

    ``unjitted=True`` returns the raw python step for callers that embed it
    in a larger jitted program (e.g. a lax.scan multi-step loop that
    amortizes per-dispatch overhead; scripts/train_synth_long.py
    --scan_steps).
    """
    weights = loss_weights(cfg)

    def train_step(state: TrainState, batch, rng):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            loss_pack, new_stats = _forward(model, cfg, variables, batch, rng, train=True)
            total = jnp.zeros((), jnp.float32)
            metrics = {}
            for k, v in loss_pack.items():
                m = jnp.mean(v)
                metrics[k] = m
                total = total + weights[k] * m
            metrics["loss_total"] = total
            return total, (metrics, new_stats)

        (_, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    if unjitted:
        return train_step
    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    rep = replicated(mesh)
    data = batch_sharding(mesh, cfg.data_axis)
    return jax.jit(
        train_step,
        donate_argnums=(0,),
        in_shardings=(rep, (data, data, data), rep),
        out_shardings=(rep, rep),
    )
