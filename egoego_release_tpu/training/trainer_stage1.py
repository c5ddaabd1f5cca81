"""Stage-1 trainers (HeadNet / GravityNet).

Port of trainer_head_estimation.py and
trainer_amass_head_gravity_normal_estimation.py: AdamW + StepLR(step, 0.3)
stepped per epoch, grad-norm clip 1.0, per-epoch validation.  Both trainers
share one jitted step; only the loss closure differs.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from egoego_release_tpu.models.gravitynet import (
    HeadNormalFormer,
    gravitynet_loss,
    slam_traj_features,
)
from egoego_release_tpu.models.headnet import (
    HeadFormer,
    headformer_loss,
    padding_mask_from_len,
)


class Stage1State(NamedTuple):
    params: Any
    opt_state: Any
    epoch: jnp.ndarray


def make_optimizer(lr: float, step_size_epochs: int, gamma: float = 0.3,
                   steps_per_epoch: int = 1):
    """AdamW + staircase exponential decay == torch StepLR semantics."""
    schedule = optax.exponential_decay(
        init_value=lr,
        transition_steps=step_size_epochs * steps_per_epoch,
        decay_rate=gamma,
        staircase=True,
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule),
    )


def freeze_subtrees(optimizer, frozen_keys: tuple[str, ...]):
    """Zero all updates (including AdamW weight decay) for params whose tree
    path contains one of `frozen_keys`.  torch optimizers skip
    requires_grad=False params entirely — the reference freezes the OF CNN
    that way (head_estimation_transformer.py:68-72) — whereas optax.adamw
    would still weight-decay them."""
    import jax.tree_util as jtu

    def label_fn(params):
        def lab(path, _):
            keys = {getattr(p, "key", None) for p in path}
            return "frozen" if keys & set(frozen_keys) else "train"

        return jtu.tree_map_with_path(lab, params)

    return optax.multi_transform(
        {"train": optimizer, "frozen": optax.set_to_zero()}, label_fn
    )


class Stage1Trainer:
    """Generic stage-1 trainer; subclass-free via a loss closure."""

    def __init__(self, model, loss_fn: Callable, optimizer):
        self.model = model
        self.loss_fn = loss_fn  # (model, params, batch, key) -> (loss, aux)
        self.optimizer = optimizer
        self._step = jax.jit(self._step_impl, donate_argnums=(0,))

    def init_state(self, params) -> Stage1State:
        return Stage1State(
            params=params,
            opt_state=self.optimizer.init(params),
            epoch=jnp.zeros((), jnp.int32),
        )

    def _step_impl(self, state: Stage1State, batch, key):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: self.loss_fn(self.model, p, batch, key), has_aux=True
        )(state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state._replace(params=params, opt_state=opt_state), loss, aux

    def train_step(self, state, batch, key):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return self._step(state, batch, key)


# -- loss closures -----------------------------------------------------------


def headnet_loss_fn(model: HeadFormer, params, batch, key,
                    w_rotation: float = 1.0, w_va: float = 1.0,
                    w_dist: float = 1.0, dist_scale: float = 10.0):
    """batch: of (B,T,512), head_pose (B,T+1,7), head_vels (B,T,6),
    seq_len (B,) — the reference training batch (trainer_head_estimation.py)."""
    mask = padding_mask_from_len(batch["seq_len"].astype(jnp.float32), model.window)
    va, dist = model.apply(
        params, batch["of"], mask, deterministic=False,
        rngs={"dropout": key},
    )
    loss, (ol, vl, dl) = headformer_loss(
        va, dist,
        batch["head_pose"][:, 0, 3:],
        batch["head_vels"][:, :, 3:],
        batch["head_pose"][:, :, 3:],
        batch["head_pose"][:, :, :3],
        w_rotation=w_rotation, w_va=w_va, w_dist=w_dist, dist_scale=dist_scale,
    )
    return loss, {"orient": ol, "va": vl, "dist": dl}


def headnet_cnn_loss_fn(model, params, batch, key,
                        w_rotation: float = 1.0, w_va: float = 1.0,
                        w_dist: float = 1.0, dist_scale: float = 10.0):
    """Raw-flow variant (input_of_feats=False): batch['of'] is
    (B, T, H, W, 2) flow frames; the HeadFormerWithCNN encodes them inline.
    BatchNorm uses current-batch statistics (reference running_stats=False),
    so apply is mutable over batch_stats; the updated stats are discarded
    (the reference never reads running averages on this path)."""
    mask = padding_mask_from_len(batch["seq_len"].astype(jnp.float32), model.headformer.window)
    (va, dist), _ = model.apply(
        params, batch["of"], mask, deterministic=False,
        rngs={"dropout": key}, mutable=["batch_stats"],
    )
    loss, (ol, vl, dl) = headformer_loss(
        va, dist,
        batch["head_pose"][:, 0, 3:],
        batch["head_vels"][:, :, 3:],
        batch["head_pose"][:, :, 3:],
        batch["head_pose"][:, :, :3],
        w_rotation=w_rotation, w_va=w_va, w_dist=w_dist, dist_scale=dist_scale,
    )
    return loss, {"orient": ol, "va": vl, "dist": dl}


def gravitynet_loss_fn(model: HeadNormalFormer, params, batch, key):
    """batch: head_rot_mat (B,T+1,3,3), head_trans (B,T+1,3), seq_len (B,),
    floor_normal (B,3) — AMASSHeadPoseDataset output."""
    feats = slam_traj_features(batch["head_rot_mat"], batch["head_trans"])
    window = model.window
    t = feats.shape[1]
    if t < window:
        feats = jnp.pad(feats, ((0, 0), (0, window - t), (0, 0)))
    mask = (
        jnp.arange(window)[None, :] < (batch["seq_len"] - 1)[:, None]
    ).astype(jnp.float32)
    normal = model.apply(
        params, feats, mask, deterministic=False, rngs={"dropout": key}
    )
    loss = gravitynet_loss(normal, batch["floor_normal"])
    return loss, {"normal": loss}


def train_epochs(trainer: Stage1Trainer, state: Stage1State, batches,
                 steps_per_epoch: int, num_epochs: int, key,
                 val_fn=None, log_every: int = 50):
    for epoch in range(num_epochs):
        for s in range(steps_per_epoch):
            key, sk = jax.random.split(key)
            state, loss, aux = trainer.train_step(state, next(batches), sk)
            if (s + 1) % log_every == 0:
                print(f"epoch {epoch} step {s+1}: loss {float(loss):.5f}")
        state = state._replace(epoch=state.epoch + 1)
        if val_fn is not None:
            val_fn(state, epoch)
    return state
