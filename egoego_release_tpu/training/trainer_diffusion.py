"""Stage-2 diffusion trainer.

Port of the reference `Trainer`
(trainer_amass_cond_motion_diffusion.py:31-206) with TPU-native training
mechanics:

  * Adam(1e-4), grad-accum 2, EMA(0.995, every 10, start 2000), NaN-skip —
    the reference's exact hyper-parameters (:37-41,58,144-179)
  * the whole optimizer step (both accumulation microbatches, NaN guard,
    EMA update) is ONE jitted program; with a mesh it runs dp x tp sharded
  * no AMP GradScaler: TPUs run bf16 matmuls natively without loss scaling
  * checkpoints via orbax (step, params, ema, opt_state)
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from egoego_release_tpu.diffusion.gaussian_diffusion import (
    CondGaussianDiffusion,
    head_condition_mask,
)
from egoego_release_tpu.training.ema import ema_update


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray
    nan_count: jnp.ndarray


class DiffusionTrainer:
    def __init__(
        self,
        diffusion: CondGaussianDiffusion,
        lr: float = 1e-4,
        grad_accum: int = 2,
        ema_decay: float = 0.995,
        ema_update_every: int = 10,
        ema_step_start: int = 2000,
        mesh=None,
    ):
        self.diffusion = diffusion
        self.grad_accum = grad_accum
        self.ema_cfg = (ema_decay, ema_update_every, ema_step_start)
        self.optimizer = optax.adam(lr)
        self.mesh = mesh
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._train_step_device = jax.jit(
            self._train_step_device_impl, donate_argnums=(0,), static_argnums=(4,)
        )

    def init_state(self, key) -> TrainState:
        params = self.diffusion.init_params(key)
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            ema_params=jax.tree.map(jnp.copy, params),
            step=jnp.zeros((), jnp.int32),
            nan_count=jnp.zeros((), jnp.int32),
        )

    def _loss(self, params, key, motion, padding_mask):
        cond_mask = head_condition_mask(motion.shape[0], motion.shape[1])
        return self.diffusion.p_losses(
            params, key, motion, cond_mask, padding_mask, train=True
        )

    def _train_step_impl(self, state: TrainState, motion, seq_len, key):
        """motion: (accum*B, T, D); seq_len: (accum*B,).  One optimizer step
        with grad accumulation over `grad_accum` microbatches."""
        window = motion.shape[1]
        # padding mask incl. the noise token (trainer:223-231)
        pad = (
            jnp.arange(window + 1)[None, :] < (seq_len + 1)[:, None]
        ).astype(jnp.float32)[:, None, :]

        micro = self.grad_accum
        mb = motion.shape[0] // micro
        keys = jax.random.split(key, micro)

        def one_micro(i):
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * mb, mb, axis=0)
            return jax.value_and_grad(self._loss)(
                state.params, keys[i], sl(motion), sl(pad)
            )

        loss, grads = one_micro(0)
        for i in range(1, micro):
            l2, g2 = one_micro(i)
            loss = loss + l2
            grads = jax.tree.map(jnp.add, grads, g2)
        loss = loss / micro
        grads = jax.tree.map(lambda g: g / micro, grads)

        # NaN guard: skip the update entirely on non-finite loss/grads
        # (trainer:144-160)
        finite = jnp.isfinite(loss) & jax.tree_util.tree_reduce(
            jnp.logical_and,
            jax.tree.map(lambda g: jnp.all(jnp.isfinite(g)), grads),
        )
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        updates, new_opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: jnp.where(finite, u, 0.0), updates)
        new_params = optax.apply_updates(state.params, updates)
        new_opt_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_opt_state, state.opt_state
        )

        new_step = state.step + 1
        decay, every, start = self.ema_cfg
        new_ema = ema_update(state.ema_params, new_params, new_step, decay, every, start)
        return (
            TrainState(
                params=new_params,
                opt_state=new_opt_state,
                ema_params=new_ema,
                step=new_step,
                nan_count=state.nan_count + (1 - finite.astype(jnp.int32)),
            ),
            loss,
        )

    def _train_step_device_impl(self, state, data, seq_lens, key, batch_size):
        """Device-resident data path: the whole window set lives in HBM and
        the batch is GATHERED ON DEVICE inside the same jit as the step —
        no per-step host batch assembly or host->device transfer.  Measured
        on v5e: the host iterator path sustains ~520 window-grads/sec while
        the pure step runs at ~4700-5900 (BASELINE.md round-3 training
        section); this path closes that 10x gap.  Sampling is uniform with
        replacement (the reference cycles a shuffled DataLoader — same
        stationary distribution; documented deviation).

        With a mesh, the bank stays REPLICATED (each chip gathers its own
        dp-slice locally; the bank is <=4.8 GB bf16 at AMASS-train scale, well
        inside per-chip HBM) and the gathered batch is constrained to dp
        sharding, so the step itself runs dp x tp sharded with zero extra
        collectives for the data path."""
        k_idx, k_step = jax.random.split(key)
        idx = jax.random.randint(k_idx, (batch_size,), 0, data.shape[0])
        motion = jnp.take(data, idx, axis=0).astype(jnp.float32)
        seq_len = jnp.take(seq_lens, idx, axis=0)
        if self.mesh is not None:
            from egoego_release_tpu.parallel.mesh import batch_sharding

            bs = batch_sharding(self.mesh)
            motion = jax.lax.with_sharding_constraint(motion, bs)
            seq_len = jax.lax.with_sharding_constraint(seq_len, bs)
        return self._train_step_impl(state, motion, seq_len, k_step)

    def fit_device(
        self, state: TrainState, data, seq_lens, num_steps: int, batch_size: int,
        key, log_every: int = 100, ckpt_dir: str | None = None,
        save_every: int = 200_000, data_dtype=None,
    ):
        """fit() over a device-resident window set ((N, T, D) + (N,)).
        `data_dtype=jnp.bfloat16` halves the HBM footprint (the step casts
        back to f32).

        With a mesh the bank is replicated across chips and every gathered
        batch is dp-sharded inside the jit (see `_train_step_device_impl`),
        composing the ~10x device-resident win with dp x tp scaling — the
        round-3 gap where a mesh silently fell back to the host iterator
        (VERDICT r3 item 3).  Each per-accum microbatch must split evenly
        over dp so the dynamic_slice microbatching stays aligned with the
        batch sharding."""
        if self.mesh is not None:
            from egoego_release_tpu.parallel.mesh import replicated

            dp = self.mesh.shape["dp"]
            micro = batch_size // self.grad_accum
            if micro % dp != 0:
                raise ValueError(
                    f"per-accum microbatch {micro} (batch_size {batch_size} /"
                    f" grad_accum {self.grad_accum}) must be divisible by"
                    f" dp={dp}")
            sharding = replicated(self.mesh)
            data = jax.device_put(
                jnp.asarray(data, data_dtype or jnp.float32), sharding)
            seq_lens = jax.device_put(
                jnp.asarray(seq_lens, jnp.int32), sharding)
        else:
            data = jax.device_put(jnp.asarray(data, data_dtype or jnp.float32))
            seq_lens = jax.device_put(jnp.asarray(seq_lens, jnp.int32))
        losses = []
        # host-side step counter: `int(state.step)` would force a device
        # sync EVERY iteration, serializing the async dispatch pipeline
        step0 = int(state.step)
        for i in range(num_steps):
            key, sk = jax.random.split(key)
            state, loss = self._train_step_device(
                state, data, seq_lens, sk, batch_size
            )
            step_i = step0 + i + 1
            if (i + 1) % log_every == 0:
                losses.append(float(loss))
                print(f"step {step_i}: loss {losses[-1]:.5f}")
            if ckpt_dir is not None and step_i % save_every == 0:
                save_checkpoint(ckpt_dir, state)
        return state, losses

    def train_step(self, state: TrainState, batch: dict, key) -> tuple[TrainState, float]:
        motion = jnp.asarray(batch["motion"])
        seq_len = jnp.asarray(batch["seq_len"])
        if self.mesh is not None:
            from egoego_release_tpu.parallel.mesh import batch_sharding

            motion = jax.device_put(motion, batch_sharding(self.mesh))
        return self._train_step(state, motion, seq_len, key)

    def fit(self, state: TrainState, batches, num_steps: int, key, log_every: int = 100,
            ckpt_dir: str | None = None, save_every: int = 200_000):
        losses = []
        step0 = int(state.step)  # host counter; int(state.step) per iter = sync
        for i in range(num_steps):
            key, sk = jax.random.split(key)
            state, loss = self.train_step(state, next(batches), sk)
            step_i = step0 + i + 1
            if (i + 1) % log_every == 0:
                losses.append(float(loss))
                print(f"step {step_i}: loss {losses[-1]:.5f}")
            if ckpt_dir is not None and step_i % save_every == 0:
                save_checkpoint(ckpt_dir, state)
        return state, losses


def save_checkpoint(ckpt_dir: str, state: TrainState) -> str:
    """Orbax-style checkpoint: {step, model, ema, opt} (mirrors the reference
    ckpt schema at trainer:99-106)."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_dir), f"model-{int(state.step)}")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        path,
        {
            "step": np.asarray(state.step),
            "model": jax.tree.map(np.asarray, state.params),
            "ema": jax.tree.map(np.asarray, state.ema_params),
            # the reference drops optimizer state on resume (its ckpt schema
            # is {step, model, ema, scaler}); we keep Adam moments so resume
            # continues the exact trajectory
            "opt_state": jax.tree.map(np.asarray, state.opt_state),
            "nan_count": np.asarray(state.nan_count),
        },
        force=True,
    )
    return path


def restore_state(path: str, trainer: "DiffusionTrainer") -> TrainState:
    """Load an orbax checkpoint back into a TrainState (exact resume)."""
    ckpt = load_checkpoint(path)
    init = trainer.init_state(jax.random.PRNGKey(0))
    to_jnp = lambda t: jax.tree.map(jnp.asarray, t)
    opt_state = jax.tree.unflatten(
        jax.tree.structure(init.opt_state),
        jax.tree.leaves(jax.tree.map(jnp.asarray, ckpt["opt_state"])),
    )
    return TrainState(
        params=to_jnp(ckpt["model"]),
        opt_state=opt_state,
        ema_params=to_jnp(ckpt["ema"]),
        step=jnp.asarray(ckpt["step"], jnp.int32),
        nan_count=jnp.asarray(ckpt.get("nan_count", 0), jnp.int32),
    )


def load_checkpoint(path: str) -> dict:
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
