"""Wan2.2-TI2V DPO train step (flow matching).

Parity target: reference ``train/Wan2.2-TI2V-5B/03_train.py:189-242`` —
shifted-sigma flow-matching noise, clean image latent as the first temporal
frame, per-token timestep tensor with t=0 on first-frame tokens, shared
noise/timestep for the win/lose pair, velocity target eps - z0.

Same TPU layout as the CogVideoX trainer: policy = base + LoRA, reference =
bare base (one copy of the 5B weights in HBM).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import optax

from videogpa_tpu.models.wan.config import WanConfig
from videogpa_tpu.models.wan.dit import wan_forward
from videogpa_tpu.models.wan.flow_match import (
    flow_add_noise,
    flow_velocity_target,
    sigma_from_timestep,
    ti2v_timestep_tokens,
)
from videogpa_tpu.train.loss import DPOLoss
from videogpa_tpu.train.trainer import TrainerConfig, TrainState, make_optimizer


def make_wan_dpo_train_step_unbound(cfg: WanConfig, tcfg: TrainerConfig):
    """Build the jitted Wan DPO train step with base params UNBOUND.

    Returns (train_step, eval_step) with signature
    ``step(base_params, state, batch, key)``. The unbound form exists so the
    step can be AOT-lowered against abstract ``jax.ShapeDtypeStruct`` params
    (the Wan 5B memory proof, ``train/memory.py::aot_wan_train_memory``)
    without materializing the 5B weights; ``make_wan_dpo_train_step`` binds
    concrete params for normal use.
    """
    loss_fn_obj = DPOLoss(beta=tcfg.beta)
    optimizer = make_optimizer(tcfg)
    lora_scaling = tcfg.lora_alpha / tcfg.lora_rank

    def forward(base_p, lora, latents, t, context):
        return wan_forward(
            base_p, latents, t, context, cfg,
            attn_impl=tcfg.attn_impl, remat=tcfg.remat,
            compute_dtype=tcfg.compute_dtype, lora=lora, lora_scaling=lora_scaling,
        )

    def shared_step(base_p, lora, batch: Dict[str, jax.Array], key: jax.Array):
        x_win = batch["x_win"]  # (B, C, F, H, W)
        x_lose = batch["x_lose"]
        context = batch["prompt_emb"]
        image_latent = batch.get("image_latent")
        B, _, F, H, W = x_win.shape

        k_t, k_noise = jax.random.split(key)
        timesteps = jax.random.randint(k_t, (B,), 1, cfg.num_train_timesteps)
        sigma = sigma_from_timestep(timesteps, cfg.num_train_timesteps, cfg.shift)
        noise = jax.random.normal(k_noise, x_win.shape, jnp.float32)

        x_win_noisy = flow_add_noise(x_win, noise, sigma)
        x_lose_noisy = flow_add_noise(x_lose, noise, sigma)
        if image_latent is not None:
            # concatenate, not at[].set(): the dynamic-update-slice form can
            # be miscompiled under a sharded mesh (see cogvideox dit rope)
            x_win_noisy = jnp.concatenate(
                [image_latent, x_win_noisy[:, :, 1:]], axis=2)
            x_lose_noisy = jnp.concatenate(
                [image_latent, x_lose_noisy[:, :, 1:]], axis=2)

        t_tokens = ti2v_timestep_tokens(timesteps, (F, H, W), cfg.patch_size)

        v_win = forward(base_p, lora, x_win_noisy, t_tokens, context)
        v_lose = forward(base_p, lora, x_lose_noisy, t_tokens, context)
        v_win_ref = jax.lax.stop_gradient(
            forward(base_p, None, x_win_noisy, t_tokens, context))
        v_lose_ref = jax.lax.stop_gradient(
            forward(base_p, None, x_lose_noisy, t_tokens, context))

        v_win_target = flow_velocity_target(x_win, noise)
        v_lose_target = flow_velocity_target(x_lose, noise)

        out = loss_fn_obj(
            v_win, v_lose, v_win_ref, v_lose_ref, v_win_target, v_lose_target
        )
        return out.loss, {
            "loss": out.loss,
            "reward_margin": out.reward_margin,
            "reward_accuracy": out.accuracy,
        }

    # base params as a runtime argument, not a jit closure constant (multi-GB
    # constants break/bloat remote compilation — see trainer.py)
    @functools.partial(jax.jit, donate_argnums=(1,))
    def _train_step(base_p, state: TrainState, batch, key):
        (_, metrics), grads = jax.value_and_grad(shared_step, argnums=1,
                                                 has_aux=True)(
            base_p, state.lora, batch, key
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(lora, opt_state, state.step + 1), metrics

    @jax.jit
    def _eval_step(base_p, state: TrainState, batch, key):
        _, metrics = shared_step(base_p, state.lora, batch, key)
        return metrics

    return _train_step, _eval_step


def make_wan_dpo_train_step(base_params, cfg: WanConfig, tcfg: TrainerConfig):
    _train_step, _eval_step = make_wan_dpo_train_step_unbound(cfg, tcfg)
    train_step = functools.partial(_train_step, base_params)
    eval_step = functools.partial(_eval_step, base_params)
    return train_step, eval_step
