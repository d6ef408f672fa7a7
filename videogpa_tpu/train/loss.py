"""Diffusion-DPO loss.

Behavioral parity target: reference ``train/loss.py:25-155`` —
per-sample MSE of (prediction, target) for the policy and the frozen
reference model; the implicit reward is the *improvement over the reference*:

    logits = beta * ((ref_win_err - model_win_err) - (ref_lose_err - model_lose_err))
    loss   = -logsigmoid(logits)          (or hinge / label-smoothed BCE)

Pure functions over arrays (differentiable, jit-safe); errors reduce over all
non-batch axes so any latent layout works.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class LossOutput:
    loss: jax.Array
    reward_margin: jax.Array
    winner_reward: jax.Array
    loser_reward: jax.Array
    accuracy: jax.Array


def _per_sample_mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    axes = tuple(range(1, pred.ndim))
    return jnp.mean(
        (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2, axis=axes
    )


@dataclasses.dataclass(frozen=True)
class DPOLoss:
    beta: float = 500.0
    label_smoothing: float = 0.0
    loss_type: str = "sigmoid"  # "sigmoid" | "hinge"

    def __call__(
        self,
        v_win: jax.Array,
        v_lose: jax.Array,
        v_win_ref: jax.Array,
        v_lose_ref: jax.Array,
        v_win_target: jax.Array,
        v_lose_target: jax.Array,
    ) -> LossOutput:
        model_win_err = _per_sample_mse(v_win, v_win_target)
        model_lose_err = _per_sample_mse(v_lose, v_lose_target)
        ref_win_err = _per_sample_mse(v_win_ref, v_win_target)
        ref_lose_err = _per_sample_mse(v_lose_ref, v_lose_target)

        win_diff = ref_win_err - model_win_err
        lose_diff = ref_lose_err - model_lose_err

        winner_reward = -model_win_err
        loser_reward = -model_lose_err
        reward_margin = winner_reward - loser_reward

        logits = self.beta * (win_diff - lose_diff)

        if self.loss_type == "sigmoid":
            if self.label_smoothing > 0:
                target = 1.0 - self.label_smoothing
                # BCE-with-logits against a soft target
                loss = jnp.mean(
                    jnp.maximum(logits, 0)
                    - logits * target
                    + jnp.log1p(jnp.exp(-jnp.abs(logits)))
                )
            else:
                loss = -jnp.mean(jax.nn.log_sigmoid(logits))
        elif self.loss_type == "hinge":
            loss = jnp.mean(jax.nn.relu(1.0 - logits))
        else:
            raise ValueError(f"Unknown loss type: {self.loss_type}")

        accuracy = jnp.mean((winner_reward > loser_reward).astype(jnp.float32))
        return LossOutput(
            loss=loss,
            reward_margin=jnp.mean(reward_margin),
            winner_reward=jnp.mean(winner_reward),
            loser_reward=jnp.mean(loser_reward),
            accuracy=accuracy,
        )


@dataclasses.dataclass(frozen=True)
class SFTLoss:
    def __call__(self, v_pred: jax.Array, v_target: jax.Array, **_) -> LossOutput:
        loss = jnp.mean(
            (v_pred.astype(jnp.float32) - v_target.astype(jnp.float32)) ** 2
        )
        zero = jnp.asarray(0.0)
        return LossOutput(loss, zero, zero, zero, zero)


def create_loss_strategy(
    strategy: str = "dpo", beta: float = 1.0, label_smoothing: float = 0.0
):
    if strategy == "dpo":
        return DPOLoss(beta=beta, label_smoothing=label_smoothing)
    if strategy == "sft":
        return SFTLoss()
    raise ValueError(f"Unknown strategy: {strategy}")
