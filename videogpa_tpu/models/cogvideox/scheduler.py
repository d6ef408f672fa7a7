"""CogVideoX noise schedulers: shared schedule + DDIM and DPM-Solver++ steps.

Schedule parity targets (the diffusers CogVideoXDDIM/DPMScheduler config the
reference loads, ``train/CogVideoX-I2V-5B/03_train.py:111``):
- scaled_linear betas sqrt-space linspace(sqrt(0.00085), sqrt(0.012), 1000)
- SNR shift: ac <- ac / (s + (1 - s) * ac) with s = snr_shift_scale = 3.0
- zero-terminal-SNR rescale (Lin et al. 2024)
- v-prediction; "trailing" timestep spacing for sampling
  (reference ``generate/CogVideoX-5B.py:18``: timestep_spacing="trailing")

``add_noise``/``get_velocity`` are exact (the DPO training path depends on
them, reference ``train/CogVideoX-I2V-5B/03_train.py:135-146``); the sampler
offers DDIM (eta=0) and deterministic DPM-Solver++(2M) on x0-prediction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _make_alphas_cumprod(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    snr_shift_scale: float = 3.0,
    rescale_betas_zero_snr: bool = True,
) -> np.ndarray:
    betas = (
        np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_train_timesteps) ** 2
    )
    alphas_cumprod = np.cumprod(1.0 - betas)
    # SNR shift (CogVideoX: snr_shift_scale=3)
    alphas_cumprod = alphas_cumprod / (
        snr_shift_scale + (1 - snr_shift_scale) * alphas_cumprod
    )
    if rescale_betas_zero_snr:
        sqrt_ac = np.sqrt(alphas_cumprod)
        s0, sT = sqrt_ac[0].copy(), sqrt_ac[-1].copy()
        sqrt_ac = sqrt_ac - sT
        sqrt_ac = sqrt_ac * s0 / (s0 - sT)
        alphas_cumprod = sqrt_ac ** 2
    return alphas_cumprod.astype(np.float32)


@dataclasses.dataclass
class CogVideoXScheduler:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    snr_shift_scale: float = 3.0
    rescale_betas_zero_snr: bool = True
    prediction_type: str = "v_prediction"
    timestep_spacing: str = "trailing"

    def __post_init__(self):
        self.alphas_cumprod = jnp.asarray(
            _make_alphas_cumprod(
                self.num_train_timesteps,
                self.beta_start,
                self.beta_end,
                self.snr_shift_scale,
                self.rescale_betas_zero_snr,
            )
        )
        # final_alpha_cumprod for the step before t=0 (set_alpha_to_one=False
        # in CogVideoX configs -> alphas_cumprod[0])
        self.final_alpha_cumprod = self.alphas_cumprod[0]

    # ------------------------------------------------------------------
    # Training utilities (exact parity required)
    # ------------------------------------------------------------------

    def _gather_ac(self, timesteps: jax.Array, ndim: int) -> jax.Array:
        ac = self.alphas_cumprod[timesteps]
        return ac.reshape(ac.shape + (1,) * (ndim - ac.ndim))

    def add_noise(
        self, original: jax.Array, noise: jax.Array, timesteps: jax.Array
    ) -> jax.Array:
        ac = self._gather_ac(timesteps, original.ndim).astype(original.dtype)
        return jnp.sqrt(ac) * original + jnp.sqrt(1 - ac) * noise

    def get_velocity(
        self, sample: jax.Array, noise: jax.Array, timesteps: jax.Array
    ) -> jax.Array:
        ac = self._gather_ac(timesteps, sample.ndim).astype(sample.dtype)
        return jnp.sqrt(ac) * noise - jnp.sqrt(1 - ac) * sample

    # ------------------------------------------------------------------
    # Sampling
    # ------------------------------------------------------------------

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        if self.timestep_spacing == "trailing":
            step = self.num_train_timesteps / num_inference_steps
            ts = np.round(np.arange(self.num_train_timesteps, 0, -step)).astype(
                np.int64
            )
            ts -= 1
        elif self.timestep_spacing == "linspace":
            ts = np.linspace(0, self.num_train_timesteps - 1, num_inference_steps)
            ts = ts.round()[::-1].astype(np.int64)
        else:
            step = self.num_train_timesteps // num_inference_steps
            ts = (np.arange(0, num_inference_steps) * step).round()[::-1].astype(
                np.int64
            )
        return ts

    def _pred_x0_eps(
        self, sample: jax.Array, model_output: jax.Array, ac_t: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        sqrt_ac = jnp.sqrt(ac_t)
        sqrt_1mac = jnp.sqrt(1 - ac_t)
        if self.prediction_type == "v_prediction":
            x0 = sqrt_ac * sample - sqrt_1mac * model_output
            eps = sqrt_ac * model_output + sqrt_1mac * sample
        elif self.prediction_type == "epsilon":
            eps = model_output
            x0 = (sample - sqrt_1mac * eps) / jnp.maximum(sqrt_ac, 1e-8)
        else:
            raise ValueError(self.prediction_type)
        return x0, eps

    def ddim_step(
        self,
        model_output: jax.Array,
        timestep: int,
        prev_timestep: int,
        sample: jax.Array,
    ) -> jax.Array:
        """Deterministic DDIM update (the CogVideoX a_t/b_t formulation)."""
        ac_t = self.alphas_cumprod[timestep]
        ac_prev = jnp.where(
            prev_timestep >= 0,
            self.alphas_cumprod[jnp.maximum(prev_timestep, 0)],
            self.final_alpha_cumprod,
        )
        x0, _ = self._pred_x0_eps(sample, model_output, ac_t)
        # a_t = sqrt((1-ac_prev)/(1-ac_t)); b_t = sqrt(ac_prev) - sqrt(ac_t) a_t
        a_t = jnp.sqrt((1 - ac_prev) / jnp.maximum(1 - ac_t, 1e-12))
        b_t = jnp.sqrt(ac_prev) - jnp.sqrt(ac_t) * a_t
        return a_t * sample + b_t * x0

    def dpm_step(
        self,
        model_output: jax.Array,
        timestep: int,
        prev_timestep: int,
        sample: jax.Array,
        noise: jax.Array,
        old_x0: Optional[jax.Array] = None,
        timestep_back: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """diffusers ``CogVideoXDPMScheduler.step`` (SDE DPM-Solver++ 2M).

        The reference sampler is STOCHASTIC: each step mixes in fresh noise
        with ``mult_noise = sigma_prev * sqrt(1 - e^{-2h})`` and applies a
        second-order correction from the previous step's pred_x0 when
        available (``timestep_back`` = the previous, larger timestep).

        Returns (prev_first_order, prev_second_order, pred_x0); callers
        select the 2nd-order result when old_x0 was real and
        prev_timestep >= 0 (diffusers falls back to 1st order on the first
        and final steps).
        """
        ac_t = self.alphas_cumprod[timestep]
        ac_prev = jnp.where(
            prev_timestep >= 0,
            self.alphas_cumprod[jnp.maximum(prev_timestep, 0)],
            self.final_alpha_cumprod,
        )
        x0, _ = self._pred_x0_eps(sample, model_output, ac_t)

        # lamb = log(sqrt(ac / (1 - ac))). The alphas are floored before the
        # log: with zero-terminal SNR, ac[999] == 0 exactly and the true
        # lambda is -inf; under lax.while_loop XLA:TPU can fuse the selecting
        # jnp.where into masked arithmetic where the unselected branch's
        # inf/inf NaN leaks through (0 * nan = nan). The floor makes every
        # intermediate finite and differs from the inf limit by ~1e-10.
        def lam(ac):
            ac = jnp.clip(ac, 1e-20, 1.0 - 1e-12)
            return 0.5 * jnp.log(ac / (1 - ac))

        lam_t = lam(ac_t)
        lam_s = lam(ac_prev)
        h = lam_s - lam_t

        mult1 = jnp.sqrt((1 - ac_prev) / jnp.maximum(1 - ac_t, 1e-12)) * jnp.exp(-h)
        mult2 = jnp.expm1(-2 * h) * jnp.sqrt(ac_prev)
        mult_noise = jnp.sqrt(1 - ac_prev) * jnp.sqrt(
            jnp.maximum(1 - jnp.exp(-2 * h), 0.0)
        )

        prev1 = mult1 * sample - mult2 * x0 + mult_noise * noise

        if old_x0 is None:
            return prev1, prev1, x0
        # r = h_last / h with h_last = lam_t - lam_back
        ac_back = self.alphas_cumprod[
            jnp.maximum(timestep_back, 0) if timestep_back is not None else 0
        ]
        lam_back = lam(ac_back)
        r = (lam_t - lam_back) / jnp.where(h == 0, 1e-12, h)
        mult3 = 1 + 1 / (2 * jnp.where(r == 0, 1e-12, r))
        mult4 = 1 / (2 * jnp.where(r == 0, 1e-12, r))
        # ac_back == 0 (the zero-terminal-SNR t=999 as timestep_back): the
        # true lam_back is -inf => r = inf => the reference's 2nd-order
        # correction degenerates to 1st order (mult3, mult4) = (1, 0)
        back_degenerate = ac_back <= 1e-19
        mult3 = jnp.where(back_degenerate, 1.0, mult3)
        mult4 = jnp.where(back_degenerate, 0.0, mult4)
        denoised_d = mult3 * x0 - mult4 * old_x0
        prev2 = mult1 * sample - mult2 * denoised_d + mult_noise * noise
        return prev1, prev2, x0
