"""T5/umT5 encoder parity vs transformers — a true external oracle.

transformers IS installed in this environment, so unlike the hand-ported
CogVideoX/Wan oracles this compares against the actual library the
reference uses to encode prompts (``train/CogVideoX-I2V-5B/02_encode.py:
79-98`` via diffusers' T5EncoderModel; Wan's umT5 in
``train/Wan2.2-TI2V-5B/02_encode.py``): real relative-position bucketing,
gated-GELU, RMSNorm, and the shared-vs-per-layer bias difference between
T5 v1.1 and umT5.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from videogpa_tpu.models.t5.encoder import (  # noqa: E402
    T5Config,
    convert_t5_encoder,
    t5_encode,
)


def _tiny_hf(per_layer_bias: bool):
    cfg = T5Config.tiny(per_layer_bias)
    kwargs = dict(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        d_kv=cfg.d_kv,
        d_ff=cfg.d_ff,
        num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
        is_encoder_decoder=False,
        use_cache=False,
    )
    if per_layer_bias:
        hf_cfg = transformers.UMT5Config(**kwargs)
        model = transformers.UMT5EncoderModel(hf_cfg)
    else:
        hf_cfg = transformers.T5Config(**kwargs)
        model = transformers.T5EncoderModel(hf_cfg)
    return model.eval(), cfg


class TestT5Parity:
    @pytest.mark.parametrize("per_layer_bias", [False, True])
    def test_encoder_matches_transformers(self, per_layer_bias):
        torch.manual_seed(0)
        model, cfg = _tiny_hf(per_layer_bias)
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        params = convert_t5_encoder(sd, cfg)

        rng = np.random.default_rng(0)
        ids = rng.integers(0, cfg.vocab_size, (2, 17))
        mask = np.ones((2, 17), np.int64)
        mask[0, 12:] = 0  # padded prompt
        mask[1, 9:] = 0

        with torch.no_grad():
            want = model(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask),
            ).last_hidden_state.numpy()
        got = np.asarray(
            t5_encode(
                params,
                jnp.asarray(ids),
                jnp.asarray(mask),
                cfg,
                compute_dtype=jnp.float32,
            )
        )
        assert got.shape == want.shape
        # compare only unmasked positions (padded positions are downstream-
        # masked by every consumer; transformers still computes them)
        m = mask[..., None].astype(bool)
        np.testing.assert_allclose(
            np.where(m, got, 0.0), np.where(m, want, 0.0), atol=2e-4, rtol=1e-3
        )
