"""Numerical parity of the flax ColIdefics3 (SmolVLM) against transformers."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_colpali_tpu.models.idefics3 import ColIdefics3Model, ColIdefics3ModelConfig
from multimodal_colpali_tpu.models import hf_import

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_colidefics():
    from transformers import Idefics3Model, Idefics3Config

    cfg = ColIdefics3ModelConfig.tiny(vocab_size=64)
    hf_cfg = Idefics3Config(
        vision_config=dict(
            hidden_size=cfg.vision.hidden_size,
            intermediate_size=cfg.vision.intermediate_size,
            num_hidden_layers=cfg.vision.num_hidden_layers,
            num_attention_heads=cfg.vision.num_attention_heads,
            image_size=cfg.vision.image_size, patch_size=cfg.vision.patch_size,
        ),
        text_config=dict(
            hidden_size=cfg.text.hidden_size,
            intermediate_size=cfg.text.intermediate_size,
            num_hidden_layers=cfg.text.num_hidden_layers,
            num_attention_heads=cfg.text.num_attention_heads,
            num_key_value_heads=cfg.text.num_key_value_heads,
            vocab_size=cfg.text.vocab_size, rope_theta=cfg.text.rope_theta,
            rms_norm_eps=cfg.text.rms_norm_eps, max_position_embeddings=256,
        ),
        scale_factor=cfg.scale_factor,
        image_token_id=cfg.image_token_id,
    )
    torch.manual_seed(0)
    hf_model = Idefics3Model(hf_cfg).eval()
    torch.manual_seed(1)
    proj = torch.nn.Linear(cfg.text.hidden_size, cfg.embedding_dim)
    sd = dict(hf_model.state_dict())
    sd["embedding_proj_layer.weight"] = proj.weight
    sd["embedding_proj_layer.bias"] = proj.bias
    params = hf_import.colidefics3_params_from_hf(sd, cfg)
    return cfg, hf_model, proj, params


def _ref(hf_model, proj, ids, mask, pix=None):
    with torch.no_grad():
        kwargs = {}
        if pix is not None:
            kwargs["pixel_values"] = torch.from_numpy(pix)
        hidden = hf_model(input_ids=torch.from_numpy(ids),
                          attention_mask=torch.from_numpy(mask),
                          **kwargs).last_hidden_state
        want = proj(hidden)
        want = want / want.norm(dim=-1, keepdim=True)
        return (want * torch.from_numpy(mask)[..., None]).numpy()


def test_colidefics_text_only_parity(tiny_colidefics):
    cfg, hf_model, proj, params = tiny_colidefics
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 60, size=(2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    want = _ref(hf_model, proj, ids, mask)
    got = np.asarray(ColIdefics3Model(cfg).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_colidefics_image_parity(tiny_colidefics):
    cfg, hf_model, proj, params = tiny_colidefics
    rng = np.random.default_rng(1)
    b = 2
    n_img = cfg.n_image_tokens  # 16 patches / scale^2(=4) = 4
    seq = [cfg.image_token_id] * n_img + [5, 9, 11]
    ids = np.tile(np.asarray(seq, np.int64), (b, 1))
    mask = np.ones_like(ids)
    pix = rng.standard_normal(
        (b, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    # Idefics3 expects pixel_values [B, n_images, C, H, W]
    want = _ref(hf_model, proj, ids, mask, pix[:, None])
    got = np.asarray(ColIdefics3Model(cfg).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        jnp.asarray(pix.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)
