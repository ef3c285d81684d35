"""Numerical parity of the flax ColGranite (LLaVA-Next + Granite) vs torch."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_colpali_tpu.models.granite import ColGraniteModel, ColGraniteModelConfig
from multimodal_colpali_tpu.models import hf_import

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_colgranite():
    from transformers import LlavaNextModel, LlavaNextConfig

    cfg = ColGraniteModelConfig.tiny(vocab_size=64)
    hf_cfg = LlavaNextConfig(
        vision_config=dict(
            model_type="siglip_vision_model",
            hidden_size=cfg.vision.hidden_size,
            intermediate_size=cfg.vision.intermediate_size,
            num_hidden_layers=cfg.vision.num_hidden_layers,
            num_attention_heads=cfg.vision.num_attention_heads,
            image_size=cfg.vision.image_size, patch_size=cfg.vision.patch_size,
        ),
        text_config=dict(
            model_type="granite",
            hidden_size=cfg.text.hidden_size,
            intermediate_size=cfg.text.intermediate_size,
            num_hidden_layers=cfg.text.num_hidden_layers,
            num_attention_heads=cfg.text.num_attention_heads,
            num_key_value_heads=cfg.text.num_key_value_heads,
            vocab_size=cfg.text.vocab_size, rope_theta=cfg.text.rope_theta,
            rms_norm_eps=cfg.text.rms_norm_eps,
            embedding_multiplier=cfg.text.embedding_multiplier,
            attention_multiplier=cfg.text.attention_multiplier,
            residual_multiplier=cfg.text.residual_multiplier,
            logits_scaling=1.0, max_position_embeddings=256,
        ),
        image_grid_pinpoints=[[cfg.vision.image_size, cfg.vision.image_size]],
        vision_feature_select_strategy="full",
        vision_feature_layer=cfg.vision_feature_layer,
        image_token_index=cfg.image_token_id,
    )
    torch.manual_seed(0)
    hf_model = LlavaNextModel(hf_cfg).eval()
    torch.manual_seed(1)
    proj = torch.nn.Linear(cfg.text.hidden_size, cfg.embedding_dim)
    sd = dict(hf_model.state_dict())
    sd["embedding_proj_layer.weight"] = proj.weight
    sd["embedding_proj_layer.bias"] = proj.bias
    params = hf_import.colgranite_params_from_hf(sd, cfg)
    return cfg, hf_model, proj, params


def _ref(hf_model, proj, ids, mask, pix=None, image_sizes=None):
    with torch.no_grad():
        kwargs = {}
        if pix is not None:
            kwargs["pixel_values"] = torch.from_numpy(pix)
            kwargs["image_sizes"] = torch.tensor(image_sizes)
        hidden = hf_model(input_ids=torch.from_numpy(ids),
                          attention_mask=torch.from_numpy(mask),
                          **kwargs).last_hidden_state
        want = proj(hidden)
        want = want / want.norm(dim=-1, keepdim=True)
        return (want * torch.from_numpy(mask)[..., None]).numpy()


def test_colgranite_text_only_parity(tiny_colgranite):
    cfg, hf_model, proj, params = tiny_colgranite
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 60, size=(2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    want = _ref(hf_model, proj, ids, mask)
    got = np.asarray(ColGraniteModel(cfg).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_colgranite_image_parity(tiny_colgranite):
    cfg, hf_model, proj, params = tiny_colgranite
    rng = np.random.default_rng(1)
    b = 2
    n_img = cfg.n_image_tokens  # g=4: 16 + 4*5 = 36
    assert n_img == 36
    seq = [cfg.image_token_id] * n_img + [5, 9, 11]
    ids = np.tile(np.asarray(seq, np.int64), (b, 1))
    mask = np.ones_like(ids)
    size = cfg.vision.image_size
    pix = rng.standard_normal((b, 3, size, size)).astype(np.float32)
    # LLaVA-Next anyres input: [B, num_tiles+1, C, H, W]; tile == base here.
    pix5 = np.stack([pix, pix], axis=1)
    want = _ref(hf_model, proj, ids, mask, pix5, [[size, size]] * b)
    got = np.asarray(ColGraniteModel(cfg).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        jnp.asarray(pix.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=6e-4, atol=6e-5)
