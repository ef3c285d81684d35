"""Numerical parity of the flax ColFlor (Florence-2) against transformers."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_colpali_tpu.models.florence2 import ColFlorModel, ColFlorModelConfig
from multimodal_colpali_tpu.models import hf_import

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_colflor():
    from transformers import Florence2Model, Florence2Config

    cfg = ColFlorModelConfig.tiny(vocab_size=64)
    v = cfg.vision
    hf_cfg = Florence2Config(
        vision_config=dict(
            depths=list(v.depths), embed_dim=list(v.embed_dim),
            num_heads=list(v.num_heads), num_groups=list(v.num_groups),
            patch_size=list(v.patch_size), patch_stride=list(v.patch_stride),
            patch_padding=list(v.patch_padding),
            patch_prenorm=list(v.patch_prenorm), window_size=v.window_size,
            drop_path_rate=0.0, projection_dim=v.projection_dim,
            image_size=[cfg.image_size, cfg.image_size],
            max_position_embeddings=v.max_position_embeddings,
        ),
        text_config=dict(
            d_model=cfg.text.d_model, encoder_layers=cfg.text.encoder_layers,
            decoder_layers=1,
            encoder_attention_heads=cfg.text.encoder_attention_heads,
            decoder_attention_heads=2, encoder_ffn_dim=cfg.text.encoder_ffn_dim,
            decoder_ffn_dim=48, vocab_size=cfg.text.vocab_size,
            max_position_embeddings=cfg.text.max_position_embeddings,
            scale_embedding=cfg.text.scale_embedding, activation_function="gelu",
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        ),
        image_token_id=cfg.image_token_id,
    )
    torch.manual_seed(0)
    hf_model = Florence2Model(hf_cfg).eval()
    torch.manual_seed(1)
    proj = torch.nn.Linear(cfg.text.d_model, cfg.embedding_dim)
    sd = dict(hf_model.state_dict())
    sd["embedding_proj_layer.weight"] = proj.weight
    sd["embedding_proj_layer.bias"] = proj.bias
    params = hf_import.colflor_params_from_hf(sd, cfg)
    return cfg, hf_model, proj, params


def _ref_embeddings(hf_model, proj, ids, mask, pix=None):
    with torch.no_grad():
        kwargs = {}
        if pix is not None:
            kwargs["pixel_values"] = torch.from_numpy(pix)
        out = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            decoder_input_ids=torch.zeros((ids.shape[0], 1), dtype=torch.long),
            **kwargs,
        ).encoder_last_hidden_state
        want = proj(out)
        want = want / want.norm(dim=-1, keepdim=True)
        return (want * torch.from_numpy(mask)[..., None]).numpy()


def test_colflor_text_only_parity(tiny_colflor):
    cfg, hf_model, proj, params = tiny_colflor
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 60, size=(2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    want = _ref_embeddings(hf_model, proj, ids, mask)
    got = np.asarray(ColFlorModel(cfg).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_colflor_image_parity(tiny_colflor):
    cfg, hf_model, proj, params = tiny_colflor
    rng = np.random.default_rng(1)
    b = 2
    # 32px -> stage0 8x8 -> stage1 4x4 = 16 patch tokens + 1 pooled = 17
    n_img_tok = 17
    seq = [cfg.image_token_id] * n_img_tok + [5, 9, 11]
    ids = np.tile(np.asarray(seq, np.int64), (b, 1))
    mask = np.ones_like(ids)
    pix = rng.standard_normal((b, 3, cfg.image_size, cfg.image_size)).astype(np.float32)

    want = _ref_embeddings(hf_model, proj, ids, mask, pix)
    got = np.asarray(ColFlorModel(cfg).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        jnp.asarray(pix.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=6e-4, atol=6e-5)
