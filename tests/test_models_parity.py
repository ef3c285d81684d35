"""Numerical parity of the flax encoders against torch/transformers.

Tiny random-weight configs: instantiate the HF torch model, port its weights
with hf_import, run both forwards on the same inputs, compare. This pins the
whole architecture (patchify, attention masking, RoPE, RMSNorm, scaling,
projection, normalization) without needing checkpoint downloads.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.models.configs import BertConfig, ColPaliModelConfig
from multimodal_colpali_tpu.models.colpali import ColPaliModel
from multimodal_colpali_tpu.models.bert import BertEncoder
from multimodal_colpali_tpu.models import hf_import

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_colpali():
    from transformers import ColPaliForRetrieval, ColPaliConfig
    from transformers.models.paligemma import PaliGemmaConfig

    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    hf_cfg = ColPaliConfig(
        vlm_config=PaliGemmaConfig(
            vision_config=dict(
                hidden_size=cfg.vision.hidden_size,
                intermediate_size=cfg.vision.intermediate_size,
                num_hidden_layers=cfg.vision.num_hidden_layers,
                num_attention_heads=cfg.vision.num_attention_heads,
                image_size=cfg.vision.image_size,
                patch_size=cfg.vision.patch_size,
            ),
            text_config=dict(
                hidden_size=cfg.text.hidden_size,
                intermediate_size=cfg.text.intermediate_size,
                num_hidden_layers=cfg.text.num_hidden_layers,
                num_attention_heads=cfg.text.num_attention_heads,
                num_key_value_heads=cfg.text.num_key_value_heads,
                head_dim=cfg.text.head_dim,
                vocab_size=cfg.text.vocab_size,
            ),
            projection_dim=cfg.text.hidden_size,  # projector out == text hidden
            image_token_index=cfg.image_token_id,
        ),
        embedding_dim=cfg.embedding_dim,
    )
    torch.manual_seed(0)
    hf_model = ColPaliForRetrieval(hf_cfg).eval()
    params = hf_import.colpali_params_from_hf(hf_model.state_dict(), cfg)
    return cfg, hf_model, params


def test_colpali_text_only_parity(tiny_colpali):
    cfg, hf_model, params = tiny_colpali
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 60, size=(2, 7)).astype(np.int64)
    mask = np.ones((2, 7), np.int64)
    mask[1, 5:] = 0  # right padding on row 1

    with torch.no_grad():
        want = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).embeddings.numpy()

    model = ColPaliModel(cfg)
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_colpali_image_parity(tiny_colpali):
    cfg, hf_model, params = tiny_colpali
    rng = np.random.default_rng(1)
    n_patch = cfg.vision.num_patches  # 4 for 28px/14px
    b = 2
    # PaliGemma-style prompt: [image]*n_patches + bos + text
    ids = np.full((b, n_patch + 3), cfg.image_token_id, np.int64)
    ids[:, n_patch:] = rng.integers(0, 60, size=(b, 3))
    mask = np.ones_like(ids)
    pix = rng.standard_normal(
        (b, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)

    with torch.no_grad():
        want = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            pixel_values=torch.from_numpy(pix),
        ).embeddings.numpy()

    model = ColPaliModel(cfg)
    got = np.asarray(model.apply(
        {"params": params},
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
        jnp.asarray(pix.transpose(0, 2, 3, 1)),  # NCHW -> NHWC
    ))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_bert_parity():
    from transformers import BertModel, BertConfig as HFBertConfig

    cfg = BertConfig.tiny()
    hf_cfg = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
    )
    torch.manual_seed(0)
    hf_model = BertModel(hf_cfg).eval()

    rng = np.random.default_rng(2)
    ids = rng.integers(0, 90, size=(2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[0, 7:] = 0

    with torch.no_grad():
        out = hf_model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state[:, 0].numpy()
    want = out / np.linalg.norm(out, axis=-1, keepdims=True)  # bge CLS + L2

    params = hf_import.bert_params_from_hf(hf_model.state_dict(), cfg)
    model = BertEncoder(cfg)
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
