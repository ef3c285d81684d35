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


def test_colgranite_anyres_multitile_parity(tiny_colgranite):
    """anyres 1x2 tiling (base + two tiles, newline per spatial row) must
    match HF LLaVA-Next pack_image_features. The image size equals the
    selected pinpoint exactly, so HF's unpad crop is a no-op (the case our
    static-shape packing reproduces bit-for-bit)."""
    import copy

    from transformers import LlavaNextModel

    cfg, hf_model, proj, params = tiny_colgranite
    s = cfg.vision.image_size
    g = cfg.grid
    ty, tx = 1, 2

    hf_cfg2 = copy.deepcopy(hf_model.config)
    hf_cfg2.image_grid_pinpoints = [[s, s], [s, 2 * s]]
    hf2 = LlavaNextModel(hf_cfg2).eval()
    hf2.load_state_dict(hf_model.state_dict())

    rng = np.random.default_rng(4)
    n_img = cfg.n_image_tokens_for((ty, tx))  # g^2 + ty*g*(tx*g+1)
    assert n_img == g * g + ty * g * (tx * g + 1)
    seq = [cfg.image_token_id] * n_img + [5, 9]
    ids = np.asarray([seq], np.int64)
    mask = np.ones_like(ids)
    # base + 2 tiles, each a base-size image
    tiles = rng.standard_normal((1, 1 + ty * tx, 3, s, s)).astype(np.float32)
    want = _ref(hf_model=hf2, proj=proj, ids=ids, mask=mask, pix=tiles,
                image_sizes=[[s, 2 * s]])
    got = np.asarray(ColGraniteModel(cfg).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
        jnp.asarray(tiles.transpose(0, 1, 3, 4, 2)), tiles=(ty, tx)))
    np.testing.assert_allclose(got, want, rtol=6e-4, atol=6e-5)


def test_granite_anyres_processor_and_grouped_embedding():
    """End-to-end anyres path: tiling selection, grouped embedding, token
    counts per tiling, order preservation."""
    import warnings

    from PIL import Image

    from multimodal_colpali_tpu.models.processing_granite import (
        ColGraniteProcessor, select_best_resolution)
    from multimodal_colpali_tpu.models.registry import load_retriever

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = load_retriever("tiny-colgranite", seed=0)
    cfg = r.processor.cfg
    r.processor = ColGraniteProcessor(cfg, anyres=True)

    s = cfg.vision.image_size
    assert select_best_resolution(s, 2 * s, r.processor.pinpoints) == (s, 2 * s)
    rng = np.random.default_rng(0)
    mk = lambda h, w: Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))
    imgs = [mk(s, 2 * s), mk(2 * s, s), mk(s, 2 * s)]  # wide, tall, wide
    tilings = [r.processor.tiling_for(im) for im in imgs]
    # exact-canvas aspects need no unpad crop (dy = dx = 0)
    assert tilings[0] == (1, 2, 0, 0) and tilings[1] == (2, 1, 0, 0)

    embs = r.embed_images(imgs, batch_size=2)
    assert len(embs) == 3
    for e, t in zip(embs, tilings):
        assert e.shape[0] > cfg.n_image_tokens_for(t)
    assert embs[0].shape == embs[2].shape
    assert not np.allclose(embs[0], embs[2])
