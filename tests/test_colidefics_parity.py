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


def test_colidefics_multitile_parity(tiny_colidefics):
    """Tiled sub-images (2 tiles + global last, text markers between
    image-token runs) must match HF Idefics3 with pixel_values
    [B, n_images, C, H, W] in the same sub-image order."""
    cfg, hf_model, proj, params = tiny_colidefics
    rng = np.random.default_rng(3)
    n_tok = cfg.n_image_tokens
    img = cfg.image_token_id
    # 1x2 tiling: [marker, tiles..., markers, global, text] - markers are
    # ordinary text ids; only the image-token RUNS drive feature scatter.
    seq = ([7] + [img] * n_tok + [8] + [img] * n_tok
           + [9, 9] + [img] * n_tok + [5, 11])
    ids = np.asarray([seq], np.int64)
    mask = np.ones_like(ids)
    s = cfg.vision.image_size
    subs = rng.standard_normal((1, 3, 3, s, s)).astype(np.float32)

    want = _ref(hf_model, proj, ids, mask, subs)
    got = np.asarray(ColIdefics3Model(cfg).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
        jnp.asarray(subs.transpose(0, 1, 3, 4, 2)), tiles=(1, 2)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_idefics_splitting_processor_and_grouped_embedding():
    """End-to-end split path: tiling selection, structured prompt, grouped
    embedding with order preservation."""
    import warnings

    from PIL import Image

    from multimodal_colpali_tpu.models.processing_idefics3 import ColIdefics3Processor
    from multimodal_colpali_tpu.models.registry import load_retriever

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = load_retriever("tiny-colidefics3", seed=0)
    cfg = r.processor.cfg
    s = cfg.vision.image_size
    r.processor = ColIdefics3Processor(cfg, image_splitting=True,
                                       longest_edge=2 * s)
    rng = np.random.default_rng(0)
    mk = lambda h, w: Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))
    imgs = [mk(2 * s, s), mk(s, 2 * s), mk(2 * s, s)]
    tilings = [r.processor.tiling_for(im) for im in imgs]
    assert tilings[0] == (2, 1) and tilings[1] == (1, 2)

    batch = r.processor.process_images([imgs[0]], grid=(2, 1))
    assert batch["pixel_values"].shape == (1, 3, s, s, 3)  # 2 tiles + global
    n_img_tokens = int((batch["input_ids"] == cfg.image_token_id).sum())
    assert n_img_tokens == 3 * cfg.n_image_tokens

    embs = r.embed_images(imgs, batch_size=2)
    assert len(embs) == 3
    assert embs[0].shape == embs[2].shape
    assert not np.allclose(embs[0], embs[2])
    for e in embs:
        assert e.shape[0] > 3 * cfg.n_image_tokens
