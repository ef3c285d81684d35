"""Numerical parity of the flax ColQwen2 (Qwen2-VL) against transformers."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_colpali_tpu.models.qwen2vl import ColQwen2Model, ColQwen2ModelConfig
from multimodal_colpali_tpu.models.processing_qwen2vl import ColQwen2Processor
from multimodal_colpali_tpu.models import hf_import

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_colqwen():
    from transformers import ColQwen2ForRetrieval, ColQwen2Config
    from transformers.models.qwen2_vl import Qwen2VLConfig

    cfg = ColQwen2ModelConfig.tiny(vocab_size=64)
    hf_cfg = ColQwen2Config(
        vlm_config=Qwen2VLConfig(
            vision_config=dict(
                depth=cfg.vision.depth, embed_dim=cfg.vision.embed_dim,
                hidden_size=cfg.vision.hidden_size,
                num_heads=cfg.vision.num_heads, in_chans=3,
                spatial_merge_size=cfg.vision.spatial_merge_size,
                patch_size=cfg.vision.patch_size,
                temporal_patch_size=cfg.vision.temporal_patch_size,
                mlp_ratio=cfg.vision.mlp_ratio,
            ),
            text_config=dict(
                hidden_size=cfg.text.hidden_size,
                intermediate_size=cfg.text.intermediate_size,
                num_hidden_layers=cfg.text.num_hidden_layers,
                num_attention_heads=cfg.text.num_attention_heads,
                num_key_value_heads=cfg.text.num_key_value_heads,
                vocab_size=cfg.text.vocab_size,
                rope_theta=cfg.text.rope_theta,
                rms_norm_eps=cfg.text.rms_norm_eps,
                rope_scaling={"rope_type": "default",
                              "mrope_section": list(cfg.text.mrope_section)},
            ),
            image_token_id=cfg.image_token_id,
            video_token_id=cfg.image_token_id - 3,  # distinct, unused
            vision_start_token_id=cfg.vision_start_token_id,
            vision_end_token_id=cfg.vision_end_token_id,
        ),
        embedding_dim=cfg.embedding_dim,
    )
    torch.manual_seed(0)
    hf_model = ColQwen2ForRetrieval(hf_cfg).eval()
    params = hf_import.colqwen2_params_from_hf(hf_model.state_dict(), cfg)
    return cfg, hf_model, params


def test_colqwen_text_only_parity(tiny_colqwen):
    cfg, hf_model, params = tiny_colqwen
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 60, size=(2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[1, 7:] = 0

    with torch.no_grad():
        want = hf_model(input_ids=torch.from_numpy(ids),
                        attention_mask=torch.from_numpy(mask)).embeddings.numpy()

    proc = ColQwen2Processor(cfg)
    pos = proc.mrope_position_ids(ids.astype(np.int32), mask.astype(np.int32))
    model = ColQwen2Model(cfg)
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        jnp.asarray(pos, jnp.int32),
    ))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_colqwen_image_parity(tiny_colqwen):
    cfg, hf_model, params = tiny_colqwen
    rng = np.random.default_rng(1)
    b = 2
    gh, gw = cfg.grid_h, cfg.grid_w  # 4x4 patches -> 2x2 merged tokens
    m = cfg.vision.spatial_merge_size
    n_img_tok = (gh // m) * (gw // m)

    seq = ([cfg.vision_start_token_id] + [cfg.image_token_id] * n_img_tok
           + [cfg.vision_end_token_id] + [5, 9, 11])
    ids = np.tile(np.asarray(seq, np.int64), (b, 1))
    mask = np.ones_like(ids)

    # Random preprocessed images: [H, W, 3] floats through the same
    # patch-flatten path on both sides.
    from multimodal_colpali_tpu.models.processing_qwen2vl import flatten_patches
    h_px, w_px = gh * cfg.vision.patch_size, gw * cfg.vision.patch_size
    imgs = rng.standard_normal((b, h_px, w_px, 3)).astype(np.float32)
    patches = np.stack([flatten_patches(im, cfg) for im in imgs])  # [B, P, D]

    with torch.no_grad():
        want = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            pixel_values=torch.from_numpy(patches),  # [B, P, D]; HF unpads rows
            image_grid_thw=torch.tensor([[1, gh, gw]] * b),
        ).embeddings.numpy()

    proc = ColQwen2Processor(cfg)
    pos = proc.mrope_position_ids(ids.astype(np.int32), mask.astype(np.int32))
    model = ColQwen2Model(cfg)
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        jnp.asarray(pos, jnp.int32), jnp.asarray(patches),
    ))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_processor_shapes():
    from PIL import Image

    cfg = ColQwen2ModelConfig.tiny()
    proc = ColQwen2Processor(cfg)
    rng = np.random.default_rng(0)
    imgs = [Image.fromarray(rng.integers(0, 255, (80, 60, 3), dtype=np.uint8))
            for _ in range(2)]
    batch = proc.process_images(imgs)
    assert batch["pixel_values"].shape == (2, cfg.grid_h * cfg.grid_w,
                                           cfg.vision.patch_dim)
    assert batch["position_ids"].shape == (3,) + batch["input_ids"].shape
    qb = proc.process_queries(["what is this?"])
    assert qb["input_ids"].shape[1] % 16 == 0


@pytest.fixture(scope="module")
def tiny_colqwen25():
    from transformers import Qwen2_5_VLModel, Qwen2_5_VLConfig

    cfg = ColQwen2ModelConfig.tiny_25(vocab_size=64)
    hf_cfg = Qwen2_5_VLConfig(
        vision_config=dict(
            depth=cfg.vision.depth, hidden_size=cfg.vision.embed_dim,
            out_hidden_size=cfg.vision.hidden_size,
            num_heads=cfg.vision.num_heads,
            intermediate_size=cfg.vision.intermediate_size,
            patch_size=cfg.vision.patch_size,
            temporal_patch_size=cfg.vision.temporal_patch_size,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            window_size=cfg.vision.window_size,
            fullatt_block_indexes=list(cfg.vision.fullatt_block_indexes),
        ),
        text_config=dict(
            hidden_size=cfg.text.hidden_size,
            intermediate_size=cfg.text.intermediate_size,
            num_hidden_layers=cfg.text.num_hidden_layers,
            num_attention_heads=cfg.text.num_attention_heads,
            num_key_value_heads=cfg.text.num_key_value_heads,
            vocab_size=cfg.text.vocab_size,
            rope_theta=cfg.text.rope_theta,
            rms_norm_eps=cfg.text.rms_norm_eps,
            rope_scaling={"rope_type": "default",
                          "mrope_section": list(cfg.text.mrope_section)},
        ),
        image_token_id=cfg.image_token_id,
        video_token_id=cfg.image_token_id - 3,
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
    )
    torch.manual_seed(0)
    hf_model = Qwen2_5_VLModel(hf_cfg).eval()
    # ColQwen2.5 = backbone + linear projection + L2 norm; inject a random
    # projection on both sides since the HF class doesn't exist here.
    torch.manual_seed(1)
    proj = torch.nn.Linear(cfg.text.hidden_size, cfg.embedding_dim)
    sd = dict(hf_model.state_dict())
    sd["embedding_proj_layer.weight"] = proj.weight
    sd["embedding_proj_layer.bias"] = proj.bias
    params = hf_import.colqwen2_params_from_hf(sd, cfg)
    return cfg, hf_model, proj, params


def test_colqwen25_image_parity(tiny_colqwen25):
    cfg, hf_model, proj, params = tiny_colqwen25
    rng = np.random.default_rng(3)
    b = 2
    gh, gw = cfg.grid_h, cfg.grid_w  # 8x8 patches -> 4x4 merged (2x2 windows)
    m = cfg.vision.spatial_merge_size
    n_img_tok = (gh // m) * (gw // m)

    seq = ([cfg.vision_start_token_id] + [cfg.image_token_id] * n_img_tok
           + [cfg.vision_end_token_id] + [5, 9, 11, 7])
    ids = np.tile(np.asarray(seq, np.int64), (b, 1))
    mask = np.ones_like(ids)
    mask[1, -2:] = 0  # right padding on row 1

    from multimodal_colpali_tpu.models.processing_qwen2vl import flatten_patches
    h_px, w_px = gh * cfg.vision.patch_size, gw * cfg.vision.patch_size
    imgs = rng.standard_normal((b, h_px, w_px, 3)).astype(np.float32)
    patches = np.stack([flatten_patches(im, cfg) for im in imgs])

    with torch.no_grad():
        hidden = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            pixel_values=torch.from_numpy(patches.reshape(-1, patches.shape[-1])),
            image_grid_thw=torch.tensor([[1, gh, gw]] * b),
        ).last_hidden_state
        want = proj(hidden)
        want = want / want.norm(dim=-1, keepdim=True)
        want = (want * torch.from_numpy(mask)[..., None]).numpy()

    from multimodal_colpali_tpu.models.processing_qwen2vl import ColQwen2Processor
    proc = ColQwen2Processor(cfg)
    pos = proc.mrope_position_ids(ids.astype(np.int32), mask.astype(np.int32))
    model = ColQwen2Model(cfg)
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        jnp.asarray(pos, jnp.int32), jnp.asarray(patches),
    ))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_colqwen25_window_fold_equals_mask(tiny_colqwen25):
    """The folded (windows-into-batch) attention fast path must compute the
    same function as the block-diagonal-mask formulation it replaces."""
    from multimodal_colpali_tpu.models import qwen2vl as Q

    cfg, _, _, params = tiny_colqwen25
    rng = np.random.default_rng(11)
    gh, gw = cfg.grid_h, cfg.grid_w
    m = cfg.vision.spatial_merge_size
    n_img_tok = (gh // m) * (gw // m)
    seq = ([cfg.vision_start_token_id] + [cfg.image_token_id] * n_img_tok
           + [cfg.vision_end_token_id] + [5, 9])
    ids = np.asarray([seq], np.int32)
    mask = np.ones_like(ids)

    from multimodal_colpali_tpu.models.processing_qwen2vl import (
        ColQwen2Processor, flatten_patches)
    h_px, w_px = gh * cfg.vision.patch_size, gw * cfg.vision.patch_size
    img = rng.standard_normal((h_px, w_px, 3)).astype(np.float32)
    patches = flatten_patches(img, cfg)[None]
    proc = ColQwen2Processor(cfg)
    pos = proc.mrope_position_ids(ids, mask)
    model = ColQwen2Model(cfg)
    args = ({"params": params}, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(pos), jnp.asarray(patches))

    fast = np.asarray(model.apply(*args))
    assert not Q._FORCE_WINDOW_MASK
    Q._FORCE_WINDOW_MASK = True
    try:
        slow = np.asarray(model.apply(*args))
    finally:
        Q._FORCE_WINDOW_MASK = False
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)


def test_colqwen25_padded_fold_equals_mask(tiny_colqwen25):
    """Ragged grids fold via per-window padding + kv_lens; that path must
    compute the same function as the block-diagonal-mask formulation."""
    from multimodal_colpali_tpu.models import qwen2vl as Q

    cfg, _, _, params = tiny_colqwen25
    rng = np.random.default_rng(17)
    gh, gw = 10, 8  # llm grid 5x4, vmws 2 -> ragged bottom window row
    counts = np.bincount(Q.window_partition(cfg.vision, gh, gw)[1])
    assert counts.min() != counts.max(), "grid must be ragged for this test"
    m = cfg.vision.spatial_merge_size
    n_img_tok = (gh // m) * (gw // m)
    seq = ([cfg.vision_start_token_id] + [cfg.image_token_id] * n_img_tok
           + [cfg.vision_end_token_id] + [5, 9])
    ids = np.asarray([seq], np.int32)
    mask = np.ones_like(ids)

    from multimodal_colpali_tpu.models.processing_qwen2vl import (
        ColQwen2Processor, flatten_patches)
    h_px, w_px = gh * cfg.vision.patch_size, gw * cfg.vision.patch_size
    img = rng.standard_normal((h_px, w_px, 3)).astype(np.float32)
    patches = flatten_patches(img, cfg, (gh, gw))[None]
    proc = ColQwen2Processor(cfg, dynamic_resolution=True)
    pos = proc.mrope_position_ids(ids, mask, grid=(gh, gw))
    model = ColQwen2Model(cfg)
    args = ({"params": params}, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(pos), jnp.asarray(patches))

    fast = np.asarray(model.apply(*args, grid=(gh, gw)))
    assert not Q._FORCE_WINDOW_MASK
    Q._FORCE_WINDOW_MASK = True
    try:
        slow = np.asarray(model.apply(*args, grid=(gh, gw)))
    finally:
        Q._FORCE_WINDOW_MASK = False
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)


def test_colqwen25_ragged_window_parity(tiny_colqwen25):
    """A grid whose unit dims don't divide the window size produces ragged
    edge windows; that layout takes the padded window fold (per-window
    suffix kv_lens + kv_valid full-attention blocks) and must still match
    torch."""
    from multimodal_colpali_tpu.models import qwen2vl as Q

    cfg, hf_model, proj, params = tiny_colqwen25
    rng = np.random.default_rng(13)
    gh, gw = 10, 8  # llm grid 5x4, vmws 2 -> ragged bottom window row
    m = cfg.vision.spatial_merge_size
    _, unit_wid = Q.window_partition(cfg.vision, gh, gw)
    counts = np.bincount(unit_wid)
    assert counts.min() != counts.max(), "grid must be ragged for this test"
    n_img_tok = (gh // m) * (gw // m)

    from multimodal_colpali_tpu.models.processing_qwen2vl import (
        ColQwen2Processor, flatten_patches)
    h_px, w_px = gh * cfg.vision.patch_size, gw * cfg.vision.patch_size
    img = rng.standard_normal((h_px, w_px, 3)).astype(np.float32)
    patches = flatten_patches(img, cfg, (gh, gw))[None]

    seq = ([cfg.vision_start_token_id] + [cfg.image_token_id] * n_img_tok
           + [cfg.vision_end_token_id] + [5, 9])
    ids = np.asarray([seq], np.int64)
    mask = np.ones_like(ids)

    with torch.no_grad():
        hidden = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            pixel_values=torch.from_numpy(
                patches.reshape(-1, patches.shape[-1])),
            image_grid_thw=torch.tensor([[1, gh, gw]]),
        ).last_hidden_state
        want = proj(hidden)
        want = want / want.norm(dim=-1, keepdim=True)
        want = want.numpy()

    proc = ColQwen2Processor(cfg, dynamic_resolution=True)
    pos = proc.mrope_position_ids(ids.astype(np.int32),
                                  mask.astype(np.int32), grid=(gh, gw))
    model = ColQwen2Model(cfg)
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), jnp.asarray(pos, jnp.int32),
        jnp.asarray(patches), grid=(gh, gw),
    ))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_colqwen_dynamic_grid_parity(tiny_colqwen):
    """A non-default (rectangular) grid through the dynamic-resolution path
    must match torch with the matching image_grid_thw."""
    cfg, hf_model, params = tiny_colqwen
    rng = np.random.default_rng(5)
    gh, gw = 4, 8  # wider-than-tall page at the tiny scale
    m = cfg.vision.spatial_merge_size
    n_img_tok = (gh // m) * (gw // m)

    from multimodal_colpali_tpu.models.processing_qwen2vl import flatten_patches
    h_px, w_px = gh * cfg.vision.patch_size, gw * cfg.vision.patch_size
    img = rng.standard_normal((h_px, w_px, 3)).astype(np.float32)
    patches = flatten_patches(img, cfg, (gh, gw))[None]  # [1, P, D]

    seq = ([cfg.vision_start_token_id] + [cfg.image_token_id] * n_img_tok
           + [cfg.vision_end_token_id] + [5, 9])
    ids = np.asarray([seq], np.int64)
    mask = np.ones_like(ids)

    with torch.no_grad():
        want = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            pixel_values=torch.from_numpy(patches),
            image_grid_thw=torch.tensor([[1, gh, gw]]),
        ).embeddings.numpy()

    proc = ColQwen2Processor(cfg, dynamic_resolution=True)
    pos = proc.mrope_position_ids(ids.astype(np.int32), mask.astype(np.int32),
                                  grid=(gh, gw))
    model = ColQwen2Model(cfg)
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), jnp.asarray(pos, jnp.int32),
        jnp.asarray(patches), grid=(gh, gw),
    ))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_smart_grid_matches_hf_smart_resize():
    """Our smart_grid must pick the same buckets transformers' smart_resize
    picks (same factor/min/max semantics)."""
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import smart_resize
    from multimodal_colpali_tpu.models.processing_qwen2vl import smart_grid

    factor, min_px, max_px = 28, 4 * 28 * 28, 64 * 28 * 28
    rng = np.random.default_rng(0)
    for _ in range(40):
        h = int(rng.integers(30, 2000))
        w = int(rng.integers(30, 2000))
        want = smart_resize(h, w, factor=factor, min_pixels=min_px,
                            max_pixels=max_px)
        got = smart_grid(h, w, factor, min_px, max_px)
        assert got == tuple(want), (h, w, got, want)


def test_dynamic_resolution_embedding_groups():
    """End-to-end dynamic path: embed_images groups by grid, keeps input
    order, and emits grid-dependent token counts."""
    import warnings
    from PIL import Image
    from multimodal_colpali_tpu.models.registry import load_retriever
    from multimodal_colpali_tpu.models.processing_qwen2vl import ColQwen2Processor

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = load_retriever("tiny-colqwen2", seed=0)
    cfg = r.processor.cfg
    r.processor = ColQwen2Processor(
        cfg, dynamic_resolution=True,
        max_pixels=cfg.grid_h * cfg.grid_w * cfg.vision.patch_size ** 2)
    rng = np.random.default_rng(0)
    mk = lambda h, w: Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))
    # tall, wide, tall: groups must reassemble in original order
    imgs = [mk(112, 56), mk(56, 112), mk(112, 56)]
    grids = [r.processor.smart_grid(im) for im in imgs]
    assert grids[0] == grids[2] != grids[1]
    embs = r.embed_images(imgs, batch_size=2)
    assert len(embs) == 3
    m = cfg.vision.spatial_merge_size
    for e, (gh, gw) in zip(embs, grids):
        n_img_tok = (gh // m) * (gw // m)
        assert e.shape[0] > n_img_tok  # image block + prompt tokens
        assert e.shape[1] == cfg.embedding_dim
    # same-grid images 0 and 2 differ in content, not shape
    assert embs[0].shape == embs[2].shape
    assert not np.allclose(embs[0], embs[2])
