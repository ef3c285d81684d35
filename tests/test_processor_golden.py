"""Golden preprocessing parity: our processors vs the HF image processors.

The BASELINE bit-match goal (top-5 rankings vs the reference) starts at
pixels: the reference feeds colpali-engine/transformers processors
(05_experiment02.py:210-214), so each family's image pipeline here is
pinned against the corresponding transformers image processor, constructed
offline with the documented constants (no checkpoint downloads). Plus a
full-stack ranking golden: top-5 page ids through processor -> encoder ->
MaxSim must bit-match the torch path end to end.

Coverage notes (honest gaps, by design of the simplified pipelines):
- ColQwen2: ours uses a static resolution bucket (grid 54x54); parity is
  asserted at that bucket, where HF smart_resize is the identity.
- ColIdefics3: the non-split path asserts the rescale+normalize math on
  pre-sized inputs; the SPLIT path (round 3) bit-matches HF's full resize
  chain including resampling (test_colidefics3_split_pixels_bitmatch_hf
  here and the end-to-end score pin in test_static_shape_deviation.py).
- Granite: anyres multi-tile parity lives in test_colgranite_parity.py;
  the unpad-skip deviation is quantified in
  test_static_shape_deviation.py (1.4% mean score delta).
"""

import numpy as np
import pytest
from PIL import Image

pytest.importorskip("torch")
pytest.importorskip("transformers")


def _imgs(sizes, seed=0):
    rng = np.random.default_rng(seed)
    return [Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))
            for h, w in sizes]


def test_colpali_pixels_bitmatch_hf_siglip():
    from transformers.models.siglip import SiglipImageProcessor

    from multimodal_colpali_tpu.models.processing import ImagePreprocessor

    imgs = _imgs([(600, 480), (300, 900), (448, 448)])
    ours = ImagePreprocessor(image_size=448)(imgs)
    hf = SiglipImageProcessor(size={"height": 448, "width": 448},
                              image_mean=[0.5] * 3, image_std=[0.5] * 3,
                              resample=Image.BICUBIC)
    want = np.transpose(hf(imgs, return_tensors="np")["pixel_values"],
                        (0, 2, 3, 1))
    np.testing.assert_array_equal(ours, want)


def test_colflor_pixels_bitmatch_hf_clip():
    from transformers.models.clip import CLIPImageProcessor

    from multimodal_colpali_tpu.models.florence2 import ColFlorModelConfig
    from multimodal_colpali_tpu.models.processing_florence2 import (
        IMAGENET_MEAN, IMAGENET_STD, ColFlorProcessor)

    cfg = ColFlorModelConfig.colflor()
    proc = ColFlorProcessor(cfg)
    imgs = _imgs([(500, 700), (768, 768)], seed=1)
    ours = np.stack([proc.preprocess_image(im) for im in imgs])
    hf = CLIPImageProcessor(
        size={"height": cfg.image_size, "width": cfg.image_size},
        do_center_crop=False, resample=Image.BICUBIC,
        image_mean=IMAGENET_MEAN.tolist(), image_std=IMAGENET_STD.tolist())
    want = np.transpose(hf(imgs, return_tensors="np")["pixel_values"],
                        (0, 2, 3, 1))
    np.testing.assert_allclose(ours, want, rtol=0, atol=1e-6)


def test_colqwen2_patches_bitmatch_hf_at_native_bucket():
    from transformers.models.qwen2_vl import Qwen2VLImageProcessor

    from multimodal_colpali_tpu.models.qwen2vl import ColQwen2ModelConfig
    from multimodal_colpali_tpu.models.processing_qwen2vl import (
        CLIP_MEAN, CLIP_STD, ColQwen2Processor)

    cfg = ColQwen2ModelConfig.colqwen2_v1()
    proc = ColQwen2Processor(cfg)
    h_px = cfg.grid_h * cfg.vision.patch_size
    w_px = cfg.grid_w * cfg.vision.patch_size
    img = _imgs([(h_px, w_px)], seed=2)[0]  # at-bucket: smart_resize = id

    ours = proc.preprocess_image(img)       # [gh*gw, 3*t*ps*ps]
    hf = Qwen2VLImageProcessor(
        min_pixels=h_px * w_px, max_pixels=h_px * w_px,
        patch_size=cfg.vision.patch_size,
        temporal_patch_size=cfg.vision.temporal_patch_size,
        merge_size=cfg.vision.spatial_merge_size,
        image_mean=CLIP_MEAN.tolist(), image_std=CLIP_STD.tolist())
    out = hf(img, return_tensors="np")
    assert out["image_grid_thw"].tolist() == [[1, cfg.grid_h, cfg.grid_w]]
    np.testing.assert_allclose(ours, out["pixel_values"], rtol=0, atol=1e-6)


def test_colidefics3_normalization_matches_hf():
    from transformers.models.idefics3 import Idefics3ImageProcessor

    from multimodal_colpali_tpu.models.idefics3 import ColIdefics3ModelConfig
    from multimodal_colpali_tpu.models.processing_idefics3 import ColIdefics3Processor

    cfg = ColIdefics3ModelConfig.colsmol_256m()
    s = cfg.vision.image_size
    proc = ColIdefics3Processor(cfg)
    img = _imgs([(s, s)], seed=3)[0]  # pre-sized: no resampling involved
    ours = proc.image_preprocessor([img])
    hf = Idefics3ImageProcessor(
        do_image_splitting=False, size={"longest_edge": s},
        max_image_size={"longest_edge": s},
        image_mean=[0.5] * 3, image_std=[0.5] * 3, do_pad=False)
    want = hf(img, return_tensors="np")["pixel_values"]  # [1, 1, 3, H, W]
    want = np.transpose(want.reshape(1, 3, s, s), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, want, rtol=0, atol=1e-6)


def test_top5_ranking_bitmatches_torch_end_to_end():
    """Full-stack golden (BASELINE bit-match criterion, tiny weights):
    processor -> encoder -> MaxSim top-5 ids, ours vs torch, on a 24-page
    synthetic corpus. The torch side reproduces colpali-engine's
    score_multi_vector math (reference 05_experiment02.py:210-219)."""
    import torch
    import jax.numpy as jnp
    from transformers import ColPaliForRetrieval, ColPaliConfig
    from transformers.models.paligemma import PaliGemmaConfig

    from multimodal_colpali_tpu.models import hf_import
    from multimodal_colpali_tpu.models.colpali import ColPaliModel
    from multimodal_colpali_tpu.models.configs import ColPaliModelConfig
    from multimodal_colpali_tpu.models.processing import ColPaliProcessor
    from multimodal_colpali_tpu.ops.maxsim import maxsim_scores
    from multimodal_colpali_tpu.ops.topk import topk_with_stable_ties

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
            projection_dim=cfg.text.hidden_size,
            image_token_index=cfg.image_token_id,
        ),
        embedding_dim=cfg.embedding_dim,
    )
    torch.manual_seed(0)
    hf_model = ColPaliForRetrieval(hf_cfg).eval()
    params = hf_import.colpali_params_from_hf(hf_model.state_dict(), cfg)
    model = ColPaliModel(cfg)
    proc = ColPaliProcessor(cfg)

    pages = _imgs([(64, 48)] * 24, seed=4)
    queries = ["what binds selectins", "glycan structures"]

    batch = proc.process_images(pages)
    qbatch = proc.process_queries(queries)
    with torch.no_grad():
        d_t = hf_model(
            input_ids=torch.from_numpy(batch["input_ids"]).long(),
            attention_mask=torch.from_numpy(batch["attention_mask"]).long(),
            pixel_values=torch.from_numpy(
                batch["pixel_values"].transpose(0, 3, 1, 2)),
        ).embeddings.float()
        q_t = hf_model(
            input_ids=torch.from_numpy(qbatch["input_ids"]).long(),
            attention_mask=torch.from_numpy(qbatch["attention_mask"]).long(),
        ).embeddings.float()
    # score_multi_vector: einsum -> max over doc tokens -> sum over q tokens
    sim = torch.einsum("bnd,csd->bcns", q_t, d_t)
    scores_t = sim.max(dim=3)[0].sum(dim=2)
    want = torch.topk(scores_t, k=5, dim=1).indices.numpy()

    got_d = np.asarray(model.apply(
        {"params": params}, jnp.asarray(batch["input_ids"]),
        jnp.asarray(batch["attention_mask"]),
        jnp.asarray(batch["pixel_values"])), np.float32)
    got_q = np.asarray(model.apply(
        {"params": params}, jnp.asarray(qbatch["input_ids"]),
        jnp.asarray(qbatch["attention_mask"])), np.float32)
    scores = maxsim_scores(jnp.asarray(got_q), jnp.asarray(got_d))
    _, got = topk_with_stable_ties(scores, 5)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_colidefics3_split_pixels_bitmatch_hf():
    """The idefics3 SPLIT path (tiles + global) bit-matches HF's
    Idefics3ImageProcessor - including the two-step LANCZOS resize chain
    (longest-edge even-rounded, stretch to tile multiples) and the
    canvas-derived global view - for upscaled and non-square tilings."""
    from transformers.models.idefics3 import Idefics3ImageProcessor

    from multimodal_colpali_tpu.models.idefics3 import ColIdefics3ModelConfig
    from multimodal_colpali_tpu.models.processing_idefics3 import (
        ColIdefics3Processor)

    cfg = ColIdefics3ModelConfig.colsmol_256m()
    s = cfg.vision.image_size
    proc = ColIdefics3Processor(cfg, image_splitting=True, longest_edge=2 * s)
    hf = Idefics3ImageProcessor(
        do_image_splitting=True, size={"longest_edge": 2 * s},
        max_image_size={"longest_edge": s},
        image_mean=[0.5] * 3, image_std=[0.5] * 3, do_pad=True)
    for seed, (h, w) in enumerate([(s, int(2.5 * s)), (s, int(1.5 * s)),
                                   (3 * s, s)]):
        img = _imgs([(h, w)], seed=seed)[0]
        tiles = proc._split_tiles(img, proc.tiling_for(img))
        want = hf(img, return_tensors="np")["pixel_values"]
        assert want.shape[1] == tiles.shape[0], (want.shape, tiles.shape)
        np.testing.assert_allclose(
            tiles, want[0].transpose(0, 2, 3, 1), rtol=0, atol=1e-6)
