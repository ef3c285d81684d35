"""Qwen2-VL MULTIMODAL parity: the reference's old-model VLM class
(AdaptLLM/biomed-Qwen2-VL-2B-Instruct serves image-context MCQs via vLLM,
00_run_docker_old_models.sh:24-38) against torch
``Qwen2VLForConditionalGeneration`` on a tiny config - vision tower
(shared with the ColQwen2 retriever), in-jit mrope positions, causal
prefill, and greedy decode through the batchers."""

import numpy as np
import pytest
import jax.numpy as jnp

from multimodal_colpali_tpu.generation.qwen2vl_mm import (
    Qwen2VLMMEngine, mrope_positions_from_ids)
from multimodal_colpali_tpu.models import hf_import
from multimodal_colpali_tpu.models.qwen2vl import ColQwen2ModelConfig

torch = pytest.importorskip("torch")


def _pair():
    from transformers import Qwen2VLForConditionalGeneration
    from transformers.models.qwen2_vl import Qwen2VLConfig

    cfg = ColQwen2ModelConfig.tiny(vocab_size=64)
    hf_cfg = Qwen2VLConfig(
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
            tie_word_embeddings=True,
            rope_scaling={"rope_type": "default",
                          "mrope_section": list(cfg.text.mrope_section)},
        ),
        image_token_id=cfg.image_token_id,
        video_token_id=cfg.image_token_id - 3,
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
    )
    torch.manual_seed(0)
    hf = Qwen2VLForConditionalGeneration(hf_cfg).eval()
    params = hf_import.qwen2vl_lm_params_from_hf(hf.state_dict(), cfg)
    return cfg, Qwen2VLMMEngine(cfg, params), hf


def _patches(cfg, rng, n: int) -> np.ndarray:
    """[N, P, patch_dim] random pre-patchified images at the static grid."""
    from multimodal_colpali_tpu.models.processing_qwen2vl import (
        flatten_patches)

    h_px = cfg.grid_h * cfg.vision.patch_size
    w_px = cfg.grid_w * cfg.vision.patch_size
    imgs = rng.standard_normal((n, h_px, w_px, 3)).astype(np.float32)
    return np.stack([flatten_patches(im, cfg) for im in imgs])


def _hf_generate(hf, prompt, patches, grid_thw, max_new):
    ids_t = torch.tensor([prompt], dtype=torch.long)
    with torch.no_grad():
        out = hf.generate(
            input_ids=ids_t,
            attention_mask=torch.ones_like(ids_t),
            pixel_values=torch.from_numpy(
                patches.reshape(-1, patches.shape[-1])),
            image_grid_thw=torch.tensor(grid_thw),
            max_new_tokens=max_new, do_sample=False)
    return out[0, len(prompt):].tolist()


def test_mrope_positions_match_processor():
    """The in-jit formulation reproduces the host processor's
    get_rope_index for the retrieval layout (one prefix image block,
    right padding) and for text-only rows."""
    from multimodal_colpali_tpu.models.processing_qwen2vl import (
        ColQwen2Processor)

    cfg = ColQwen2ModelConfig.tiny()
    proc = ColQwen2Processor(cfg)
    m = cfg.vision.spatial_merge_size
    gm = (cfg.grid_h // m, cfg.grid_w // m)
    n_tok = gm[0] * gm[1]
    rows = [
        [cfg.vision_start_token_id] + [cfg.image_token_id] * n_tok
        + [cfg.vision_end_token_id, 5, 9, 11],
        [7, 3, 2, 5, 9, 11, 4, 4, 0, 0],                   # text-only
    ]
    s = max(len(r) for r in rows)
    ids = np.zeros((len(rows), s), np.int32)
    mask = np.zeros((len(rows), s), np.int32)
    ids[0, : len(rows[0])] = rows[0]
    mask[0, : len(rows[0])] = 1
    ids[1, : len(rows[1])] = rows[1]
    mask[1, : 8] = 1                                       # right padding
    want = proc.mrope_position_ids(ids, mask)
    got, last = mrope_positions_from_ids(
        jnp.asarray(ids), jnp.asarray(mask), cfg.image_token_id, gm)
    got = np.asarray(got)
    # the processor zeroes padded slots; compare valid slots only
    valid = mask.astype(bool)
    for st in range(3):
        np.testing.assert_array_equal(got[st][valid], want[st][valid])
    # last_pos + 1 is the decode start: text-final rows end at their last
    # text position
    assert int(np.asarray(last)[1]) == 7


def test_mrope_positions_multi_image_and_image_final():
    """Two image blocks and an image-FINAL prompt follow HF's
    max(position)+1 resumption rule."""
    cfg = ColQwen2ModelConfig.tiny()
    m = cfg.vision.spatial_merge_size
    gh, gw = cfg.grid_h // m, cfg.grid_w // m   # 2x2 -> 4 tokens, max=2
    n_tok = gh * gw
    img = [cfg.vision_start_token_id] + [cfg.image_token_id] * n_tok \
        + [cfg.vision_end_token_id]
    row = [9] + img + [5, 7] + img                          # image-final
    ids = np.asarray([row], np.int32)
    mask = np.ones_like(ids)
    pos, last = mrope_positions_from_ids(
        jnp.asarray(ids), jnp.asarray(mask), cfg.image_token_id, (gh, gw))
    pos = np.asarray(pos)
    # text 9 at 0; vision_start at 1; image block base 2 (t=2, h/w 2..3);
    # vision_end at 2+max(2,2)=4; text 5,7 at 5,6; vision_start 7; block
    # base 8; vision_end at 8+2=10
    assert pos[0, 0, 0] == 0 and pos[0, 0, 1] == 1
    assert pos[0, 0, 2] == 2 and pos[1, 0, 2] == 2 and pos[2, 0, 2] == 2
    assert pos[1, 0, 2 + n_tok - 1] == 2 + gh - 1
    assert pos[2, 0, 2 + n_tok - 1] == 2 + gw - 1
    assert pos[0, 0, 2 + n_tok] == 4                        # vision_end
    assert pos[0, 0, 2 + n_tok + 1] == 5                    # text resumes
    # image-final: decode must start at max+1 = final vision_end + 1
    assert int(np.asarray(last)[0]) == int(pos.max())


def test_qwen2vl_mm_prefill_logits_match_torch():
    cfg, eng, hf = _pair()
    rng = np.random.default_rng(0)
    prompt = eng.build_mm_prompt([5, 9, 11, 3])
    patches = _patches(cfg, rng, 1)
    got = eng.next_token_logits([prompt], patches[None],
                                bucket=len(prompt))

    ids_t = torch.tensor([prompt], dtype=torch.long)
    with torch.no_grad():
        want = hf(
            input_ids=ids_t, attention_mask=torch.ones_like(ids_t),
            pixel_values=torch.from_numpy(
                patches.reshape(-1, patches.shape[-1])),
            image_grid_thw=torch.tensor([[1, cfg.grid_h, cfg.grid_w]]),
        ).logits[0, -1].numpy()
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-4)


def test_qwen2vl_mm_greedy_generation_matches_torch():
    """Greedy decode parity with one image, including the LEFT-padded
    bucket (positions must come from the advance formulation, not slot
    indices)."""
    cfg, eng, hf = _pair()
    rng = np.random.default_rng(1)
    prompt = eng.build_mm_prompt([5, 9, 11, 3, 17, 42])
    patches = _patches(cfg, rng, 1)
    got = eng.generate([prompt], patches[None], max_new_tokens=12,
                       bucket=16)[0]
    want = _hf_generate(hf, prompt, patches,
                        [[1, cfg.grid_h, cfg.grid_w]], 12)
    assert got == want, (got, want)


def test_qwen2vl_mm_two_images_match_torch():
    """TWO context images (exp-02's multi-image MCQ prompts): each image
    fills its own block with its own mrope grid; swapping the images
    moves the logits."""
    cfg, eng, hf = _pair()
    rng = np.random.default_rng(2)
    prompt = eng.build_mm_prompt([5, 9, 11], n_images=2)
    assert prompt.count(cfg.image_token_id) == 2 * eng.tokens_per_image
    patches = _patches(cfg, rng, 2)
    got = eng.generate([prompt], patches[None], max_new_tokens=10,
                       bucket=len(prompt))[0]
    want = _hf_generate(hf, prompt, patches,
                        [[1, cfg.grid_h, cfg.grid_w]] * 2, 10)
    assert got == want, (got, want)
    a = eng.next_token_logits([prompt], patches[None], bucket=len(prompt))
    b = eng.next_token_logits([prompt], patches[::-1][None].copy(),
                              bucket=len(prompt))
    assert not np.allclose(a, b)


def _tiny_mm():
    from multimodal_colpali_tpu.generation.engine import Qwen2DecodeEngine
    from multimodal_colpali_tpu.models.registry import (
        qwen2vl_mm_random_params)

    cfg = ColQwen2ModelConfig.tiny()
    params = qwen2vl_mm_random_params(cfg, seed=4)
    return (cfg, Qwen2DecodeEngine(cfg.text, params, dtype=jnp.float32),
            Qwen2VLMMEngine(cfg, params, dtype=jnp.float32))


def test_qwen2vl_mm_through_batchers():
    """A Qwen2-VL image request decodes in the slot batch next to text
    requests (both batchers), matching the isolated engine stream - the
    scheduler's mm hook routes to the engine's causal prefill and the
    [N, P, patch_dim] pixel stack survives the image_rank lift."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    cfg, eng, mm = _tiny_mm()
    rng = np.random.default_rng(3)
    patches = _patches(cfg, rng, 1)
    prompt = mm.build_mm_prompt([5, 9, 11])
    want_mm = mm.generate([prompt], patches[None], max_new_tokens=6,
                          bucket=16)[0]
    want_txt = eng.generate([[40, 2, 7]], max_new_tokens=8)[0]

    for cls, kw in ((ContinuousBatcher, {}),
                    (PagedContinuousBatcher, {"page_size": 8})):
        bat = cls(eng, batch_slots=2, max_seq_len=64, chunk=3,
                  mm_engine=mm, **kw)
        txt_fut = bat.submit([40, 2, 7], max_new_tokens=8)
        # single image submitted WITHOUT the stack axis: [P, patch_dim]
        mm_fut = bat.submit(prompt, max_new_tokens=6,
                            pixel_values=patches[0])
        bat.drain()
        assert mm_fut.result(60) == want_mm, cls.__name__
        assert txt_fut.result(60) == want_txt, cls.__name__


def test_qwen2vl_mm_preemption_resumes():
    """A preempted Qwen2-VL image request resumes via the two-stage
    causal extension and still bit-matches the uninterrupted stream."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    cfg, eng, mm = _tiny_mm()
    rng = np.random.default_rng(5)
    patches = _patches(cfg, rng, 1)
    prompt = mm.build_mm_prompt([5, 9, 11, 3, 17])
    want = mm.generate([prompt], patches[None], max_new_tokens=10,
                       bucket=16)[0]
    bat = PagedContinuousBatcher(eng, batch_slots=3, max_seq_len=64,
                                 chunk=3, page_size=8, pool_pages=8,
                                 mm_engine=mm)
    mm_fut = bat.submit(prompt, max_new_tokens=10, pixel_values=patches)
    txt_futs = [bat.submit(list(range(2, 16)), max_new_tokens=8)
                for _ in range(2)]
    bat.drain()
    assert mm_fut.result(60) == want
    assert bat.preemptions > 0
    for f in txt_futs:
        f.result(60)
