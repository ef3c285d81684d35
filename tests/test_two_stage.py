"""Two-stage retrieval tests: recall vs the exact scan, and training loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_colpali_tpu.ops.maxsim import maxsim_scores_reference
from multimodal_colpali_tpu.ops.topk import topk_with_stable_ties
from multimodal_colpali_tpu.ops.two_stage import (
    build_two_stage_index, pool_corpus, two_stage_maxsim_topk,
)


def _normed(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_pool_corpus_ignores_padding(rng):
    d = jnp.asarray(_normed(rng, (3, 6, 128)))
    d_lens = jnp.asarray([6, 3, 1], jnp.int32)
    pooled = np.asarray(pool_corpus(d, d_lens), np.float32)
    want1 = np.asarray(d[1][:3]).mean(axis=0)
    np.testing.assert_allclose(pooled[1], want1, atol=1e-3)
    np.testing.assert_allclose(pooled[2], np.asarray(d[2][0]), atol=1e-3)


def test_two_stage_topk_matches_exact_on_separated_corpus(rng):
    """With clustered pages, the pooled prefilter must recover the exact
    top-k after rescore."""
    p, nt, dim, nq = 64, 8, 128, 4
    centers = _normed(rng, (p, dim))
    d = centers[:, None, :] + 0.05 * rng.standard_normal((p, nt, dim)).astype(np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    d_lens = np.full(p, nt, np.int32)
    q = _normed(rng, (nq, dim)) * 0.1 + centers[17][None, :]  # near page 17
    q = (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)

    exact = maxsim_scores_reference(jnp.asarray(q[None]), jnp.asarray(d),
                                    None, jnp.asarray(d_lens))
    want_v, want_i = topk_with_stable_ties(exact, 5)

    pooled, codes, scales = build_two_stage_index(jnp.asarray(d), jnp.asarray(d_lens))
    got_v, got_i = two_stage_maxsim_topk(
        jnp.asarray(q), jnp.int32(nq), pooled, codes, scales,
        jnp.asarray(d_lens), k=5, n_candidates=16,
    )
    assert int(got_i[0]) == int(want_i[0, 0]) == 17
    # rescored scores close to exact (int8 quantization tolerance)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v[0]),
                               rtol=0.02, atol=0.05)


def test_two_stage_zero_len_pages_never_win(rng):
    p, nt, dim = 16, 4, 128
    d = jnp.asarray(_normed(rng, (p, nt, dim)))
    d_lens = jnp.asarray([0] * 8 + [nt] * 8, jnp.int32)
    pooled, codes, scales = build_two_stage_index(d, d_lens)
    q = jnp.asarray(_normed(rng, (3, dim)))
    _, idx = two_stage_maxsim_topk(q, jnp.int32(3), pooled, codes, scales,
                                   d_lens, k=8, n_candidates=16)
    assert all(int(i) >= 8 for i in np.asarray(idx))


def test_colbert_loss_prefers_matched_pairs(rng):
    from multimodal_colpali_tpu.training import colbert_loss

    b, nq, nt, dim = 4, 3, 5, 16
    d = jnp.asarray(_normed(rng, (b, nt, dim)))
    # queries aligned with their own docs -> low loss
    q_good = d[:, :nq, :]
    mask_q = jnp.ones((b, nq), jnp.int32)
    mask_d = jnp.ones((b, nt), jnp.int32)
    good = float(colbert_loss(q_good, d, mask_q, mask_d))
    # shuffled -> high loss
    q_bad = jnp.roll(q_good, 1, axis=0)
    bad = float(colbert_loss(q_bad, d, mask_q, mask_d))
    assert good < bad


def test_train_step_reduces_loss(rng):
    import optax
    from multimodal_colpali_tpu.models.configs import ColPaliModelConfig
    from multimodal_colpali_tpu.models.colpali import ColPaliModel
    from multimodal_colpali_tpu.models.registry import fast_random_params
    from multimodal_colpali_tpu.training import make_train_step, make_training_setup

    cfg = ColPaliModelConfig.tiny()
    model = ColPaliModel(cfg)
    params = jax.tree.map(jnp.asarray, fast_random_params(model, cfg, 0))
    params, opt_state, optimizer = make_training_setup(
        model, params, mesh=None, learning_rate=1e-3)
    step = make_train_step(model, optimizer)

    b = 4
    n_img = cfg.vision.num_patches
    batch = {
        "query_ids": jnp.asarray(rng.integers(3, 60, (b, 8)), jnp.int32),
        "query_mask": jnp.ones((b, 8), jnp.int32),
        "doc_ids": jnp.full((b, n_img + 4), 0, jnp.int32).at[:, :n_img].set(cfg.image_token_id),
        "doc_mask": jnp.ones((b, n_img + 4), jnp.int32),
        "doc_pixels": jnp.asarray(rng.standard_normal(
            (b, cfg.vision.image_size, cfg.vision.image_size, 3)), jnp.float32),
    }
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_pallas_normalize_matches_reference(rng):
    from multimodal_colpali_tpu.ops.preprocess import (
        normalize_images, normalize_images_reference)

    u8 = jnp.asarray(rng.integers(0, 256, (2, 16, 128, 3)), jnp.uint8)
    got = normalize_images(u8, interpret=True)
    want = normalize_images_reference(u8)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=1e-2)
    # CLIP stats too
    got2 = normalize_images(u8, mean=(0.481, 0.457, 0.408),
                            std=(0.268, 0.261, 0.275), interpret=True)
    want2 = normalize_images_reference(u8, mean=(0.481, 0.457, 0.408),
                                       std=(0.268, 0.261, 0.275))
    np.testing.assert_allclose(np.asarray(got2, np.float32),
                               np.asarray(want2, np.float32), atol=2e-2)


def test_train_checkpoint_roundtrip(rng, tmp_path):
    import optax
    from multimodal_colpali_tpu.models.configs import ColPaliModelConfig
    from multimodal_colpali_tpu.models.colpali import ColPaliModel
    from multimodal_colpali_tpu.models.registry import fast_random_params
    from multimodal_colpali_tpu.training import make_training_setup
    from multimodal_colpali_tpu.training.checkpoint import (
        make_checkpoint_manager, restore_train_state, save_train_state)

    cfg = ColPaliModelConfig.tiny()
    model = ColPaliModel(cfg)
    params = jax.tree.map(jnp.asarray, fast_random_params(model, cfg, 0))
    params, opt_state, _ = make_training_setup(model, params)

    mgr = make_checkpoint_manager(str(tmp_path / "ckpt"))
    save_train_state(mgr, 7, params, opt_state)
    zeros = jax.tree.map(jnp.zeros_like, params)
    step, p2, o2 = restore_train_state(mgr, zeros, jax.tree.map(jnp.zeros_like, opt_state))
    assert step == 7
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(p2)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
