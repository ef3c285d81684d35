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


def test_two_stage_bf16_rescore_matches_exact_scan(rng):
    """With ``d_full`` the rescore reads the originals, so candidate scores
    equal the exact scan's scores (no int8 quantization error)."""
    p, nt, dim, nq = 48, 8, 128, 4
    d = _normed(rng, (p, nt, dim))
    d_lens = np.full(p, nt, np.int32)
    q = _normed(rng, (nq, dim))

    exact = maxsim_scores_reference(jnp.asarray(q[None]), jnp.asarray(d),
                                    None, jnp.asarray(d_lens))
    want_v, want_i = topk_with_stable_ties(exact, 5)

    pooled, codes, scales = build_two_stage_index(jnp.asarray(d), jnp.asarray(d_lens))
    got_v, got_i = two_stage_maxsim_topk(
        jnp.asarray(q), jnp.int32(nq), pooled, codes, scales,
        jnp.asarray(d_lens), k=5, n_candidates=p, d_full=jnp.asarray(d),
    )
    # candidates == whole corpus, rescore from originals -> identical ranking
    # AND identical scores (both fp32 einsum over the same data).
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i[0]))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v[0]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("with_full", [False, True])
def test_sharded_two_stage_bitmatches_single_device(mesh8, rng, with_full):
    """BASELINE config #5: pooled prefilter AND corpus sharding together.

    The 8-device result must be bit-identical to the single-device two-stage
    result (same candidate set, same tie rules, same fp32 rescore)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_colpali_tpu.ops.two_stage import sharded_two_stage_maxsim_topk

    p, nt, dim, nq, k, cand = 64, 6, 128, 5, 5, 16
    # Clustered corpus with duplicated pages -> exercises tie handling.
    centers = _normed(rng, (8, dim))
    d = centers[rng.integers(0, 8, p)][:, None, :] \
        + 0.02 * rng.standard_normal((p, nt, dim)).astype(np.float32)
    d[10] = d[3]  # exact duplicate -> exact-score tie
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    d_lens = np.full(p, nt, np.int32)
    d_lens[7] = 0  # a masked page
    q = _normed(rng, (nq, dim))

    pooled, codes, scales = build_two_stage_index(jnp.asarray(d), jnp.asarray(d_lens))
    args = dict(k=k, n_candidates=cand)
    d_full = jnp.asarray(d) if with_full else None
    want_v, want_i = two_stage_maxsim_topk(
        jnp.asarray(q), jnp.int32(nq), pooled, codes, scales,
        jnp.asarray(d_lens), d_full=d_full, **args)

    sh = NamedSharding(mesh8, P("corpus"))
    put = lambda x: jax.device_put(x, sh)
    got_v, got_i = sharded_two_stage_maxsim_topk(
        mesh8, "corpus", jnp.asarray(q), jnp.int32(nq),
        put(pooled), put(codes), put(scales), put(jnp.asarray(d_lens)),
        d_full=put(d_full) if with_full else None, **args)

    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_pooled_prefilter_recall_on_clustered_corpus(rng):
    """Recall@5 vs the exact scan on a realistically *clustered* corpus
    (pages share cluster structure, so pooled scores collide), across
    oversampling factors. Documents the basis for the store's default
    oversampling=2.0: recall must rise with oversampling and be high by 4x.
    """
    p, nt, dim, k = 256, 8, 128, 5
    centers = _normed(rng, (12, dim))
    assign = rng.integers(0, 12, p)
    d = centers[assign][:, None, :] \
        + 0.15 * rng.standard_normal((p, nt, dim)).astype(np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    d_lens = np.full(p, nt, np.int32)
    pooled, codes, scales = build_two_stage_index(jnp.asarray(d), jnp.asarray(d_lens))

    n_queries = 16
    recalls = {}
    for oversampling in (1, 2, 4, 8):
        hits = total = 0
        for qi in range(n_queries):
            qrng = np.random.default_rng(100 + qi)
            c = centers[qrng.integers(0, 12)]
            q = c[None, :] + 0.3 * qrng.standard_normal((4, dim)).astype(np.float32)
            q = (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)
            exact = maxsim_scores_reference(
                jnp.asarray(q[None]), jnp.asarray(d), None, jnp.asarray(d_lens))
            _, want = topk_with_stable_ties(exact, k)
            _, got = two_stage_maxsim_topk(
                jnp.asarray(q), jnp.int32(4), pooled, codes, scales,
                jnp.asarray(d_lens), k=k, n_candidates=k * oversampling,
                d_full=jnp.asarray(d))
            hits += len(set(np.asarray(want[0]).tolist())
                        & set(np.asarray(got).tolist()))
            total += k
        recalls[oversampling] = hits / total
    # Monotone (within noise) and high once oversampled.
    assert recalls[8] >= recalls[2] - 0.02
    assert recalls[2] >= recalls[1] - 0.02
    assert recalls[4] >= 0.9, recalls
    assert recalls[8] >= 0.95, recalls


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


def test_multi_centroid_prefilter_beats_mean_pooling(rng):
    """The failure mode pooled_centroids fixes: relevant pages carry the
    query topic in a MINORITY of tokens (mean pooling dilutes it to ~1/3),
    while distractor pages are uniformly filled with a mildly-similar topic
    (mean keeps ~0.5). Exact MaxSim ranks the relevant pages first (the max
    picks their topic tokens); the mean prefilter drops them in stage 1,
    per-page farthest-point token picks keep a near-pure topic token."""
    from multimodal_colpali_tpu.ops.two_stage import pool_corpus_fps

    # n_rel < n_candidates (= 2k), so stage-1 need only separate relevant
    # from distractor pages, not fine-order near-identical relevant ones.
    n_rel, n_dis, nt, dim, k = 8, 120, 12, 128, 5
    topic = _normed(rng, (1, dim))[0]
    near = topic + 0.9 * _normed(rng, (1, dim))[0]  # mildly similar direction
    near /= np.linalg.norm(near)
    pages = []
    for i in range(n_rel):  # topic in 4/12 tokens, rest random
        toks = _normed(rng, (nt, dim))
        toks[:4] = topic + 0.05 * rng.standard_normal((4, dim))
        pages.append(toks)
    for i in range(n_dis):  # uniformly near-topic
        pages.append(near + 0.05 * rng.standard_normal((nt, dim)))
    d = np.stack(pages).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d_lens = np.full(n_rel + n_dis, nt, np.int32)

    pooled_mean, codes, scales = build_two_stage_index(
        jnp.asarray(d), jnp.asarray(d_lens))
    pooled_km = pool_corpus_fps(jnp.asarray(d), jnp.asarray(d_lens), k=4)

    def recall(pooled):
        hits = total = 0
        for qi in range(12):
            qrng = np.random.default_rng(300 + qi)
            q = topic[None] + 0.1 * qrng.standard_normal((4, dim)).astype(np.float32)
            q = (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)
            exact = maxsim_scores_reference(
                jnp.asarray(q[None]), jnp.asarray(d), None, jnp.asarray(d_lens))
            _, want = topk_with_stable_ties(exact, k)
            assert all(int(i) < n_rel for i in np.asarray(want[0]))  # sanity
            _, got = two_stage_maxsim_topk(
                jnp.asarray(q), jnp.int32(4), pooled, codes, scales,
                jnp.asarray(d_lens), k=k, n_candidates=2 * k,
                d_full=jnp.asarray(d))
            hits += len(set(np.asarray(want[0]).tolist())
                        & set(np.asarray(got).tolist()))
            total += k
        return hits / total

    r_mean, r_km = recall(pooled_mean), recall(pooled_km)
    assert r_km > r_mean, (r_km, r_mean)
    assert r_km >= 0.9, (r_km, r_mean)
    assert r_mean <= 0.5, r_mean  # the mean prefilter really does fail here


def test_sharded_two_stage_multi_centroid_bitmatch(mesh8, rng):
    """The sharded path handles [P, K, DIM] stage-1 representations and
    still bit-matches single-device."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_colpali_tpu.ops.two_stage import (
        pool_corpus_fps, sharded_two_stage_maxsim_topk)
    from multimodal_colpali_tpu.ops.maxsim import quantize_corpus_int8

    p, nt, dim = 64, 6, 128
    d = _normed(rng, (p, nt, dim))
    d_lens = np.full(p, nt, np.int32)
    pooled = pool_corpus_fps(jnp.asarray(d), jnp.asarray(d_lens), k=3)
    codes, scales = quantize_corpus_int8(jnp.asarray(d))
    q = _normed(rng, (4, dim))

    want_v, want_i = two_stage_maxsim_topk(
        jnp.asarray(q), jnp.int32(4), pooled, codes, scales,
        jnp.asarray(d_lens), k=5, n_candidates=16)
    sh = NamedSharding(mesh8, P("corpus"))
    put = lambda x: jax.device_put(x, sh)
    got_v, got_i = sharded_two_stage_maxsim_topk(
        mesh8, "corpus", jnp.asarray(q), jnp.int32(4),
        put(pooled), put(codes), put(scales), put(jnp.asarray(d_lens)),
        k=5, n_candidates=16)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_remat_train_step_matches(rng):
    """jax.checkpoint rematerialization must not change the training math -
    same loss and same updated params as the plain step."""
    from multimodal_colpali_tpu.models.configs import ColPaliModelConfig
    from multimodal_colpali_tpu.models.colpali import ColPaliModel
    from multimodal_colpali_tpu.models.registry import fast_random_params
    from multimodal_colpali_tpu.training import make_train_step, make_training_setup

    cfg = ColPaliModelConfig.tiny()
    model = ColPaliModel(cfg)
    params = jax.tree.map(jnp.asarray, fast_random_params(model, cfg, 0))
    params, opt_state, optimizer = make_training_setup(model, params)

    n_img = cfg.vision.num_patches
    b = 2
    batch = {
        "query_ids": jnp.asarray(rng.integers(3, 60, (b, 8)), jnp.int32),
        "query_mask": jnp.ones((b, 8), jnp.int32),
        "doc_ids": jnp.full((b, n_img + 4), 0, jnp.int32).at[:, :n_img].set(
            cfg.image_token_id),
        "doc_mask": jnp.ones((b, n_img + 4), jnp.int32),
        "doc_pixels": jnp.asarray(rng.standard_normal(
            (b, cfg.vision.image_size, cfg.vision.image_size, 3)), jnp.float32),
    }
    plain = make_train_step(model, optimizer)
    remat = make_train_step(model, optimizer, remat=True)
    p1, _, l1 = plain(params, opt_state, batch)
    p2, _, l2 = remat(params, opt_state, batch)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    a, b_ = jax.tree.leaves(p1)[0], jax.tree.leaves(p2)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5,
                               atol=1e-6)
