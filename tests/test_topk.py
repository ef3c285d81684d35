"""Top-k tests: torch.topk tie parity and sharded-vs-single-device equality."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_colpali_tpu.ops.maxsim import maxsim_scores_reference
from multimodal_colpali_tpu.ops.topk import topk_with_stable_ties, sharded_maxsim_topk


def test_values_match_torch_topk(rng):
    """Values must match torch.topk exactly; tie *order* is unspecified in
    torch, so the framework's contract (lower index first) is checked
    separately below rather than against torch."""
    torch = pytest.importorskip("torch")
    scores = rng.integers(0, 5, size=(4, 32)).astype(np.float32)
    v, i = topk_with_stable_ties(jnp.asarray(scores), 8)
    tv, _ = torch.topk(torch.from_numpy(scores), 8, dim=-1, sorted=True)
    np.testing.assert_array_equal(np.asarray(v), tv.numpy())
    # Returned indices must actually point at the returned values.
    np.testing.assert_array_equal(
        np.take_along_axis(scores, np.asarray(i), axis=-1), np.asarray(v)
    )
    # Deterministic tie order: indices strictly increase within equal values.
    vv, ii = np.asarray(v), np.asarray(i)
    for r in range(vv.shape[0]):
        for c in range(1, vv.shape[1]):
            if vv[r, c] == vv[r, c - 1]:
                assert ii[r, c] > ii[r, c - 1]


def test_stable_ties_basic():
    s = jnp.asarray([[1.0, 3.0, 3.0, 2.0, 3.0]])
    v, i = topk_with_stable_ties(s, 3)
    np.testing.assert_array_equal(np.asarray(i), [[1, 2, 4]])
    np.testing.assert_array_equal(np.asarray(v), [[3.0, 3.0, 3.0]])


def test_sharded_topk_matches_single_device(mesh8, rng):
    b, nq, dim, nt = 2, 4, 128, 8
    p = 64  # 8 pages/shard
    q = rng.standard_normal((b, nq, dim), dtype=np.float32)
    d = rng.standard_normal((p, nt, dim), dtype=np.float32)
    d_lens = rng.integers(1, nt + 1, size=p).astype(np.int32)
    q_lens = np.full((b,), nq, np.int32)

    scores = maxsim_scores_reference(jnp.asarray(q), jnp.asarray(d),
                                     jnp.asarray(q_lens), jnp.asarray(d_lens))
    want_v, want_i = topk_with_stable_ties(scores, 5)

    got_v, got_i = sharded_maxsim_topk(
        mesh8, "corpus", jnp.asarray(q), jnp.asarray(d), jnp.asarray(d_lens), 5,
        q_lens=jnp.asarray(q_lens), use_pallas=False,
    )
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_sharded_topk_with_ties(mesh8):
    """Cross-shard ties must resolve toward the lower global page index."""
    b, nq, dim, nt, p = 1, 1, 128, 1, 16
    q = np.zeros((b, nq, dim), np.float32)
    q[0, 0, 0] = 1.0
    d = np.zeros((p, nt, dim), np.float32)
    d[:, 0, 0] = 1.0  # every page scores identically
    d_lens = np.ones(p, np.int32)
    v, i = sharded_maxsim_topk(
        mesh8, "corpus", jnp.asarray(q), jnp.asarray(d), jnp.asarray(d_lens), 4,
        use_pallas=False,
    )
    np.testing.assert_array_equal(np.asarray(i), [[0, 1, 2, 3]])


def test_sharded_topk_k_larger_than_shard(mesh8, rng):
    """k greater than the per-shard page count pads candidates correctly."""
    b, nq, dim, nt, p = 1, 2, 128, 4, 16  # 2 pages/shard
    q = rng.standard_normal((b, nq, dim), dtype=np.float32)
    d = rng.standard_normal((p, nt, dim), dtype=np.float32)
    d_lens = np.full(p, nt, np.int32)
    scores = maxsim_scores_reference(jnp.asarray(q), jnp.asarray(d))
    want_v, want_i = topk_with_stable_ties(scores, 6)
    got_v, got_i = sharded_maxsim_topk(
        mesh8, "corpus", jnp.asarray(q), jnp.asarray(d), jnp.asarray(d_lens), 6,
        use_pallas=False,
    )
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
