"""MaxSim kernel tests against an independent NumPy oracle.

The oracle reproduces the colpali-engine ``score_multi_vector`` math used by
the reference at 05_experiment02.py:214: per query token, max dot product
over page tokens, summed over query tokens.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_colpali_tpu.ops.maxsim import (
    maxsim_scores,
    maxsim_scores_reference,
    maxsim_scores_pallas,
    maxsim_scores_int8_pallas,
    quantize_corpus_int8,
)


def numpy_oracle(q, d, q_lens=None, d_lens=None):
    b, nq, dim = q.shape
    p, nt, _ = d.shape
    out = np.zeros((b, p), dtype=np.float64)
    for bi in range(b):
        nqi = nq if q_lens is None else int(q_lens[bi])
        for pi in range(p):
            nti = nt if d_lens is None else int(d_lens[pi])
            s = 0.0
            for i in range(nqi):
                dots = d[pi, :nti].astype(np.float64) @ q[bi, i].astype(np.float64)
                s += dots.max() if nti > 0 else float("-inf")
            out[bi, pi] = s
    return out


def make_case(rng, b=2, nq=5, p=7, nt=12, dim=128, ragged=True):
    q = rng.standard_normal((b, nq, dim), dtype=np.float32)
    d = rng.standard_normal((p, nt, dim), dtype=np.float32)
    q_lens = rng.integers(1, nq + 1, size=b).astype(np.int32) if ragged else None
    d_lens = rng.integers(1, nt + 1, size=p).astype(np.int32) if ragged else None
    return q, d, q_lens, d_lens


def test_reference_matches_numpy_oracle(rng):
    q, d, q_lens, d_lens = make_case(rng)
    got = np.asarray(maxsim_scores_reference(jnp.asarray(q), jnp.asarray(d),
                                             jnp.asarray(q_lens), jnp.asarray(d_lens)))
    want = numpy_oracle(q, d, q_lens, d_lens)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_reference_no_masks(rng):
    q, d, _, _ = make_case(rng, ragged=False)
    got = np.asarray(maxsim_scores_reference(jnp.asarray(q), jnp.asarray(d)))
    want = numpy_oracle(q, d)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("p,nt,block_pages", [(7, 16, 4), (16, 24, 4), (3, 8, 8)])
def test_pallas_interpret_matches_reference(rng, p, nt, block_pages):
    q, d, q_lens, d_lens = make_case(rng, p=p, nt=nt)
    args = (jnp.asarray(q), jnp.asarray(d), jnp.asarray(q_lens), jnp.asarray(d_lens))
    want = np.asarray(maxsim_scores_reference(*args))
    got = np.asarray(
        maxsim_scores_pallas(*args, block_pages=block_pages, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_bf16_close_to_fp32_oracle(rng):
    q, d, q_lens, d_lens = make_case(rng, p=9, nt=16)
    got = np.asarray(
        maxsim_scores_pallas(
            jnp.asarray(q, jnp.bfloat16).astype(jnp.bfloat16),
            jnp.asarray(d).astype(jnp.bfloat16),
            jnp.asarray(q_lens), jnp.asarray(d_lens),
            block_pages=4, interpret=True,
        )
    )
    want = numpy_oracle(q, d, q_lens, d_lens)
    # bf16 inputs: ~2-3 decimal digits; scores are sums of ~5 unit-scale dots.
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.5)


def test_int8_quantized_scan_ranks_match(rng):
    q, d, q_lens, d_lens = make_case(rng, b=1, p=24, nt=16)
    dq, dscale = quantize_corpus_int8(jnp.asarray(d))
    approx = np.asarray(
        maxsim_scores_int8_pallas(
            jnp.asarray(q), dq, dscale, jnp.asarray(q_lens), jnp.asarray(d_lens),
            block_pages=8, interpret=True,
        )
    )
    exact = np.asarray(
        maxsim_scores_reference(jnp.asarray(q), jnp.asarray(d),
                                jnp.asarray(q_lens), jnp.asarray(d_lens))
    )
    np.testing.assert_allclose(approx, exact, rtol=0.02, atol=0.2)
    # int8 with per-token scales preserves the top-1 on well-separated data.
    assert approx[0].argmax() == exact[0].argmax()


def test_dispatcher_cpu_path(rng):
    q, d, q_lens, d_lens = make_case(rng, p=5, nt=8)
    got = np.asarray(maxsim_scores(jnp.asarray(q), jnp.asarray(d),
                                   jnp.asarray(q_lens), jnp.asarray(d_lens)))
    want = numpy_oracle(q, d, q_lens, d_lens)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_torch_score_multi_vector_parity(rng):
    """Cross-check against the exact torch formulation the reference uses."""
    torch = pytest.importorskip("torch")
    q, d, _, _ = make_case(rng, b=3, nq=6, p=10, nt=14, ragged=False)
    tq, td = torch.from_numpy(q), torch.from_numpy(d)
    # colpali-engine score_multi_vector: einsum("bnd,csd->bcns").max(3).sum(2)
    t_scores = torch.einsum("bnd,csd->bcns", tq, td).max(dim=3)[0].sum(dim=2)
    got = np.asarray(maxsim_scores_reference(jnp.asarray(q), jnp.asarray(d)))
    np.testing.assert_allclose(got, t_scores.numpy(), rtol=1e-4, atol=1e-4)
