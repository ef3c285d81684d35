"""End-to-end retriever tests: processor -> encoder -> MaxSim -> store."""

import numpy as np
import pytest
from PIL import Image

from multimodal_colpali_tpu.models import load_retriever, ColPaliProcessor
from multimodal_colpali_tpu.models.configs import ColPaliModelConfig
from multimodal_colpali_tpu.store import (
    MultiVectorStore, PointStruct,
)


@pytest.fixture(scope="module")
def tiny_retriever():
    with pytest.warns(UserWarning, match="random init"):
        return load_retriever("tiny-colpali", seed=0)


def _imgs(rng, n, size=28):
    return [
        Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8), "RGB")
        for _ in range(n)
    ]


def test_embed_images_shapes(tiny_retriever, rng):
    embs = tiny_retriever.embed_images(_imgs(rng, 3))
    assert len(embs) == 3
    cfg = ColPaliModelConfig.tiny()
    for e in embs:
        assert e.shape[1] == cfg.embedding_dim
        assert e.shape[0] >= cfg.vision.num_patches  # image tokens + text
        norms = np.linalg.norm(e, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)  # L2-normalized


def test_embed_queries_deterministic(tiny_retriever):
    a = tiny_retriever.embed_queries(["what is a glycan?"])[0]
    b = tiny_retriever.embed_queries(["what is a glycan?", "other question"])[0]
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_self_retrieval_roundtrip(tiny_retriever, rng):
    """A page should retrieve itself: embed pages, index, query with one
    page's own embedding as the 'query'."""
    images = _imgs(rng, 6)
    embs = tiny_retriever.embed_images(images)
    store = MultiVectorStore("c", dim=embs[0].shape[1],
                             max_tokens=max(e.shape[0] for e in embs))
    store.upsert([
        PointStruct(id=i, vector=e, payload={"page": i}) for i, e in enumerate(embs)
    ])
    res = store.query(embs[4], limit=3)
    assert res.points[0].id == 4


def test_score_multi_vector_matches_store(tiny_retriever, rng):
    images = _imgs(rng, 5)
    embs = tiny_retriever.embed_images(images)
    queries = tiny_retriever.embed_queries(["alpha beta", "gamma"])
    proc = tiny_retriever.processor
    scores = proc.score_multi_vector(queries, embs)
    assert scores.shape == (2, 5)
    # Compare against per-pair einsum.
    q0, d2 = queries[0], embs[2]
    want = float(np.sum(np.max(q0 @ d2.T, axis=1)))
    assert scores[0, 2] == pytest.approx(want, rel=1e-4)


def test_query_bucketing_stable(tiny_retriever):
    """Short and long queries land in different buckets but stay correct."""
    short = tiny_retriever.embed_queries(["a"])[0]
    long = tiny_retriever.embed_queries(
        ["a " + " ".join(f"w{i}" for i in range(30))]
    )[0]
    assert short.shape[0] < long.shape[0]


@pytest.mark.parametrize("name", ["tiny-colqwen2", "tiny-colqwen2.5", "tiny-colflor", "tiny-colidefics3", "tiny-colgranite"])
def test_colqwen_retriever_swap(name, rng):
    """Retriever-swap capability: the Qwen families drive through the same
    Retriever/store surface as ColPali (BASELINE configs #3/#4)."""
    with pytest.warns(UserWarning, match="random init"):
        r = load_retriever(name, seed=1)
    cfg = r.model.cfg
    size = (getattr(cfg, 'image_size', 0)
            or getattr(cfg.vision, 'image_size', 0)
            or cfg.grid_h * cfg.vision.patch_size)
    images = _imgs(rng, 4, size=size)
    embs = r.embed_images(images)
    assert len(embs) == 4
    assert embs[0].shape[1] == r.model.cfg.embedding_dim
    np.testing.assert_allclose(np.linalg.norm(embs[0], axis=-1), 1.0, atol=1e-3)
    queries = r.embed_queries(["find the glycan page"])
    store = MultiVectorStore("c", dim=embs[0].shape[1],
                             max_tokens=max(e.shape[0] for e in embs))
    store.upsert([PointStruct(id=i, vector=e, payload={}) for i, e in enumerate(embs)])
    res = store.query(embs[2], limit=2)
    assert res.points[0].id == 2
    scores = r.processor.score_multi_vector(queries, embs)
    assert scores.shape == (1, 4)


def test_dp_sharded_embedding_matches_unsharded(mesh8, rng):
    """DP over the 8-device mesh ('data' axis) must not change embeddings."""
    from jax.sharding import Mesh
    import jax
    import numpy as np2

    devs = np2.array(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devs, ("data", "model"))
    with pytest.warns(UserWarning):
        r_plain = load_retriever("tiny-colpali", seed=0)
    with pytest.warns(UserWarning):
        r_dp = load_retriever("tiny-colpali", seed=0, mesh=mesh)
    imgs = _imgs(rng, 5)  # odd count: forces batch padding to 8
    a = r_plain.embed_images(imgs)
    b = r_dp.embed_images(imgs)
    assert len(a) == len(b) == 5
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=2e-2)
    qa = r_plain.embed_queries(["one question"])
    qb = r_dp.embed_queries(["one question"])
    np.testing.assert_allclose(qa[0], qb[0], atol=2e-2)
