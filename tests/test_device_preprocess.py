"""Device-side preprocessing (uint8 upload + in-jit normalize).

The reference preprocesses pages on the host (PIL + numpy fp32 inside the
HF processors, functions.py:678-713 + colpali-engine's process_images);
``load_retriever(device_preprocess=True)`` ships resized uint8 pixels
(4x less host->device traffic) and fuses rescale+normalize into the
forward jit (ops/preprocess.normalize_images - Pallas on TPU, the
reference math off-TPU). The host stage becomes resize-only.

The normalize math is the same f32 chain as the host preprocessor
(x/255 -> -mean -> /std), so embeddings must match the host path
bit-for-bit off-TPU.
"""

import warnings

import numpy as np
import pytest
from PIL import Image

from multimodal_colpali_tpu.models import load_retriever


def _imgs(rng, n, size=28):
    return [Image.fromarray(
        rng.integers(0, 255, (size, size, 3), dtype=np.uint8), "RGB")
        for _ in range(n)]


@pytest.fixture(scope="module")
def pair():
    with pytest.warns(UserWarning, match="random init"):
        host = load_retriever("tiny-colpali", seed=0)
    with pytest.warns(UserWarning, match="random init"):
        dev = load_retriever("tiny-colpali", seed=0, device_preprocess=True)
    return host, dev


def test_u8_batch_shape_and_dtype(pair, rng):
    host, dev = pair
    batch = dev.processor.process_images(_imgs(rng, 3),
                                         device_preprocess=True)
    pix = batch["pixel_values"]
    assert pix.dtype == np.uint8
    size = dev.processor.image_preprocessor.image_size
    assert pix.shape == (3, size, size, 3)
    # the uint8 pixels are exactly what the host path normalizes: applying
    # the same f32 chain reproduces the fp32 batch bit-for-bit
    imgs2 = _imgs(np.random.default_rng(7), 2)
    u8 = dev.processor.image_preprocessor.u8(imgs2)
    f32 = host.processor.image_preprocessor(imgs2)
    np.testing.assert_array_equal(
        (u8.astype(np.float32) / 255.0 - 0.5) / 0.5, f32)


def test_device_preprocess_embeddings_match_host(pair, rng):
    host, dev = pair
    imgs = _imgs(rng, 3)
    e_host = host.embed_images(imgs)
    e_dev = dev.embed_images(imgs)
    for a, b in zip(e_host, e_dev):
        np.testing.assert_array_equal(a, b)


def test_device_preprocess_query_path_unaffected(pair):
    host, dev = pair
    a = host.embed_queries(["q one"])[0]
    b = dev.embed_queries(["q one"])[0]
    np.testing.assert_array_equal(a, b)


def test_colsmol_device_preprocess_matches_host(rng):
    """ColIdefics3's fixed square layout (ColSmol) also supports the
    uint8 path - the family whose 500 pages/s device rate makes the host
    stage the bottleneck."""
    with pytest.warns(UserWarning, match="random init"):
        host = load_retriever("tiny-colidefics3", seed=0)
    with pytest.warns(UserWarning, match="random init"):
        dev = load_retriever("tiny-colidefics3", seed=0,
                             device_preprocess=True)
    imgs = _imgs(rng, 2)
    for a, b in zip(host.embed_images(imgs), dev.embed_images(imgs)):
        np.testing.assert_array_equal(a, b)


def test_device_preprocess_rejects_splitting():
    with pytest.raises(ValueError, match="fixed square layout"):
        with pytest.warns(UserWarning, match="random init"):
            load_retriever("tiny-colidefics3", dynamic_resolution=True,
                           device_preprocess=True)


def test_pipelined_embedder_fast_raster(tmp_path, rng):
    """raster_dpi="auto" renders pages at the model's input size (6x less
    host raster/resize work). Pixels differ from the 144-DPI chain by
    design; the entry schema, ordering, and embedding geometry must not."""
    from multimodal_colpali_tpu.ingest.pipeline import PipelinedEmbedder
    from tests.test_ingest import make_sample_pdf

    pdf_dir = tmp_path / "papers"
    pdf_dir.mkdir()
    make_sample_pdf(str(pdf_dir / "a.pdf"), n_pages=2, lines_per_page=3,
                    seed=0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        dev = load_retriever("tiny-colpali", seed=0, device_preprocess=True)
    got = PipelinedEmbedder(dev, batch_size=2,
                            raster_dpi="auto").embed_pdf_dir(str(pdf_dir))
    assert [(g["doc_id"], g["page_id"], g["file_name"]) for g in got] == [
        (0, 0, "a.pdf"), (0, 1, "a.pdf")]
    for g in got:
        e = g["embedding"]
        assert np.isfinite(e).all()
        np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0,
                                   atol=1e-2)


def test_unsupported_processor_raises():
    with pytest.raises(ValueError, match="device_preprocess is not"):
        with pytest.warns(UserWarning, match="random init"):
            load_retriever("tiny-colqwen2", device_preprocess=True)


def test_pipelined_embedder_device_preprocess(tmp_path, rng):
    """e2e: PDFs -> resize-only host stages -> uint8 upload -> in-jit
    normalize -> embeddings equal to the host-preprocessed pipeline."""
    from multimodal_colpali_tpu.ingest.pipeline import PipelinedEmbedder
    from tests.test_ingest import make_sample_pdf

    pdf_dir = tmp_path / "papers"
    pdf_dir.mkdir()
    make_sample_pdf(str(pdf_dir / "a.pdf"), n_pages=2, lines_per_page=3,
                    seed=0)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        host = load_retriever("tiny-colpali", seed=0)
        dev = load_retriever("tiny-colpali", seed=0, device_preprocess=True)
    want = PipelinedEmbedder(host, batch_size=2).embed_pdf_dir(str(pdf_dir))
    got = PipelinedEmbedder(dev, batch_size=2).embed_pdf_dir(str(pdf_dir))
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["embedding"], w["embedding"])
