"""Vector store tests: CRUD, filtered search, two-stage search, persistence,
and Qdrant-shaped client facade behavior."""

import numpy as np
import pytest

from multimodal_colpali_tpu.store import (
    DenseVectorStore, Distance, FieldCondition, Filter, MatchValue,
    MultiVectorConfig, MultiVectorStore, PointStruct, QuantizationSearchParams,
    SearchParams, VectorClient, VectorParams,
)


def _mv_points(rng, n, nt=6, dim=128, user=None):
    pts = []
    for i in range(n):
        vec = rng.standard_normal((nt, dim)).astype(np.float32)
        payload = {"index": i, "ref": f"doc_{i}_pg_{i}"}
        if user is not None:
            payload["username"] = user if i % 2 == 0 else "other"
        pts.append(PointStruct(id=i, vector=vec, payload=payload))
    return pts


def test_multivector_upsert_query_roundtrip(rng):
    store = MultiVectorStore("colpali", dim=128, max_tokens=8)
    pts = _mv_points(rng, 12)
    store.upsert(pts)
    assert len(store) == 12
    # Query with point 3's own (unnormalized) vectors: cosine MaxSim must
    # rank point 3 first (self-similarity = n_tokens).
    res = store.query(pts[3].vector, limit=4)
    assert res.points[0].id == 3
    assert res.points[0].payload["index"] == 3
    assert res.points[0].score == pytest.approx(6.0, rel=1e-2)


def test_multivector_filter(rng):
    store = MultiVectorStore("colpali", dim=128, max_tokens=8)
    store.upsert(_mv_points(rng, 10, user="alice"))
    flt = Filter(must=[FieldCondition(key="username", match=MatchValue(value="alice"))])
    res = store.query(rng.standard_normal((4, 128)).astype(np.float32), limit=10,
                      query_filter=flt)
    ids = {p.id for p in res.points}
    assert ids == {0, 2, 4, 6, 8}
    for p in res.points:
        assert p.payload["username"] == "alice"


def test_multivector_delete_and_overwrite(rng):
    store = MultiVectorStore("c", dim=128, max_tokens=8)
    pts = _mv_points(rng, 6)
    store.upsert(pts)
    store.delete(ids=[1, 3])
    assert len(store) == 4
    assert store.count() == 4
    # Overwriting an existing id keeps the count stable.
    store.upsert([PointStruct(id=0, vector=pts[5].vector, payload={"new": True})])
    assert len(store) == 4
    res = store.query(pts[5].vector, limit=1)
    assert res.points[0].id in (0, 5)


def test_multivector_two_stage_matches_exact(rng):
    exact = MultiVectorStore("e", dim=128, max_tokens=8)
    quant = MultiVectorStore("q", dim=128, max_tokens=8, quantized=True)
    pts = _mv_points(rng, 32)
    exact.upsert(pts)
    quant.upsert(pts)
    q = rng.standard_normal((4, 128)).astype(np.float32)
    r_exact = exact.query(q, limit=5)
    r_quant = quant.query(
        q, limit=5,
        search_params=SearchParams(
            quantization=QuantizationSearchParams(ignore=False, rescore=True,
                                                  oversampling=2.0)),
    )
    assert [p.id for p in r_exact.points] == [p.id for p in r_quant.points]
    # Rescored scores are exact, so they match to bf16 tolerance.
    for a, b in zip(r_exact.points, r_quant.points):
        assert a.score == pytest.approx(b.score, rel=2e-2)


def test_multivector_persistence_roundtrip(rng, tmp_path):
    store = MultiVectorStore("c", dim=128, max_tokens=8)
    pts = _mv_points(rng, 8)
    store.upsert(pts)
    store.save(str(tmp_path / "c"))
    loaded = MultiVectorStore.load(str(tmp_path / "c"))
    res_a = store.query(pts[2].vector, limit=3)
    res_b = loaded.query(pts[2].vector, limit=3)
    assert [p.id for p in res_a.points] == [p.id for p in res_b.points]


def test_dense_store_cosine(rng):
    store = DenseVectorStore("text", dim=64)
    vecs = rng.standard_normal((20, 64)).astype(np.float32)
    store.upsert([PointStruct(id=i, vector=vecs[i], payload={"i": i}) for i in range(20)])
    res = store.query(vecs[7], limit=3)
    assert res.points[0].id == 7
    assert res.points[0].score == pytest.approx(1.0, abs=2e-2)  # cosine self-sim


def test_dense_store_filter_and_scroll(rng):
    store = DenseVectorStore("text", dim=32)
    vecs = rng.standard_normal((10, 32)).astype(np.float32)
    store.upsert([
        PointStruct(id=i, vector=vecs[i], payload={"username": "u" + str(i % 2)})
        for i in range(10)
    ])
    flt = Filter(must=[FieldCondition(key="username", match=MatchValue(value="u1"))])
    res = store.query(vecs[0], limit=10, query_filter=flt)
    assert all(p.payload["username"] == "u1" for p in res.points)
    assert len(res.points) == 5
    records, nxt = store.scroll(flt=flt, limit=3)
    assert len(records) == 3 and nxt == 3
    records2, nxt2 = store.scroll(flt=flt, limit=3, offset=3)
    assert len(records2) == 2 and nxt2 is None


def test_client_facade(rng, tmp_path):
    client = VectorClient(path=str(tmp_path / "storage"))
    client.create_collection(
        "colpali_vd",
        vectors_config=VectorParams(size=128, distance=Distance.COSINE,
                                    multivector_config=MultiVectorConfig()),
        max_tokens=8,
    )
    client.create_collection("RAG_TEXT", vectors_config=VectorParams(size=64))
    assert client.collection_exists("colpali_vd")
    assert {c.name for c in client.get_collections().collections} == {"colpali_vd", "RAG_TEXT"}

    pts = _mv_points(rng, 6)
    client.upsert("colpali_vd", pts)
    assert client.count("colpali_vd").count == 6
    res = client.query_points("colpali_vd", query=pts[1].vector, limit=2)
    assert res.points[0].id == 1

    client.delete("colpali_vd", points_selector=[1])
    assert client.count("colpali_vd").count == 5

    # Persistence: save, reopen, same results.
    client.save()
    client2 = VectorClient(path=str(tmp_path / "storage"))
    assert client2.collection_exists("RAG_TEXT")
    res2 = client2.query_points("colpali_vd", query=pts[2].vector, limit=1)
    assert res2.points[0].id == 2

    client2.delete_collection("RAG_TEXT")
    assert not client2.collection_exists("RAG_TEXT")


def test_sharded_store_query(mesh8, rng):
    store = MultiVectorStore("c", dim=128, max_tokens=8, mesh=mesh8, mesh_axis="corpus")
    pts = _mv_points(rng, 19)  # odd count: padding across 8 shards
    store.upsert(pts)
    res = store.query(pts[11].vector, limit=3)
    assert res.points[0].id == 11
    unsharded = MultiVectorStore("c2", dim=128, max_tokens=8)
    unsharded.upsert(pts)
    res2 = unsharded.query(pts[11].vector, limit=3)
    assert [p.id for p in res.points] == [p.id for p in res2.points]


def test_pooled_two_stage_store(rng):
    """prefilter='pooled' store returns the exact ranking on clustered data
    and respects payload filters."""
    p, nt, dim = 40, 8, 128
    centers = rng.standard_normal((p, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    pts = []
    for i in range(p):
        vec = centers[i][None] + 0.05 * rng.standard_normal((nt, dim)).astype(np.float32)
        pts.append(PointStruct(id=i, vector=vec,
                               payload={"username": "a" if i % 2 == 0 else "b"}))
    exact = MultiVectorStore("e", dim=dim, max_tokens=nt)
    pooled = MultiVectorStore("p", dim=dim, max_tokens=nt,
                              quantized=True, prefilter="pooled")
    exact.upsert(pts)
    pooled.upsert(pts)
    q = centers[23][None].repeat(4, axis=0) + 0.02 * rng.standard_normal((4, dim)).astype(np.float32)
    r_exact = exact.query(q, limit=5)
    r_pooled = pooled.query(q, limit=5, search_params=SearchParams(
        quantization=QuantizationSearchParams(ignore=False, oversampling=4.0)))
    assert [pt.id for pt in r_pooled.points] == [pt.id for pt in r_exact.points]
    assert r_pooled.points[0].id == 23
    # filter: only even ids (username 'a')
    flt = Filter(must=[FieldCondition(key="username", match=MatchValue(value="a"))])
    r_f = pooled.query(q, limit=5, query_filter=flt, search_params=SearchParams(
        quantization=QuantizationSearchParams(ignore=False, oversampling=4.0)))
    assert all(pt.id % 2 == 0 for pt in r_f.points)


def test_sharded_pooled_two_stage_store(mesh8, rng):
    """mesh + prefilter='pooled' (BASELINE config #5): the sharded two-stage
    query must match the unsharded pooled store exactly."""
    p, nt, dim = 37, 8, 128  # odd count: padding across 8 shards
    centers = rng.standard_normal((p, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    pts = []
    for i in range(p):
        vec = centers[i][None] + 0.05 * rng.standard_normal((nt, dim)).astype(np.float32)
        pts.append(PointStruct(id=i, vector=vec,
                               payload={"username": "a" if i % 2 == 0 else "b"}))
    sharded = MultiVectorStore("s", dim=dim, max_tokens=nt, quantized=True,
                               prefilter="pooled", mesh=mesh8, mesh_axis="corpus")
    plain = MultiVectorStore("u", dim=dim, max_tokens=nt, quantized=True,
                             prefilter="pooled")
    sharded.upsert(pts)
    plain.upsert(pts)
    q = centers[19][None].repeat(4, axis=0) + 0.02 * rng.standard_normal((4, dim)).astype(np.float32)
    params = SearchParams(quantization=QuantizationSearchParams(
        ignore=False, oversampling=4.0))
    r_s = sharded.query(q, limit=5, search_params=params)
    r_u = plain.query(q, limit=5, search_params=params)
    assert [pt.id for pt in r_s.points] == [pt.id for pt in r_u.points]
    assert r_s.points[0].id == 19
    for a, b in zip(r_s.points, r_u.points):
        assert a.score == b.score  # identical fp32 rescore math
    # payload filter folds into token counts on the sharded path too
    flt = Filter(must=[FieldCondition(key="username", match=MatchValue(value="a"))])
    r_f = sharded.query(q, limit=5, query_filter=flt, search_params=params)
    assert r_f.points and all(pt.id % 2 == 0 for pt in r_f.points)


def test_persistence_preserves_prefilter_and_dtype(rng, tmp_path):
    """ADVICE r1: a pooled store must reload as a pooled store (the <10 ms
    query path survived a save/load round trip)."""
    import jax.numpy as jnp

    store = MultiVectorStore("c", dim=128, max_tokens=8, quantized=True,
                             prefilter="pooled", dtype=jnp.float32)
    store.upsert(_mv_points(rng, 8))
    store.save(str(tmp_path / "c"))
    loaded = MultiVectorStore.load(str(tmp_path / "c"))
    assert loaded.prefilter == "pooled"
    assert loaded.quantized is True
    assert loaded.dtype == jnp.float32


def test_sharded_int8_two_stage_store(mesh8, rng):
    """mesh + prefilter='int8' (GSPMD-auto path): must match the unsharded
    int8 two-stage result (VERDICT r1: this combination was untested)."""
    pts = _mv_points(rng, 20)
    sharded = MultiVectorStore("m", dim=128, max_tokens=8, quantized=True,
                               prefilter="int8", mesh=mesh8, mesh_axis="corpus")
    plain = MultiVectorStore("u", dim=128, max_tokens=8, quantized=True,
                             prefilter="int8")
    sharded.upsert(pts)
    plain.upsert(pts)
    params = SearchParams(quantization=QuantizationSearchParams(
        ignore=False, rescore=True, oversampling=2.0))
    a = sharded.query(pts[7].vector, limit=5, search_params=params)
    b = plain.query(pts[7].vector, limit=5, search_params=params)
    assert [p.id for p in a.points] == [p.id for p in b.points]
    assert a.points[0].id == 7


def test_distributed_corpus_view_single_process(mesh8, rng):
    """The multi-host view devolves to device sharding in one process and
    must reproduce the exact store's ranking with global ids."""
    from multimodal_colpali_tpu.store.distributed import DistributedCorpusView

    p, nt, dim = 37, 8, 128
    vecs = rng.standard_normal((p, nt, dim)).astype(np.float32)
    lens = np.full(p, nt, np.int32)

    exact = MultiVectorStore("e", dim=dim, max_tokens=nt)
    exact.upsert([PointStruct(id=i, vector=vecs[i], payload={})
                  for i in range(p)])
    view = DistributedCorpusView(vecs, lens, mesh=mesh8,
                                 prefilter="pooled")
    assert view.owns(0) and view.owns(p - 1)

    q = vecs[21][:4]
    want = [pt.id for pt in exact.query(q, limit=5).points]
    _, ids = view.query(q, limit=5, oversampling=4.0)
    assert ids.tolist() == want
    assert ids[0] == 21


def test_on_disk_store_matches_pooled_device_path(rng):
    """on_disk=True (Qdrant's host/disk-resident originals,
    01_create_context_qdrant.py:217): pooled device prefilter + host-gather
    rescore must bit-match the fully device-resident pooled store, including
    score values, payload filters, and with_vectors."""
    p, nt, dim = 40, 8, 128
    centers = rng.standard_normal((p, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    pts = []
    for i in range(p):
        vec = centers[i][None] + 0.05 * rng.standard_normal((nt, dim)).astype(np.float32)
        pts.append(PointStruct(id=i, vector=vec,
                               payload={"username": "a" if i % 2 == 0 else "b"}))
    device = MultiVectorStore("dev", dim=dim, max_tokens=nt,
                              quantized=True, prefilter="pooled")
    hosted = MultiVectorStore("host", dim=dim, max_tokens=nt, on_disk=True)
    device.upsert(pts)
    hosted.upsert(pts)
    sp = SearchParams(quantization=QuantizationSearchParams(
        ignore=False, oversampling=4.0))
    q = centers[23][None].repeat(4, axis=0) + \
        0.02 * rng.standard_normal((4, dim)).astype(np.float32)

    r_dev = device.query(q, limit=5, search_params=sp)
    r_host = hosted.query(q, limit=5, search_params=sp, with_vectors=True)
    assert [pt.id for pt in r_host.points] == [pt.id for pt in r_dev.points]
    for a, b in zip(r_host.points, r_dev.points):
        assert a.score == pytest.approx(b.score, rel=1e-5)
    assert len(r_host.points[0].vector) == nt  # originals still reachable

    flt = Filter(must=[FieldCondition(key="username", match=MatchValue(value="a"))])
    r_df = device.query(q, limit=5, query_filter=flt, search_params=sp)
    r_hf = hosted.query(q, limit=5, query_filter=flt, search_params=sp)
    assert [pt.id for pt in r_hf.points] == [pt.id for pt in r_df.points]
    assert all(pt.id % 2 == 0 for pt in r_hf.points)


def test_on_disk_store_memmap_roundtrip(rng, tmp_path):
    """Saving an on_disk store writes raw .npy originals; loading
    memory-maps them (no RAM copy of the corpus), queries still work, and a
    mutation after load materializes safely."""
    nt, dim = 6, 64
    store = MultiVectorStore("od", dim=dim, max_tokens=nt, on_disk=True)
    pts = _mv_points(rng, 16, nt=nt, dim=dim)
    store.upsert(pts)
    want = [pt.id for pt in store.query(pts[5].vector, limit=3).points]

    d = str(tmp_path / "od")
    store.save(d)
    import os
    assert os.path.exists(os.path.join(d, "vectors.npy"))

    loaded = MultiVectorStore.load(d)
    assert loaded.on_disk and isinstance(loaded._vectors, np.memmap)
    got = [pt.id for pt in loaded.query(pts[5].vector, limit=3).points]
    assert got == want

    # mutation on the memmapped corpus materializes and keeps working
    extra = _mv_points(rng, 1, nt=nt, dim=dim)[0]
    extra = PointStruct(id=99, vector=np.asarray(pts[5].vector) * 1.0,
                        payload={"index": 99, "ref": "doc_99"})
    loaded.upsert([extra])
    top = loaded.query(pts[5].vector, limit=2).points
    assert {top[0].id, top[1].id} == {5, 99}


def test_on_disk_save_over_loaded_memmap_is_safe(rng, tmp_path):
    """Saving an on_disk store back into the directory it was loaded from
    must not corrupt the corpus: the live ``self._vectors`` IS the memmap
    of the destination file, so the writer has to go through a temp file
    (a plain np.save would truncate the backing file before reading it)."""
    nt, dim = 6, 64
    store = MultiVectorStore("od", dim=dim, max_tokens=nt, on_disk=True)
    pts = _mv_points(rng, 12, nt=nt, dim=dim)
    store.upsert(pts)
    d = str(tmp_path / "od")
    store.save(d)
    originals = np.array(store._vectors, copy=True)

    loaded = MultiVectorStore.load(d)           # memmaps vectors.npy
    assert isinstance(loaded._vectors, np.memmap)
    loaded.save(d)                              # save over our own source

    reloaded = MultiVectorStore.load(d)
    np.testing.assert_array_equal(np.asarray(reloaded._vectors), originals)
    got = [pt.id for pt in reloaded.query(pts[5].vector, limit=3).points]
    assert got[0] == 5


def test_on_disk_ignore_true_is_exact_scan(rng):
    """QuantizationSearchParams(ignore=True) must bypass the pooled
    prefilter on on_disk collections exactly as it does on device-resident
    ones (retrieve_colpali always passes ignore=True): ranking and scores
    match the exact unquantized device scan, including under a filter."""
    p, nt, dim = 48, 8, 128
    pts = _mv_points(rng, p, nt=nt, dim=dim)
    exact = MultiVectorStore("ex", dim=dim, max_tokens=nt)   # plain scan
    hosted = MultiVectorStore("od", dim=dim, max_tokens=nt, on_disk=True)
    exact.upsert(pts)
    hosted.upsert(pts)
    sp = SearchParams(quantization=QuantizationSearchParams(
        ignore=True, rescore=True, oversampling=2.0))
    q = np.asarray(pts[31].vector) + \
        0.01 * rng.standard_normal((nt, dim)).astype(np.float32)

    r_ex = exact.query(q, limit=5, search_params=sp)
    r_od = hosted.query(q, limit=5, search_params=sp, with_vectors=True)
    assert [pt.id for pt in r_od.points] == [pt.id for pt in r_ex.points]
    for a, b in zip(r_od.points, r_ex.points):
        assert a.score == pytest.approx(b.score, rel=1e-4)
    assert len(r_od.points[0].vector) == nt

    flt = Filter(must=[FieldCondition(key="ref",
                                      match=MatchValue(value="doc_7_pg_7"))])
    r_exf = exact.query(q, limit=5, query_filter=flt, search_params=sp)
    r_odf = hosted.query(q, limit=5, query_filter=flt, search_params=sp)
    assert [pt.id for pt in r_odf.points] == [pt.id for pt in r_exf.points] \
        == [7]


def test_on_disk_collection_via_client(rng, tmp_path):
    """VectorParams(on_disk=True) flows through the client facade and
    survives the client's save/load cycle."""
    client = VectorClient(path=str(tmp_path / "store"))
    client.create_collection(
        "cp", vectors_config=VectorParams(
            size=64, distance=Distance.COSINE,
            multivector_config=MultiVectorConfig(), on_disk=True),
        max_tokens=6)
    pts = _mv_points(rng, 10, nt=6, dim=64)
    client.upsert("cp", pts)
    res = client.query_points("cp", query=pts[4].vector, limit=2)
    assert res.points[0].id == 4
    client.save()
    client2 = VectorClient(path=str(tmp_path / "store"))
    assert client2._collections["cp"].on_disk
    res2 = client2.query_points("cp", query=pts[4].vector, limit=2)
    assert [p.id for p in res2.points] == [p.id for p in res.points]
