from multimodal_colpali_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    batch_sharding,
    replicate,
    shard_params_for_tp,
    initialize_distributed,
    global_corpus_mesh,
    make_global_corpus,
)
