from multimodal_colpali_tpu.training.trainer import (  # noqa: F401
    colbert_loss,
    make_train_step,
    make_training_setup,
)
