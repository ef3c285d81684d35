from multimodal_colpali_tpu.ops.maxsim import (  # noqa: F401
    maxsim_scores,
    maxsim_scores_reference,
    maxsim_scores_pallas,
)
from multimodal_colpali_tpu.ops.topk import topk_with_stable_ties, sharded_maxsim_topk  # noqa: F401
from multimodal_colpali_tpu.ops.quant import (  # noqa: F401
    quantize_int8,
    dequantize,
    quantize_lm_params,
)
