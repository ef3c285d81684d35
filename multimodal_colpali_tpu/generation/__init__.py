from multimodal_colpali_tpu.generation.client import (  # noqa: F401
    ERROR_SENTINEL,
    get_response_context,
    get_responses,
    mcq_response_format,
    post_request_with_retries,
    post_request_with_retries_raising,
    resolve_endpoint,
    run_inference,
    run_sync,
)
from multimodal_colpali_tpu.generation.messages import (  # noqa: F401
    build_choice_string,
    build_instruction_block,
    build_reference_from_metadata,
    document_to_context_entry,
    encode_image,
    encode_image_to_data_url,
    format_msgs,
    image_context_messages,
    pil_image_to_data_url,
)
from multimodal_colpali_tpu.generation.parse import response_real_out  # noqa: F401


def __getattr__(name):
    # Lazy: the decode engine pulls in jax/model stacks; the HTTP client
    # surface above must stay importable without touching a backend.
    if name in ("GemmaDecodeEngine", "ByteTokenizer"):
        from multimodal_colpali_tpu.generation import engine

        return getattr(engine, name)
    if name in ("GenerationServer", "render_chat_prompt"):
        from multimodal_colpali_tpu.generation import server

        return getattr(server, name)
    if name == "ContinuousBatcher":
        from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

        return ContinuousBatcher
    if name == "PagedContinuousBatcher":
        from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

        return PagedContinuousBatcher
    raise AttributeError(name)
