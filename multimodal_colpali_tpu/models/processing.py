"""Input processing: image preprocessing and prompt/tokenization for ColPali.

Mirrors the behavior of ``ColPaliProcessor.process_images/process_queries``
that the reference calls at functions.py:837-839 and functions.py:887-889:

- images -> fixed 448x448 bicubic resize, rescale 1/255, normalize to
  [-1, 1], prompt ``<image>*1024 <bos> Describe the image.\\n``
- queries -> ``<bos> Query: {query}`` + 10 ``<pad>`` augmentation tokens.

Tokenization is pluggable: pass a HuggingFace tokenizer for real
checkpoints, or use the built-in deterministic ``SimpleTokenizer`` (hash
vocab) for random-weight/e2e runs in download-less environments.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

from multimodal_colpali_tpu.models.configs import ColPaliModelConfig

try:  # PIL is available in this image; keep the seam explicit anyway.
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None

IMAGE_PROMPT = "Describe the image."
QUERY_PREFIX = "Query: "
QUERY_AUGMENTATION_TOKENS = 10


class SimpleTokenizer:
    """Deterministic hash tokenizer for environments without checkpoint
    tokenizers. Splits on whitespace/punctuation and hashes into the vocab,
    reserving ids: 0=<pad>, 1=<eos>, 2=<bos>, image_token_id=<image>."""

    def __init__(self, vocab_size: int, image_token_id: int):
        self.vocab_size = vocab_size
        self.pad_id = 0
        self.eos_id = 1
        self.bos_id = 2
        self.image_token_id = image_token_id

    def encode(self, text: str) -> List[int]:
        import re

        pieces = re.findall(r"\w+|[^\w\s]", text.lower())
        lo, hi = 3, self.vocab_size - 1
        out = []
        for p in pieces:
            h = 2166136261
            for ch in p.encode():  # FNV-1a, stable across runs/processes
                h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
            out.append(lo + h % (hi - lo))
        return out


@dataclasses.dataclass
class ImagePreprocessor:
    """PIL -> normalized NHWC float array, SigLIP convention."""

    image_size: int = 448
    mean: float = 0.5
    std: float = 0.5

    def __call__(self, images: Sequence[Any]) -> np.ndarray:
        arrs = []
        for img in images:
            if Image is not None and isinstance(img, Image.Image):
                im = img.convert("RGB").resize(
                    (self.image_size, self.image_size), Image.BICUBIC
                )
                a = np.asarray(im, dtype=np.float32)
            else:
                a = np.asarray(img, dtype=np.float32)
                if a.shape[:2] != (self.image_size, self.image_size):
                    if Image is None:
                        raise ValueError("non-PIL input must be pre-resized")
                    im = Image.fromarray(a.astype(np.uint8)).resize(
                        (self.image_size, self.image_size), Image.BICUBIC
                    )
                    a = np.asarray(im, dtype=np.float32)
            a = a / 255.0
            a = (a - self.mean) / self.std
            arrs.append(a)
        return np.stack(arrs, axis=0)

    def u8(self, images: Sequence[Any]) -> np.ndarray:
        """PIL -> resized uint8 NHWC, normalization deferred to the device
        (ops/preprocess.normalize_images: fused rescale+normalize on the
        VPU). 4x less host->device traffic than fp32 and no host fp32
        pass - the host stage is resize-only."""
        arrs = []
        for img in images:
            if Image is not None and isinstance(img, Image.Image):
                im = img.convert("RGB").resize(
                    (self.image_size, self.image_size), Image.BICUBIC
                )
                a = np.asarray(im, dtype=np.uint8)
            else:
                a = np.asarray(img)
                if a.shape[:2] != (self.image_size, self.image_size):
                    if Image is None:
                        raise ValueError("non-PIL input must be pre-resized")
                    im = Image.fromarray(a.astype(np.uint8)).resize(
                        (self.image_size, self.image_size), Image.BICUBIC
                    )
                    a = np.asarray(im, dtype=np.uint8)
                a = a.astype(np.uint8)
            arrs.append(a)
        return np.stack(arrs, axis=0)


class ColPaliProcessor:
    """Builds model inputs; shape-compatible with the HF processor surface."""

    def __init__(
        self,
        cfg: ColPaliModelConfig,
        tokenizer: Optional[Any] = None,
        query_pad_to_multiple: int = 16,
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer or SimpleTokenizer(
            cfg.text.vocab_size, cfg.image_token_id
        )
        self.image_seq_length = cfg.vision.num_patches
        self.image_preprocessor = ImagePreprocessor(cfg.vision.image_size)
        self.query_pad_to_multiple = query_pad_to_multiple

    # -- pieces -------------------------------------------------------------

    def _ids(self, text: str) -> List[int]:
        tok = self.tokenizer
        if hasattr(tok, "encode"):
            try:
                return list(tok.encode(text, add_special_tokens=False))
            except TypeError:
                return list(tok.encode(text))
        raise TypeError("tokenizer must expose .encode()")

    def _special(self, name: str, default: int) -> int:
        return getattr(self.tokenizer, name, default)

    # -- public API -----------------------------------------------------------

    def process_images(self, images: Sequence[Any],
                       device_preprocess: bool = False) -> dict:
        """-> {input_ids, attention_mask [B,S], pixel_values [B,H,W,3]}.

        ``device_preprocess=True`` emits uint8 pixels (resize-only host
        stage); the Retriever normalizes them on device inside the same
        jit as the forward (ops/preprocess.py)."""
        if device_preprocess:
            pix: Any = self.image_preprocessor.u8(images)
        else:
            pix = self.image_preprocessor(images)
        prompt_ids = self._ids(IMAGE_PROMPT + "\n")
        bos = self._special("bos_id", 2)
        seq = (
            [self.cfg.image_token_id] * self.image_seq_length
            + [bos]
            + prompt_ids
        )
        b = len(images)
        input_ids = np.tile(np.asarray(seq, np.int32), (b, 1))
        attention_mask = np.ones_like(input_ids)
        return {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "pixel_values": pix,
        }

    def process_queries(self, queries: Sequence[str]) -> dict:
        """-> {input_ids, attention_mask [B,S]} padded to a length bucket."""
        bos = self._special("bos_id", 2)
        pad = self._special("pad_id", 0)
        rows = []
        for q in queries:
            ids = [bos] + self._ids(QUERY_PREFIX + q + "\n")
            ids += [pad] * QUERY_AUGMENTATION_TOKENS
            rows.append(ids)
        max_len = max(len(r) for r in rows)
        m = self.query_pad_to_multiple
        max_len = ((max_len + m - 1) // m) * m  # bucket: stable jit shapes
        input_ids = np.full((len(rows), max_len), pad, np.int32)
        attention_mask = np.zeros((len(rows), max_len), np.int32)
        for i, r in enumerate(rows):
            input_ids[i, : len(r)] = r
            # The 10 <pad> augmentation tokens are *attended* (they act as a
            # learned query-expansion buffer, as in colpali-engine).
            attention_mask[i, : len(r)] = 1
        return {"input_ids": input_ids, "attention_mask": attention_mask}

    def score_multi_vector(self, qs: Sequence[np.ndarray], ds: Sequence[np.ndarray]) -> np.ndarray:
        """MaxSim scores [n_queries, n_docs] from variable-length embeddings.

        Equivalent to colpali-engine ``score_multi_vector`` (the oracle at
        reference 05_experiment02.py:214), running on the TPU kernel.
        """
        import jax.numpy as jnp
        from multimodal_colpali_tpu.ops.maxsim import maxsim_scores

        q_pad, q_lens = pad_multivectors(qs)
        d_pad, d_lens = pad_multivectors(ds)
        return np.asarray(
            maxsim_scores(
                jnp.asarray(q_pad), jnp.asarray(d_pad),
                jnp.asarray(q_lens), jnp.asarray(d_lens),
            )
        )


def pad_multivectors(
    arrs: Sequence[np.ndarray], multiple: int = 8
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack variable-length [n_i, dim] arrays into [N, max_n, dim] + lengths."""
    lens = np.asarray([a.shape[0] for a in arrs], np.int32)
    max_n = int(max(1, ((lens.max() + multiple - 1) // multiple) * multiple))
    dim = arrs[0].shape[-1]
    out = np.zeros((len(arrs), max_n, dim), np.float32)
    for i, a in enumerate(arrs):
        out[i, : a.shape[0]] = np.asarray(a, np.float32)
    return out, lens
