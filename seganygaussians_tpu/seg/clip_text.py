"""Open-vocabulary CLIP querying (parity: `clip_utils/`).

All scoring math (`get_relevancy`, template averaging, score→3D-mask lifting)
is pure jnp over embedding arrays, so it works with embeddings from ANY
source: the per-mask ``clip_features/<image>.pt`` sidecars the reference
pipeline precomputes, or a live encoder.  The encoder itself
(OpenCLIP ViT-B/16 in the reference, `clip_utils/clip_utils.py:56-95`) is
pluggable through :class:`ClipEncoder` (HF ``transformers`` CLIP when weights
are available locally — this framework adds no network dependency).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Canonical negatives (`clip_utils/clip_utils.py:16`).
CANONICAL_NEGATIVES = ("object", "things", "stuff", "texture")

# The 87-prompt template bank (`clip_utils/__init__.py:7-88`).
DEFAULT_TEMPLATE = [
    "a bad photo of a {}.", "a photo of many {}.", "a sculpture of a {}.",
    "a photo of the hard to see {}.", "a low resolution photo of the {}.",
    "a rendering of a {}.", "graffiti of a {}.", "a bad photo of the {}.",
    "a cropped photo of the {}.", "a tattoo of a {}.", "the embroidered {}.",
    "a photo of a hard to see {}.", "a bright photo of a {}.",
    "a photo of a clean {}.", "a photo of a dirty {}.",
    "a dark photo of the {}.", "a drawing of a {}.", "a photo of my {}.",
    "the plastic {}.", "a photo of the cool {}.", "a close-up photo of a {}.",
    "a black and white photo of the {}.", "a painting of the {}.",
    "a painting of a {}.", "a pixelated photo of the {}.",
    "a sculpture of the {}.", "a bright photo of the {}.",
    "a cropped photo of a {}.", "a plastic {}.", "a photo of the dirty {}.",
    "a jpeg corrupted photo of a {}.", "a blurry photo of the {}.",
    "a photo of the {}.", "a good photo of the {}.", "a rendering of the {}.",
    "a {} in a video game.", "a photo of one {}.", "a doodle of a {}.",
    "a close-up photo of the {}.", "a photo of a {}.", "the origami {}.",
    "the {} in a video game.", "a sketch of a {}.", "a doodle of the {}.",
    "a origami {}.", "a low resolution photo of a {}.", "the toy {}.",
    "a rendition of the {}.", "a photo of the clean {}.",
    "a photo of a large {}.", "a rendition of a {}.", "a photo of a nice {}.",
    "a photo of a weird {}.", "a blurry photo of a {}.", "a cartoon {}.",
    "art of a {}.", "a sketch of the {}.", "a embroidered {}.",
    "a pixelated photo of a {}.", "itap of the {}.",
    "a jpeg corrupted photo of the {}.", "a good photo of a {}.",
    "a plushie {}.", "a photo of the nice {}.", "a photo of the small {}.",
    "a photo of the weird {}.", "the cartoon {}.", "art of the {}.",
    "a drawing of the {}.", "a photo of the large {}.",
    "a black and white photo of a {}.", "the plushie {}.",
    "a dark photo of a {}.", "itap of a {}.", "graffiti of the {}.",
    "a toy {}.", "itap of my {}.", "a photo of a cool {}.",
    "a photo of a small {}.", "a tattoo of the {}.",
]


def _normalize(x, eps=1e-9):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(eps)


def get_relevancy(
    embeds: jnp.ndarray,  # (N, C) image/mask embeddings (need not be normed)
    pos_embeds: jnp.ndarray,  # (P, C) normalised positive text embeddings
    neg_embeds: jnp.ndarray,  # (Q, C) normalised negative text embeddings
    positive_id: int = 0,
) -> jnp.ndarray:
    """(N, 2) [score, 1-score]: 10×-temperature pairwise softmax against each
    negative, min over negatives (`clip_utils/clip_utils.py:148-164`)."""
    pos = embeds @ pos_embeds[positive_id]  # (N,)
    negs = embeds @ neg_embeds.T  # (N, Q)
    pair = jnp.stack([jnp.broadcast_to(pos[:, None], negs.shape), negs], axis=-1)
    soft = jax.nn.softmax(10.0 * pair, axis=-1)  # (N, Q, 2)
    lowest = jnp.min(soft[..., 0], axis=-1)
    return jnp.stack([lowest, 1.0 - lowest], axis=-1)


def get_relevancy_multi(
    embeds: jnp.ndarray, pos_embeds: jnp.ndarray, neg_embeds: jnp.ndarray
) -> jnp.ndarray:
    """(N, P, 2) relevancy per positive (`get_relevancy_with_template`,
    `clip_utils/clip_utils.py:180-194`)."""
    pos = embeds @ pos_embeds.T  # (N, P)
    negs = embeds @ neg_embeds.T  # (N, Q)
    pair = jnp.stack(
        [
            jnp.broadcast_to(pos[:, :, None], pos.shape + (negs.shape[-1],)),
            jnp.broadcast_to(negs[:, None, :], pos.shape + (negs.shape[-1],)),
        ],
        axis=-1,
    )  # (N, P, Q, 2)
    soft = jax.nn.softmax(10.0 * pair, axis=-1)
    lowest = jnp.min(soft[..., 0], axis=-1)  # (N, P)
    return jnp.stack([lowest, 1.0 - lowest], axis=-1)


def get_scores(
    mask_embeds: jnp.ndarray,  # (N, C) per-SAM-mask CLIP features
    pos_embeds: jnp.ndarray,
    neg_embeds: jnp.ndarray,
) -> jnp.ndarray:
    """(N,) per-mask relevancy score (`clip_utils/__init__.py:214-226`)."""
    return get_relevancy(mask_embeds, _normalize(pos_embeds),
                         _normalize(neg_embeds))[:, 0]


def get_segmentation_scores(
    mask_embeds: jnp.ndarray, pos_embeds: jnp.ndarray
) -> jnp.ndarray:
    """(N, P) raw cosine scores (`clip_utils/clip_utils.py:196-199`)."""
    return mask_embeds @ _normalize(pos_embeds).T


def scores_to_pixel_map(
    scores: jnp.ndarray,  # (K,) per-mask scores
    masks: jnp.ndarray,  # (K, H, W)
) -> jnp.ndarray:
    """Per-pixel score: mask-weighted mean over covering masks
    (the commented recipe at `clip_utils/__init__.py:199-207` /
    `get_multi_lvl_scores`)."""
    num = jnp.einsum("k,khw->hw", scores, masks)
    den = jnp.sum(masks, axis=0) + 1e-9
    return num / den


def lift_scores_to_3d(
    views: Sequence,  # objects with .params (CameraParams)
    view_scores: Sequence[jnp.ndarray],  # per-view (h, w) 2D score maps
    state,  # models.gaussians.GaussianState
    config=None,
    threshold: float = 0.0,
) -> jnp.ndarray:
    """2D score maps → per-Gaussian 3D mask via mask-render backprop
    (`clip_utils/__init__.py:291-330` get_3d_mask): for each view, the
    gradient of −Σ score·rendered_mask w.r.t. the per-Gaussian mask values is
    SUBTRACTED from an accumulator; positives after all views form the mask.
    """
    import jax.numpy as jnp

    from seganygaussians_tpu import render as R
    from seganygaussians_tpu.ops.rasterize import RasterConfig

    config = config or RasterConfig()
    cap = state.alive.shape[0]
    acc = jnp.zeros((cap,), jnp.float32)
    bg = jnp.zeros((3,), jnp.float32)

    for view, score in zip(views, view_scores):
        score = jnp.asarray(score, jnp.float32)

        def neg_overlap(m):
            pkg = R.render_mask(view.params, state, bg, precomputed_mask=m,
                                config=config)
            rendered = pkg["mask"]
            target = jax.image.resize(score, rendered.shape, "bilinear")
            return -jnp.sum(target * rendered)

        g = jax.grad(neg_overlap)(acc * 0.0)
        acc = acc - g
    return (acc > threshold) & state.alive


class _OpenClipImpl:
    """OpenCLIP backend — reference parity (`clip_utils/clip_utils.py:56-95`:
    ViT-B-16 laion2b_s34b_b88k).  Reference-produced ``clip_features``
    sidecars were embedded with THIS text/image tower; scores against them
    are only meaningful with this backend."""

    def __init__(self, model_name: str, pretrained: str):
        import open_clip

        model, _, _ = open_clip.create_model_and_transforms(
            model_name, pretrained=pretrained
        )
        model.eval()
        self.model = model
        self.tokenizer = open_clip.get_tokenizer(model_name)

    def encode_text(self, prompts: list[str]) -> np.ndarray:
        import torch

        with torch.no_grad():
            tok = torch.cat([self.tokenizer(p) for p in prompts])
            out = self.model.encode_text(tok)
        return out.float().numpy()

    def encode_image(self, images: np.ndarray) -> np.ndarray:
        import torch

        # 224² resize + CLIP normalisation (`clip_utils/clip_utils.py:60-68,
        # 201-203`).
        mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
        t = torch.from_numpy(np.asarray(images, np.float32)).permute(0, 3, 1, 2)
        t = torch.nn.functional.interpolate(
            t, size=(224, 224), mode="bilinear", align_corners=False
        )
        t = (t - torch.from_numpy(mean)[None, :, None, None]) / torch.from_numpy(
            std
        )[None, :, None, None]
        with torch.no_grad():
            out = self.model.encode_image(t)
        return out.float().numpy()


class _HfClipImpl:
    """HF transformers fallback (different weights than the reference's
    laion2b tower — do NOT score reference-made sidecars with this)."""

    def __init__(self, model_name: str):
        from transformers import CLIPModel, CLIPProcessor

        self.model = CLIPModel.from_pretrained(model_name)
        self.processor = CLIPProcessor.from_pretrained(model_name)

    def encode_text(self, prompts: list[str]) -> np.ndarray:
        import torch

        inputs = self.processor(text=prompts, return_tensors="pt", padding=True)
        with torch.no_grad():
            return self.model.get_text_features(**inputs).numpy()

    def encode_image(self, images: np.ndarray) -> np.ndarray:
        import torch

        inputs = self.processor(images=list(images), return_tensors="pt")
        with torch.no_grad():
            return self.model.get_image_features(**inputs).numpy()


class ClipEncoder:
    """Pluggable text/image encoder.

    Backend order mirrors the reference: OpenCLIP ViT-B-16 laion2b_s34b_b88k
    (`clip_utils/clip_utils.py:56-95`) when ``open_clip`` is importable —
    required for compatibility with reference-produced ``clip_features``
    sidecars — then HF transformers CLIP as a fallback (different weights;
    cross-scoring against laion2b sidecars will not match).  ``_impl`` is a
    seam for tests: any object with ``encode_text(prompts) -> (P, D)`` and
    ``encode_image(images) -> (B, D)`` (un-normalised) plugs in.
    """

    def __init__(
        self,
        model_name: str = "ViT-B-16",
        pretrained: str = "laion2b_s34b_b88k",
        hf_model_name: str = "openai/clip-vit-base-patch16",
        backend: str = "auto",
        _impl=None,
    ):
        if _impl is not None:
            self.backend = "injected"
            self._impl = _impl
            return
        errors = []
        if backend in ("auto", "open_clip"):
            try:
                self._impl = _OpenClipImpl(model_name, pretrained)
                self.backend = "open_clip"
                return
            except Exception as e:  # no open_clip / no weights
                errors.append(f"open_clip: {e}")
                if backend == "open_clip":
                    raise RuntimeError(
                        "OpenCLIP weights unavailable locally; precompute "
                        "clip_features sidecars offline (get_clip_features "
                        "flow) and query with those embeddings instead"
                    ) from e
        try:
            self._impl = _HfClipImpl(hf_model_name)
            self.backend = "hf"
        except Exception as e:
            errors.append(f"hf: {e}")
            raise RuntimeError(
                "CLIP weights unavailable locally "
                f"({'; '.join(errors)}); precompute clip_features sidecars "
                "offline (get_clip_features flow) and query with those "
                "embeddings instead"
            ) from e

    def encode_text(self, prompts: list[str]) -> np.ndarray:
        out = np.asarray(self._impl.encode_text(prompts), np.float32)
        return out / np.linalg.norm(out, axis=-1, keepdims=True).clip(1e-12)

    def encode_text_with_template(
        self, texts: list[str], template: Optional[list[str]] = None
    ) -> np.ndarray:
        """Template-averaged embeddings (`set_positives_with_template`,
        `clip_utils/clip_utils.py:127-146`)."""
        template = template or DEFAULT_TEMPLATE
        prompts = [t.format(x) for x in texts for t in template]
        emb = self.encode_text(prompts).reshape(len(texts), len(template), -1)
        emb = emb.mean(axis=1)
        return emb / np.linalg.norm(emb, axis=-1, keepdims=True)

    def encode_image(self, images: np.ndarray) -> np.ndarray:
        out = np.asarray(self._impl.encode_image(images), np.float32)
        return out / np.linalg.norm(out, axis=-1, keepdims=True).clip(1e-12)
