"""CLIP-guided training loss (equivalent of reference nerf/clip_utils.py:11,
CLIPLoss: renders under random poses are pulled toward a text prompt).

Gated: requires the `transformers` CLIP weights locally (this image has the
transformers library but no downloaded checkpoints and no network egress, so
construction raises with guidance unless a local model path is provided)."""

from __future__ import annotations

import numpy as np


class CLIPLoss:
    def __init__(self, text: str, model_path: str = None):
        self.available = False
        self.text = text
        if model_path is None:
            return
        try:  # pragma: no cover - needs local CLIP weights
            import torch
            from transformers import CLIPModel, CLIPProcessor

            self.model = CLIPModel.from_pretrained(model_path)
            self.processor = CLIPProcessor.from_pretrained(model_path)
            self.torch = torch
            with torch.no_grad():
                tok = self.processor(text=[text], return_tensors="pt", padding=True)
                self.text_feat = self.model.get_text_features(**tok)
                self.text_feat = self.text_feat / self.text_feat.norm(dim=-1,
                                                                      keepdim=True)
            self.available = True
        except Exception as e:  # pragma: no cover
            print(f"[clip] unavailable: {e}")

    def __call__(self, image: np.ndarray) -> float:  # pragma: no cover
        """image [H, W, 3] in [0,1] -> negative cosine similarity (loss)."""
        if not self.available:
            raise RuntimeError(
                "CLIPLoss needs local CLIP weights (pass model_path); no "
                "network egress in this environment")
        torch = self.torch
        with torch.no_grad():
            px = self.processor(images=[(image * 255).astype(np.uint8)],
                                return_tensors="pt")
            feat = self.model.get_image_features(**px)
            feat = feat / feat.norm(dim=-1, keepdim=True)
            return float(1.0 - (feat * self.text_feat).sum())
