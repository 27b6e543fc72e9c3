"""CLIP-guided training loss (equivalent of reference nerf/clip_utils.py:11
CLIPLoss + its trainer hook nerf/utils.py:413-417,454: renders under random
poses are pulled toward a text prompt with loss = -cos(CLIP(img), CLIP(text)),
differentiable through the image — the CLIP weights stay frozen).

TPU-native integration (train/trainer.py clip_step): the render runs as a
jitted JAX forward, the image crosses to host torch for the CLIP loss AND
its d(loss)/d(image) (torch autograd, loss_and_grad below), and the gradient
re-enters JAX as the cotangent of a jitted render-vjp — no host callbacks
inside jit, which keeps the path robust over the tunneled TPU.

Construction modes:
  model_path   — local transformers CLIP checkpoint directory (this image
                 has no network egress, so no implicit downloads happen).
  random_init  — a small randomly-initialized CLIPModel built from a config
                 (no weights needed): the full preprocessing/encode/loss/
                 gradient path executes for tests, smoke runs and API parity.
                 Guidance DIRECTION is meaningless with random weights; the
                 math and gradients are exactly the production path.
"""

from __future__ import annotations

import numpy as np

# CLIP pixel normalization (reference nerf/clip_utils.py:25-26)
_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class CLIPLoss:
    def __init__(self, text: str = None, model_path: str = None,
                 random_init: bool = False):
        self.available = False
        self.text = text
        self.text_feat = None
        self._tok = None
        if model_path is None and not random_init:
            return
        try:
            import torch
            from transformers import CLIPModel

            self.torch = torch
            if random_init:
                from transformers import CLIPConfig

                cfg = CLIPConfig(
                    projection_dim=64,
                    text_config={"hidden_size": 64, "intermediate_size": 128,
                                 "num_hidden_layers": 2,
                                 "num_attention_heads": 2,
                                 "max_position_embeddings": 77,
                                 "vocab_size": 49408},
                    vision_config={"hidden_size": 64,
                                   "intermediate_size": 128,
                                   "num_hidden_layers": 2,
                                   "num_attention_heads": 2,
                                   "image_size": 64, "patch_size": 16})
                self.model = CLIPModel(cfg)
            else:
                self.model = CLIPModel.from_pretrained(model_path)
                try:
                    from transformers import CLIPTokenizerFast

                    self._tok = CLIPTokenizerFast.from_pretrained(model_path)
                except Exception:
                    self._tok = None
            self.model.eval()
            for p in self.model.parameters():
                p.requires_grad_(False)
            self.image_size = self.model.config.vision_config.image_size
            if text is not None:
                self.prepare_text(text)
            self.available = True
        except Exception as e:  # pragma: no cover - import/shape errors
            print(f"[clip] unavailable: {e}")

    # ------------------------------------------------------------------ text

    def _tokenize(self, text: str):
        """Tokenize with the checkpoint's tokenizer when present; otherwise a
        deterministic word-hash fallback (random_init mode has no vocab files
        — the ids only need to be a stable function of the text)."""
        torch = self.torch
        if self._tok is not None:
            return self._tok([text], return_tensors="pt", padding=True,
                             truncation=True)["input_ids"]
        vocab = self.model.config.text_config.vocab_size
        import hashlib

        ids = [49406]  # startoftext
        for w in text.lower().split()[:30]:
            h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
            ids.append(h % (vocab - 3) + 1)
        ids.append(49407)  # endoftext
        return torch.tensor([ids], dtype=torch.long)

    def prepare_text(self, text: str):
        torch = self.torch
        with torch.no_grad():
            feat = self.model.get_text_features(input_ids=self._tokenize(text))
            self.text_feat = feat / feat.norm(dim=-1, keepdim=True)
        self.text = text

    # ----------------------------------------------------------------- image

    def _preprocess(self, img):
        """Differentiable resize + CLIP normalization ([H, W, 3] float tensor
        in [0, 1] -> [1, 3, S, S]); torchvision's PIL transform pipeline is
        not differentiable, so the resize is bilinear interpolation
        (reference uses T.Resize on tensors, same math)."""
        torch = self.torch
        x = img.permute(2, 0, 1)[None]
        s = self.image_size
        x = torch.nn.functional.interpolate(
            x, size=(s, s), mode="bilinear", align_corners=False,
            antialias=True)
        mean = torch.tensor(_CLIP_MEAN, dtype=x.dtype).view(1, 3, 1, 1)
        std = torch.tensor(_CLIP_STD, dtype=x.dtype).view(1, 3, 1, 1)
        return (x - mean) / std

    def loss_torch(self, img):
        """-cos(CLIP(img), CLIP(text)) on a torch image tensor [H, W, 3];
        differentiable w.r.t. the image (reference clip_utils.py:42-58)."""
        feat = self.model.get_image_features(pixel_values=self._preprocess(img))
        feat = feat / feat.norm(dim=-1, keepdim=True)
        return -(feat * self.text_feat).sum(-1).mean()

    def __call__(self, image: np.ndarray) -> float:
        """image [H, W, 3] float in [0, 1] -> loss (no gradient)."""
        self._require()
        torch = self.torch
        with torch.no_grad():
            return float(self.loss_torch(torch.from_numpy(
                np.asarray(image, np.float32))))

    def loss_and_grad(self, image: np.ndarray):
        """-> (loss: float, d(loss)/d(image): [H, W, 3] float32) via torch
        autograd — the cotangent the trainer feeds back into the jitted
        render-vjp."""
        self._require()
        torch = self.torch
        x = torch.from_numpy(np.asarray(image, np.float32)).requires_grad_(True)
        loss = self.loss_torch(x)
        loss.backward()
        return float(loss.detach()), x.grad.detach().numpy()

    def _require(self):
        if not self.available or self.text_feat is None:
            raise RuntimeError(
                "CLIPLoss needs a prepared model+text: pass model_path with "
                "a local CLIP checkpoint (no network egress here), or "
                "random_init=True for weight-free execution")
