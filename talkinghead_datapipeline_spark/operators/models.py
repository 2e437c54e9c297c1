"""Deterministic stand-in models for the inference tier (SURVEY §7 phase 5).

The reference's models (wav2vec2 HF checkpoint, SFD/FAN face models, EMOCA
ResNet encoders, FLAME decoder, PyTorch3D renderer) need GPU weights that are
out of scope for the correctness harness. Each stand-in below preserves the
node's *data contract* — input/output schema, shapes, batching — while being
a pure deterministic function, so pipelines are testable end-to-end and the
real model drops in by swapping the factory.

``FlameDecoderStub`` is special: the real FLAME decode (dpl/flame/flame.py:
241-312) is pure linear algebra (blendshapes + LBS), so the stub implements
an honest miniature of it — fixed random basis matrices, linear decode —
rather than a hash fake.

Media decode (image/audio/video) is NOT implemented here — the codec
libraries are not in the runtime. ``decode_image``/``decode_audio`` raise
NotImplementedError behind a feature gate; the surrounding Spark plumbing
(binary columns + typed metadata structs) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np


def _seeded_rng(name: str) -> np.random.Generator:
    seed = int.from_bytes(hashlib.md5(name.encode()).digest()[:8], "little")
    return np.random.default_rng(seed)


class Wav2vecStub:
    """N6 stand-in: waveform (float array) → (T, dim) features @ feature_fps.

    Mirrors the contract of dpl/wav2vec/inference.py:64-92: output length
    ``int(len(wav)/sr * fps - 0.25)``, plus the volume envelope
    (mean |amp| per floor(sr/fps)-sample block, inference.py:94-106).
    """

    def __init__(self, dim: int = 8, sr: int = 16000, fps: int = 50):
        self.dim, self.sr, self.fps = dim, sr, fps
        self._proj = _seeded_rng("wav2vec_proj").normal(size=(1, dim))

    def features(self, wav: np.ndarray) -> np.ndarray:
        n_frames = max(int(len(wav) / self.sr * self.fps - 0.25), 0)
        spf = self.sr // self.fps
        out = np.zeros((n_frames, self.dim))
        for t in range(n_frames):
            block = wav[t * spf : (t + 1) * spf]
            out[t] = block.mean() * self._proj[0] if len(block) else 0.0
        return out

    def volume(self, wav: np.ndarray) -> np.ndarray:
        spf = self.sr // self.fps
        n = len(wav) // spf
        return np.abs(wav[: n * spf]).reshape(n, spf).mean(axis=1)


class EmocaEncoderStub:
    """N14 stand-in: crop bytes → 236-dim code split as the reference does
    (dpl/emoca/inference.py:95-105): shape 100 | tex 50 | exp 50 | pose 6 |
    cam 3 | light 27 (reshaped (9,3) downstream)."""

    SPLITS = {"shape": 100, "tex": 50, "exp": 50, "pose": 6, "cam": 3, "light": 27}

    def encode(self, crop_bytes: bytes) -> dict[str, np.ndarray]:
        digest = hashlib.md5(crop_bytes).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        code = rng.normal(size=236)
        out, off = {}, 0
        for key, width in self.SPLITS.items():
            out[key] = code[off : off + width]
            off += width
        return out


class FlameDecoderStub:
    """N16 miniature: linear blend-shape decode, honest linear algebra.

    verts = template + S @ shape + E @ exp  (shape (V,3));
    landmarks = fixed vertex subset (the barycentric-extraction analog,
    dpl/flame/lbs.py:107-146 simplified to vertex picks).
    """

    def __init__(self, n_verts: int = 64, n_shape: int = 8, n_exp: int = 8, n_lmk: int = 12):
        rng = _seeded_rng("flame_basis")
        self.template = rng.normal(size=(n_verts, 3))
        self.shape_dirs = rng.normal(size=(n_verts, 3, n_shape)) * 0.1
        self.exp_dirs = rng.normal(size=(n_verts, 3, n_exp)) * 0.1
        self.lmk_idx = rng.choice(n_verts, size=n_lmk, replace=False)

    def decode(self, shape: np.ndarray, exp: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        verts = (
            self.template
            + self.shape_dirs @ shape[: self.shape_dirs.shape[2]]
            + self.exp_dirs @ exp[: self.exp_dirs.shape[2]]
        )
        return verts, verts[self.lmk_idx]


class RendererStub:
    """N17 stand-in: verts + cam → deterministic pseudo-image bytes with the
    real sink contract (binary payload + width/height metadata)."""

    def __init__(self, size_hw: tuple[int, int] = (16, 16)):
        self.size_hw = size_hw

    def render(self, verts: np.ndarray, cam: np.ndarray) -> bytes:
        h = hashlib.md5(verts.tobytes() + cam.tobytes()).digest()
        n = self.size_hw[0] * self.size_hw[1]
        return (h * (n // len(h) + 1))[:n]


# Media decode feature gates ------------------------------------------------

def decode_image(data: bytes) -> np.ndarray:
    """Decode an image binary column to HWC uint8 (S14 analog).

    STUB: no codec library (PIL/cv2) in this runtime. The Spark-side
    contract (BinaryType column in, array shape out) is exercised in tests
    via ``fake_decode_image``.
    """
    raise NotImplementedError("image codecs not available in this runtime")


def fake_decode_image(data: bytes, size_hw: tuple[int, int] = (8, 8)) -> np.ndarray:
    """Deterministic decode stand-in: bytes → tiled uint8 HWC array."""
    h, w = size_hw
    digest = hashlib.md5(data).digest()
    flat = np.frombuffer((digest * (h * w * 3 // len(digest) + 1))[: h * w * 3], dtype=np.uint8)
    return flat.reshape(h, w, 3)
