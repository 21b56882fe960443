"""Film: progressive accumulation buffer + display conversion + checkpoints.

Replaces the reference's accum/frame buffers and state-reset logic
(reference: optixPathTracer.cpp updateState:371-380, accumulation
raygen.cu:155-169)."""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..utils import image as image_mod


@dataclasses.dataclass
class Film:
    width: int
    height: int
    accum: jnp.ndarray = None   # (W*H, 3)
    subframe: int = 0           # samples accumulated so far

    def __post_init__(self):
        if self.accum is None:
            self.accum = jnp.zeros((self.width * self.height, 3))

    def reset(self):
        """Accumulation reset on camera/resize/algorithm change
        (optixPathTracer.cpp:371-380)."""
        self.accum = jnp.zeros((self.width * self.height, 3))
        self.subframe = 0

    def add(self, sample):
        a = 1.0 / (self.subframe + 1.0)
        self.accum = self.accum + (sample - self.accum) * a
        self.subframe += 1

    def hdr(self) -> np.ndarray:
        """(H, W, 3) float32, row 0 at the image top."""
        return np.asarray(self.accum).reshape(self.height, self.width, 3)[::-1]

    def display(self) -> np.ndarray:
        return image_mod.to_display(jnp.asarray(self.hdr().copy()))

    def save_png(self, path: str):
        image_mod.write_png(path, self.display())

    def save_hdr(self, path: str):
        image_mod.write_hdr_npz(path, self.hdr())
