"""Checkpoint / resume for progressive rendering.

The reference saves the framebuffer once at the end and loses everything on
a crash (reference: src/core/integrator.cpp:22-30; SURVEY.md section 5).
Here renders accumulate in spp chunks and checkpoint (accumulation buffer +
RNG seed + spp-done count) after every chunk, enabling restart and
progressive preview.
"""
from __future__ import annotations

import os

import numpy as np


def save_checkpoint(path: str, fb: np.ndarray, seed: int, spp_done: int,
                    spp_total: int) -> None:
    tmp = path + ".tmp"
    np.savez(tmp if tmp.endswith(".npz") else tmp,
             fb=np.asarray(fb), seed=seed, spp_done=spp_done,
             spp_total=spp_total)
    # np.savez appends .npz when missing.
    src = tmp if os.path.exists(tmp) else tmp + ".npz"
    os.replace(src, path)


def load_checkpoint(path: str):
    """Returns (fb, seed, spp_done, spp_total) or None."""
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return (z["fb"], int(z["seed"]), int(z["spp_done"]),
                int(z["spp_total"]))
