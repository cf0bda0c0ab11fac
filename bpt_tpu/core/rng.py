"""Counter-based RNG key discipline.

The reference shares one Mersenne-Twister across all threads (with an
acknowledged data race; reference: src/core/renderer.cpp:155-160,
src/core/math.h:63-76).  The TPU build replaces this with JAX's counter-based
threefry keys: every (pixel-sample, depth, purpose) tuple gets its own stream,
so renders are deterministic and reproducible by construction regardless of
device count or sharding (SURVEY.md section 2.7).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Stable purpose tags so streams never collide across call sites.
EMITTER_SELECT = 1
EMITTER_POSITION = 2
EMITTER_FACE = 3
EMITTER_DIRECTION = 4
BSDF_SAMPLE = 5
RR = 6
PIXEL_JITTER = 7
NEE_SELECT = 8
NEE_POSITION = 9
NEE_FACE = 10


def stream(key, *ids):
    """Derive a sub-key by folding in a sequence of integer tags."""
    for i in ids:
        key = jax.random.fold_in(key, i)
    return key


def uniform1(key, shape):
    """U[0,1) floats."""
    return jax.random.uniform(key, shape, dtype=jnp.float32)


def uniform2(key, shape):
    """U[0,1)^2 samples of shape (*shape, 2)."""
    return jax.random.uniform(key, (*shape, 2), dtype=jnp.float32)
