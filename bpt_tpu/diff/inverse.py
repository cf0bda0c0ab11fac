"""Inverse rendering: recover material parameters by pixel-gradient descent.

BASELINE.json config #5: "recover BSDF albedo + light emission via
pixel-gradient descent".  The optimizer renders the scene with current
parameters, compares to a target image, and descends the detached-sampling
gradient (diff/grad.py).  Works single-chip or sharded over a mesh
(parallel/mesh.py pattern; see __graft_entry__.dryrun_multichip for the
multi-device training step).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..integrators.bdpt import BDPTConfig
from ..scene.scene import SceneData
from .grad import apply_params, extract_params, loss_and_grad


@dataclasses.dataclass
class InverseResult:
    params: Dict[str, jnp.ndarray]
    losses: list
    iterations: int


def recover_materials(
    scene: SceneData,
    camera,
    cfg: BDPTConfig,
    target_fb: jnp.ndarray,
    *,
    fields=("diffuse", "emission"),
    init_params: Optional[Dict[str, jnp.ndarray]] = None,
    iterations: int = 50,
    lr: float = 0.5,
    spp_chunk: int = 2,
    seed: int = 0,
    callback: Optional[Callable] = None,
) -> InverseResult:
    """Adam-style (momentum + RMS) descent on the selected material fields.

    target_fb: (W*H, 3) target framebuffer at full cfg.spp scale.
    Non-selected fields stay frozen at the scene's values.
    """
    cam_consts = camera.device_constants()
    base = extract_params(scene)
    params = dict(base)
    if init_params:
        params.update(init_params)

    m = {f: jnp.zeros_like(params[f]) for f in fields}
    v = {f: jnp.zeros_like(params[f]) for f in fields}
    b1, b2, eps = 0.9, 0.999, 1e-8

    key = jax.random.key(seed)
    losses = []
    for it in range(iterations):
        k = jax.random.fold_in(key, it)
        loss, g = loss_and_grad(params, scene, cam_consts, cfg, k,
                                spp_chunk, target_fb)
        losses.append(float(loss))
        for f in fields:
            m[f] = b1 * m[f] + (1 - b1) * g[f]
            v[f] = b2 * v[f] + (1 - b2) * g[f] ** 2
            mh = m[f] / (1 - b1 ** (it + 1))
            vh = v[f] / (1 - b2 ** (it + 1))
            params[f] = jnp.clip(
                params[f] - lr * mh / (jnp.sqrt(vh) + eps), 0.0, None)
        if callback:
            callback(it, float(loss), params)
    return InverseResult(params=params, losses=losses, iterations=iterations)
