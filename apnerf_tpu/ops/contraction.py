"""Unbounded-scene contraction (mip-NeRF 360 style).

Capability parity with ``contract_to_unisphere``
(``perception/models/radiance_fields/ngp.py:42-66``): normalize into the
aabb as [-1, 1], contract magnitudes > 1 to (2 - 1/|x|) * x/|x|, then remap
to [0, 1]. Branch-free jnp (the reference uses boolean-mask assignment).
"""

from __future__ import annotations

import jax.numpy as jnp


def contract_to_unisphere(x: jnp.ndarray, aabb: jnp.ndarray, eps: float = 1e-6):
    aabb_min, aabb_max = aabb[:3], aabb[3:]
    x = (x - aabb_min) / (aabb_max - aabb_min)
    x = x * 2.0 - 1.0
    mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    safe_mag = jnp.maximum(mag, eps)
    contracted = (2.0 - 1.0 / safe_mag) * (x / safe_mag)
    x = jnp.where(mag > 1.0, contracted, x)
    return x / 4.0 + 0.5
