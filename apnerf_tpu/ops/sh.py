"""Spherical-harmonics direction encoding (degree 4 → 16 coefficients).

Replacement for the reference's tcnn ``SphericalHarmonics`` encoding
(``perception/models/radiance_fields/ngp.py:107-121``). tcnn feeds
directions remapped to [0,1] (``ngp.py:205``) and internally maps back to
[-1,1]; here we take unit directions directly — same information, one less
affine round-trip.

Coefficients follow the standard real SH basis (as in tiny-cuda-nn's
closed-form polynomial evaluation), pure jnp — it fuses into the
surrounding network on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def sh_encode_deg4(d: jnp.ndarray) -> jnp.ndarray:
    """Real spherical harmonics up to degree 4 (l=0..3), 16 outputs.

    Args:
      d: [..., 3] unit directions.
    Returns:
      [..., 16]
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z

    out = [
        jnp.full_like(x, 0.28209479177387814),  # l=0
        -0.48860251190291987 * y,  # l=1
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,  # l=2
        -1.0925484305920792 * yz,
        0.94617469575755997 * zz - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * (xx - yy),
        0.59004358992664352 * y * (-3.0 * xx + yy),  # l=3
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * zz),
        0.3731763325901154 * z * (5.0 * zz - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * zz),
        1.4453057213202769 * z * (xx - yy),
        0.59004358992664352 * x * (-xx + 3.0 * yy),
    ]
    return jnp.stack(out, axis=-1)
