"""Morton (Z-order) codes — ray/splat spatial sorting.

Used for (a) LBVH construction over splat/primitive AABBs (replacing the
reference's embree SAH build, lvp_acceleration_structure.c:1301-1351) and
(b) ray binning for coherence (the TPU analogue of the simulator's ray
coherency engine, vulkan-sim/src/gpgpu-sim/ray_coherency_engine.cc).
"""

from __future__ import annotations

import jax.numpy as jnp


def _expand_bits_3(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so they occupy every 3rd bit."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(points: jnp.ndarray, lo=None, hi=None) -> jnp.ndarray:
    """30-bit 3D Morton codes for [N,3] points (normalized to [lo, hi])."""
    if lo is None:
        lo = jnp.min(points, axis=0)
    if hi is None:
        hi = jnp.max(points, axis=0)
    scale = jnp.where(hi > lo, 1023.0 / (hi - lo), 0.0)
    q = jnp.clip((points - lo) * scale, 0.0, 1023.0).astype(jnp.uint32)
    return (_expand_bits_3(q[:, 0]) << 2 |
            _expand_bits_3(q[:, 1]) << 1 |
            _expand_bits_3(q[:, 2])).astype(jnp.uint32)


def _expand_bits_2(v: jnp.ndarray) -> jnp.ndarray:
    v = v.astype(jnp.uint32)
    v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
    v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & jnp.uint32(0x33333333)
    v = (v | (v << 1)) & jnp.uint32(0x55555555)
    return v


def morton2d(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """32-bit 2D Morton codes for pixel/ray coherence sorting."""
    return (_expand_bits_2(x.astype(jnp.uint32)) << 1 |
            _expand_bits_2(y.astype(jnp.uint32))).astype(jnp.uint32)
