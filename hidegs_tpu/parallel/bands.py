"""Space-parallel rendering: split one camera into horizontal bands.

The multi-chip analog of sharding screen tiles (SURVEY §2.4 "shard screen
tiles across chips"): a pinhole camera crop is exactly a principal-point
shift, so each device renders a full-width horizontal band of the image with
an adjusted camera, and the bands concatenate into the original frame. Bands
ride the same view-parallel machinery (each band is just another "view" on
the data axis), which is how a single very large frame spreads across a mesh.
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp

from hidegs_tpu.core.camera_math import CameraParams


def split_camera_bands(cam: CameraParams, n_bands: int) -> List[CameraParams]:
    """Split into `n_bands` equal-height crops (height must divide evenly).

    Cropping rows [r0, r1) of a pinhole image is the same camera with
    cy' = cy - r0 and height' = r1 - r0.
    """
    H = cam.height
    assert H % n_bands == 0, f"height {H} not divisible into {n_bands} bands"
    bh = H // n_bands
    return [
        CameraParams(
            R=cam.R,
            t=cam.t,
            fx=cam.fx,
            fy=cam.fy,
            cx=cam.cx,
            cy=cam.cy - i * bh,
            height=bh,
            width=cam.width,
            # keep the FULL frustum for the EWA tangent clamp
            full_height=cam.frustum_height,
            full_width=cam.frustum_width,
        )
        for i in range(n_bands)
    ]


def assemble_bands(band_images: List[jnp.ndarray]) -> jnp.ndarray:
    """Concatenate per-band (..., bh, W) outputs back into the full frame."""
    return jnp.concatenate(band_images, axis=-2)
