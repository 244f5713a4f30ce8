"""Offline camera paths — the headless analogue of the reference's
interactive ModelViewController (RayTracingInVulkan/src/Vulkan/
ModelViewController.cpp: orbit state from mouse deltas, WASD fly with
per-frame UpdateCamera). gsrt renders headlessly, so paths are generated
up front and frames rendered in sequence (feeding the temporal-reuse
serving loop, gsrt.serving).

All generators return a list of Camera objects sharing intrinsics.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

from gsrt.core.types import Camera, look_at, make_camera


def orbit_path(target, radius: float, n_frames: int, *,
               height: float = 0.0, fov_y_deg: float = 40.0,
               width: int = 1920, height_px: int = 1080,
               degrees: float = 360.0, start_deg: float = 0.0,
               up=(0.0, 1.0, 0.0)) -> list[Camera]:
    """Circular orbit around `target` at `radius`, camera elevated by
    `height` above the target plane — the ModelViewController orbit
    (mouse-drag yaw) swept uniformly over `degrees`."""
    target = np.asarray(target, np.float64)
    cams = []
    # full 360 loops space frames EXCLUSIVE of the endpoint (frame 0 and
    # frame n would coincide); partial arcs must REACH the end angle
    full_loop = abs(abs(degrees) - 360.0) < 1e-9
    denom = n_frames if full_loop else max(n_frames - 1, 1)
    for i in range(n_frames):
        a = math.radians(start_deg + degrees * i / max(denom, 1))
        eye = target + np.array([radius * math.cos(a), height,
                                 radius * math.sin(a)])
        cams.append(make_camera(look_at(eye, target, up), fov_y_deg,
                                width, height_px))
    return cams


def dolly_path(eye_from, eye_to, target, n_frames: int, *,
               fov_y_deg: float = 40.0, width: int = 1920,
               height_px: int = 1080, up=(0.0, 1.0, 0.0)) -> list[Camera]:
    """Linear fly from eye_from to eye_to, always looking at `target`
    (the WASD forward-fly of ModelViewController, smoothed)."""
    eye_from = np.asarray(eye_from, np.float64)
    eye_to = np.asarray(eye_to, np.float64)
    cams = []
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        eye = eye_from * (1.0 - s) + eye_to * s
        cams.append(make_camera(look_at(eye, target, up), fov_y_deg,
                                width, height_px))
    return cams


def interpolate_path(keyframes: Sequence[Camera], frames_per_seg: int,
                     up=(0.0, 1.0, 0.0)) -> list[Camera]:
    """Piecewise-linear interpolation of eye positions between keyframe
    cameras (orientation re-derived by looking at the blended forward
    target). Keyframes must share intrinsics, and `up` should match the
    up vector the keyframes were built with — intermediate frames derive
    roll from it, so a mismatch snaps orientation at the appended final
    keyframe."""
    if len(keyframes) < 2:
        return list(keyframes)
    k0 = keyframes[0]
    fov = math.degrees(2.0 * math.atan(0.5 * k0.height / float(k0.fy)))
    cams = []
    for a, b in zip(keyframes[:-1], keyframes[1:]):
        pa = np.asarray(a.position, np.float64)
        pb = np.asarray(b.position, np.float64)
        # forward = camera-space +z in world: third ROW of view rotation
        fa = np.asarray(a.view[2, :3], np.float64)
        fb = np.asarray(b.view[2, :3], np.float64)
        for i in range(frames_per_seg):
            s = i / frames_per_seg
            eye = pa * (1 - s) + pb * s
            fwd = fa * (1 - s) + fb * s
            n = np.linalg.norm(fwd)
            fwd = fwd / (n if n > 1e-9 else 1.0)
            cams.append(make_camera(look_at(eye, eye + fwd, up), fov,
                                    k0.width, k0.height))
    cams.append(keyframes[-1])
    return cams
