"""Perspective / orthographic camera ray generation.

Mirrors src/cameras/perspective.cpp + the raster->screen->camera
transform chain built in src/core/camera.cpp (ProjectiveCamera).  All
per-ray work is vectorized over the film-sample batch; the transform
chain is precomputed on host into a single raster->camera matrix.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as cm

Array = jax.Array


class CameraParams(NamedTuple):
    raster_to_camera: Array  # [4,4]
    camera_to_world: Array  # [4,4]
    dx_camera: Array  # [3] differential basis (for MIPmap rays)
    dy_camera: Array  # [3]
    orthographic: bool
    environment: bool = False
    inv_res: Any = None  # [2] 1/xres, 1/yres (environment mapping)
    # Realistic lens system (render/realistic.py LensSystem); non-None
    # routes generate_rays_weighted through the element trace.
    lens: Any = None
    res: Any = None  # [2] xres, yres (realistic raster mapping)


def _screen_to_raster(screen, xres, yres):
    return (
        cm.scale_mat([xres, yres, 1.0]).astype(np.float64)
        @ cm.scale_mat(
            [1.0 / (screen[1] - screen[0]),
             1.0 / (screen[2] - screen[3]), 1.0]
        ).astype(np.float64)
        @ cm.translate([-screen[0], -screen[3], 0.0]).astype(np.float64)
    )


def _default_screen(xres, yres, screen_window):
    frame = xres / yres
    if screen_window is not None:
        return np.asarray(screen_window, np.float64)
    if frame > 1.0:
        return np.array([-frame, frame, -1.0, 1.0])
    return np.array([-1.0, 1.0, -1.0 / frame, 1.0 / frame])


def make_orthographic(camera_to_world: np.ndarray, xres: int, yres: int,
                      screen_window: np.ndarray | None = None
                      ) -> CameraParams:
    """src/cameras/orthographic.cpp: parallel rays along +z."""
    screen = _default_screen(xres, yres, screen_window)
    # camera_to_screen = Orthographic(0,1) = identity on x,y (z is only
    # a depth remap pbrt never uses for ray generation).
    raster_to_camera = np.linalg.inv(
        _screen_to_raster(screen, xres, yres)
    ).astype(np.float32)
    p0 = cm.np_transform_point(raster_to_camera, np.zeros(3, np.float32))
    px = cm.np_transform_point(raster_to_camera,
                               np.array([1, 0, 0], np.float32))
    py = cm.np_transform_point(raster_to_camera,
                               np.array([0, 1, 0], np.float32))
    return CameraParams(
        raster_to_camera=jnp.asarray(raster_to_camera),
        camera_to_world=jnp.asarray(camera_to_world.astype(np.float32)),
        dx_camera=jnp.asarray((px - p0).astype(np.float32)),
        dy_camera=jnp.asarray((py - p0).astype(np.float32)),
        orthographic=True,
    )


def make_environment(camera_to_world: np.ndarray, xres: int, yres: int
                     ) -> CameraParams:
    """src/cameras/environment.cpp: latitude-longitude ray directions."""
    return CameraParams(
        raster_to_camera=jnp.eye(4),
        camera_to_world=jnp.asarray(camera_to_world.astype(np.float32)),
        dx_camera=jnp.zeros(3),
        dy_camera=jnp.zeros(3),
        orthographic=False,
        environment=True,
        inv_res=jnp.asarray([1.0 / xres, 1.0 / yres], jnp.float32),
    )


def make_perspective(camera_to_world: np.ndarray, fov_deg: float,
                     xres: int, yres: int,
                     screen_window: np.ndarray | None = None) -> CameraParams:
    frame = xres / yres
    if screen_window is None:
        if frame > 1.0:
            screen = np.array([-frame, frame, -1.0, 1.0])
        else:
            screen = np.array([-1.0, 1.0, -1.0 / frame, 1.0 / frame])
    else:
        screen = np.asarray(screen_window, np.float64)

    camera_to_screen = cm.perspective(fov_deg, 1e-2, 1000.0).astype(np.float64)
    # Screen -> raster (camera.h ProjectiveCamera ctor).
    screen_to_raster = (
        cm.scale_mat([xres, yres, 1.0]).astype(np.float64)
        @ cm.scale_mat(
            [1.0 / (screen[1] - screen[0]), 1.0 / (screen[2] - screen[3]), 1.0]
        ).astype(np.float64)
        @ cm.translate([-screen[0], -screen[3], 0.0]).astype(np.float64)
    )
    raster_to_screen = np.linalg.inv(screen_to_raster)
    raster_to_camera = (
        np.linalg.inv(camera_to_screen) @ raster_to_screen
    ).astype(np.float32)

    # Differential basis: camera-space offsets of one-pixel raster steps.
    p0 = cm.np_transform_point(raster_to_camera, np.zeros(3, np.float32))
    px = cm.np_transform_point(raster_to_camera, np.array([1, 0, 0], np.float32))
    py = cm.np_transform_point(raster_to_camera, np.array([0, 1, 0], np.float32))

    return CameraParams(
        raster_to_camera=jnp.asarray(raster_to_camera),
        camera_to_world=jnp.asarray(camera_to_world.astype(np.float32)),
        dx_camera=jnp.asarray((px - p0).astype(np.float32)),
        dy_camera=jnp.asarray((py - p0).astype(np.float32)),
        orthographic=False,
    )


def generate_rays(cam: CameraParams, p_film: Array) -> tuple[Array, Array]:
    """p_film: [R,2] raster coords (continuous). Returns (o, d) world.

    Realistic cameras need a lens sample and carry a per-ray weight;
    this wrapper uses the pupil-rect centre and drops the weight (the
    probe/ray-cone call sites).  Weighted paths use
    generate_rays_weighted."""
    if cam.lens is not None:
        o, d, _ = generate_rays_weighted(
            cam, p_film, jnp.full(p_film.shape, 0.5))
        return o, d
    if cam.environment:
        # environment.cpp:GenerateRay: theta over rows, phi over cols.
        theta = jnp.pi * p_film[..., 1] * cam.inv_res[1]
        phi = 2.0 * jnp.pi * p_film[..., 0] * cam.inv_res[0]
        st, ct = jnp.sin(theta), jnp.cos(theta)
        d_cam = jnp.stack([st * jnp.cos(phi), ct, st * jnp.sin(phi)], -1)
        o_cam = jnp.zeros_like(d_cam)
        o = cm.transform_point(cam.camera_to_world, o_cam)
        d = cm.normalize(cm.transform_vector(cam.camera_to_world, d_cam))
        return o, d
    p_raster = jnp.concatenate(
        [p_film, jnp.zeros(p_film.shape[:-1] + (1,))], axis=-1
    )
    p_cam = cm.transform_point(cam.raster_to_camera, p_raster)
    if cam.orthographic:
        o_cam = p_cam
        d_cam = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), p_cam.shape)
    else:
        o_cam = jnp.zeros_like(p_cam)
        d_cam = cm.normalize(p_cam)
    o = cm.transform_point(cam.camera_to_world, o_cam)
    d = cm.normalize(cm.transform_vector(cam.camera_to_world, d_cam))
    return o, d


def generate_rays_weighted(cam: CameraParams, p_film: Array,
                           u_lens: Array) -> tuple[Array, Array, Array]:
    """(o, d, weight): realistic cameras trace the lens system with the
    given pupil sample (realistic.cpp:GenerateRay); other models return
    weight 1 (their We is folded into the projective mapping)."""
    if cam.lens is not None:
        from .realistic import generate_rays_realistic

        return generate_rays_realistic(
            cam.lens, cam.camera_to_world,
            float(cam.res[0]), float(cam.res[1]), p_film, u_lens)
    o, d = generate_rays(cam, p_film)
    return o, d, jnp.ones(p_film.shape[:-1])


def make_realistic(camera_to_world: np.ndarray, lens_rows, xres: int,
                   yres: int, aperture_diameter_mm: float,
                   focus_distance: float, film_diag_mm: float
                   ) -> CameraParams:
    """Camera "realistic" (src/cameras/realistic.cpp): lens prescription
    + thick-lens autofocus + exit-pupil tables (render/realistic.py)."""
    from .realistic import make_lens_system

    lens = make_lens_system(
        np.asarray(lens_rows, np.float64), aperture_diameter_mm,
        focus_distance, film_diag_mm * 1e-3, xres, yres)
    eye = np.eye(4, dtype=np.float32)
    return CameraParams(
        raster_to_camera=jnp.asarray(eye),
        camera_to_world=jnp.asarray(
            np.asarray(camera_to_world, np.float32)),
        dx_camera=jnp.zeros(3),
        dy_camera=jnp.zeros(3),
        orthographic=False,
        lens=lens,
        # Static tuple (not an array): generate_rays_weighted reads the
        # resolution as Python floats at trace time, and the camera
        # rides through jit as an argument pytree (driver.
        # split_device_args) where array leaves become tracers.
        res=(float(xres), float(yres)),
    )
