"""Exact lockstep replay: serial-consumption parity with the reference.

The reference's RandomSampler is ONE serial PCG32 per 16x16 tile
(src/samplers/random.cpp:68), never reseeded between pixels or samples
(Sampler::SetSampleNumber only moves an index, src/core/sampler.cpp:79),
so the stream position of every draw depends on how many draws every
preceding sample in the tile consumed -- and pbrt consumes draws
*conditionally* (consumption rules: core/lockstep.py docstring).

This driver closes that loop: lanes are TILES, and the replay walks
(pixel-in-tile, sample) in the reference's serial order --- pixels
row-major over the cropped tile bounds, each pixel's samples
back-to-back (statpath.cpp:255-294).  A per-tile stream cursor rides
the bounce-scan carry (integrator._bounce_step, MODE_LOCKSTEP_EXACT)
and advances exactly as the reference's control flow would, so every
draw site reads the value pbrt's sampler would produce at that stream
position -- for ALL samples, not just up to the first early
termination.

This is a parity instrument, not a fast path: tiles trace one sample
at a time (max_px * spp sequential bounce scans over T parallel
lanes).  Use it at parity resolutions; production renders use the
counter-based streams (core/rng.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lockstep as LS
from ..core import rng as crng
from . import camera as CAM
from .integrator import IntegratorConfig, _bounce_step, _scrub_ls, \
    _zero_path_carry


class ExactReplay(NamedTuple):
    """Per-(pixel, sample) replay record, host arrays.

    cursor_start[p, s]: the tile-stream position at which sample s of
    pixel p began consuming (its pFilm.x position) -- THE positional-
    parity observable.  u_cam[p, s]: the (pFilm jitter) values actually
    consumed there.  radiance[p, s]: the sample's film estimate.
    consumed[p, s] = cursor_start[p, s+1] - cursor_start[p, s] within
    the tile-serial order (not per-pixel!)."""
    cursor_start: np.ndarray  # [P, S] int32
    cursor_end: np.ndarray  # [P, S] int32
    u_cam: np.ndarray  # [P, S, 2] f32
    radiance: np.ndarray  # [P, S, 3] f32 (bounce 0 == the film estimate)
    film: np.ndarray  # [P, 3] f32 mean over samples
    # Per-tracked-bounce Ls (statpath.cpp:761-958 Ls/betas semantics):
    # radiance_b[:, :, k] is the radiance arriving from bounce k onward,
    # the t0-bK buffer's per-sample input.  [P, S, NL, 3].
    radiance_b: np.ndarray = None


def render_exact(scene, bvh, dist, cfg: IntegratorConfig, cam,
                 width: int, height: int, spp: int,
                 base_seed: int = 0, albedo_luts=None) -> ExactReplay:
    """Serial-order replay of one render iteration at `spp` samples.

    cfg.sampler_mode must be MODE_LOCKSTEP_EXACT.  Restrictions match
    the reference configs this mode diffs against: no media
    (cfg.volumetric unsupported), >= 1 light, uniform/power light
    strategy (see core/lockstep.py docstring for why).
    """
    assert cfg.sampler_mode == crng.MODE_LOCKSTEP_EXACT
    stream, pixel_of_tile, n_px = LS.make_streams(
        width, height, spp, cfg.max_depth, base_seed)
    T, max_px = pixel_of_tile.shape
    rows = jnp.asarray(stream)  # [T, L]
    pot = jnp.asarray(pixel_of_tile)
    npx = jnp.asarray(n_px)
    W = width

    NL, NB = cfg.n_ls, max(cfg.nb_mis, 1)
    n_steps = cfg.max_depth + 1 + cfg.null_extra
    # Feedback inputs (ACRR/SMIS) neutral: parity runs are iteration 1.
    avg_ls = jnp.ones((T, NL))
    win_b = jnp.zeros((T, NB))
    win_l = jnp.zeros((T, NB))
    fb = jnp.zeros((), bool)
    dummy_keys = jnp.zeros((T, 2), jnp.uint32)

    def one_sample(cursor, j):
        """Trace tile-serial sample j (pixel i = j // spp) on all tiles."""
        i = j // spp
        pid = jnp.take(pot, i, axis=1)  # [T]
        valid = (i < npx) & (pid >= 0)
        pid_safe = jnp.maximum(pid, 0)
        cur_start = cursor

        u_cam = jnp.stack(
            [jnp.take_along_axis(rows, (cursor + k)[:, None], 1)[:, 0]
             for k in (0, 1)], axis=-1)
        px = (pid_safe % W).astype(jnp.float32)
        py = (pid_safe // W).astype(jnp.float32)
        p_film = jnp.stack([px, py], axis=-1) + u_cam
        o, d = CAM.generate_rays(cam, p_film)

        carry = dict(o=o, d=d, **_zero_path_carry(T, NL, NB))
        carry["active"] = valid
        carry["cursor"] = cursor + LS.D_CAMERA  # camera: 5 draws, always

        def body(c, step):
            return _bounce_step(scene, bvh, dist, cfg, c, step,
                                dummy_keys, avg_ls, win_b, win_l, fb,
                                albedo_luts, rows), None

        carry, _ = jax.lax.scan(body, carry, jnp.arange(n_steps))
        new_cursor = jnp.where(valid, carry["cursor"], cursor)
        ls_all = _scrub_ls(carry["ls"])  # [T, NL, 3]
        rec = (cur_start, new_cursor, u_cam,
               jnp.where(valid[:, None, None], ls_all, 0.0), pid, valid)
        return new_cursor, rec

    cursor0 = jnp.zeros((T,), jnp.int32)
    _, recs = jax.lax.scan(one_sample, cursor0,
                           jnp.arange(max_px * spp, dtype=jnp.int32))
    cs, ce, uc, ls, pid, valid = (np.asarray(r) for r in recs)  # [J, T, ...]

    P = width * height
    out_cs = np.zeros((P, spp), np.int32)
    out_ce = np.zeros((P, spp), np.int32)
    out_uc = np.zeros((P, spp, 2), np.float32)
    out_lb = np.zeros((P, spp, NL, 3), np.float32)
    J = max_px * spp
    for j in range(J):
        s = j % spp
        m = valid[j]
        p = pid[j][m]
        out_cs[p, s] = cs[j][m]
        out_ce[p, s] = ce[j][m]
        out_uc[p, s] = uc[j][m]
        out_lb[p, s] = ls[j][m]
    out_ls = out_lb[:, :, 0]
    return ExactReplay(
        cursor_start=out_cs, cursor_end=out_ce, u_cam=out_uc,
        radiance=out_ls, film=out_ls.mean(axis=1), radiance_b=out_lb,
    )


def moments_from_samples(ls: np.ndarray, bc_lambda: float | None = 0.5):
    """Per-pixel (n, mean, m2, m3) over the sample axis in the
    reference's exact accumulation order and precision.

    Reproduces StatTile::AddStatSampleM3 (estimator.h:188-205): Meng's
    single-pass update in f32, samples applied in their in-pixel order
    (pbrt accumulates each pixel's spp samples back-to-back).  With
    bc_lambda set, samples pass through the Box-Cox transform first
    (estimator.h:135-145, the Radiance config's transform=true path);
    None skips it (the film-mean/film-m2 untransformed track).

    ls: [P, S, C] per-sample values (ExactReplay.radiance).
    Returns (n [P], mean [P, C], m2 [P, C], m3 [P, C]) float32.
    """
    P, S, C = ls.shape
    x = ls.astype(np.float32)
    if bc_lambda is not None:
        lam = np.float32(bc_lambda)
        x = (np.power(np.maximum(x, 0.0), lam, dtype=np.float32)
             - np.float32(1.0)) / lam
    n = np.zeros((P,), np.float32)
    mean = np.zeros((P, C), np.float32)
    m2 = np.zeros((P, C), np.float32)
    m3 = np.zeros((P, C), np.float32)
    for s in range(S):
        v = x[:, s]
        n += 1
        d = v - mean
        d2 = d * d
        dN = d / n[:, None]
        dN2 = dN * dN
        mean += dN
        m2 += d * (d - dN)
        # estimator.h:204: m3 reads the ALREADY-UPDATED m2.
        m3 += -np.float32(3.0) * dN * m2 + d * (d2 - dN2)
    return n, mean, m2, m3
