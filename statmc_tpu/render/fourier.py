"""FourierBSDF: tabulated BSDF reader + TPU evaluation.

Replaces the reference's FourierBSDFTable machinery
(src/materials/fourier.cpp:116-206 Read, src/core/reflection.cpp:322-377
FourierBSDF::f, src/core/interpolation.cpp:61-103 CatmullRomWeights,
:348-361 Fourier) with a TPU shape:

* the on-disk SCATFUN v1 format is parsed bit-exactly (same header,
  same subset restrictions: flags==1, 1 or 3 channels, nBases==1);
* the variable-length per-(muI, muO) coefficient lists are PADDED into
  one dense [nMu, nMu, nCh, M] block so a ray batch can gather its
  4x4 Catmull-Rom neighborhood with plain vectorized takes -- the
  reference walks a ragged offset table per intersection
  (reflection.cpp:341-355), which is pointer-chasing the TPU cannot do;
* series longer than M_CAP are truncated (energy in high-order cosine
  terms of near-specular tables; a warning reports the dropped tail).

Evaluation math matches reflection.cpp:322-377 exactly: Catmull-Rom
weights in muI/muO including the one-sided boundary stencils, Fourier
cosine series in the azimuth difference, Y/R/B channel layout with the
green reconstruction G = 1.39829 Y - 0.100913 B - 0.297375 R, the
1/|muI| scale, and the radiance-mode eta^2 adjoint factor.

Sampling: the wavefront integrator keeps its substrate-style
(cosine + microfacet) proposal for fourier lanes (render/bsdf.py) and
only the evaluated f comes from the table -- unbiased MIS (the pdf
describes the proposal actually drawn), trading pbrt's
SampleCatmullRom2D importance fit for a dispatch with no ragged
per-lane CDF walks.
"""
from __future__ import annotations

import struct
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

M_CAP = 64  # dense padded Fourier-order cap (see module docstring)

_HEADER = b"SCATFUN\x01"


class FourierFile(NamedTuple):
    """Host-side parse of one .bsdf file (numpy)."""
    mu: np.ndarray      # [nMu] zenith cosine nodes (ascending)
    cdf: np.ndarray     # [nMu, nMu] marginal CDF (sampling)
    m: np.ndarray       # [nMu, nMu] int series length per node pair
    ak: np.ndarray      # [nMu, nMu, nCh, M] dense padded coefficients
    eta: float
    n_channels: int
    m_max: int          # the file's true mMax (before padding/truncation)


def read_bsdf(path: str, m_cap: int = M_CAP) -> FourierFile:
    """Parse a SCATFUN v1 .bsdf file (materials/fourier.cpp:116-206)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _HEADER:
        raise ValueError(f"{path}: not a SCATFUN v1 file")
    ints = np.frombuffer(data, dtype="<i4", offset=8, count=9)
    flags, n_mu, n_coeffs, m_max, n_channels, n_bases = ints[:6]
    (eta,) = struct.unpack_from("<f", data, 8 + 9 * 4)
    # 4 more unused int32 slots follow eta (fourier.cpp:158-162).
    off = 8 + 9 * 4 + 4 + 4 * 4
    if flags != 1 or n_channels not in (1, 3) or n_bases != 1:
        raise ValueError(
            f"{path}: unsupported SCATFUN variant (flags={flags}, "
            f"channels={n_channels}, bases={n_bases})")
    mu = np.frombuffer(data, dtype="<f4", offset=off, count=n_mu)
    off += 4 * n_mu
    cdf = np.frombuffer(data, dtype="<f4", offset=off,
                        count=n_mu * n_mu).reshape(n_mu, n_mu)
    off += 4 * n_mu * n_mu
    ol = np.frombuffer(data, dtype="<i4", offset=off,
                       count=n_mu * n_mu * 2).reshape(n_mu * n_mu, 2)
    off += 8 * n_mu * n_mu
    a = np.frombuffer(data, dtype="<f4", offset=off, count=n_coeffs)

    m_arr = ol[:, 1].reshape(n_mu, n_mu)
    M = min(int(m_max), m_cap) if m_max > 0 else 1
    ak = np.zeros((n_mu, n_mu, n_channels, M), np.float32)
    dropped = 0.0
    for i in range(n_mu * n_mu):
        offset, length = int(ol[i, 0]), int(ol[i, 1])
        if length <= 0:
            continue
        take = min(length, M)
        # per-pair layout is [nCh, m] contiguous (reflection.cpp:352).
        blk = a[offset:offset + n_channels * length].reshape(
            n_channels, length)
        ak[i // n_mu, i % n_mu, :, :take] = blk[:, :take]
        if length > M:
            dropped = max(dropped, float(np.abs(blk[:, M:]).max()))
    if dropped > 0:
        import logging
        logging.getLogger("statmc_tpu.fourier").warning(
            "%s: Fourier series truncated at %d orders "
            "(largest dropped coefficient %.3g)", path, M, dropped)
    return FourierFile(mu=np.asarray(mu, np.float32),
                       cdf=np.asarray(cdf, np.float32),
                       m=np.minimum(m_arr, M).astype(np.int32),
                       ak=ak, eta=float(eta), n_channels=int(n_channels),
                       m_max=int(m_max))


def write_bsdf(path: str, mu: np.ndarray, ak_list, eta: float = 1.0,
               n_channels: int = 1) -> None:
    """Write a SCATFUN v1 file (test/tool generator; inverse of
    read_bsdf, format per materials/fourier.cpp:148-186).

    ak_list: nested [nMu][nMu] -> [nCh, m] float arrays (m may vary)."""
    n_mu = len(mu)
    coeffs, offlen = [], []
    off = 0
    m_max = 0
    for i in range(n_mu):
        for o in range(n_mu):
            blk = np.asarray(ak_list[i][o], np.float32).reshape(
                n_channels, -1)
            m = blk.shape[1] if blk.size else 0
            if m and not np.any(blk):
                m = 0
            offlen.append((off, m))
            if m:
                coeffs.append(blk[:, :m].reshape(-1))
                off += n_channels * m
                m_max = max(m_max, m)
    a = (np.concatenate(coeffs) if coeffs
         else np.zeros((0,), np.float32))
    # A crude uniform CDF (only sampling quality, not correctness,
    # depends on it).
    cdf = np.tile(np.linspace(0.0, 1.0, n_mu, dtype=np.float32),
                  (n_mu, 1))
    with open(path, "wb") as f:
        f.write(_HEADER)
        f.write(np.asarray(
            [1, n_mu, a.size, m_max, n_channels, 1, 0, 0, 0],
            "<i4").tobytes())
        f.write(struct.pack("<f", eta))
        f.write(np.zeros(4, "<i4").tobytes())
        f.write(np.asarray(mu, "<f4").tobytes())
        f.write(np.asarray(cdf, "<f4").tobytes())
        f.write(np.asarray(offlen, "<i4").tobytes())
        f.write(np.asarray(a, "<f4").tobytes())


class FourierTables(NamedTuple):
    """Stacked device tables for every fourier material in a scene.

    Tables are padded to the largest (nMu, M) among them; `n_mu` keeps
    each table's true node count (padded mu nodes repeat the last node
    so searchsorted never lands in them)."""
    mu: Any      # [F, nMuP]
    n_mu: Any    # [F] int32
    ak: Any      # [F, nMuP, nMuP, 3, MP]  (1-channel files replicated)
    eta: Any     # [F]
    n_channels: Any  # [F] int32


def stack_tables(files: list[FourierFile]) -> FourierTables:
    F = len(files)
    n_mu_p = max(f.mu.shape[0] for f in files)
    m_p = max(f.ak.shape[-1] for f in files)
    mu = np.zeros((F, n_mu_p), np.float32)
    ak = np.zeros((F, n_mu_p, n_mu_p, 3, m_p), np.float32)
    n_mu = np.zeros((F,), np.int32)
    eta = np.zeros((F,), np.float32)
    nch = np.zeros((F,), np.int32)
    for i, fl in enumerate(files):
        n = fl.mu.shape[0]
        mu[i, :n] = fl.mu
        mu[i, n:] = fl.mu[-1] + 1.0  # out-of-range guard nodes
        a = fl.ak
        if fl.n_channels == 1:
            a = np.repeat(a, 3, axis=2)
        ak[i, :n, :n, :, :a.shape[-1]] = a
        n_mu[i] = n
        eta[i] = fl.eta
        nch[i] = fl.n_channels
    return FourierTables(mu=jnp.asarray(mu), n_mu=jnp.asarray(n_mu),
                         ak=jnp.asarray(ak), eta=jnp.asarray(eta),
                         n_channels=jnp.asarray(nch))


def _catmull_rom_weights(nodes: Array, n: Array, x: Array):
    """Vectorized CatmullRomWeights (interpolation.cpp:61-103).

    nodes: [R, nMuP] per-lane node row; n: [R] true node count;
    x: [R].  Returns (offset [R] int32, weights [R, 4], ok [R])."""
    R = x.shape[0]
    nP = nodes.shape[1]
    first = nodes[:, 0]
    last = jnp.take_along_axis(nodes, (n - 1)[:, None], axis=1)[:, 0]
    # Frame rotations leave |cos| a few ulp beyond 1.0; pbrt's exact
    # bounds test would zero those SAMPLES (visible as darkened film
    # pixels wherever a ray direction rounds past a node), so tolerate
    # 1e-5 of numeric overhang and clamp into the node range.
    ok = (x >= first - 1e-5) & (x <= last + 1e-5)
    x = jnp.clip(x, first, last)
    # FindInterval: largest idx with nodes[idx] <= x, clamped to
    # [1, n-2] exactly like pbrt's FindInterval + offset = idx - 1.
    le = (nodes <= x[:, None]) & (
        jnp.arange(nP)[None, :] < n[:, None])
    idx = jnp.sum(le, axis=1) - 1
    idx = jnp.clip(idx, 0, jnp.maximum(n - 2, 0))
    x0 = jnp.take_along_axis(nodes, idx[:, None], axis=1)[:, 0]
    x1 = jnp.take_along_axis(nodes, jnp.minimum(idx + 1, n - 1)[:, None],
                             axis=1)[:, 0]
    t = (x - x0) / jnp.where(x1 > x0, x1 - x0, 1.0)
    t2 = t * t
    t3 = t2 * t
    w1 = 2 * t3 - 3 * t2 + 1
    w2 = -2 * t3 + 3 * t2
    # First node weight (one-sided at the boundary).
    xm1 = jnp.take_along_axis(nodes, jnp.maximum(idx - 1, 0)[:, None],
                              axis=1)[:, 0]
    w0_in = (t3 - 2 * t2 + t) * (x1 - x0) / jnp.where(
        x1 > xm1, x1 - xm1, 1.0)
    w0_edge = t3 - 2 * t2 + t
    has_m1 = idx > 0
    w0 = jnp.where(has_m1, -w0_in, 0.0)
    w1 = jnp.where(has_m1, w1, w1 - w0_edge)
    w2 = w2 + jnp.where(has_m1, w0_in, w0_edge)
    # Last node weight.
    xp2 = jnp.take_along_axis(nodes, jnp.minimum(idx + 2, n - 1)[:, None],
                              axis=1)[:, 0]
    w3_in = (t3 - t2) * (x1 - x0) / jnp.where(xp2 > x0, xp2 - x0, 1.0)
    w3_edge = t3 - t2
    has_p2 = idx + 2 < n
    w1 = w1 - jnp.where(has_p2, w3_in, w3_edge)
    w2 = w2 + jnp.where(has_p2, 0.0, w3_edge)
    w3 = jnp.where(has_p2, w3_in, 0.0)
    weights = jnp.stack([w0, w1, w2, w3], axis=-1)
    return (idx - 1).astype(jnp.int32), weights, ok


def eval_f(tab: FourierTables, fid: Array, wo: Array, wi: Array) -> Array:
    """FourierBSDF::f over lanes (reflection.cpp:322-377).

    fid: [R] table index (lanes with fid < 0 return 0); wo/wi: [R, 3]
    local shading frame.  Returns RGB f [R, 3]."""
    R = wo.shape[0]
    f = jnp.maximum(fid, 0)
    mu_rows = jnp.take(tab.mu, f, axis=0)          # [R, nMuP]
    n_rows = jnp.take(tab.n_mu, f, axis=0)         # [R]
    mu_i = -wi[:, 2]
    mu_o = wo[:, 2]
    # CosDPhi(-wi, wo) (geometry.h): azimuth-difference cosine.
    num = wi[:, 0] * wo[:, 0] + wi[:, 1] * wo[:, 1]
    den2 = ((wi[:, 0] ** 2 + wi[:, 1] ** 2)
            * (wo[:, 0] ** 2 + wo[:, 1] ** 2))
    cos_phi = jnp.where(den2 > 1e-20,
                        jnp.clip(-num / jnp.sqrt(jnp.maximum(den2, 1e-20)),
                                 -1.0, 1.0),
                        1.0)
    oi, wI, okI = _catmull_rom_weights(mu_rows, n_rows, mu_i)
    oo, wO, okO = _catmull_rom_weights(mu_rows, n_rows, mu_o)
    ok = okI & okO & (fid >= 0)

    MP = tab.ak.shape[-1]
    nP = tab.ak.shape[1]
    ak_flat = tab.ak.reshape(tab.ak.shape[0] * nP * nP, 3, MP)
    acc = jnp.zeros((R, 3, MP))
    for b in range(4):
        for a in range(4):
            w = (wI[:, a] * wO[:, b])[:, None, None]
            ii = jnp.clip(oi + a, 0, nP - 1)
            jj = jnp.clip(oo + b, 0, nP - 1)
            # File layout is [muO, muI]-major: GetAk reads
            # m[offsetO * nMu + offsetI] (reflection.h:166-169).
            rows = jnp.take(ak_flat, (f * nP + jj) * nP + ii, axis=0)
            acc = acc + w * rows
    phi = jnp.arccos(cos_phi)
    cosk = jnp.cos(jnp.arange(MP)[None, :] * phi[:, None])  # [R, MP]
    sums = jnp.sum(acc * cosk[:, None, :], axis=-1)          # [R, 3] Y,R,B
    Y = jnp.maximum(sums[:, 0], 0.0)
    scale = jnp.where(jnp.abs(mu_i) > 1e-12, 1.0 / jnp.abs(mu_i), 0.0)
    # Radiance-transport adjoint factor (reflection.cpp:361-365).
    eta_t = jnp.take(tab.eta, f, axis=0)
    same_side = mu_i * mu_o > 0
    eta_f = jnp.where(mu_i > 0, 1.0 / eta_t, eta_t)
    scale = scale * jnp.where(same_side, eta_f * eta_f, 1.0)
    nch = jnp.take(tab.n_channels, f, axis=0)
    Rc = sums[:, 1]
    Bc = sums[:, 2]
    G = 1.39829 * Y - 0.100913 * Bc - 0.297375 * Rc
    rgb = jnp.stack([Rc, G, Bc], axis=-1)
    mono = jnp.broadcast_to(Y[:, None], rgb.shape)
    out = jnp.where((nch == 1)[:, None], mono, rgb)
    out = jnp.maximum(out * scale[:, None], 0.0)
    return jnp.where(ok[:, None], out, 0.0)


def lambertian_file(albedo, n_mu: int = 16) -> tuple[np.ndarray, list]:
    """(mu nodes, ak_list) for an ideal Lambertian reflector: the
    azimuth-constant series a_0 = rho/pi * |muI| (the table stores
    f * |muI|, cf. the 1/|muI| scale in reflection.cpp:359).

    Conventions baked in: muI = CosTheta(-wi), so REFLECTION entries
    live where muI and muO have opposite signs; 3-channel files store
    [Y, R, B] with G reconstructed at eval (reflection.cpp:369-373);
    ak_list is [muO][muI]-major like the file (reflection.h:166)."""
    albedo = np.atleast_1d(np.asarray(albedo, np.float32))
    if albedo.shape[0] == 3:
        y = (0.212671 * albedo[0] + 0.715160 * albedo[1]
             + 0.072169 * albedo[2])
        chans = np.array([y, albedo[0], albedo[2]], np.float32)
    else:
        chans = albedo
    nch = chans.shape[0]
    mu = np.linspace(-1.0, 1.0, n_mu, dtype=np.float32)
    ak = [[np.zeros((nch, 1), np.float32) for _ in range(n_mu)]
          for _ in range(n_mu)]
    for o, mo in enumerate(mu):
        for i, mi in enumerate(mu):
            if mi * mo < 0:  # reflection side
                ak[o][i] = (chans[:, None] / np.pi
                            * np.float32(abs(mi)))
    return mu, ak
