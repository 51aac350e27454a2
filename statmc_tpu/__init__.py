"""statmc-tpu: a TPU-native statistical Monte Carlo rendering framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
cg-tuwien/StatMC ("A Statistical Approach to Monte Carlo Denoising",
Sakai et al., SIGGRAPH Asia 2024): a wavefront path tracer that tracks
per-pixel streaming statistics (n, mean, M2, M3, Box-Cox transformed)
alongside radiance and G-buffers, an iterative render->denoise loop, a
statistical joint-bilateral denoising filter as a differentiable Pallas
kernel, ACRR and SMIS.

Nothing here is a port: the reference is an OO C++/CUDA plugin renderer
(pbrt-v3 + OpenCV); this package is a SoA, masked-stream, mesh-sharded
JAX program.  See SURVEY.md at the repo root for the mapping.
"""

__version__ = "0.1.0"
