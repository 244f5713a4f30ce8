"""Render configuration.

Single dataclass replacing the reference's three-tier config system
(boost::program_options CLI at RayTracingInVulkan/src/Options.cpp:9-72,
gpgpusim.config knobs, and env vars — see SURVEY.md §5).

The numeric thresholds are the reference's exact values so parity tests are
bit-meaningful:
  * k-buffer size k=8            (RayTracingInVulkan/src/Assets/Scene.hpp NextK[..][8])
  * gaussian cutoff g ∈ [0,5.6]  (assets/shaders/RayTracing.ProceduralGauss.rint:103)
  * alpha threshold 1/255        (ProceduralGauss.rint:107)
  * exp LUT: 256 segments on [0,8] (src/Utilities/ExpLUT.hpp:10-24, Scene.cpp:47)
  * tMin/tMax = 1e-3 / 1e4       (GaussTracing.rgen:50-51)
"""

from __future__ import annotations

import dataclasses
from typing import Literal


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    # --- image / launch ---
    width: int = 128
    height: int = 128
    samples: int = 1          # --samples (spp)
    bounces: int = 16         # --bounces; for 3DGS these are k-buffer *passes*
                              # (GaussTracing.rgen:47 reuses NumberOfBounces)
    shadow_rays: int = 2      # --shadowrays (TraceShadow.rgen semantics)
    ao_rays: int = 4          # TraceAO.rgen semantics

    # --- 3DGS splatting ---
    k: int = 8                # per-ray k-nearest hit buffer depth
    g_cutoff: float = 5.6     # reject splats with 0.5*d'Σ⁻¹d outside [0, g_cutoff]
    alpha_threshold: float = 1.0 / 255.0
    max_passes: int = 64      # upper bound on the rgen multi-pass loop
    use_exp_lut: bool = False # True → 256-seg piecewise-linear exp(-x) (parity);
                              # False → exact VPU exp (TPU has fast transcendentals)
    conic_mode: Literal["reference", "standard"] = "standard"
    # "reference" replicates the reference's quirk of using the 2D covariance
    # entries directly as the quadratic form (ProceduralGauss.rint:95-102);
    # "standard" uses the inverse covariance (EWA / INRIA 3DGS), which is what
    # real scenes require for sensible footprints.
    cov2d_dilation: float = 0.0  # standard 3DGS adds 0.3 px² to cov2d diagonal;
                                 # the reference adds none. Enable for .ply scenes.
    sh_degree: int = 3
    white_background: bool = False

    # --- ray march bounds ---
    t_min: float = 1e-3
    t_max: float = 1e4
    init_depth: float = 1e4   # k-buffer slot init (Scene.cpp:44 "10000.0")

    # --- tiling (perf path) ---
    # tile shapes select the blend kernel: pixel-count 1024 with tile_w 128
    # -> the 8x128 register-tile kernel (splat_pallas); any other multiple
    # of 128 px -> the subtile kernel (splat_subtile). 32x16 measured best
    # on v5e at 1M/1080p once binning came to dominate the frame (sweep
    # 2026-08-20, compact+bf16: 75.9 ms vs 79.0 at 16x16 / 88.8 at 32x32
    # — the pair count drops 4.19M -> 3.15M and every binning stage
    # scales with pairs, while win=512 blend cost absorbs only part of
    # it; 59.3 dB vs 16x16, pure chunk-regrouping noise).
    tile_w: int = 32
    tile_h: int = 16
    pair_chunk: int = 384       # pairs per kernel chunk (multiple of 128).
                                # 384 measured on v5e 2026-08-21 at the
                                # headline workload: packed-blend 49.5 ->
                                # 38.8 ms (tile stream) / 51.3 -> 35.5
                                # (group stream) vs 128 — fewer chunk
                                # boundaries amortize the per-chunk
                                # carries/totals; 512 is within noise
                                # (36.9/35.6). The subtile and 128x8
                                # kernels still run 128 (clamped at their
                                # call sites)
    expand_impl: Literal["pallas", "xla", "fused", "binned"] = "fused"
                                # pair expansion. "fused" (DEFAULT since
                                # r5): barrel-shift kernel with the
                                # pair->source merge computed in-kernel —
                                # measured 74.4 ms/frame vs pallas 76.1,
                                # binned 76.6 at 1M/1080p on v5e
                                # 2026-08-21 (the round-3 "fused loses"
                                # verdict was Mosaic fori_loop overhead,
                                # fixed by a 16-way manual unroll).
                                # "pallas": kernel + XLA dense merge-rank.
                                # "binned": fused + in-kernel emit of the
                                # compact tile-sort operands (compact
                                # payload only; f32 falls back to pallas).
                                # "xla": jnp.repeat reference fallback.
    blend_impl: Literal["packed", "subtile"] = "packed"
                                # subtile blend kernel for non-128x8 tiles:
                                # "packed" streams globally-aligned 128-lane
                                # chunks with MXU segment bookkeeping
                                # (splat_packed); "subtile" = per-segment
                                # chunk windows (splat_subtile)
    blend_bs: int = 128         # subtiles per grid step in the packed
                                # kernel; 128 matches the one-hot matmul's
                                # native MXU width (smaller bs pads to 128
                                # anyway) and amortizes grid-step overhead
    splat_chunk: int = 256      # splats per chunk in the brute-force paths
    exact_hits: bool = False    # packed-kernel tiled path: count each
                                # pixel's accepted splats exactly (one
                                # extra 0/1 MXU pass per chunk) instead of
                                # reporting the tile's pair count per
                                # pixel. The exact rt_avg_nodes_per_ray
                                # analogue (gpu-sim.cc:1504-1532) on the
                                # perf path; off by default for speed
    scan_impl: Literal["roll", "logmm"] = "logmm"
                                # packed-kernel exclusive-cumprod scan:
                                # "roll" = 8-step masked Hillis-Steele;
                                # "logmm" = log-space segmented-triangular
                                # MXU matmul (hi/lo bf16 split). logmm
                                # measured 95.7 vs 105.9 ms/frame on v5e
                                # (1M @1080p); image delta 1.1e-4. roll is
                                # the MEASURED LOSER, kept as the exact-
                                # reassociation fallback (one regression
                                # test); required OFF for stream="group"
    blend_math: Literal["f32", "bf16"] = "bf16"
                                # packed-kernel elementwise math tier:
                                # "bf16" halves the VPU vregs of the
                                # (win, 128) EWA/alpha math and drops the
                                # lo residual of the value-side MXU
                                # contractions (~1e-2-class color error);
                                # alpha/exp/accept and the trans carries
                                # stay f32 (Mosaic v5e rejects packed-bf16
                                # cmpf). Measured 2026-08-20 on v5e, 1M
                                # @1080p: 78.9 vs 83.5 ms/frame over
                                # compact/f32; 54.8 dB PSNR vs the f32
                                # payload (compact/f32 itself: 56.8 dB) —
                                # the default perf tier per the sweep-
                                # winner policy (tools/tier_compare.py)
    payload: Literal["f32", "compact"] = "compact"
                                # pair-payload precision for the packed
                                # blend path: "compact" packs mean (u16
                                # fixed point, tile-relative), quads (bf16)
                                # and depth into a 6-row int32 payload —
                                # fewer sort operands / expand rows / DMA
                                # bytes at ~1e-3-class alpha error (the
                                # reference's own exp-LUT granularity);
                                # "f32" is the bit-parity tier. compact
                                # measured 87.9 vs 95.7 ms/frame (v5e, 1M
                                # @1080p, logmm scan), maxerr 4.3e-3 vs
                                # f32 — the default serving tier; paths
                                # that need f32 (VJP, ntx > 127) fall
                                # back automatically
    stream: Literal["tile", "group"] = "group"
                                # pair-stream granularity for the packed
                                # blend path. "tile": pairs are sorted by
                                # tile id (the 3.15M-row, 5-operand stable
                                # tile sort). "group": pairs only need
                                # contiguity per KERNEL GROUP (bs tiles =
                                # k full tile rows); splats expand to
                                # (splat x row-group) units (~1.1x splats),
                                # the stable sort runs at UNIT scale, and
                                # the pair-level sort disappears — the
                                # blend kernel's one-hot routing already
                                # tolerates within-group tile interleaving
                                # when the logmm scan + order-independent
                                # chunk totals are used. Requires compact
                                # payload + packed blend + logmm + rect
                                # spans and a tile grid with k*ntx <= 128,
                                # (k*ntx) % 8 == 0 (1080p at 16/32 px
                                # tiles qualifies); falls back to "tile"
                                # otherwise. DEFAULT since r5: 59.5 vs
                                # 61.7 ms (tile) at the headline workload
                                # with pair_chunk=384 (2026-08-21)
    span_mode: Literal["rect", "ellipse"] = "rect"
                                # pair generation: "rect" = one pair per
                                # tile of the footprint's bounding box;
                                # "ellipse" = per-tile-row x-spans of the
                                # exact footprint ellipse (fewer pairs,
                                # identical image — bbox-corner tiles
                                # contain no above-threshold pixel). Needs
                                # nty <= 255 (falls back to rect above).
                                # MEASURED LOSER at the headline workload
                                # (r3: 113.7/104.3 vs 95.7 ms — footprints
                                # are small vs tiles, so the bbox is near-
                                # tight); opt-in for large-splat regimes
                                # only, one regression test
    serving_super: int = 8      # tiles per supertile side for the serving
                                # cutoff coarsening (gsrt.serving): smaller
                                # = finer cull granularity, larger = cheaper
                                # per-splat lookup tables

    # --- BVH ---
    bvh_branching: int = 8      # wide nodes (reference packs 6-wide GEN_RT nodes)
    bvh_leaf_size: int = 4
    traversal_stack_depth: int = 64

    # --- path tracing ---
    has_sky: bool = True
    gamma_correction: bool = True  # sqrt gamma (RayTracing.rgen:93)

    # --- numerics ---
    dtype: str = "float32"

    @property
    def num_pixels(self) -> int:
        return self.width * self.height

    @property
    def sh_coeffs(self) -> int:
        return (self.sh_degree + 1) ** 2

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


# Reference demo configuration: 16x16 launch, 2 hardcoded gaussians
# (SceneList.cpp:124-125, GaussTracing.rgen:27 "ray_id = x + 16*y").
REFERENCE_DEMO = RenderConfig(
    width=16, height=16, samples=1, bounces=4, k=8,
    use_exp_lut=True, conic_mode="reference", gamma_correction=False,
)
