"""Directional + ambient lambert shading with fixed-point color math.

Replicates src/rendering/shading.rs exactly:

- light direction (0.4, 1, 0.3).normalize(), ambient 0.35, diffuse 0.65
  (shading.rs:21-31); the mesher's precomputed per-face constants
  (binary_greedy.rs:269-282) use hard-coded normalized components, which we
  reuse verbatim so light values match to the last ulp.
- ``shade_color``      — u8 RGB base, light quantized to *255 fixed point
  (shading.rs:72-85)
- ``shade_color_u32``  — packed ARGB base, light quantized to *256 fixed
  point (shading.rs:90-110)

Face lighting is constant per face direction, so all shading collapses to a
tiny host-precomputed table of pre-shaded colors; the rasterizer kernel just
selects — there is no per-pixel lighting math on device (the reference
reaches the same conclusion: light is precomputed at mesh time,
binary_greedy.rs:231).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..models.block_type import BLOCK_COLORS
from ..meshing.quad_format import FACE_NORMALS

# binary_greedy.rs:270-275 — precomputed normalized light dir
LIGHT_DIR = np.array([0.35634832, 0.8908708, 0.2672612], dtype=np.float32)
AMBIENT = np.float32(0.35)
DIFFUSE = np.float32(0.65)

# AO level (0 = unoccluded .. 3 = fully occluded) -> light multiplier
# (shading.rs:55-62).  The reference's mesher always emits level 0
# ("AO level is 0 for now", binary_greedy.rs:259), so default output is
# identical with AO on or off; the machinery is wired end-to-end so a
# mesher that does compute levels shades exactly like vertex_light.
AO_FACTORS = np.array([1.0, 0.8, 0.6, 0.4], dtype=np.float32)

# framebuffer.rs:481-489 uses the opposite level convention
# (0 = darkest .. 3 = unoccluded); preserved verbatim in
# rendering/framebuffer.apply_ao.
APPLY_AO_FACTORS = np.array([0.4, 0.6, 0.8, 1.0], dtype=np.float32)


@dataclass
class ShadingConfig:
    """shading.rs:9-31."""

    light_dir: np.ndarray = field(default_factory=lambda: LIGHT_DIR.copy())
    ambient: float = 0.35
    diffuse: float = 0.65
    use_ao: bool = True

    def vertex_light(self, face: int | np.ndarray,
                     ao_level: int | np.ndarray = 0) -> np.ndarray:
        """Scalar light for a vertex's (normal face, AO level) — the
        legacy Vertex-path light (shading.rs:40-67); honors ``use_ao``.
        Consumes the AO bits of the 8-byte packed vertex
        (models/vertex.py unpack_vertices)."""
        return face_lighting(face, ao_level, use_ao=self.use_ao)

    def shade_color(self, base_rgb, light: float) -> int:
        """shading.rs:72-85 — u8 RGB + light -> packed ARGB."""
        light_u8 = np.uint32(np.float32(light) * np.float32(255.0))
        r = min((int(base_rgb[0]) * int(light_u8)) >> 8, 255)
        g = min((int(base_rgb[1]) * int(light_u8)) >> 8, 255)
        b = min((int(base_rgb[2]) * int(light_u8)) >> 8, 255)
        return 0xFF000000 | (r << 16) | (g << 8) | b

    def shade_color_u32(self, base: int, light: float) -> int:
        """shading.rs:90-110 — packed ARGB + light -> packed ARGB."""
        r = (base >> 16) & 0xFF
        g = (base >> 8) & 0xFF
        b = base & 0xFF
        light_fp = int(np.float32(light) * np.float32(256.0))
        r = min((r * light_fp) >> 8, 255)
        g = min((g * light_fp) >> 8, 255)
        b = min((b * light_fp) >> 8, 255)
        return 0xFF000000 | (r << 16) | (g << 8) | b


def face_lighting(face: int | np.ndarray, ao_level: int | np.ndarray = 0,
                  *, use_ao: bool = True) -> np.ndarray:
    """Per-face-direction lambert light (binary_greedy.rs:269-282 /
    rasterizer.rs:1204-1216), modulated by the AO factor exactly like
    vertex_light (shading.rs:40-67: light = ambient + diffuse * lambert;
    if use_ao: light *= ao_factor; clamp).  Vectorized over face indices;
    ``ao_level`` defaults to 0 = the reference mesher's constant
    (binary_greedy.rs:259), where the factor is exactly 1.0."""
    n = FACE_NORMALS[np.asarray(face)].astype(np.float32)
    lambert = np.maximum((n * LIGHT_DIR).sum(-1), np.float32(0.0))
    light = AMBIENT + DIFFUSE * lambert
    if use_ao:
        light = light * AO_FACTORS[np.asarray(ao_level)]
    return np.clip(light, 0.0, 1.0).astype(np.float32)


def build_quad_color_tables(
    atlas_tables: dict[str, np.ndarray],
    *,
    enable_shading: bool = True,
    enable_textures: bool = True,
    shading: ShadingConfig | None = None,
    ao_level: int = 0,
) -> dict[str, np.ndarray]:
    """Pre-shaded per-(face, block) color pairs for the rasterizer.

    ``ao_level`` bakes the AO factor into the per-face light exactly like
    the reference's mesh-time vertex light (shading.rs:55-62); the
    reference mesher emits level 0 (binary_greedy.rs:259), the identity.

    Returns ``color_even``/``color_odd`` uint32[6, 4] plus the texture parity
    masks uint32[4].  Textured colors use shade_color_u32 (the textured
    fragment path, rasterizer.rs:1446-1449); flat colors use shade_color
    (the flat-color path, rasterizer.rs:1591-1596) — the two fixed-point
    scales differ in the reference (255 vs 256) and are preserved.
    """
    cfg = shading or ShadingConfig()
    lights = face_lighting(np.arange(6), ao_level, use_ao=cfg.use_ao)
    ce = np.zeros((6, 4), dtype=np.uint32)
    co = np.zeros((6, 4), dtype=np.uint32)
    for f in range(6):
        for b in range(4):
            if enable_textures:
                base_e = int(atlas_tables["color_even"][b])
                base_o = int(atlas_tables["color_odd"][b])
                if enable_shading:
                    ce[f, b] = cfg.shade_color_u32(base_e, float(lights[f]))
                    co[f, b] = cfg.shade_color_u32(base_o, float(lights[f]))
                else:
                    ce[f, b] = base_e | 0xFF000000
                    co[f, b] = base_o | 0xFF000000
            else:
                if enable_shading:
                    c = cfg.shade_color(BLOCK_COLORS[b], float(lights[f]))
                else:
                    rgb = BLOCK_COLORS[b]
                    c = 0xFF000000 | (int(rgb[0]) << 16) | (int(rgb[1]) << 8) | int(rgb[2])
                ce[f, b] = c
                co[f, b] = c
    out = dict(color_even=ce, color_odd=co)
    if enable_textures:
        out["mask_lo"] = atlas_tables["mask_lo"].astype(np.uint32)
        out["mask_hi"] = atlas_tables["mask_hi"].astype(np.uint32)
    else:
        out["mask_lo"] = np.zeros(4, dtype=np.uint32)
        out["mask_hi"] = np.zeros(4, dtype=np.uint32)
    return out
