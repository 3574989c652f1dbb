"""Texture atlas + shading unit tests — ports of the reference's
shading_tests.rs and texture.rs behaviors."""

import numpy as np

from differential_projection_voxel_renderer_tpu.ops.shading import (
    ShadingConfig,
    build_quad_color_tables,
    face_lighting,
)
from differential_projection_voxel_renderer_tpu.ops.texture import (
    MicroTexture,
    TextureAtlas,
    create_checkerboard,
    create_noise,
    rgb565_to_argb32,
)


def test_rgb565_expansion_bit_replication():
    """texture.rs:42-53: white, black, pure channels."""
    assert rgb565_to_argb32(0xFFFF) == 0xFFFFFFFF
    assert rgb565_to_argb32(0x0000) == 0xFF000000
    assert rgb565_to_argb32(0xF800) == 0xFFFF0000  # pure red
    assert rgb565_to_argb32(0x07E0) == 0xFF00FF00  # pure green
    assert rgb565_to_argb32(0x001F) == 0xFF0000FF  # pure blue


def test_checkerboard_pattern():
    t = create_checkerboard(0xF81F, 0x0000)
    c0 = t.sample(0, 0)
    c1 = t.sample(1, 0)
    assert c0 != c1
    for y in range(8):
        for x in range(8):
            expect = c0 if (x + y) % 2 == 0 else c1
            assert t.sample(x, y) == expect
    # tiling wrap (sample &7, texture.rs:21-23)
    assert t.sample(8, 8) == t.sample(0, 0)
    assert t.sample(9, 17) == t.sample(1, 1)


def test_noise_texture_deterministic_two_tone():
    t1 = create_noise(0x8410, 0x73AE)
    t2 = create_noise(0x8410, 0x73AE)
    np.testing.assert_array_equal(t1.indices, t2.indices)
    tt = t1.two_tone()
    assert tt is not None
    base, dark = tt
    assert base == rgb565_to_argb32(0x8410)
    assert dark == rgb565_to_argb32(0x73AE)


def test_parity_mask_matches_sample():
    """The kernel's 64-bit parity-mask sampler must reproduce sample()
    exactly for the default atlas."""
    atlas = TextureAtlas()
    tables = atlas.kernel_tables()
    for b, tex in enumerate(atlas.textures):
        bits = int(tables["mask_lo"][b]) | (int(tables["mask_hi"][b]) << 32)
        for y in range(8):
            for x in range(8):
                bit = (bits >> (y * 8 + x)) & 1
                expect = (int(tables["color_odd"][b]) if bit
                          else int(tables["color_even"][b]))
                assert tex.sample(x, y) == expect, (b, x, y)


def test_face_lighting_values():
    """binary_greedy.rs:269-282: +Y brightest, -Y ambient only."""
    light = face_lighting(np.arange(6))
    assert abs(light[2] - (0.35 + 0.65 * 0.8908708)) < 1e-6  # +Y
    assert abs(light[3] - 0.35) < 1e-6  # -Y: lambert clamped to 0
    assert light[2] > light[0] > light[4] > 0.35  # +Y > +X > +Z > ambient
    assert abs(light[1] - 0.35) < 1e-6  # -X faces away from light
    assert abs(light[5] - 0.35) < 1e-6  # -Z


def test_shade_color_fixed_point():
    """shading.rs:72-110 fixed-point semantics (255 vs 256 scales)."""
    cfg = ShadingConfig()
    # full light leaves u8 RGB nearly unchanged (255/256 scale loses 1 bit)
    c = cfg.shade_color([128, 64, 32], 1.0)
    assert c == (0xFF000000 | (127 << 16) | (63 << 8) | 31)
    # packed variant uses 256 scale: full light is exact
    c2 = cfg.shade_color_u32(0xFF804020, 1.0)
    assert c2 == 0xFF804020
    # zero light -> black (alpha preserved)
    assert cfg.shade_color([200, 200, 200], 0.0) == 0xFF000000
    assert cfg.shade_color_u32(0xFFC8C8C8, 0.0) == 0xFF000000


def test_quad_color_tables_modes():
    atlas = TextureAtlas()
    kt = atlas.kernel_tables()
    shaded = build_quad_color_tables(kt, enable_shading=True, enable_textures=True)
    unshaded = build_quad_color_tables(kt, enable_shading=False, enable_textures=True)
    flat = build_quad_color_tables(kt, enable_shading=True, enable_textures=False)
    # textures off -> even == odd (flat block colors)
    np.testing.assert_array_equal(flat["color_even"], flat["color_odd"])
    assert (flat["mask_lo"] == 0).all()
    # shading changes at least some face colors
    assert (shaded["color_even"] != unshaded["color_even"]).any()
    # unshaded textured colors match the raw atlas tones
    for b in range(1, 4):
        assert np.uint32(unshaded["color_even"][0, b]) == np.uint32(
            kt["color_even"][b] | 0xFF000000
        )


# ----------------------------------------------------------------- AO


def test_ao_level_zero_is_identity():
    """The reference mesher always emits AO level 0 (binary_greedy.rs:259),
    where the factor is exactly 1.0 — tables with AO on/off must be
    bit-identical at level 0."""
    from differential_projection_voxel_renderer_tpu.ops.shading import (
        ShadingConfig, build_quad_color_tables, face_lighting,
    )
    from differential_projection_voxel_renderer_tpu.ops.texture import (
        TextureAtlas,
    )

    at = TextureAtlas().kernel_tables()
    t_on = build_quad_color_tables(at, shading=ShadingConfig(use_ao=True))
    t_off = build_quad_color_tables(at, shading=ShadingConfig(use_ao=False))
    for k in t_on:
        np.testing.assert_array_equal(t_on[k], t_off[k])
    np.testing.assert_array_equal(face_lighting(np.arange(6), 0),
                                  face_lighting(np.arange(6)))


def test_ao_levels_darken_like_vertex_light():
    """shading.rs:55-62: light *= {1.0, 0.8, 0.6, 0.4}[ao], then clamp;
    the factor must flow through the fixed-point color math end-to-end."""
    from differential_projection_voxel_renderer_tpu.ops.shading import (
        AO_FACTORS, ShadingConfig, build_quad_color_tables, face_lighting,
    )
    from differential_projection_voxel_renderer_tpu.ops.texture import (
        TextureAtlas,
    )

    cfg = ShadingConfig()
    base = face_lighting(np.arange(6), 0)
    for lvl in (1, 2, 3):
        lit = face_lighting(np.arange(6), lvl)
        np.testing.assert_allclose(
            lit, np.clip(base * AO_FACTORS[lvl], 0, 1), rtol=0, atol=0)
        # use_ao=False ignores the level (shading.rs:55 `if self.use_ao`)
        np.testing.assert_array_equal(
            face_lighting(np.arange(6), lvl, use_ao=False), base)
    at = TextureAtlas().kernel_tables()
    t0 = build_quad_color_tables(at, ao_level=0)
    t3 = build_quad_color_tables(at, ao_level=3)
    # every shaded channel at level 3 is <= the level-0 channel
    for k in ("color_even", "color_odd"):
        for sh in (16, 8, 0):
            c0 = (t0[k] >> sh) & 0xFF
            c3 = (t3[k] >> sh) & 0xFF
            assert (c3 <= c0).all()
    assert (t3["color_even"] != t0["color_even"]).any()
    # vertex_light honors the packed vertex AO bits' convention
    assert cfg.vertex_light(2, 3) < cfg.vertex_light(2, 0)


def test_apply_ao_reference_factors():
    """framebuffer.rs:481-496: level 0 -> 0.4 ... 3 -> 1.0 (note: opposite
    convention to shading.rs vertex AO; both preserved verbatim)."""
    from differential_projection_voxel_renderer_tpu.rendering.framebuffer import (
        apply_ao,
    )

    assert apply_ao([100, 200, 50], 3) == 0xFF000000 | (100 << 16) | (200 << 8) | 50
    assert apply_ao([100, 200, 50], 0) == 0xFF000000 | (40 << 16) | (80 << 8) | 20
    assert apply_ao([255, 255, 255], 1) == 0xFF000000 | (153 << 16) | (153 << 8) | 153
    assert apply_ao([255, 255, 255], 4) == 0xFFFFFFFF  # _ => 1.0
