"""Macrotile rendering — the reference's L2-cache tiling, mapped to VMEM.

Reference components (SURVEY.md section 2.5) and their TPU forms:

- ``MacroTile`` (macrotile.rs:19-47): a 128x128 own color+depth buffer sized
  to fit L2 (128 KB).  Here: the Pallas rasterizer's VMEM-resident output
  tile (ops/raster.py) — same sizing argument, swapping L2 for VMEM
  (a 128x128 tile is 128 KB of VMEM out of ~16 MB).  ``MACROTILE_SIZE=128``
  is the default tile shape this module configures.
- ``MacroTileBins`` + ``ThreadLocalBins`` (macrotile.rs:180-296): bin mesh
  screen AABBs into tiles, merging thread-local bins to avoid contention.
  Here: ``ops/raster.build_tile_lists`` — the dense [tiles x quads] overlap
  matrix + scatter-free compaction computes every tile's bin in one
  vectorized shot; there is no contention to avoid because nothing mutates.
- the >25%-of-screen "large primitive" bypass (macrotile.rs:26, 180-226):
  unnecessary here — a large quad simply appears in many tile lists and its
  per-tile cost is bounded by the sub-block loop (ops/raster.py PIECE_*).
- ``render_frame_macrotile`` (macrotile_renderer.rs:51-170): the alternative
  frame orchestrator.  Here: the standard pipeline with 128x128 tiles —
  provided as :func:`macrotile_renderer` for API parity.
- the Hi-Z consult the reference plumbs but never wires
  (macrotile_renderer.rs:68-70, an unfinished integration) is COMPLETED
  here as ``use_hiz=True``: the exact two-pass occlusion mode
  (pipeline._two_pass_step) renders the nearest ``near_quads`` of the
  front-to-back stream, builds a rendered-depth max pyramid
  (ops/hiz.build_max_pyramid), culls far quads that PROVABLY cannot win a
  blend before their geometry/binning cost, and finishes on the near
  pass's framebuffer.  Commutative blending makes the two-pass frame
  bit-identical to the single-pass frame (tests/test_macrotile.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..utils.config import MACROTILE_SIZE, RenderConfig
from .pipeline import Renderer


@dataclass
class MacrotileRenderConfig:
    """macrotile_renderer.rs:26-40."""

    tile_size: int = MACROTILE_SIZE
    # exact two-pass Hi-Z occlusion (the consult the reference left
    # unwired); near_quads = the front-to-back prefix of the first pass
    use_hiz: bool = False
    near_quads: int = 8192
    parallel: bool = True  # tiles are grid programs; always "parallel"


def macrotile_renderer(width: int = 1280, height: int = 768,
                       config: MacrotileRenderConfig | None = None,
                       **render_kwargs) -> Renderer:
    """A Renderer configured with square MACROTILE_SIZE tiles
    (render_frame_macrotile's claimed-3-5x layout, macrotile_renderer.rs:50).

    ``height``/``width`` must be multiples of the tile size (the reference
    rounds tile counts up and clips; we keep static shapes)."""
    cfg = config or MacrotileRenderConfig()
    ts = cfg.tile_size
    if width % ts or height % ts:
        raise ValueError(f"framebuffer {width}x{height} must be a multiple "
                         f"of the macrotile size {ts}")
    # the macrotile maps to a block of octet-kernel tiles (a 128x128
    # macrotile = 8 register-resident 16x128 tiles); the kernel tile shape
    # itself is fixed by the VPU register geometry (ops/raster.pick_tile)
    from ..ops.raster import pick_tile

    th, tw = pick_tile(height, width)
    rc = RenderConfig(
        width=width, height=height, tile_h=th, tile_w=tw,
        two_pass_near_quads=(cfg.near_quads if cfg.use_hiz else 0),
        **render_kwargs)
    return Renderer(rc)
