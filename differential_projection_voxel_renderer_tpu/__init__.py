"""differential_projection_voxel_renderer_tpu — a TPU-native voxel rendering
framework (JAX / XLA / Pallas) with the capabilities of the Rust reference
``gatewaytofredom/differential_projection_voxel_renderer``.

Layer map (mirrors reference SURVEY.md section 1):

- ``models``    — scene data model: block types, chunks, Perlin terrain,
                  world streaming, camera/frustum (reference src/voxel,
                  src/world.rs, src/camera)
- ``meshing``   — exposed-face masks + binary greedy meshing + packed quad
                  buffers (reference src/meshing)
- ``ops``       — device compute: differential projection, culling,
                  rasterization kernels (Pallas + jnp reference impls),
                  Hi-Z, textures, shading (reference src/rendering SIMD paths)
- ``rendering`` — frame orchestration: framebuffer, render pipeline,
                  oracle rasterizer (reference src/rendering + src/main.rs)
- ``parallel``  — jax.sharding mesh utilities and the multi-chip tile-
                  sharded renderer (replaces Rayon stripe parallelism)
- ``app``       — headless frame loop / flythrough (reference src/main.rs)
- ``native``    — C++ host runtime helpers (greedy merge, sequential culls)
"""

from .models.block_type import BLOCK_COLORS, BLOCK_IS_SOLID, BlockType
from .models.camera import Camera, CameraController, Frustum
from .models.chunk import Chunk, coords_to_index, index_to_coords
from .models.world import World, WorldConfig, chunk_bounds, world_to_chunk_pos
from .utils.config import (
    CHUNK_SIZE,
    CHUNK_VOLUME,
    RenderConfig,
)

__version__ = "0.1.0"

__all__ = [
    "BlockType",
    "BLOCK_COLORS",
    "BLOCK_IS_SOLID",
    "Camera",
    "CameraController",
    "Frustum",
    "Chunk",
    "World",
    "WorldConfig",
    "RenderConfig",
    "CHUNK_SIZE",
    "CHUNK_VOLUME",
    "chunk_bounds",
    "world_to_chunk_pos",
    "coords_to_index",
    "index_to_coords",
]
