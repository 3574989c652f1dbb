"""The frame loop: world streaming, device mesh cache, culling funnel,
and the per-frame render call.

This is the TPU-native equivalent of the reference's app layer
(src/main.rs:20-608), headless: winit/softbuffer are replaced by device-
resident color/depth buffers that can be fetched to numpy on demand
(SURVEY.md section 7 "Interactivity").

Per frame (main.rs RedrawRequested, :207-310):
1. controller -> camera
2. world.update — stream/unload chunks (budgeted, hysteresis)
3. frustum + distance chunk visibility (vectorized numpy)
4. incremental remeshing: new chunks + their already-meshed neighbors
   (main.rs:224-277), meshed on host (C++ greedy) into the device quad pool
5. front-to-back sort + horizon culling + optional occlusion pass (host,
   sequential algorithms — see ops/culling.py, ops/occlusion.py)
6. one jitted device render step (rendering/pipeline.py)
"""

from __future__ import annotations

import collections
import functools
import os
import time
from dataclasses import dataclass, replace as dc_replace

import jax
import jax.numpy as jnp
import numpy as np

from ..meshing.greedy import mesh_chunk
from ..models.camera import Camera, CameraController
from ..models.world import World, WorldConfig, world_to_chunk_pos
from ..ops.culling import HorizonCullingConfig, horizon_cull_mask, sort_front_to_back
from ..ops.occlusion import occlusion_pass, project_chunk_rects
from ..rendering.pipeline import (
    RESIDENT_INSERT_FP, RESIDENT_INSERT_KP, RESIDENT_INSERT_MC, Renderer,
    _c6_of, apply_insert_payload)
from ..utils.config import CHUNK_SIZE, QUADS_PER_CHUNK_CAP, RenderConfig
from ..utils.profiling import FUNCTION_COUNTERS


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _pool_set_row(pool, c6pool, slot, row, count):
    """In-place (donated) row update of the device quad pool — the TPU
    analogue of inserting into the mesh cache HashMap (main.rs:274)."""
    c6 = _c6_of(row[None, :], count[None])
    return pool.at[slot].set(row), c6pool.at[slot].set(c6[0])


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _pool_set_rows(pool, c6pool, slots, rows, counts):
    """Batched in-place row update: one dispatch per remesh BATCH, not per
    chunk (each dispatch costs a full round trip on remote-TPU setups)."""
    return (pool.at[slots].set(rows),
            c6pool.at[slots].set(_c6_of(rows, counts)))


@functools.partial(jax.jit, donate_argnums=(0, 1),
                   static_argnames=("k", "mc"))
def _pool_set_rows_flat(pool, c6pool, packed, *, k: int, mc: int):
    """Row update from a FLAT concatenated quad stream: the batch crosses
    host->device as sum(counts) quads (pow2-padded) instead of k
    bucket-width rows — a streaming frame's ~9x~300-quad batch is ~11 KB
    of real payload vs 32 KB of padded rows, and H2D through the relay
    is the whole cost of the insert path (NOTES.md round 3).  Rows are
    rebuilt device-side with one [k, mc] gather.

    ``packed`` u32[3k + fp] is ONE consolidated upload — slots | starts |
    counts header, then the flat quad words: each SEPARATE host->device
    array costs a relay round trip (NOTES.md), so the three tiny index
    arrays ride in front of the payload they describe."""
    return apply_insert_payload(pool, c6pool, packed, k=k, mc=mc)


def _meta11_env() -> bool:
    """DPVR_META11: force the legacy 11-short draw-list layout (A/B knob).
    Parsed like the other numeric knobs so "0" means off."""
    return bool(int(os.environ.get("DPVR_META11", "0") or "0"))


def _dir_counts(quads: np.ndarray) -> np.ndarray:
    """Per-face-direction counts of a packed quad array.  The pool's
    dir-skip gather assumes rows are dir-CONTIGUOUS in face order (the
    mesher's deterministic emission, meshing/greedy.py); violating that
    would gather the wrong quads, so it is asserted here."""
    if len(quads) == 0:
        return np.zeros(6, np.int32)
    d = (np.asarray(quads, np.uint32) >> 29) & 7
    assert (np.diff(d) >= 0).all(), "mesh quads not grouped by face dir"
    return np.bincount(d, minlength=6)[:6].astype(np.int32)


class QuadPool:
    """Device-resident mesh cache: packed quads per chunk slot.

    Replaces the reference's ``mesh_cache: HashMap<IVec3, Option<ChunkMesh>>``
    (main.rs:81) + the Hyper-Pipeline basis cache: chunk meshes stay in HBM
    across frames; only newly-meshed chunks are uploaded (16 KB rows).
    """

    def __init__(self, slots: int = 4096, qcap: int = QUADS_PER_CHUNK_CAP):
        if slots > 32767:
            # pool slots travel in the renderer's int16 draw-list upload
            # (rendering/pipeline.py render_fused); a larger pool would
            # wrap and gather the wrong rows
            raise ValueError("QuadPool slots must be <= 32767 "
                             "(int16 draw-list upload)")
        self.slots = slots
        self.qcap = qcap
        self.quads = jnp.zeros((slots, qcap), jnp.uint32)
        # device mirror of counts6 (below): lets the renderer's META5
        # draw-list upload drop the 6 count shorts per chunk.  Maintained
        # inside the same donated dispatches that scatter quad rows;
        # NEVER cleared on remove() — a freed slot is no longer in any
        # draw list, and reuse rewrites the row before it can be gathered
        # (padding entries gather slot 0 with a zero dir mask -> length 0).
        self.counts6_dev = jnp.zeros((slots, 6), jnp.int32)
        self.counts = np.zeros(slots, np.int32)
        # per-face-direction quad counts (meshes are dir-grouped in pool
        # row order — the mesher's deterministic +X,-X,+Y,-Y,+Z,-Z
        # emission), enabling whole back-facing directions to be skipped
        # at draw-list build (engine._dir_keep_mask)
        self.counts6 = np.zeros((slots, 6), np.int32)
        self.positions = np.zeros((slots, 3), np.int32)
        # pos -> slot; None-mesh chunks (uniform/empty) get count 0 slots so
        # "has cache entry" stays distinct from "has no mesh" (main.rs:285)
        self.by_pos: dict[tuple[int, int, int], int] = {}
        self._free: list[int] = list(range(slots - 1, -1, -1))
        self.overflow_drops = 0
        self._dev_cache: tuple | None = None  # (counts, positions) on device
        self._used = np.zeros(slots, bool)  # slot occupancy (lookup_slots)
        self._lookup_cache: tuple | None = None  # sorted (keys, slots)

    def device_tables(self):
        """Device copy of positions, re-uploaded only after pool mutations
        (counts stay host-side — the gather indices are host-built)."""
        import jax.numpy as _jnp

        if self._dev_cache is None:
            self._dev_cache = _jnp.asarray(self.positions)
        return self._dev_cache

    def __contains__(self, pos) -> bool:
        return tuple(int(c) for c in pos) in self.by_pos

    def insert(self, pos, quads: np.ndarray | None) -> None:
        key = tuple(int(c) for c in pos)
        slot = self.by_pos.get(key)
        if slot is None:
            if not self._free:
                raise RuntimeError(
                    "QuadPool exhausted; raise `slots` (mesh cache capacity)"
                )
            slot = self._free.pop()
            self.by_pos[key] = slot
            self._used[slot] = True
        n = 0
        row = np.zeros(self.qcap, np.uint32)
        if quads is not None:
            n = min(len(quads), self.qcap)
            if len(quads) > self.qcap:
                self.overflow_drops += len(quads) - self.qcap
            row[:n] = quads[:n]
        self.quads, self.counts6_dev = _pool_set_row(
            self.quads, self.counts6_dev, jnp.int32(slot),
            jnp.asarray(row), jnp.int32(n))
        self.counts[slot] = n
        self.counts6[slot] = _dir_counts(row[:n])
        self.positions[slot] = key
        self._dev_cache = None
        self._lookup_cache = None

    def insert_rows_device(self, positions, quad_rows, counts, c6) -> None:
        """Batched insert of device-resident quad rows (the device-meshing
        path): one device-to-device scatter, no quad H2D.  ``c6`` is the
        per-dir histogram for the HOST mirror, computed inside the meshing
        dispatch (ops/meshing_jax._mesh_chunks_jit) — fetching it from the
        quad rows here used to download the whole [k, qcap] buffer.
        Duplicate positions are allowed iff their rows are identical
        (the bucket-padding contract): the duplicate-index scatter then
        writes the same data whatever order XLA picks."""
        k = len(positions)
        assert quad_rows.shape == (k, self.qcap)
        slots = np.zeros(k, np.int32)
        for i, pos in enumerate(positions):
            key = tuple(int(c) for c in pos)
            slot = self.by_pos.get(key)
            if slot is None:
                if not self._free:
                    raise RuntimeError(
                        "QuadPool exhausted; raise `slots` "
                        "(mesh cache capacity)")
                slot = self._free.pop()
                self.by_pos[key] = slot
                self._used[slot] = True
            slots[i] = slot
            self.counts[slot] = int(counts[i])
            self.counts6[slot] = c6[i]
            self.positions[slot] = key
        self.quads, self.counts6_dev = _pool_set_rows(
            self.quads, self.counts6_dev, jnp.asarray(slots), quad_rows,
            jnp.asarray(counts, jnp.int32))
        self._dev_cache = None
        self._lookup_cache = None

    def insert_many(self, items) -> None:
        """Batched insert of [(pos, quads-or-None), ...]: ONE donated
        device scatter for the whole remesh batch.  Batch sizes are padded
        to power-of-two buckets (duplicate scatter of the first row) so
        the jit retraces a bounded number of shapes."""
        if not items:
            return
        if len(items) > 512:  # bound the staging buffer / single transfer
            for i in range(0, len(items), 512):
                self.insert_many(items[i:i + 512])
            return
        # The batch crosses as ONE flat concatenated quad stream
        # (pow2-padded) + tiny (slot, start, count) arrays; rows are
        # rebuilt device-side (_pool_set_rows_flat).  Shape ladders bound
        # the jit retrace count: batch size {16, 64, 512}, device row
        # width {512, qcap}.  Meshes wider than 512 go in their own call
        # so the common streaming batch keeps the small gather width and
        # the warmable (16, 512, fp) shape family (warm_streaming).
        if any(it[1] is not None and len(it[1]) > 512 for it in items):
            small = [it for it in items
                     if it[1] is None or len(it[1]) <= 512]
            wide = [it for it in items
                    if it[1] is not None and len(it[1]) > 512]
            if small:
                self.insert_many(small)
            items = wide
        k = len(items)
        slots = np.zeros(k, np.int32)
        counts = np.zeros(k, np.int32)
        parts = []
        for i, (pos, quads) in enumerate(items):
            key = tuple(int(c) for c in pos)
            slot = self.by_pos.get(key)
            if slot is None:
                if not self._free:
                    raise RuntimeError(
                        "QuadPool exhausted; raise `slots` "
                        "(mesh cache capacity)")
                slot = self._free.pop()
                self.by_pos[key] = slot
                self._used[slot] = True
            n = 0
            if quads is not None:
                n = min(len(quads), self.qcap)
                if len(quads) > self.qcap:
                    self.overflow_drops += len(quads) - self.qcap
                parts.append(np.asarray(quads[:n], np.uint32))
                self.counts6[slot] = _dir_counts(parts[-1])
            else:
                self.counts6[slot] = 0
            slots[i] = slot
            counts[i] = n
            self.counts[slot] = n
            self.positions[slot] = key
        starts = np.cumsum(counts) - counts
        total = int(counts.sum())
        mc = 512 if counts.max(initial=0) <= 512 else self.qcap
        kp = 16 if k <= 16 else (64 if k <= 64 else 512)
        if kp != k:  # pad with idempotent duplicates of entry 0
            slots = np.concatenate([slots, np.full(kp - k, slots[0],
                                                   np.int32)])
            starts = np.concatenate([starts, np.full(kp - k, starts[0],
                                                     np.int64)])
            counts = np.concatenate([counts, np.full(kp - k, counts[0],
                                                     np.int32)])
        # pow2 with a 2048 floor: bounds the flat-shape ladder to
        # {2048, 4096, 8192, ...} (each distinct shape is one retrace)
        fp = 1 << max(11, (max(total, 1) - 1).bit_length())
        packed = np.zeros(3 * kp + fp, np.uint32)
        packed[:kp] = slots.astype(np.uint32)
        packed[kp:2 * kp] = starts.astype(np.uint32)
        packed[2 * kp:3 * kp] = counts.astype(np.uint32)
        if total:
            packed[3 * kp:3 * kp + total] = np.concatenate(parts)
        self.quads, self.counts6_dev = _pool_set_rows_flat(
            self.quads, self.counts6_dev, jnp.asarray(packed),
            k=kp, mc=mc)
        self._dev_cache = None
        self._lookup_cache = None

    # fused insert+render payload shape (ONE trace; bigger/odd batches
    # fall back to insert_many's shape ladder)
    INSERT_KP = 16
    INSERT_MC = 512
    INSERT_FP = 8192

    def prepare_insert_payload(self, items, kp: int | None = None,
                               mc: int | None = None,
                               fp: int | None = None) -> np.ndarray | None:
        """Host bookkeeping + ONE u32 payload for a fused insert+render
        dispatch (rendering/pipeline._fused_frame_insert), or None when
        the batch doesn't fit the fused shape (<= INSERT_KP entries,
        meshes <= INSERT_MC quads, flat total <= INSERT_FP) — callers
        then fall back to insert_many.

        ALL host-side state (slots, counts, counts6, positions, by_pos)
        updates immediately, so the same frame's funnel sees the new
        meshes; the DEVICE pool catches up inside the fused dispatch,
        before its draw-list expansion gathers rows.  Each separate
        host->device transfer costs ~a round trip on relay-attached
        hosts (NOTES.md) — folding the insert into the frame upload is
        the streaming path's round-trip diet."""
        kp = self.INSERT_KP if kp is None else kp
        mc = self.INSERT_MC if mc is None else mc
        fp = self.INSERT_FP if fp is None else fp
        items = [it for it in items]
        if not items or len(items) > kp:
            return None
        if any(it[1] is not None and len(it[1]) > mc
               for it in items):
            return None
        total = sum(len(q) for _, q in items if q is not None)
        if total > fp:
            return None
        k = len(items)
        slots = np.zeros(kp, np.int32)
        counts = np.zeros(kp, np.int32)
        parts = []
        for i, (pos, quads) in enumerate(items):
            key = tuple(int(c) for c in pos)
            slot = self.by_pos.get(key)
            if slot is None:
                if not self._free:
                    raise RuntimeError(
                        "QuadPool exhausted; raise `slots` "
                        "(mesh cache capacity)")
                slot = self._free.pop()
                self.by_pos[key] = slot
                self._used[slot] = True
            n = 0
            if quads is not None:
                n = len(quads)
                parts.append(np.asarray(quads, np.uint32))
                self.counts6[slot] = _dir_counts(parts[-1])
            else:
                self.counts6[slot] = 0
            slots[i] = slot
            counts[i] = n
            self.counts[slot] = n
            self.positions[slot] = key
        # pad unused entries with idempotent duplicates of entry 0
        slots[k:] = slots[0]
        counts[k:] = counts[0]
        starts = np.zeros(kp, np.int64)
        starts[:k] = np.cumsum(counts[:k]) - counts[:k]
        starts[k:] = starts[0]
        packed = np.zeros(3 * kp + fp, np.uint32)
        packed[:kp] = slots.astype(np.uint32)
        packed[kp:2 * kp] = starts.astype(np.uint32)
        packed[2 * kp:3 * kp] = counts.astype(np.uint32)
        if total:
            packed[3 * kp:3 * kp + total] = np.concatenate(parts)
        self._dev_cache = None
        self._lookup_cache = None
        return packed

    def dispatch_insert_payload(self, payload: np.ndarray,
                                kp: int | None = None,
                                mc: int | None = None) -> None:
        """Apply a prepared payload with the STANDALONE donated scatter
        (the fallback when the frame can't take the fused path)."""
        self.quads, self.counts6_dev = _pool_set_rows_flat(
            self.quads, self.counts6_dev, jnp.asarray(payload),
            k=self.INSERT_KP if kp is None else kp,
            mc=self.INSERT_MC if mc is None else mc)

    def adopt_device_arrays(self, quads, counts6_dev) -> None:
        """Rebind the device pool arrays after a fused insert+render
        dispatch returned the (donated-in, scattered) new buffers."""
        self.quads = quads
        self.counts6_dev = counts6_dev

    def remove(self, pos) -> None:
        key = tuple(int(c) for c in pos)
        slot = self.by_pos.pop(key, None)
        if slot is not None:
            self.counts[slot] = 0
            self.counts6[slot] = 0
            self._used[slot] = False
            self._free.append(slot)
            self._dev_cache = None
        self._lookup_cache = None

    def retain(self, predicate) -> None:
        """Drop cache entries whose position fails the predicate
        (main.rs:280 ``mesh_cache.retain``).  Pass a dict/set for the
        fast path (direct membership; a callable costs ~12 us/entry of
        Python overhead across thousands of cached meshes)."""
        if isinstance(predicate, (dict, set, frozenset)):
            keys = [k for k in self.by_pos if k not in predicate]
        else:
            keys = [k for k in self.by_pos if not predicate(k)]
        for key in keys:
            self.remove(key)

    def slot_of(self, pos) -> int | None:
        return self.by_pos.get(tuple(int(c) for c in pos))

    @staticmethod
    def _pack_keys(pos: np.ndarray) -> np.ndarray:
        """[N, 3] int chunk coords -> sortable int64 keys (21 bits/axis,
        biased)."""
        p = np.asarray(pos, np.int64)
        b = np.int64(1 << 20)
        return (((p[:, 0] + b) << 42) | ((p[:, 1] + b) << 21)
                | (p[:, 2] + b))

    def lookup_slots(self, pos: np.ndarray):
        """Vectorized pos -> slot join: returns (slots i32[N], has bool[N])
        where ``has`` marks positions with a cache entry (even count-0
        ones, matching ``in self.by_pos``).  One sorted-key binary search
        replaces the per-chunk dict loop of the frame funnel (measured
        ~0.85 ms of Python at vd12); the sorted table rebuilds lazily only
        after pool mutations."""
        if self._lookup_cache is None:
            used = np.nonzero(self._used)[0].astype(np.int32)
            keys = self._pack_keys(self.positions[used])
            o = np.argsort(keys)
            self._lookup_cache = (keys[o], used[o])
        pk, ps = self._lookup_cache
        q = self._pack_keys(pos)
        if len(pk) == 0 or len(q) == 0:
            return (np.zeros(len(q), np.int32), np.zeros(len(q), bool))
        ii = np.minimum(np.searchsorted(pk, q), len(pk) - 1)
        hit = pk[ii] == q
        return ps[ii].astype(np.int32), hit


@dataclass
class FrameResult:
    color: jnp.ndarray  # int32[H, W] ARGB bits (device)
    depth: jnp.ndarray  # f32[H, W] (device)
    stats: jnp.ndarray  # [gathered, rasterized, overflow, bin_overflow]
    rendered_meshes: int
    visible_chunks: int

    def color_numpy(self) -> np.ndarray:
        return np.asarray(self.color).view(np.uint32)

    def depth_numpy(self) -> np.ndarray:
        return np.asarray(self.depth)


class Engine:
    """Owns world + camera + mesh pool + renderer; drives frames."""

    def __init__(self, render_config: RenderConfig | None = None,
                 world_config: WorldConfig | None = None,
                 pool_slots: int = 4096,
                 horizon_config: HorizonCullingConfig | None = None,
                 device_meshing: bool = False,
                 resident_stream: bool | None = None):
        self.config = render_config or RenderConfig()
        # Resident superset stream mode (opt-in; DPVR_RESIDENT=1): the
        # moving-camera mode.  The device stream is built from the
        # DISTANCE SPHERE (the world's own visibility criterion,
        # world.rs:118-146, evaluated at the camera's chunk cell) with a
        # cell-widened dir mask, so it stays valid across ANY rotation
        # and any movement within the cell — the frustum draw list
        # changes nearly every moving frame (measured: 79/80 frames at
        # flythrough speed; NOTES.md round 5) and forced a per-frame
        # device re-expansion.  Every extra quad the superset carries is
        # one the device's exact frustum/backface culls drop, so frames
        # are bit-identical to the serial path (tested).  The stream
        # rebuilds only on cell crossings / unloads / explicit
        # invalidation; newly streamed chunks APPEND post-dispatch
        # (1-frame stale — the stale-pool contract).  Costs: a larger
        # gather bucket (2x gather_cap, compaction re-enabled) and
        # sphere-sized draw lists (vcap >= 1024).
        self.resident_stream = (bool(
            int(os.environ.get("DPVR_RESIDENT", "0") or "0"))
            if resident_stream is None else resident_stream)
        if self.resident_stream:
            self.config = dc_replace(
                self.config,
                gather_cap=2 * self.config.gather_cap,
                visible_chunks_cap=max(self.config.visible_chunks_cap,
                                       1024),
                # the superset rasterizes the chunks the host horizon
                # cull would have dropped; measured 259 items past the
                # 98304 item cap at the vd12 flythrough pose — and item
                # overflow drops whole trailing TILES (frame-visible),
                # so the resident mode carries headroom
                tile_k_cap=max(self.config.tile_k_cap, 131072))
        self._res_uploads = None          # (quads, quad_world) device pair
        self._res_total = 0               # host-tracked stream length
        self._res_cell = None             # camera chunk cell at build
        self._res_pos: set = set()        # position keys in the stream
        self._res_n = 0                   # chunk count (bookkeeping)
        self._res_dirty = False           # force rebuild next frame
        self._res_appends = 0             # consumed append-rider counter
        self._res_pending = None          # queued batch for next dispatch
        self._res_insert = None           # queued scatter payload (rides
                                          # the same dispatch; see
                                          # _step_camf_append_insert)
        self._res_fused_inserts = 0       # consumed fused-scatter counter
        # resident meshing budget: the sphere-wide remesh scan queues
        # every newly loaded chunk PLUS remeshed neighbors (the frustum
        # path only queues the visible ones) — unbudgeted, a streaming
        # frame could mesh 40-80 chunks (unwarmed 512-wide insert
        # shapes, ~5 ms host).  Per frame the stash is distance-sorted
        # and at most this many mesh; the rest carry over (the reference
        # budgets its own streaming at 16 chunks/frame, world.rs:34).
        # Sized to the resident insert payload (RESIDENT_INSERT_KP) so
        # a full batch still rides the fused scatter+append+render
        # dispatch instead of falling back to a standalone scatter.
        # DPVR_RES_BUDGET: measurement knob (smaller batches spread host
        # meshing over more frames at the cost of later visibility).
        self.resident_mesh_budget = int(os.environ.get(
            "DPVR_RES_BUDGET", str(RESIDENT_INSERT_KP)))
        self._stale_set: set = set()      # resident stash dedupe
        self.world = World(world_config or WorldConfig(
            view_distance=12, frustum_culling=True, max_chunks_per_frame=16
        ))
        if self.resident_stream:
            self.world.track_added = True
        self.renderer = Renderer(self.config)
        self.pool = QuadPool(slots=pool_slots)
        aspect = self.config.width / self.config.height
        self.camera = Camera(np.array([0.0, 10.0, 20.0], np.float32), aspect)
        self.controller = CameraController()
        self.horizon_config = horizon_config or HorizonCullingConfig()
        # mesh on device (ops/meshing_jax: batched bitplane masks +
        # lockstep greedy, bit-exact vs the host mesher) — worthwhile when
        # host CPU is the remeshing bottleneck; voxel upload (32 KB/chunk)
        # replaces quad upload (16 KB/chunk)
        self.device_meshing = device_meshing
        self.enable_horizon_culling = True
        self.enable_occlusion_culling = False  # 'O' toggle default (main.rs:112)
        # reference epsilon (occlusion.rs:138); see ops/occlusion.py note
        self.occlusion_epsilon = 0.005
        # per-second FPS print + slow-frame warning (main.rs:324-335,
        # 599-605); off by default so tests/benches stay quiet
        self.log_fps = False
        self.slow_frame_ms = 16.0
        self._fps_frames = 0
        self._fps_t0 = time.perf_counter()
        self._neighbor_offsets = [
            (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)
        ]
        # frame-to-frame memoization keys (static camera / static world
        # frames skip the remesh scan, cache retention, visibility query,
        # index building, and host->device uploads entirely)
        self._seen_world_version = -1
        self._seen_unload_version = -1
        self._seen_visible_sig = None
        self._seen_vp = None
        self._visible_cache = None
        self._upload_cache = None
        self._prev_hiz = None          # temporal_hiz: last static frame's
        self._prev_hiz_sig = None      # max pyramid + its (sig, vp) identity
        # frames-in-flight bookkeeping: (rendered_meshes, visible) per
        # entered-but-not-yet-emitted frame (render_frame_pipelined)
        self._pipe_meta: collections.deque = collections.deque()
        # streaming fast path: fold small remesh batches into the frame
        # dispatch (QuadPool.prepare_insert_payload + renderer
        # render_fused_insert); falls back to insert_many for big/odd
        # batches and to a standalone scatter when the frame can't take
        # the fused layout
        self.fused_insert = True
        self._pending_insert: np.ndarray | None = None
        # One-frame-stale pool mode (opt-in; DPVR_STALE_POOL=1 or set
        # this flag): a streaming frame renders from the pool AS OF the
        # previous frame and the frame's remesh batch is meshed +
        # inserted AFTER the render dispatch goes out.  This breaks the
        # donated-pool dependency chain — on relay-attached hosts every
        # streaming frame's dispatch otherwise consumes the PREVIOUS
        # frame's still-pending pool output, which the relay resolves
        # synchronously (~a round trip per frame, NOTES.md round 4) —
        # and overlaps host meshing with the device render.  Fidelity
        # cost, bounded and documented: the remesh batch lands ONE frame
        # late — a newly streamed chunk appears one frame after the
        # serial mode would show it, and a remeshed neighbor shows its
        # previous mesh for that one frame.  Nothing else differs
        # (tested: tests/test_engine.py stale-pool cases).
        self.stale_streaming = (bool(
            int(os.environ.get("DPVR_STALE_POOL", "0") or "0"))
            or self.resident_stream)  # resident appends are inherently
        #                               one frame stale (post-dispatch)
        self._stale_stash: list = []
        assert (QuadPool.INSERT_KP == Renderer.INSERT_KP
                and QuadPool.INSERT_MC == Renderer.INSERT_MC
                and QuadPool.INSERT_FP == Renderer.INSERT_FP)

    # ------------------------------------------------------------- meshing
    def _remesh(self, visible_chunks) -> int:
        """Incremental remeshing with neighbor invalidation
        (main.rs:224-277).  Returns number of chunks (re)meshed."""
        to_mesh: list[tuple[int, int, int]] = []
        meshed = self.pool.by_pos  # direct dict membership (hot path)
        loaded = self.world.chunks
        for chunk in visible_chunks:
            pos = chunk.position_key
            if pos not in meshed:
                to_mesh.append(pos)
                for off in self._neighbor_offsets:
                    np_ = (pos[0] + off[0], pos[1] + off[1], pos[2] + off[2])
                    if np_ in loaded and np_ in meshed:
                        to_mesh.append(np_)
        return self._mesh_list(to_mesh)

    def _missing_remesh_list(self, vis_pos: np.ndarray) -> list:
        """The frame's remesh batch: visible-but-unmeshed chunks plus
        their loaded-AND-meshed neighbors (border faces change;
        main.rs:224-277).  The missing-chunk scan is one sorted-key join
        (lookup_slots) instead of a Python loop over every visible chunk
        (~0.4 ms at vd12); the neighbor walk is one [M, 6, 3] numpy
        expansion + one more sorted-key join."""
        _, has = self.pool.lookup_slots(vis_pos)
        if has.all():
            return []
        missing = np.asarray(vis_pos[~has], np.int64)
        offs = np.asarray(self._neighbor_offsets, np.int64)  # [6, 3]
        nbrs = (missing[:, None, :] + offs[None, :, :]).reshape(-1, 3)
        _, nb_meshed = self.pool.lookup_slots(nbrs)
        keep = nbrs[nb_meshed]
        loaded = self.world.chunks
        to_mesh = [tuple(p) for p in missing.tolist()]
        to_mesh += [pos for p in keep.tolist()
                    if (pos := (p[0], p[1], p[2])) in loaded]
        return to_mesh

    def _remesh_positions(self, vis_pos: np.ndarray) -> int:
        return self._mesh_list(self._missing_remesh_list(vis_pos),
                               defer=True)

    def _mesh_list(self, to_mesh, defer: bool = False) -> int:
        if not to_mesh:
            return 0
        to_mesh = sorted(set(to_mesh))
        if self.device_meshing and len(to_mesh) >= 4:
            return self._remesh_device(to_mesh)
        batch = []
        for pos in to_mesh:
            chunk = self.world.chunks.get(pos)
            if chunk is None:
                continue
            batch.append((pos, mesh_chunk(chunk, self.world.chunks)))
        if defer and self.fused_insert and self._pending_insert is None:
            # streaming fast path: fold the insert into THIS frame's
            # render dispatch (one upload + one dispatch instead of
            # three uploads across two; rendering/pipeline
            # _fused_frame_insert).  Host pool state updates here; the
            # device pool catches up inside the frame's dispatch.
            payload = self.pool.prepare_insert_payload(batch)
            if payload is not None:
                self._pending_insert = payload
                return len(to_mesh)
        self.pool.insert_many(batch)
        return len(to_mesh)

    def _mesh_list_resident(self, to_mesh) -> None:
        """Resident streaming tail: mesh the batch and QUEUE its pool
        scatter as a payload riding the NEXT frame's render dispatch
        (rendering/pipeline._step_camf_append_insert — scatter + stream
        append + render, ONE dispatch / ONE upload).  Host pool state
        updates now so this frame's append metadata sees the new
        meshes; the device pool catches up inside that dispatch, which
        is also exactly when the batch first renders (the 1-frame-stale
        contract).  Batches that don't fit the resident payload shape
        scatter immediately (insert_many's shape ladder)."""
        if self.device_meshing and len(to_mesh) >= 4:
            self._remesh_device(sorted(set(to_mesh)))
            return
        batch = []
        for pos in sorted(set(to_mesh)):
            chunk = self.world.chunks.get(pos)
            if chunk is None:
                continue
            batch.append((pos, mesh_chunk(chunk, self.world.chunks)))
        if not batch:
            return
        # oversized meshes (> the payload's per-mesh row cap) scatter via
        # insert_many's shape ladder instead of poisoning the whole
        # batch's fused path (measured: one >cap mesh per batch was
        # enough to push most streaming frames onto the fallback)
        big = [(p, q) for p, q in batch
               if q is not None and len(q) > RESIDENT_INSERT_MC]
        if big:
            self.pool.insert_many(big)
            bigset = {p for p, _ in big}
            batch = [(p, q) for p, q in batch if p not in bigset]
        if batch and self._res_insert is None:
            payload = self.pool.prepare_insert_payload(
                batch, kp=RESIDENT_INSERT_KP, mc=RESIDENT_INSERT_MC,
                fp=RESIDENT_INSERT_FP)
            if payload is not None:
                self._res_insert = payload
                return
        if batch:
            self.pool.insert_many(batch)

    def _flush_res_insert(self) -> None:
        """Dispatch a queued resident scatter payload standalone — called
        before anything outside the fused program reads the device pool
        (stream rebuilds, mode fallbacks, remesh-only batches)."""
        if self._res_insert is not None:
            self.pool.dispatch_insert_payload(
                self._res_insert, kp=RESIDENT_INSERT_KP,
                mc=RESIDENT_INSERT_MC)
            self._res_insert = None

    def _remesh_device(self, to_mesh) -> int:
        """Batched on-device meshing (ops/meshing_jax.mesh_chunks_device):
        voxels + neighbor border planes go up once; packed quad rows land
        straight in the device pool (no host greedy pass, no quad H2D).
        Uniform chunks mesh to None exactly like the host path
        (binary_greedy.rs:87-89)."""
        from ..ops import meshing_jax as MJ

        varied, uniform = [], []
        for pos in to_mesh:
            chunk = self.world.chunks.get(pos)
            if chunk is None:
                continue
            (uniform if chunk.is_uniform else varied).append((pos, chunk))
        self.pool.insert_many([(pos, None) for pos, _ in uniform])
        if not varied:
            return len(to_mesh)
        positions = [pos for pos, _ in varied]
        dense_cache: dict[tuple, np.ndarray] = {}

        def dense_at(p):
            if p not in dense_cache:
                c = self.world.chunks.get(p)
                dense_cache[p] = None if c is None else c.dense()
            return dense_cache[p]

        blocks_by_pos = {}
        for pos, chunk in varied:
            blocks_by_pos[pos] = dense_at(pos)
            for off in self._neighbor_offsets:
                np_ = (pos[0] + off[0], pos[1] + off[1], pos[2] + off[2])
                d = dense_at(np_)
                if d is not None:
                    blocks_by_pos[np_] = d
        for chunk_size in (512,):  # bound the batch like insert_many
            for i in range(0, len(varied), chunk_size):
                part = positions[i:i + chunk_size]
                planes = MJ.neighbor_planes_from_batch(blocks_by_pos, part)
                batch = np.stack([blocks_by_pos[p] for p in part])
                # bucketed jit (ops/meshing_jax.MESH_BUCKETS): streaming
                # batch sizes vary per frame; unbucketed this retraced the
                # whole meshing program every frame (435 ms/frame, NOTES)
                quads, counts, overflow, c6, bucket = (
                    MJ.mesh_chunks_device_bucketed(
                        batch, planes, qcap=self.pool.qcap))
                if bucket != len(part):
                    # padding = repeats of chunk 0 -> identical rows, so
                    # the duplicate-slot scatter is deterministic
                    pad = bucket - len(part)
                    part = part + [part[0]] * pad
                    counts = np.concatenate([counts, counts[:1].repeat(pad)])
                    c6 = np.concatenate([c6, c6[:1].repeat(pad, axis=0)])
                self.pool.insert_rows_device(part, quads, counts, c6)
                self.pool.overflow_drops += int(overflow.sum())
        return len(to_mesh)

    # ------------------------------------------------------- runtime toggles
    def toggle_shading(self) -> bool:
        """The reference's F key (main.rs:143-153)."""
        self.renderer.set_shading(not self.config.enable_shading)
        return self.config.enable_shading

    def toggle_occlusion_culling(self) -> bool:
        """The reference's O key (main.rs:155-165)."""
        self.enable_occlusion_culling = not self.enable_occlusion_culling
        return self.enable_occlusion_culling

    def set_view_distance(self, vd: int) -> None:
        """The reference's 1/2/3 keys (main.rs:167-178)."""
        self.world.set_view_distance(vd)

    def prime(self) -> None:
        """Generate + mesh everything currently visible (the reference's
        startup path, main.rs:66-100)."""
        frustum = self.camera.extract_frustum()
        visible = self.world.get_visible_chunks_frustum(
            self.camera.position, frustum
        )
        self._remesh(visible)

    def warm_streaming(self) -> None:
        """Compile the streaming-path scatter shapes ahead of the frame
        loop (each distinct donated-scatter shape costs ~0.6 s of compile
        through the remote toolchain; cached persistently).  Inserts a
        throwaway entry at each batch-ladder size, then removes it."""
        fake = (10**6, 10**6, 10**6)
        # (kp, mc, fp) shape grid the flat-stream insert path can hit in
        # a streaming frame (each distinct shape = one jit trace; a miss
        # mid-flight costs ~2.5 s inside a frame):
        # kp16 x mc512 x fp {2048, 4096, 8192} (16 x 512 caps fp at 8192)
        for bs, width in ((1, 450), (5, 450), (10, 450),
                          # kp64 x mc512 x fp {2048, 4096, 8192, 16384,
                          # 32768} (neighbor-heavy frames)
                          (17, 1), (17, 200), (17, 450), (30, 450),
                          (64, 450),
                          # kp16 x mc qcap x fp {2048, 4096} (a >512-quad
                          # mesh splits into its own call)
                          (1, 513), (4, 513)):
            self.pool.insert_many([(fake, np.zeros(width, np.uint32))] * bs)
        if self.fused_insert:
            # warm the fused insert+render jit (the streaming fast path;
            # one trace each, else the first streaming frame pays ~2.5 s
            # mid-flight).  Each capacity bucket is its own compile
            # (minutes cold through the relay toolchain), so warm only
            # the buckets a flight plausibly hits: the current draw
            # list's bucket and its smaller neighbor when known (render
            # a frame before calling warm_streaming), else all.  The
            # payload rewrites the throwaway slot; the draw list is
            # synthetic — one chunk whose HOST count picks the bucket
            # (the device expansion reads the counts6 MIRROR).
            payload = self.pool.prepare_insert_payload(
                [(fake, np.zeros(4, np.uint32))])
            assert payload is not None
            vcap = self.config.visible_chunks_cap
            slot = self.pool.by_pos[fake]
            vs = np.zeros(vcap, np.int32)
            vs[0] = slot
            ps = np.zeros((vcap, 3), np.int32)
            vp = np.eye(4, dtype=np.float32)
            campos = np.zeros(3, np.float32)
            buckets = list(self.renderer.gather_buckets)
            if self._upload_cache is not None:
                # current bucket from the cached draw list (the fused
                # frame paths no longer return the expanded stream)
                total = int((self._last_counts_sel
                             * self._last_dir_mask).sum())
                cur = self.renderer.bucket_for(total)
                i = buckets.index(cur) if cur in buckets else 0
                buckets = buckets[max(0, i - 1):i + 2]
            for cap in buckets:
                cs = np.zeros((vcap, 6), np.int32)
                # counts are NOT part of the int16 meta (META5 reads the
                # device mirror); the host value only selects the bucket
                cs[0, 0] = cap - 1
                out = self.renderer.render_fused_insert(
                    self.pool.quads, self.pool.counts6_dev, vs, cs, ps,
                    vp, campos, payload)
                assert out is not None
                self.pool.adopt_device_arrays(out[0], out[1])
            jax.block_until_ready(self.pool.quads)
        self.pool.remove(fake)

    def warm_resident(self) -> None:
        """Compile the resident-mode programs ahead of the frame loop:
        the pool scatter ladder, the rebuild expansion + its render step
        (the current scene's bucket), and the stream append.  The
        resident path never calls the fused/insert frame programs, so
        this replaces warm_buckets + warm_streaming."""
        assert self.resident_stream
        fake = (10 ** 6, 10 ** 6, 10 ** 6)
        for bs, width in ((1, 450), (5, 450), (10, 450),
                          (17, 1), (17, 200), (17, 450), (30, 450),
                          (64, 450), (1, 513), (4, 513)):
            self.pool.insert_many([(fake, np.zeros(width, np.uint32))] * bs)
        self.pool.remove(fake)
        cell = world_to_chunk_pos(self.camera.position)
        if not self._rebuild_resident(cell):
            return
        vp = self.camera.view_projection_matrix()
        self.renderer.render_prepared(
            (self._res_uploads[0], self._res_uploads[1],
             np.int32(self._res_total)), vp, self.camera.position)
        # warm the append-rider step with a zero-count batch on the live
        # stream (nk=0 blends nothing; results discarded, stream kept as
        # built).  NOTE: a probe-chunk warm cannot work here — after
        # prime_all every in-sphere position is already pooled, so a
        # free-position search always came up empty and the first
        # streaming frame paid the ~3 s in-flight trace (measured,
        # round 5).
        from ..rendering.pipeline import pack_append_meta

        zmeta = pack_append_meta(np.zeros(1, np.int32),
                                 np.zeros((1, 6), np.int32),
                                 np.zeros((1, 3), np.int32))
        self.renderer.render_prepared_append(
            (self._res_uploads[0], self._res_uploads[1],
             np.int32(self._res_total)),
            vp, self.camera.position, self.pool.quads, zmeta, 0)
        # the fused scatter+append+render program (streaming frames):
        # scatter a probe mesh into a FREE slot (a zero-count payload
        # would scatter zero rows into its pad slot — entry-0 padding is
        # only idempotent when entry 0 is a real row), zero-count append
        fake = (10 ** 6 + 1, 10 ** 6, 10 ** 6)
        payload = self.pool.prepare_insert_payload(
            [(fake, np.zeros(4, np.uint32))], kp=RESIDENT_INSERT_KP,
            mc=RESIDENT_INSERT_MC, fp=RESIDENT_INSERT_FP)
        assert payload is not None
        *_drop, pool2, c6b = self.renderer.render_prepared_append_insert(
            (self._res_uploads[0], self._res_uploads[1],
             np.int32(self._res_total)),
            vp, self.camera.position, self.pool.quads,
            self.pool.counts6_dev, zmeta, 0, payload)
        self.pool.adopt_device_arrays(pool2, c6b)
        # ... and the standalone resident-shape scatter (_flush_res_insert
        # on rebuilds / remesh-only batches) — unwarmed it traces in-flight
        # mid-pass
        payload2 = self.pool.prepare_insert_payload(
            [(fake, np.zeros(4, np.uint32))], kp=RESIDENT_INSERT_KP,
            mc=RESIDENT_INSERT_MC, fp=RESIDENT_INSERT_FP)
        self.pool.dispatch_insert_payload(
            payload2, kp=RESIDENT_INSERT_KP, mc=RESIDENT_INSERT_MC)
        self.pool.remove(fake)
        jax.block_until_ready(self.pool.quads)

    def prime_all(self) -> None:
        """Mesh every loaded chunk (warm-cache steady state: rotating or
        moving the camera then hits the mesh cache, like the reference's
        README numbers)."""
        self._remesh(list(self.world.chunks.values()))

    def warm_buckets(self, pipelined: bool = False) -> None:
        """Pre-trace every renderer capacity bucket (see
        Renderer.warm_buckets): a moving camera whose quad total crosses a
        bucket boundary would otherwise pay a multi-second jit trace
        inside one frame.  ``pipelined`` additionally warms the
        frames-in-flight step family."""
        self.renderer.warm_buckets(
            self.pool.quads,
            None if _meta11_env() else self.pool.counts6_dev,
            pipelined=pipelined)

    def _dir_keep_mask(self, positions, cam_pos) -> np.ndarray:
        """Per-chunk face-direction keep mask [n, 6] (0 = every quad of
        that direction is provably backfacing; skipped before the gather).

        Exactness: the device backface test (ops/projection.py
        stage_a_fields, exact mode) keeps a +axis face iff
        ``cam_axis > world + axis_pos`` with axis_pos in [1, 32], and a
        -axis face iff ``cam_axis < world + axis_pos`` with axis_pos in
        [0, 31].  Skipping +axis when ``cam <= min + 1`` (all planes
        >= min+1 >= cam -> d <= 0) and -axis when ``cam >= min + 31``
        is therefore a strict subset of the device cull — the frame is
        bit-identical, only the gathered stream shrinks (reference's
        per-face-dir cull: rasterizer.rs:812-881).  All arithmetic is
        exact in f32 (integer-valued planes), so host and device agree
        deterministically.  Disabled (all-ones) when device backface
        culling is off or in span mode (whose clip-normal test differs).
        """
        if not self.config.backface_culling or self.config.span_mode:
            return np.ones((len(positions), 6), np.int32)
        m = positions.astype(np.float32) * np.float32(CHUNK_SIZE)
        cam = np.asarray(cam_pos, np.float32)
        keep = np.empty((len(positions), 6), np.int32)
        for axis in range(3):
            keep[:, 2 * axis] = cam[axis] > m[:, axis] + np.float32(1.0)
            keep[:, 2 * axis + 1] = cam[axis] < m[:, axis] + np.float32(31.0)
        return keep

    # --------------------------------------------------------------- frame
    def _funnel(self, dt: float):
        """Host side of a frame: camera/world update, visibility,
        remeshing, culling funnel, draw-list build.  Fills the _last_*
        draw-list arrays and returns (vp, sig, n, n_visible, cam_same).
        Shared by the serial and pipelined frame entry points."""
        cam = self.camera
        self.controller.update_camera(cam, dt)
        self.world.update(cam.position)

        vp_now = cam.view_projection_matrix()
        world_v = self.world.version
        cam_same = (self._seen_vp is not None
                    and np.array_equal(self._seen_vp, vp_now))
        if cam_same and world_v == self._seen_world_version                 and self._visible_cache is not None:
            vis_pos = self._visible_cache
        else:
            frustum = cam.extract_frustum()
            vis_pos = self.world.get_visible_positions(
                cam.position, frustum
            )
            self._visible_cache = vis_pos
            if not (cam_same and world_v == self._seen_world_version):
                if self.stale_streaming:
                    # stale-pool mode: collect the batch now, mesh +
                    # insert it AFTER the render dispatch (frame entry
                    # points apply _stale_stash); this frame's draw list
                    # is built from the pre-insert pool below
                    self._stale_stash += self._missing_remesh_list(vis_pos)
                else:
                    self._remesh_positions(vis_pos)
                if self.world.unload_version != self._seen_unload_version:
                    # retention only matters after an UNLOAD; streaming
                    # frames bump world.version every frame but unload
                    # rarely (the vd+2 hysteresis defers pruning), and
                    # the retain scan is O(pool) Python (~0.4 ms at vd12)
                    self.pool.retain(self.world.chunks)
                    self._seen_unload_version = self.world.unload_version
            self._seen_vp = vp_now.copy()
            self._seen_world_version = self.world.version

        # visible meshes: pool slots with quads among visible chunks —
        # one vectorized sorted-key join (lookup_slots) instead of a
        # per-chunk dict loop (~0.85 ms of Python at vd12)
        slots_all, has = self.pool.lookup_slots(vis_pos)
        hs = slots_all[has]
        nz = self.pool.counts[hs] > 0
        slots = hs[nz]
        centers = (vis_pos[has][nz].astype(np.float32) * CHUNK_SIZE + 16.0
                   if len(slots) else np.zeros((0, 3), np.float32))
        n_visible_meshes = len(slots)
        vp = cam.view_projection_matrix()

        if n_visible_meshes:
            order = sort_front_to_back(centers, cam.position)
            slots = slots[order]
            centers = centers[order]
            if self.enable_horizon_culling:
                keep = horizon_cull_mask(centers, cam.position,
                                         self.horizon_config)
                FUNCTION_COUNTERS.add("chunks_horizon_culled",
                                      int((~keep).sum()))
                slots, centers = slots[keep], centers[keep]
            if self.enable_occlusion_culling and len(slots):
                rects, near, _ = project_chunk_rects(
                    centers, vp, self.config.width, self.config.height
                )
                d2 = ((centers - cam.position[None, :]) ** 2).sum(-1)
                use_occ = d2 >= (CHUNK_SIZE * 2.0) ** 2  # main.rs:474-478
                keep = occlusion_pass(rects, near, use_occ,
                                      self.config.width, self.config.height,
                                      epsilon=self.occlusion_epsilon)
                FUNCTION_COUNTERS.add("chunks_occlusion_culled",
                                      int((~keep).sum()))
                slots, centers = slots[keep], centers[keep]

        vcap = self.config.visible_chunks_cap
        visible_slots = np.zeros(vcap, np.int32)
        counts_sel = np.zeros((vcap, 6), np.int32)
        mask_sel = np.ones((vcap, 6), np.int32)
        positions_sel = np.zeros((vcap, 3), np.int32)
        n = min(len(slots), vcap)
        if n:
            visible_slots[:n] = slots[:n]
            counts_sel[:n] = self.pool.counts6[slots[:n]]
            positions_sel[:n] = self.pool.positions[slots[:n]]
            mask_sel[:n] = self._dir_keep_mask(positions_sel[:n],
                                               cam.position)
        self._last_visible_slots = visible_slots
        self._last_counts_sel = counts_sel
        self._last_dir_mask = mask_sel
        self._last_positions_sel = positions_sel
        self._last_n_visible = n

        # the draw-list identity for upload reuse.  The dir mask is part
        # of it: it changes only when the camera crosses a chunk plane,
        # and a stale mask would DROP newly-front-facing geometry.
        sig = (self.world.version, visible_slots[:n].tobytes(),
               counts_sel[:n].tobytes(), mask_sel[:n].tobytes())
        return vp, sig, n, n_visible_meshes, cam_same

    def _apply_stale_stash(self) -> None:
        """Stale-pool mode: mesh + insert the batch collected by this
        frame's funnel, AFTER the frame's render dispatch went out (the
        host meshing overlaps the device render; the insert's donated
        pool output is consumed no earlier than the NEXT frame's
        dispatch, by which time it has long completed)."""
        if self._stale_stash:
            stash, self._stale_stash = self._stale_stash, []
            self._mesh_list(stash, defer=False)

    # --------------------------------------------- resident superset stream
    def invalidate_resident(self) -> None:
        """Force a resident-stream rebuild next frame.  Call after any
        out-of-band pool/world mutation (block edits, manual remeshes);
        the engine's own streaming/unload paths invalidate
        automatically."""
        self._res_dirty = True

    def _rebuild_resident(self, cell) -> bool:
        """Build the resident stream: every pooled mesh within the
        world's own sphere criterion of ``cell`` (dist_sq <= vd^2 in
        chunk grid — world.rs:118-146 evaluated at the cell, so the
        frame-by-frame frustum query always returns a subset), dir mask
        widened to the union of exact masks over the cell (valid for
        every camera position inside it; f32-exact integer arithmetic).
        Returns False when the set exceeds the draw-list/bucket caps —
        the caller falls back to the per-frame frustum path."""
        pool = self.pool
        live = np.flatnonzero(pool.counts > 0)
        vcap = self.config.visible_chunks_cap
        if len(live) == 0:
            return False
        p = pool.positions[live].astype(np.float32)
        d = p - np.float32(np.asarray(cell, np.float32))
        keep = np.einsum("ij,ij->i", d, d) <= np.float32(
            self.world.config.view_distance ** 2)
        sl = live[keep]
        n = len(sl)
        if n == 0 or n > vcap:
            return False
        vs = np.zeros(vcap, np.int32)
        cs = np.zeros((vcap, 6), np.int32)
        ps = np.zeros((vcap, 3), np.int32)
        vs[:n] = sl
        cs[:n] = pool.counts6[sl]
        ps[:n] = pool.positions[sl]
        mk = np.ones((vcap, 6), np.int32)
        m = ps[:n].astype(np.float32) * np.float32(CHUNK_SIZE)
        lo = np.asarray(cell, np.float32) * np.float32(CHUNK_SIZE)
        hi = lo + np.float32(CHUNK_SIZE)
        for axis in range(3):
            # union over cam in [lo, hi) of the exact per-axis keep
            # tests (_dir_keep_mask): any cam < hi passes the widened
            # +axis test; any cam > lo passes the widened -axis test
            mk[:n, 2 * axis] = hi[axis] > m[:, axis] + np.float32(1.0)
            mk[:n, 2 * axis + 1] = lo[axis] < m[:, axis] + np.float32(31.0)
        total = int((pool.counts6[sl] * mk[:n]).sum())
        if total > self.renderer.gather_buckets[-1]:
            return False
        q, w, _t = self.renderer.prepare_uploads(
            pool.quads, vs, cs, ps, dir_mask=mk)
        self._res_uploads = (q, w)
        self._res_total = total
        self._res_cell = tuple(int(c) for c in cell)
        self._res_pos = {tuple(int(x) for x in row)
                         for row in pool.positions[sl]}
        self._res_n = n
        self._res_dirty = False
        # a queued batch is already in the pool, so the fresh expansion
        # includes it — the pending rider is superseded
        self._res_pending = None
        return True

    def _queue_append(self, new_positions) -> None:
        """Queue newly inserted meshes for the NEXT frame's dispatch:
        the append rides inside that frame's render program
        (renderer.render_prepared_append — one dispatch, the stale
        contract unchanged: these chunks were already going to render
        one frame late).  All-ones dir mask — superset, exact.
        Oversized batches or a full stream flag a rebuild instead."""
        from ..rendering.pipeline import (RESIDENT_APPEND_VCAP,
                                          pack_append_meta,
                                          resident_append_cap)

        pool = self.pool
        cell = np.asarray(self._res_cell, np.float32)
        vd2 = np.float32(self.world.config.view_distance ** 2)
        slots = []
        for pos in new_positions:
            s = pool.by_pos.get(pos)
            if s is None:
                continue
            d = np.asarray(pos, np.float32) - cell
            if float((d * d).sum()) > vd2:
                continue  # outside the build sphere; next rebuild's job
            self._res_pos.add(pos)
            if pool.counts[s] > 0:
                slots.append(s)
        if not slots:
            return
        slots = np.asarray(slots, np.int32)
        c6 = pool.counts6[slots]
        batch = int(c6.sum())
        stream_len = int(self._res_uploads[0].shape[0])
        cap = resident_append_cap(stream_len)
        if (len(slots) > RESIDENT_APPEND_VCAP or batch > cap
                or self._res_total + cap > stream_len):
            self._res_dirty = True
            return
        ameta = pack_append_meta(slots, c6, pool.positions[slots])
        self._res_pending = (ameta, self._res_total, batch, len(slots))
        self._res_total += batch  # the stream copy lands next frame
        self._res_n += len(slots)

    def _render_frame_resident(self, dt: float) -> FrameResult | None:
        """Resident-mode frame: no frustum draw list, no per-frame
        expansion — one render_prepared dispatch on the resident stream,
        then (stale contract) host meshing + pool insert + stream append
        for whatever streamed in.  Returns None when the scene exceeds
        the resident caps (caller falls back to the frustum path)."""
        frame_t0 = time.perf_counter()
        cam = self.camera
        self.controller.update_camera(cam, dt)
        self.world.update(cam.position)
        if self.world.version != self._seen_world_version:
            # incremental remesh scan: only the chunks streamed in since
            # last frame (world add log) + their meshed neighbors — the
            # full sphere scan cost ~0.8 ms per streaming frame
            added = self.world.drain_added()
            if added:
                todo = self._missing_remesh_list(
                    np.asarray(added, np.int64))
                for p in todo:
                    if p not in self._stale_set:
                        self._stale_set.add(p)
                        self._stale_stash.append(p)
            self._seen_world_version = self.world.version
        if self.world.unload_version != self._seen_unload_version:
            self.pool.retain(self.world.chunks)
            self._seen_unload_version = self.world.unload_version
            self._res_dirty = True
        cell = world_to_chunk_pos(cam.position)
        if (self._res_uploads is None or self._res_dirty
                or cell != self._res_cell):
            # the rebuild expands from the device pool: any queued
            # scatter payload must land first
            self._flush_res_insert()
            # rebuilds also run the full sphere scan: a straggler that
            # predates the add log (initial region, external inserts)
            # gets meshed here
            vis = self.world.get_visible_positions(cam.position, None)
            for p in self._missing_remesh_list(vis):
                if p not in self._stale_set:
                    self._stale_set.add(p)
                    self._stale_stash.append(p)
            if not self._rebuild_resident(cell):
                return None
        vp = cam.view_projection_matrix()
        uploads = (self._res_uploads[0], self._res_uploads[1],
                   np.int32(self._res_total))
        if self._res_pending is not None:
            # previous frame's streamed batch rides in this dispatch:
            # pool scatter (when its payload fit the resident shape) +
            # append to the stream copy + render, one program
            ameta, offset, _batch, _nc = self._res_pending
            self._res_pending = None
            if self._res_insert is not None:
                payload = self._res_insert
                self._res_insert = None
                color, depth, stats, new_up, pool2, c6b = (
                    self.renderer.render_prepared_append_insert(
                        uploads, vp, cam.position, self.pool.quads,
                        self.pool.counts6_dev, ameta, offset, payload))
                self.pool.adopt_device_arrays(pool2, c6b)
                self._res_fused_inserts += 1
            else:
                color, depth, stats, new_up = (
                    self.renderer.render_prepared_append(
                        uploads, vp, cam.position, self.pool.quads,
                        ameta, offset))
            self._res_uploads = new_up
            self._res_appends += 1
        else:
            # remesh-only batches (no new positions) still need their
            # scatter before the stream's pool rows go stale-read
            self._flush_res_insert()
            color, depth, stats = self.renderer.render_prepared(
                uploads, vp, cam.position)
        if self._stale_stash:
            # nearest chunks mesh first (they become visible soonest);
            # the rest carry to later frames under the budget
            if len(self._stale_stash) > self.resident_mesh_budget:
                c = cam.position / np.float32(CHUNK_SIZE)
                arr = np.asarray(self._stale_stash, np.float32)
                d2 = ((arr - c[None, :]) ** 2).sum(1)
                order = np.argsort(d2, kind="stable")
                self._stale_stash = [self._stale_stash[i] for i in order]
            batch = self._stale_stash[:self.resident_mesh_budget]
            self._stale_stash = self._stale_stash[
                self.resident_mesh_budget:]
            self._stale_set.difference_update(batch)
            self._mesh_list_resident(batch)
            newpos = [pos for pos in batch if pos not in self._res_pos]
            if newpos:
                self._queue_append(newpos)
        self._frame_bookkeeping(stats, self._res_n, frame_t0)
        return FrameResult(color, depth, stats, self._res_n, self._res_n)

    def render_frame(self, dt: float = 0.016) -> FrameResult:
        if self.resident_stream:
            out = self._render_frame_resident(dt)
            if out is not None:
                return out
            # scene exceeds the resident caps: permanent fallback to the
            # per-frame frustum path (camera was already updated)
            self.resident_stream = False
            dt = 0.0
        if (self.renderer._pipe_carry is not None
                or self.renderer._pipe_done is not None):
            raise RuntimeError(
                "frames-in-flight pipeline is non-empty; call "
                "flush_pipeline() before mixing in serial render_frame")
        frame_t0 = time.perf_counter()
        vp, sig, n, n_visible_meshes, cam_same = self._funnel(dt)
        cam = self.camera
        # reuse the device-side gather arrays when the draw list is
        # unchanged (the TPU analogue of the reference's mesh/basis caches);
        # when it DID change, expansion + render go out as ONE dispatch
        # (moving-camera frames would otherwise pay two round trips).
        if self._pending_insert is not None:
            # a remesh batch is folded into this frame: one consolidated
            # upload + one dispatch (insert -> expand -> render)
            payload = self._pending_insert
            self._pending_insert = None
            out = self.renderer.render_fused_insert(
                self.pool.quads, self.pool.counts6_dev,
                self._last_visible_slots, self._last_counts_sel,
                self._last_positions_sel, vp, cam.position, payload,
                dir_mask=self._last_dir_mask)
            if out is not None:
                pool2, c6b, color, depth, stats = out
                self.pool.adopt_device_arrays(pool2, c6b)
                self._upload_cache = (sig, None)
                self._apply_stale_stash()
                self._frame_bookkeeping(stats, n, frame_t0)
                return FrameResult(color, depth, stats, n,
                                   n_visible_meshes)
            # fallback layout (truncated/legacy): standalone scatter,
            # then the normal render path below
            self.pool.dispatch_insert_payload(payload)
        if self._upload_cache is not None and self._upload_cache[0] == sig:
            uploads = self._upload_cache[1]
            if uploads is None:
                # the draw list settled after moving/streaming frames
                # (whose fused dispatches do not return the expanded
                # stream): re-expand ONCE and reuse from here on
                uploads = self.renderer.prepare_uploads(
                    self.pool.quads, self._last_visible_slots,
                    self._last_counts_sel, self._last_positions_sel,
                    dir_mask=self._last_dir_mask)
                self._upload_cache = (sig, uploads)
            if self.config.temporal_hiz and cam_same:
                # static frame: cull against the previous frame's depth
                # pyramid — exact (same camera/world/draw list), and the
                # new pyramid comes back fused in the same dispatch.  The
                # first static frame seeds with +inf (culls nothing).
                tsig = (sig, vp.tobytes())
                hiz1 = (self._prev_hiz
                        if self._prev_hiz is not None
                        and self._prev_hiz_sig == tsig
                        else self.renderer.empty_hiz())
                color, depth, stats, self._prev_hiz = (
                    self.renderer.render_prepared_hiz(
                        uploads, vp, cam.position, hiz1))
                self._prev_hiz_sig = tsig
            else:
                self._prev_hiz = None
                color, depth, stats = self.renderer.render_prepared(
                    uploads, vp, cam.position
                )
        else:
            color, depth, stats, uploads = self.renderer.render_fused(
                self.pool.quads, self._last_visible_slots,
                self._last_counts_sel, self._last_positions_sel,
                vp, cam.position, dir_mask=self._last_dir_mask,
                # META5 fast path; DPVR_META11=1 forces the legacy
                # 11-short layout (A/B measurement knob)
                counts6_dev=(None if _meta11_env()
                             else self.pool.counts6_dev),
            )
            self._upload_cache = (sig, uploads)
        self._apply_stale_stash()
        self._frame_bookkeeping(stats, n, frame_t0)
        return FrameResult(color, depth, stats, n, n_visible_meshes)

    def _frame_bookkeeping(self, stats, n, frame_t0) -> None:
        if FUNCTION_COUNTERS.enabled:
            st = np.asarray(stats)
            FUNCTION_COUNTERS.add("render_frames")
            FUNCTION_COUNTERS.add("quads_gathered", int(st[0]))
            FUNCTION_COUNTERS.add("quads_rasterized", int(st[1]))
            FUNCTION_COUNTERS.add("quads_culled", int(st[0]) - int(st[1]))
            # render_triangle_culled analog (profiling.rs sub-pixel counter)
            FUNCTION_COUNTERS.add("quads_subpixel_culled", int(st[4]))
        if self.log_fps:
            self._fps_frames += 1
            now = time.perf_counter()
            frame_ms = (now - frame_t0) * 1000.0
            if frame_ms > self.slow_frame_ms:
                print(f"slow frame: {frame_ms:.1f} ms "
                      f"(visible={n})")
            if now - self._fps_t0 >= 1.0:
                fps = self._fps_frames / (now - self._fps_t0)
                print(f"FPS: {fps:.1f} | chunks: {self.world.chunk_count()} "
                      f"| rendered meshes: {n}")
                self._fps_frames = 0
                self._fps_t0 = now

    def render_frame_pipelined(self, dt: float = 0.016) -> FrameResult | None:
        """Frames-in-flight frame (throughput mode): run this frame's
        funnel and dispatch it with its stage-A geometry fused into the
        PREVIOUS frame's raster call (one taxed Pallas dispatch per frame
        instead of two; rendering/pipeline.py render_*_pipelined), and
        return the previous frame's FrameResult — None on the first call.
        Drain the last frame with flush_pipeline().  Every emitted frame
        is bit-identical to render_frame's output for the same camera
        sequence (tested); the cost is ONE frame of output latency,
        honestly labeled wherever this mode is benchmarked.  The
        reference's analog is its Rayon pipeline overlap (main.rs:578-597).
        """
        frame_t0 = time.perf_counter()
        vp, sig, n, n_visible_meshes, _cam_same = self._funnel(dt)
        cam = self.camera
        self._prev_hiz = None
        if self._pending_insert is not None:
            # the fused insert+render path is serial-only for now: apply
            # the pending batch with the standalone scatter
            self.pool.dispatch_insert_payload(self._pending_insert)
            self._pending_insert = None
        if (self._upload_cache is not None
                and self._upload_cache[0] == sig
                and self._upload_cache[1] is not None):
            out = self.renderer.render_prepared_pipelined(
                self._upload_cache[1], vp, cam.position)
        else:
            out, uploads = self.renderer.render_fused_pipelined(
                self.pool.quads, self._last_visible_slots,
                self._last_counts_sel, self._last_positions_sel,
                vp, cam.position, dir_mask=self._last_dir_mask,
                counts6_dev=(None if _meta11_env()
                             else self.pool.counts6_dev),
            )
            self._upload_cache = (sig, uploads)
        self._apply_stale_stash()
        self._pipe_meta.append((n, n_visible_meshes))
        if out is None:
            return None
        color, depth, stats = out
        pn, pv = self._pipe_meta.popleft()
        self._frame_bookkeeping(stats, pn, frame_t0)
        return FrameResult(color, depth, stats, pn, pv)

    def flush_pipeline(self) -> FrameResult | None:
        """Drain the frames-in-flight pipeline: render + return the
        pending frame (None when the pipeline is empty)."""
        out = self.renderer.pipeline_flush()
        if out is None:
            self._pipe_meta.clear()
            return None
        color, depth, stats = out
        pn, pv = self._pipe_meta.popleft()
        return FrameResult(color, depth, stats, pn, pv)
