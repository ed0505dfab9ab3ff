"""Shared-memory batch transport for the streamed pipeline.

Moves ReadBatches (and per-decoder decision arrays) between the parent
and render workers through a FIXED POOL of reusable files on /dev/shm
(tmpfs) mapped with numpy: one slot per in-flight task, one memcpy in
(parent), zero-copy memmap views out (worker). This keeps the parse
single-owner — replay transport made every worker re-parse the input,
multiplying parse CPU — while the control pipe carries only a tiny
descriptor.

Slots are REUSED rather than created per task: a fresh tmpfs file pays a
page zero-fill plus a fault per 4 KB on both sides of the fork (~measured
640 MB/s effective, ~100 ms per 131k-read batch); a hot slot's pages stay
faulted and a task costs one RAM-speed memcpy (~10 ms). The pool's free
queue doubles as the pipeline's backpressure (bounded tmpfs footprint),
the role the reference's fixed-capacity feed ring buffers play
(reference feed.h:155-278).

Plain tmpfs files are used instead of multiprocessing.shared_memory
deliberately: the stdlib resource tracker double-counts segments touched
by two processes and prints spurious tracebacks at exit (fixed only in
3.13's track=False).
"""

from __future__ import annotations

import os
import queue
import threading
import uuid

import numpy as np

SHM_DIR = "/dev/shm"


def shm_supported() -> bool:
    return os.path.isdir(SHM_DIR) and os.access(SHM_DIR, os.W_OK)


class SlotPool:
    """Parent-side pool of reusable tmpfs segments.

    `acquire` blocks until a slot is free (backpressure), growing the
    slot's file when the task needs more room; `release` happens when the
    ordered writer has consumed the worker's result for that task, after
    which the worker is guaranteed not to touch the slot again."""

    GRANULE = 1 << 20  # grow in 1 MB steps so widths settling early reuse

    def __init__(self, count: int):
        pid = os.getpid()
        self._paths = [
            os.path.join(SHM_DIR, f"pheniqs-{pid}-{uuid.uuid4().hex}")
            for _ in range(count)
        ]
        self._maps: list[np.memmap | None] = [None] * count
        self._sizes = [0] * count
        self._free: "queue.Queue[int]" = queue.Queue()
        for index in range(count):
            self._free.put(index)
        self.wait_seconds = 0.0  # cumulative backpressure blocking

    def try_acquire(self, nbytes: int) -> tuple[int, np.memmap] | None:
        """Non-blocking acquire: None when no slot is free right now.

        Zero-copy parse staging uses this so a writer stall never blocks
        the parser — the ingest layer falls back to private-memory parse
        for that batch and the (blocking) stage-time copy path, which
        buffers ahead exactly like the pre-zero-copy pipeline."""
        try:
            slot = self._free.get_nowait()
        except queue.Empty:
            return None
        return self._sized(slot, nbytes)

    def acquire(self, nbytes: int) -> tuple[int, np.memmap]:
        import time

        mark = time.perf_counter()
        slot = self._free.get()
        self.wait_seconds += time.perf_counter() - mark
        return self._sized(slot, nbytes)

    def _sized(self, slot: int, nbytes: int) -> tuple[int, np.memmap]:
        if self._sizes[slot] < nbytes:
            capacity = -(-nbytes // self.GRANULE) * self.GRANULE
            self._maps[slot] = None  # unmap before resizing
            with open(self._paths[slot], "wb") as handle:
                handle.truncate(capacity)
            self._maps[slot] = np.memmap(
                self._paths[slot], dtype=np.uint8, mode="r+",
                shape=(capacity,),
            )
            self._sizes[slot] = capacity
        return slot, self._maps[slot]

    def release(self, slot: int):
        self._free.put(slot)

    def ensure(self, slot: int, nbytes: int) -> np.memmap:
        """Grow an already-acquired slot to at least `nbytes` (used when
        decision arrays appended after staging overflow the reserve)."""
        if self._sizes[slot] < nbytes:
            capacity = -(-nbytes // self.GRANULE) * self.GRANULE
            self._maps[slot] = None
            with open(self._paths[slot], "r+b") as handle:
                handle.truncate(capacity)
            self._maps[slot] = np.memmap(
                self._paths[slot], dtype=np.uint8, mode="r+",
                shape=(capacity,),
            )
            self._sizes[slot] = capacity
        return self._maps[slot]

    def path(self, slot: int) -> str:
        return self._paths[slot]

    def capacity(self, slot: int) -> int:
        return self._sizes[slot]

    def close(self):
        for index, path in enumerate(self._paths):
            self._maps[index] = None
            unlink_leftover(path)


class SlotArena:
    """Bump allocator over one acquired pool slot: the native parser
    writes batch matrices straight into tmpfs slot memory, so staging
    records offsets instead of copying — zero-copy staging, the host
    lever the round-4 stage trace identified (1.9 us/read of contended
    slot memcpy at 4-core oversubscription vs 0.08 us hot-slot).

    `alloc` is thread-safe (per-feed parse threads allocate
    concurrently). Growth via `SlotPool.ensure` remaps the parent-side
    view, but arrays handed out earlier stay valid: the mappings are
    MAP_SHARED over the same tmpfs file, and ftruncate extension keeps
    existing pages."""

    def __init__(self, pool: SlotPool, slot: int, target: np.memmap):
        self.pool = pool
        self.slot = slot
        self._target = target
        self.end = 0
        self.adopted = False  # staged: the writer releases the slot
        self.released = False
        self._lock = threading.Lock()

    def alloc(self, shape, dtype) -> np.ndarray:
        dtype = np.dtype(dtype)
        nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize
        with self._lock:
            start = self.end
            self.end = start + (-(-nbytes // 64) * 64)  # 64B-align
            if self.end > self.pool.capacity(self.slot):
                self._target = self.pool.ensure(self.slot, self.end)
            target = self._target
        return np.ndarray(shape, dtype=dtype, buffer=target, offset=start)

    def release(self):
        """Return the slot to the pool (batch dropped by input filters or
        empty); a no-op once staging adopted the slot."""
        if not self.adopted and not self.released:
            self.released = True
            self.pool.release(self.slot)


def _slot_placement(value: np.ndarray, path: str):
    """(offset, strides) when `value`'s memory lies inside the slot file
    mapped at `path` (any mapping generation), else None."""
    base = value
    while base is not None and not isinstance(base, np.memmap):
        base = getattr(base, "base", None)
    if base is None or getattr(base, "filename", None) != path:
        return None
    # arrays here are prefix/strided slices with positive strides, so the
    # data pointer is the array's lowest address; the memmap maps the file
    # from offset 0, so pointer arithmetic gives the file offset directly
    offset = value.ctypes.data - base.ctypes.data
    if offset < 0 or offset > base.nbytes:
        return None
    return int(offset), value.strides


def _layout_arrays(arrays, base_offset: int = 0):
    """64B-aligned layout plan for a list of (key, array) pairs."""
    layout = []
    contiguous = []
    offset = base_offset
    for key, value in arrays:
        value = np.ascontiguousarray(value)
        contiguous.append(value)
        layout.append((key, value.shape, value.dtype.str, offset))
        offset += -(-value.nbytes // 64) * 64  # 64B-align each array
    return layout, contiguous, offset


def _batch_arrays(batch) -> list[tuple[str, np.ndarray]]:
    arrays: list[tuple[str, np.ndarray]] = []
    for s, segment in enumerate(batch.segments):
        arrays.append((f"code{s}", segment.code))
        arrays.append((f"qual{s}", segment.quality))
        arrays.append((f"len{s}", segment.length))
    arrays.append(("qcfail", batch.qcfail))
    arrays.append(("name_offsets", batch.name_offsets))
    blob = batch.names_blob
    if not isinstance(blob, np.ndarray):
        blob = np.frombuffer(blob, dtype=np.uint8)
    arrays.append(("names_blob", blob))
    return arrays


def stage_batch(batch, pool: SlotPool, reserve: int = 0):
    """Write a ReadBatch's arrays into a fresh pool slot, reserving
    `reserve` trailing bytes for decision arrays appended later
    (append_decisions). Returns (slot, layout, end_offset). Called from
    the ingest thread so the big matrix memcpy overlaps device dispatch.

    Zero-copy path: when the batch was parsed straight into a SlotArena
    (native parser writing into the slot's mapping), in-slot arrays are
    recorded by (offset, strides) instead of copied; only small
    stragglers (arrays a consumer copied out, e.g. interleave
    de-stride) append after the arena's high-water mark."""
    arena = getattr(batch, "_arena", None)
    if arena is not None and not arena.released:
        path = pool.path(arena.slot)
        layout = []
        stragglers: list[tuple[str, np.ndarray]] = []
        for key, value in _batch_arrays(batch):
            placed = _slot_placement(value, path)
            if placed is not None:
                offset, strides = placed
                layout.append(
                    (key, value.shape, value.dtype.str, offset, strides)
                )
            else:
                stragglers.append((key, value))
        tail, contiguous, end = _layout_arrays(stragglers, arena.end)
        if stragglers or reserve:
            target = pool.ensure(arena.slot, end + reserve)
            for (key, shape, dtype, start), value in zip(tail, contiguous):
                view = np.ndarray(
                    shape, dtype=value.dtype, buffer=target, offset=start
                )
                view[...] = value
        arena.adopted = True  # released by the writer, not the parser
        return arena.slot, layout + tail, end
    layout, contiguous, offset = _layout_arrays(_batch_arrays(batch))
    slot, target = pool.acquire(max(offset + reserve, 1))
    for (key, shape, dtype, start), value in zip(layout, contiguous):
        view = np.ndarray(shape, dtype=value.dtype, buffer=target,
                          offset=start)
        view[...] = value
    return slot, layout, offset


def append_decisions(pool: SlotPool, slot: int, layout, offset: int,
                     decisions: list[dict]):
    """Append per-decoder decision arrays to a staged slot, growing it
    when the stage-time reserve was short. Returns (layout, end_offset)."""
    arrays = [
        (f"d{k}_{field}", np.asarray(value))
        for k, decision in enumerate(decisions)
        for field, value in decision.items()
    ]
    d_layout, contiguous, end = _layout_arrays(arrays, offset)
    target = pool.ensure(slot, end)
    for (key, shape, dtype, start), value in zip(d_layout, contiguous):
        view = np.ndarray(shape, dtype=value.dtype, buffer=target,
                          offset=start)
        view[...] = value
    return layout + d_layout, end


def batch_to_shm(batch, decisions: list[dict] | None, pool: SlotPool,
                 staged=None):
    """Serialize a ReadBatch (+ optional per-decoder decision arrays)
    into a pool slot. Returns (descriptor, slot); the worker maps the
    slot's file read-only (cached across tasks) and the parent releases
    the slot when the writer consumes the worker's result. `staged` is
    a (slot, layout, end_offset) from an earlier stage_batch call."""
    if staged is None:
        slot, layout, offset = stage_batch(batch, pool)
    else:
        slot, layout, offset = staged
    if decisions is not None:
        layout, offset = append_decisions(pool, slot, layout, offset, decisions)
    descriptor = {
        "path": pool.path(slot),
        "capacity": pool.capacity(slot),
        "layout": layout,
        "segments": len(batch.segments),
        "decoders": len(decisions) if decisions is not None else -1,
        "raw_index": batch.raw_index,
    }
    return descriptor, slot


# worker-side mapping cache: slot files are stable for the process
# lifetime, so each worker maps a file once and remaps only when the
# parent grew it (descriptor carries the current capacity)
_worker_maps: dict[str, tuple[np.memmap, int]] = {}


def shm_to_batch(descriptor):
    """Rebuild (ReadBatch, decisions | None) from a descriptor. Arrays
    are zero-copy views into the cached slot mapping — fully consume the
    batch before the task's result is reported (the parent may then reuse
    the slot)."""
    from ..model.batch import ReadBatch
    from ..transform import SegmentBatch

    path = descriptor["path"]
    capacity = descriptor["capacity"]
    cached = _worker_maps.get(path)
    if cached is None or cached[1] < capacity:
        mapping = np.memmap(path, dtype=np.uint8, mode="r")
        _worker_maps[path] = (mapping, mapping.shape[0])
    else:
        mapping = cached[0]
    views = {}
    for entry in descriptor["layout"]:
        # 4-tuples are contiguous copies; 5-tuples carry the strides of a
        # zero-copy in-slot view (stage_batch arena path)
        key, shape, dtype, start = entry[:4]
        strides = entry[4] if len(entry) == 5 else None
        views[key] = np.ndarray(
            shape, dtype=np.dtype(dtype), buffer=mapping, offset=start,
            strides=strides,
        )
    segments = [
        SegmentBatch(
            code=views[f"code{s}"],
            quality=views[f"qual{s}"],
            length=views[f"len{s}"],
        )
        for s in range(descriptor["segments"])
    ]
    batch = ReadBatch(
        segments=segments,
        qcfail=views["qcfail"],
        names_blob=views["names_blob"].tobytes(),
        name_offsets=views["name_offsets"],
    )
    batch.raw_index = descriptor["raw_index"]
    decisions = None
    if descriptor["decoders"] >= 0:
        decisions = []
        for k in range(descriptor["decoders"]):
            prefix = f"d{k}_"
            decisions.append(
                {
                    key[len(prefix):]: value
                    for key, value in views.items()
                    if key.startswith(prefix)
                }
            )
    return batch, decisions


def chunk_to_shm(chunk: dict) -> dict | None:
    """Spill a worker's rendered output chunk ({url: bytes}) to one tmpfs
    file, returning a descriptor the parent consumes with chunk_from_shm.
    A 65 MB chunk pickled through the result queue costs a pickle copy
    plus two pipe crossings per batch; a tmpfs spill is one write here and
    one read + feed write there. Returns None when tmpfs is unavailable
    (caller sends the dict as-is)."""
    if not chunk or not shm_supported():
        return None
    path = os.path.join(
        SHM_DIR, f"pheniqs-{os.getpid()}-out-{uuid.uuid4().hex}"
    )
    layout = []
    offset = 0
    try:
        with open(path, "wb") as handle:
            for url, data in chunk.items():
                handle.write(data)
                layout.append((url, offset, len(data)))
                offset += len(data)
    except OSError:
        unlink_leftover(path)
        return None
    return {"__shm_chunk__": path, "layout": layout}


def chunk_from_shm(descriptor: dict):
    """Yield (url, bytes) from a chunk descriptor, then unlink the file."""
    path = descriptor["__shm_chunk__"]
    try:
        with open(path, "rb") as handle:
            for url, offset, size in descriptor["layout"]:
                handle.seek(offset)
                yield url, handle.read(size)
    finally:
        unlink_leftover(path)


def unlink_leftover(path: str):
    """Best-effort cleanup of a file a crashed worker never consumed."""
    try:
        os.unlink(path)
    except FileNotFoundError:
        pass


def sweep_stale(max_files: int = 64):
    """Opportunistically unlink segments left by hard-killed runs: the
    file name embeds the creating PID; if that process is gone, nothing
    will ever consume the file."""
    try:
        entries = os.listdir(SHM_DIR)
    except OSError:
        return
    removed = 0
    for name in entries:
        if not name.startswith("pheniqs-") or removed >= max_files:
            continue
        parts = name.split("-")
        if len(parts) < 3:
            continue
        try:
            pid = int(parts[1])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            unlink_leftover(os.path.join(SHM_DIR, name))
            removed += 1
        except PermissionError:
            continue
