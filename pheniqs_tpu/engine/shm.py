"""Shared-memory batch transport for the streamed pipeline.

Moves ReadBatches (and per-decoder decision arrays) between the parent
and render workers through plain files on /dev/shm (tmpfs) mapped with
numpy: one file per task, one memcpy in (parent), zero-copy memmap views
out (worker), unlinked by the consumer. This keeps the parse
single-owner — replay transport made every worker re-parse the input,
multiplying parse CPU — while the control pipe carries only a tiny
descriptor.

Plain tmpfs files are used instead of multiprocessing.shared_memory
deliberately: the stdlib resource tracker double-counts segments touched
by two processes and prints spurious tracebacks at exit (fixed only in
3.13's track=False).
"""

from __future__ import annotations

import os
import uuid

import numpy as np

SHM_DIR = "/dev/shm"


def shm_supported() -> bool:
    return os.path.isdir(SHM_DIR) and os.access(SHM_DIR, os.W_OK)


def batch_to_shm(batch, decisions: list[dict] | None):
    """Serialize a ReadBatch (+ optional per-decoder decision arrays)
    into one fresh tmpfs file. Returns (descriptor, path); the worker
    maps it read-only and unlinks it when done."""
    arrays: list[tuple[str, np.ndarray]] = []
    for s, segment in enumerate(batch.segments):
        arrays.append((f"code{s}", segment.code))
        arrays.append((f"qual{s}", segment.quality))
        arrays.append((f"len{s}", segment.length))
    arrays.append(("qcfail", batch.qcfail))
    arrays.append(("name_offsets", batch.name_offsets))
    arrays.append(
        ("names_blob", np.frombuffer(batch.names_blob, dtype=np.uint8))
    )
    if decisions is not None:
        for k, decision in enumerate(decisions):
            for field, value in decision.items():
                arrays.append((f"d{k}_{field}", np.asarray(value)))

    layout = []
    offset = 0
    contiguous = []
    for key, value in arrays:
        value = np.ascontiguousarray(value)
        contiguous.append(value)
        layout.append((key, value.shape, value.dtype.str, offset))
        offset += -(-value.nbytes // 64) * 64  # 64B-align each array
    total = max(offset, 1)

    path = os.path.join(SHM_DIR, f"pheniqs-{os.getpid()}-{uuid.uuid4().hex}")
    target = np.memmap(path, dtype=np.uint8, mode="w+", shape=(total,))
    for (key, shape, dtype, start), value in zip(layout, contiguous):
        view = np.ndarray(shape, dtype=value.dtype, buffer=target,
                          offset=start)
        view[...] = value
    target.flush()
    del target  # drop the parent's mapping; the file carries the data
    descriptor = {
        "path": path,
        "layout": layout,
        "segments": len(batch.segments),
        "decoders": len(decisions) if decisions is not None else -1,
        "raw_index": batch.raw_index,
    }
    return descriptor, path


def shm_to_batch(descriptor):
    """Rebuild (ReadBatch, decisions | None, mapping) from a descriptor.
    Arrays are zero-copy views into the mapping — consume the batch
    before release_shm()."""
    from ..model.batch import ReadBatch
    from ..transform import SegmentBatch

    mapping = np.memmap(descriptor["path"], dtype=np.uint8, mode="r")
    views = {}
    for key, shape, dtype, start in descriptor["layout"]:
        views[key] = np.ndarray(
            shape, dtype=np.dtype(dtype), buffer=mapping, offset=start
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
    return batch, decisions, (mapping, descriptor["path"])


def release_shm(handle, unlink: bool):
    mapping, path = handle
    del mapping
    if unlink:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass


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
