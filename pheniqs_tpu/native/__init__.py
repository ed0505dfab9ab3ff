"""ctypes bindings to the native host runtime (native/pheniqs_host.cpp).

The shared library is compiled on demand with the system toolchain (g++,
zlib) and cached next to the source; when the toolchain or zlib is
unavailable the engine transparently falls back to the pure-Python reader,
so the native path is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

# the C++ source ships inside the package (wheel/sdist carry it; the
# library is compiled on demand next to it and cached)
_SOURCE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pheniqs_host.cpp")
_LIBRARY = os.path.join(os.path.dirname(_SOURCE), "libpheniqs_host.so")

_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    if os.path.exists(_LIBRARY) and os.path.getmtime(_LIBRARY) >= os.path.getmtime(
        _SOURCE
    ):
        return None
    command = [
        "g++", "-O3", "-ffp-contract=off", "-std=c++17", "-shared", "-fPIC",
        _SOURCE, "-o", _LIBRARY, "-lz", "-lpthread",
    ]
    result = subprocess.run(command, capture_output=True, text=True)
    if result.returncode != 0:
        return result.stderr[-2000:]
    return None


def load():
    """Load (building if needed) the native library, or None.
    PHENIQS_NATIVE=0 disables it (pure-Python fallbacks everywhere)."""
    global _lib, _build_error
    if os.environ.get("PHENIQS_NATIVE") == "0":
        return None
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        error = _build()
        if error is not None:
            _build_error = error
            return None
        try:
            lib = ctypes.CDLL(_LIBRARY)
        except OSError as exc:
            _build_error = str(exc)
            return None
        lib.pq_fastq_open.restype = ctypes.c_void_p
        lib.pq_fastq_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.pq_fastq_error.restype = ctypes.c_char_p
        lib.pq_fastq_error.argtypes = [ctypes.c_void_p]
        lib.pq_fastq_close.restype = None
        lib.pq_fastq_close.argtypes = [ctypes.c_void_p]
        lib.pq_fastq_pending_length.restype = ctypes.c_int64
        lib.pq_fastq_pending_length.argtypes = [ctypes.c_void_p]
        lib.pq_fastq_read_batch.restype = ctypes.c_int32
        lib.pq_fastq_read_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pq_fastq_format_batch.restype = ctypes.c_int64
        lib.pq_fastq_format_batch.argtypes = [
            ctypes.c_int32,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pq_concat_spans.restype = ctypes.c_int64
        lib.pq_concat_spans.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        lib.pq_apply_token.restype = None
        lib.pq_apply_token.argtypes = [
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),  # src_code
            ctypes.POINTER(ctypes.c_uint8),  # src_qual
            ctypes.c_int64,  # src_row_stride
            ctypes.c_int64,  # start
            ctypes.c_int32,  # w
            ctypes.POINTER(ctypes.c_int32),  # size
            ctypes.POINTER(ctypes.c_uint8),  # dst_code
            ctypes.POINTER(ctypes.c_uint8),  # dst_qual
            ctypes.c_int64,  # dst_row_stride
            ctypes.c_int64,  # dst_col_offset
            ctypes.POINTER(ctypes.c_int32),  # dst_len
        ]
        lib.pq_observation_spans.restype = None
        lib.pq_observation_spans.argtypes = [
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_void_p),  # codes
            ctypes.POINTER(ctypes.c_void_p),  # quals
            ctypes.POINTER(ctypes.c_void_p),  # seg_lens
            ctypes.POINTER(ctypes.c_int32),  # widths
            ctypes.POINTER(ctypes.c_void_p),  # panel_segs
            ctypes.c_int64,  # panel_stride
            ctypes.POINTER(ctypes.c_int32),  # seg_widths
            ctypes.POINTER(ctypes.c_int32),  # decoded
            ctypes.c_uint8,  # corrected_quality
            ctypes.POINTER(ctypes.c_uint8),  # raw_seq
            ctypes.POINTER(ctypes.c_uint8),  # raw_qual
            ctypes.POINTER(ctypes.c_int32),  # raw_lens
            ctypes.POINTER(ctypes.c_uint8),  # cor_seq
            ctypes.POINTER(ctypes.c_uint8),  # cor_qual
            ctypes.POINTER(ctypes.c_int32),  # cor_lens
        ]
        lib.pq_sam_format_full.restype = ctypes.c_int64
        lib.pq_sam_format_full.argtypes = [
            ctypes.c_int32,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pq_bam_format_full.restype = ctypes.c_int64
        lib.pq_bam_format_full.argtypes = lib.pq_sam_format_full.argtypes
        lib.pq_sam_format_batch.restype = ctypes.c_int64
        lib.pq_sam_format_batch.argtypes = [
            ctypes.c_int32,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pq_rans_compress.restype = ctypes.c_int64
        lib.pq_rans_compress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        lib.pq_rans_uncompress.restype = ctypes.c_int64
        lib.pq_rans_uncompress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        lib.pq_rans_nx16_compress.restype = ctypes.c_int64
        lib.pq_rans_nx16_compress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        lib.pq_rans_nx16_uncompress.restype = ctypes.c_int64
        lib.pq_rans_nx16_uncompress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
        ]
        lib.pq_cram_decode_slice.restype = ctypes.c_int32
        lib.pq_cram_decode_slice.argtypes = [
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pq_mdd_classify.restype = None
        lib.pq_mdd_classify.argtypes = [
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.pq_pamld_classify.restype = None
        lib.pq_pamld_classify.argtypes = [
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pq_bam_open.restype = ctypes.c_void_p
        lib.pq_bam_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.pq_bam_error.restype = ctypes.c_char_p
        lib.pq_bam_error.argtypes = [ctypes.c_void_p]
        lib.pq_bam_pending_length.restype = ctypes.c_int64
        lib.pq_bam_pending_length.argtypes = [ctypes.c_void_p]
        lib.pq_bam_close.restype = None
        lib.pq_bam_close.argtypes = [ctypes.c_void_p]
        lib.pq_bam_read_batch.restype = ctypes.c_int32
        lib.pq_bam_read_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pq_pack_h2d_segment.restype = None
        lib.pq_pack_h2d_segment.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.pq_pack_h2d_segment_cb.restype = None
        lib.pq_pack_h2d_segment_cb.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.pq_pack_h2d_segment_j4.restype = None
        lib.pq_pack_h2d_segment_j4.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.pq_bgzf_open.restype = ctypes.c_void_p
        lib.pq_bgzf_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.pq_bgzf_read.restype = ctypes.c_int64
        lib.pq_bgzf_read.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        lib.pq_bgzf_error.restype = ctypes.c_char_p
        lib.pq_bgzf_error.argtypes = [ctypes.c_void_p]
        lib.pq_bgzf_close.restype = None
        lib.pq_bgzf_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def sam_format_batch(
    names_blob: bytes,
    name_offsets: np.ndarray,
    flags: np.ndarray,
    code: np.ndarray,
    quality: np.ndarray,
    length: np.ndarray,
    phred_offset: int,
    tag_blob: bytes,
    tag_offsets: np.ndarray,
) -> tuple[bytes, np.ndarray] | None:
    """Format N SAM lines natively; returns (arena, line_offsets) or None
    when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    n = flags.shape[0]
    width = code.shape[1] if code.ndim == 2 else 0
    code = np.ascontiguousarray(code, dtype=np.uint8)
    quality = np.ascontiguousarray(quality, dtype=np.uint8)
    length = np.ascontiguousarray(length, dtype=np.int32)
    flags = np.ascontiguousarray(flags, dtype=np.int32)
    name_offsets = np.ascontiguousarray(name_offsets, dtype=np.int64)
    tag_offsets = np.ascontiguousarray(tag_offsets, dtype=np.int64)
    line_offsets = np.zeros(n + 1, dtype=np.int64)
    capacity = len(names_blob) + len(tag_blob) + n * (40 + 2 * max(width, 1))
    while True:
        arena, out = _scratch(capacity)
        used = lib.pq_sam_format_batch(
            n,
            names_blob,
            name_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            flags.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            code.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            quality.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            length.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            width,
            phred_offset,
            tag_blob,
            tag_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out,
            capacity,
            line_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if used >= 0:
            # zero-copy: a uint8 view of this call's own arena (fresh
            # allocation, so views from successive calls never alias)
            return arena[:used], line_offsets
        capacity = -used


def _scratch(capacity: int):
    """Uninitialized output scratch: np.empty skips the memset that
    ctypes.create_string_buffer pays on every call (the buffer is fully
    overwritten by the native writer up to the returned length)."""
    arena = np.empty(capacity, dtype=np.uint8)
    return arena, arena.ctypes.data_as(ctypes.c_char_p)


def available() -> bool:
    return load() is not None


def build_error() -> str | None:
    return _build_error


def _np_alloc(shape, dtype) -> np.ndarray:
    """Default batch-matrix allocator: fresh process-private memory.

    Engines that stage batches through shared memory pass
    ``SlotArena.alloc`` instead, so the parser writes straight into the
    worker-visible slot (zero-copy staging)."""
    return np.empty(shape, dtype=dtype)


class NativeFastqReader:
    """Batch FASTQ reader over the native parser.

    Yields (code (N, W) uint8, qual (N, W) uint8, length (N,) int32,
    qcfail (N,) bool, names list[bytes]) with W = ``max_length``.
    """

    _label = "FASTQ"

    def __init__(self, path: str, phred_offset: int = 33, max_length: int = 512):
        lib = load()
        if lib is None:
            raise RuntimeError(f"native host library unavailable: {_build_error}")
        self._lib = lib
        self.max_length = max_length
        self._adapted = False
        self.handle = self._open(path, phred_offset)
        if not self.handle:
            raise FileNotFoundError(path)

    # --- format bindings (overridden by NativeBamReader) -----------------
    def _open(self, path: str, phred_offset: int):
        return self._lib.pq_fastq_open(path.encode(), phred_offset)

    def _read(self, *args):
        return self._lib.pq_fastq_read_batch(*args)

    def _pending(self):
        return self._lib.pq_fastq_pending_length(self.handle)

    def _error(self):
        return self._lib.pq_fastq_error(self.handle)

    def _close(self):
        self._lib.pq_fastq_close(self.handle)

    def read_batch(self, max_records: int, alloc=None, name_alloc=None):
        """Parse up to ``max_records`` records. ``alloc(shape, dtype)``,
        when given, provides the destination matrices (zero-copy staging:
        the engine hands out views into a shared-memory slot, so the
        parser writes batch arrays straight into worker-visible memory);
        ``name_alloc`` does the same for the name arena + offsets and
        additionally switches the return to prefix VIEWS (no tobytes/copy)
        since the arena owns the lifetime."""
        if alloc is None:
            alloc = _np_alloc
        while True:
            w = self.max_length
            # fresh-allocation path uses np.empty: the parser fully writes
            # every parsed row (data + zeroed row padding), and only rows
            # [0, count) are consumed — zero-filling 30+ MB per batch was
            # pure overhead
            code = alloc((max_records, w), np.uint8)
            qual = alloc((max_records, w), np.uint8)
            length = alloc((max_records,), np.int32)
            qcfail = alloc((max_records,), np.uint8)
            # the parser reserves 4096 bytes of headroom per record; keep a
            # floor so tiny batches (max_records * 256 < 4096) still ingest
            names_capacity = max(max_records * 256, 8192)
            if name_alloc is not None:
                names = name_alloc((names_capacity,), np.uint8)
                name_offset = name_alloc((max_records + 1,), np.int64)
            else:
                names = np.empty(names_capacity, dtype=np.uint8)
                name_offset = np.empty(max_records + 1, dtype=np.int64)

            count = self._read(
                self.handle,
                max_records,
                w,
                code.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                qual.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                length.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                qcfail.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                names.ctypes.data_as(ctypes.c_void_p),
                names_capacity,
                name_offset.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
            if count == -3:
                # a record longer than the current matrices is pending in
                # the native reader (reference handles arbitrary read
                # lengths — never truncate); grow to the next 128-multiple
                # covering it and retry
                pending = int(self._pending())
                self.max_length = max(-(-pending // 128) * 128, w * 2)
                continue
            if count == -2:
                from ..errors import SequenceError

                raise SequenceError(
                    f"native {self._label} reader: name arena exhausted "
                    f"(capacity {names_capacity})"
                )
            if count < 0:
                from ..errors import SequenceError

                raw_message = self._error() or b""
                message = raw_message.decode("utf-8", errors="replace")
                raise SequenceError(
                    message or f"native {self._label} parse error"
                )
            if count == 0:
                return None
            break
        # the parser leaves row padding untouched (zeroing every row to the
        # full stride cost GBs of memset); zero only the short rows, up to
        # the batch width — columns past max(length) are undefined
        batch_width = min(int(length[:count].max(initial=0)), w)
        if not self._adapted:
            # adopt the observed read length as the matrix stride so the
            # caller's [:, :width] slice is the whole (contiguous) matrix
            # — Illumina runs are fixed-length; a longer record later
            # re-grows via the -3 protocol
            self._adapted = True
            self.max_length = max(batch_width, 8)
        short_rows = np.flatnonzero(length[:count] < batch_width)
        for row in short_rows:
            code[row, length[row] : batch_width] = 0
            qual[row, length[row] : batch_width] = 0
        if name_alloc is not None:
            # arena-backed: prefix views, no copies — the parser wrote 0/1
            # into qcfail, so the bool reinterpret is exact
            blob = names[: name_offset[count]]
            offsets = name_offset[: count + 1]
            fail = qcfail[:count].view(np.bool_)
        else:
            blob = names[: name_offset[count]].tobytes()
            offsets = name_offset[: count + 1].copy()
            fail = qcfail[:count].astype(bool)
        return (
            code[:count],
            qual[:count],
            length[:count],
            fail,
            blob,
            offsets,
        )

    def close(self):
        if self.handle:
            self._close()
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeBamReader(NativeFastqReader):
    """Batch BAM reader over the native parser: parallel BGZF inflate +
    record parsing straight into SoA buffers (BAM nibbles are the 4-bit
    codes the framework uses natively). Raises FileNotFoundError for
    non-BGZF/non-BAM files — callers fall back to the Python reader."""

    _label = "BAM"

    def _open(self, path: str, phred_offset: int):
        import os

        threads = int(os.environ.get("PHENIQS_BGZF_THREADS", "3"))
        return self._lib.pq_bam_open(path.encode(), threads)

    def _read(self, *args):
        return self._lib.pq_bam_read_batch(*args)

    def _pending(self):
        return self._lib.pq_bam_pending_length(self.handle)

    def _error(self):
        return self._lib.pq_bam_error(self.handle)

    def _close(self):
        self._lib.pq_bam_close(self.handle)


class SpanColumn:
    """Per-read byte span tag column: '\\t<prefix><bytes>' when len > 0."""

    kind = 0

    def __init__(self, prefix: bytes, buffer: bytes, starts: np.ndarray, lens: np.ndarray):
        self.prefix = prefix
        self.buffer = buffer
        self.starts = np.ascontiguousarray(starts, dtype=np.int64)
        self.lens = np.ascontiguousarray(lens, dtype=np.int32)

    @classmethod
    def from_strings(cls, prefix: bytes, values: list) -> "SpanColumn":
        joined = "".join(values).encode("latin-1")
        lens = np.fromiter(
            (len(v) for v in values), dtype=np.int32, count=len(values)
        )
        starts = np.zeros(len(values), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        return cls(prefix, joined, starts, lens)


class FloatColumn:
    """float32 %g tag column, emitted where mask is set."""

    kind = 1

    def __init__(self, prefix: bytes, values: np.ndarray, mask: np.ndarray):
        self.prefix = prefix
        self.values = np.ascontiguousarray(values, dtype=np.float32)
        self.mask = np.ascontiguousarray(mask, dtype=np.uint8)


class ConstColumn:
    """Constant bytes emitted for every read (per-segment FI/TC)."""

    kind = 2

    def __init__(self, prefix: bytes):
        self.prefix = prefix


def sam_format_full(
    names_blob: bytes,
    name_offsets: np.ndarray,
    flags: np.ndarray,
    code: np.ndarray,
    quality: np.ndarray,
    length: np.ndarray,
    phred_offset: int,
    columns: list,
):
    """Format N SAM lines with native tag rendering; returns (arena,
    line_offsets) or None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    return _format_full(
        lib.pq_sam_format_full,
        names_blob, name_offsets, flags, code, quality, length,
        phred_offset, columns,
    )


def bam_format_full(
    names_blob: bytes,
    name_offsets: np.ndarray,
    flags: np.ndarray,
    code: np.ndarray,
    quality: np.ndarray,
    length: np.ndarray,
    phred_offset: int,
    columns: list,
):
    """Format N BAM records (uncompressed record stream) from the same
    column material as `sam_format_full`; span columns must carry the
    two tag chars in their prefix (e.g. b"RG:Z:") and const columns must
    hold PRE-ENCODED binary aux bytes. Returns (arena, record_offsets)
    or None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    # BAM stores l_read_name in one byte: a 255+ char name must fail
    # loudly here (the per-record path's struct.pack('<B') does), not
    # wrap modulo 256 into a silently corrupt record
    name_lengths = np.diff(np.asarray(name_offsets, dtype=np.int64))
    if name_lengths.size and int(name_lengths.max()) > 254:
        from ..errors import SequenceError

        raise SequenceError(
            "read name exceeds the BAM 254-character limit"
        )
    return _format_full(
        lib.pq_bam_format_full,
        names_blob, name_offsets, flags, code, quality, length,
        phred_offset, columns,
    )


def _format_full(
    fn,
    names_blob: bytes,
    name_offsets: np.ndarray,
    flags: np.ndarray,
    code: np.ndarray,
    quality: np.ndarray,
    length: np.ndarray,
    phred_offset: int,
    columns: list,
):
    n = int(flags.shape[0])
    k = len(columns)
    width = code.shape[1] if code.ndim == 2 else 0
    code = np.ascontiguousarray(code, dtype=np.uint8)
    quality = np.ascontiguousarray(quality, dtype=np.uint8)
    length = np.ascontiguousarray(length, dtype=np.int32)
    flags = np.ascontiguousarray(flags, dtype=np.int32)
    name_offsets = np.ascontiguousarray(name_offsets, dtype=np.int64)

    kinds = np.fromiter((c.kind for c in columns), dtype=np.uint8, count=k)
    prefixes = (ctypes.c_char_p * k)(*(c.prefix for c in columns))
    prefix_lens = np.fromiter(
        (len(c.prefix) for c in columns), dtype=np.int32, count=k
    )
    null_char = ctypes.c_char_p()
    null_i64 = ctypes.POINTER(ctypes.c_int64)()
    null_i32 = ctypes.POINTER(ctypes.c_int32)()
    null_f32 = ctypes.POINTER(ctypes.c_float)()
    null_u8 = ctypes.POINTER(ctypes.c_uint8)()
    buffers = (ctypes.c_char_p * k)()
    starts = (ctypes.POINTER(ctypes.c_int64) * k)()
    lens = (ctypes.POINTER(ctypes.c_int32) * k)()
    floats = (ctypes.POINTER(ctypes.c_float) * k)()
    masks = (ctypes.POINTER(ctypes.c_uint8) * k)()
    span_payload = 0
    for j, column in enumerate(columns):
        if column.kind == 0:
            buffer = column.buffer
            if isinstance(buffer, np.ndarray):  # zero-copy span arenas
                buffers[j] = ctypes.c_char_p(buffer.ctypes.data)
            else:
                buffers[j] = buffer
            starts[j] = column.starts.ctypes.data_as(
                ctypes.POINTER(ctypes.c_int64)
            )
            lens[j] = column.lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            floats[j] = null_f32
            masks[j] = null_u8
            span_payload += len(column.buffer) + n * (len(column.prefix) + 1)
        elif column.kind == 1:
            buffers[j] = null_char
            starts[j] = null_i64
            lens[j] = null_i32
            floats[j] = column.values.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)
            )
            masks[j] = column.mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            span_payload += n * (len(column.prefix) + 17)
        else:
            buffers[j] = null_char
            starts[j] = null_i64
            lens[j] = null_i32
            floats[j] = null_f32
            masks[j] = null_u8
            span_payload += n * (len(column.prefix) + 1)

    line_offsets = np.zeros(n + 1, dtype=np.int64)
    capacity = len(names_blob) + span_payload + n * (40 + 2 * max(width, 1))
    while True:
        arena, out = _scratch(capacity)
        used = fn(
            n,
            names_blob,
            name_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            flags.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            code.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            quality.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            length.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            width,
            phred_offset,
            k,
            kinds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            prefixes,
            prefix_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            buffers,
            starts,
            lens,
            floats,
            masks,
            out,
            capacity,
            line_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if used >= 0:
            return arena[:used], line_offsets  # zero-copy view, fresh arena
        capacity = -used


def concat_spans(arenas: list, piece_arena: np.ndarray, piece_start: np.ndarray, piece_len: np.ndarray) -> bytes | None:
    """Concatenate spans from several arenas in piece order, natively."""
    lib = load()
    if lib is None:
        return None
    piece_arena = np.ascontiguousarray(piece_arena, dtype=np.uint8)
    piece_start = np.ascontiguousarray(piece_start, dtype=np.int64)
    piece_len = np.ascontiguousarray(piece_len, dtype=np.int32)
    # arenas may be bytes or uint8 views (sam_format_full's zero-copy
    # return); pass raw addresses either way
    arena_pointers = (ctypes.c_char_p * len(arenas))(
        *(
            ctypes.c_char_p(a.ctypes.data) if isinstance(a, np.ndarray) else a
            for a in arenas
        )
    )
    capacity = int(piece_len.sum()) + 1
    arena, out = _scratch(capacity)
    used = lib.pq_concat_spans(
        len(piece_arena),
        arena_pointers,
        piece_arena.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        piece_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        piece_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out,
        capacity,
    )
    if used < 0:
        return None
    return arena[:used]  # zero-copy view of this call's own arena


def apply_token_block(src, dst, start: int, w: int, size, offset: int) -> bool:
    """Native fast path of Rule.apply's forward constant-start block
    (transform.py): strided src rows -> contiguous dst block with
    per-read tail zeroing and dst length accumulation. Returns False when
    the native lib is unavailable or a layout precondition fails."""
    lib = load()
    if lib is None:
        return False
    src_code, src_qual = src.code, src.quality
    dst_code, dst_qual = dst.code, dst.quality
    for m in (src_code, src_qual, dst_code, dst_qual):
        if m.dtype != np.uint8 or m.ndim != 2 or m.strides[1] != 1:
            return False
    if (
        src_code.strides[0] != src_qual.strides[0]
        or dst_code.strides[0] != dst_qual.strides[0]
    ):
        return False
    n = src_code.shape[0]
    size = np.ascontiguousarray(size, dtype=np.int32)
    length = dst.length
    if length.dtype != np.int32 or not length.flags["C_CONTIGUOUS"]:
        return False
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.pq_apply_token(
        n,
        src_code.ctypes.data_as(u8p),
        src_qual.ctypes.data_as(u8p),
        src_code.strides[0],
        start,
        w,
        size.ctypes.data_as(i32p),
        dst_code.ctypes.data_as(u8p),
        dst_qual.ctypes.data_as(u8p),
        dst_code.strides[0],
        offset,
        length.ctypes.data_as(i32p),
    )
    return True


def observation_spans(
    observation,
    panel_segs,
    decoded,
    corrected_quality: int,
):
    """Fused raw/corrected observation-span rendering (mirrors the numpy
    fast path of engine/strict.py _observation_spans byte-for-byte; the
    caller has already verified the single-or-uniform precondition).

    `observation` is a list of SegmentBatch-likes with contiguous (n, W)
    uint8 code/quality and (n,) int32 length. `panel_segs` is None (raw
    only) or a list of (B, ws) uint8 per-segment panel slices sharing one
    row stride. Returns a dict shaped like _observation_spans' output."""
    lib = load()
    k = len(observation)
    if lib is None or k == 0 or k > 16:
        return None
    n = int(observation[0].length.shape[0])
    codes = (ctypes.c_void_p * k)()
    quals = (ctypes.c_void_p * k)()
    seg_lens = (ctypes.c_void_p * k)()
    widths = np.zeros(k, dtype=np.int32)
    keep_alive = []
    for j, segment in enumerate(observation):
        code = np.ascontiguousarray(segment.code, dtype=np.uint8)
        qual = np.ascontiguousarray(segment.quality, dtype=np.uint8)
        length = np.ascontiguousarray(segment.length, dtype=np.int32)
        keep_alive.extend((code, qual, length))
        codes[j] = code.ctypes.data
        quals[j] = qual.ctypes.data
        seg_lens[j] = length.ctypes.data
        widths[j] = code.shape[1] if code.ndim == 2 else 0
    w_total = int(widths.sum())
    raw_seq = np.empty(n * w_total, dtype=np.uint8)
    raw_qual = np.empty(n * w_total, dtype=np.uint8)
    raw_lens = np.empty(n, dtype=np.int32)
    null_u8 = ctypes.POINTER(ctypes.c_uint8)()
    null_i32 = ctypes.POINTER(ctypes.c_int32)()
    if panel_segs is not None:
        panel_ptrs = (ctypes.c_void_p * k)()
        seg_widths = np.zeros(k, dtype=np.int32)
        stride = None
        for j, seg in enumerate(panel_segs):
            # one row stride shared by every slice of the panel matrix
            if stride is None:
                stride = seg.strides[0]
            elif seg.strides[0] != stride:
                return None
            if seg.itemsize != 1 or seg.strides[1] != 1:
                return None
            panel_ptrs[j] = seg.ctypes.data
            seg_widths[j] = seg.shape[1]
        decoded = np.ascontiguousarray(decoded, dtype=np.int32)
        cw_total = int(
            np.minimum(widths, seg_widths).sum()
        )
        cor_seq = np.empty(n * cw_total, dtype=np.uint8)
        cor_qual = np.empty(n * cw_total, dtype=np.uint8)
        cor_lens = np.empty(n, dtype=np.int32)
        lib.pq_observation_spans(
            n, k, codes, quals, seg_lens,
            widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            panel_ptrs, stride or 0,
            seg_widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            decoded.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            corrected_quality & 0xFF,
            raw_seq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            raw_qual.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            raw_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cor_seq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cor_qual.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cor_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    else:
        cor_seq = cor_qual = cor_lens = None
        cw_total = 0
        lib.pq_observation_spans(
            n, k, codes, quals, seg_lens,
            widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            (ctypes.c_void_p * k)(), 0,
            null_i32,
            null_i32,
            0,
            raw_seq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            raw_qual.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            raw_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            null_u8,
            null_u8,
            null_i32,
        )
    starts = np.arange(n, dtype=np.int64) * w_total
    out = {
        "raw_seq": (raw_seq, starts, raw_lens),
        "raw_qual": (raw_qual, starts, raw_lens),
    }
    if panel_segs is not None:
        cor_starts = np.arange(n, dtype=np.int64) * cw_total
        out["cor_seq"] = (cor_seq, cor_starts, cor_lens)
        out["cor_qual"] = (cor_qual, cor_starts, cor_lens)
    return out


def fastq_format_batch(
    names_blob: bytes,
    name_offsets: np.ndarray,
    qcfail: np.ndarray,
    segment_number: int,
    code: np.ndarray,
    quality: np.ndarray,
    length: np.ndarray,
    phred_offset: int,
    bc_span=None,
):
    """Format N FASTQ records natively; returns (arena, record_offsets)."""
    lib = load()
    if lib is None:
        return None
    n = int(length.shape[0])
    width = code.shape[1] if code.ndim == 2 else 0
    code = np.ascontiguousarray(code, dtype=np.uint8)
    quality = np.ascontiguousarray(quality, dtype=np.uint8)
    length = np.ascontiguousarray(length, dtype=np.int32)
    qcfail = np.ascontiguousarray(qcfail, dtype=np.uint8)
    name_offsets = np.ascontiguousarray(name_offsets, dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    capacity = len(names_blob) + n * (28 + 2 * max(width, 1))
    if bc_span is not None:
        bc_buffer, bc_start, bc_len = bc_span
        if isinstance(bc_buffer, np.ndarray):  # zero-copy span arenas
            bc_buffer = ctypes.c_char_p(bc_buffer.ctypes.data)
        bc_start = np.ascontiguousarray(bc_start, dtype=np.int64)
        bc_len = np.ascontiguousarray(bc_len, dtype=np.int32)
        capacity += int(bc_len.sum())
        bc_args = (
            bc_buffer,
            bc_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            bc_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    else:
        bc_args = (
            ctypes.c_char_p(),
            ctypes.POINTER(ctypes.c_int64)(),
            ctypes.POINTER(ctypes.c_int32)(),
        )
    while True:
        arena, out = _scratch(capacity)
        used = lib.pq_fastq_format_batch(
            n,
            names_blob,
            name_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            qcfail.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            segment_number,
            code.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            quality.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            length.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            width,
            phred_offset,
            *bc_args,
            out,
            capacity,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if used >= 0:
            return arena[:used], offsets  # zero-copy view, fresh arena
        capacity = -used


def pack_h2d_native(
    widths, segments, qcfail, out, qual_bits=6, qual_lut=None
) -> bool:
    """Native path of device/step.py pack_h2d_blob: pack per-segment
    (code, qual, length) into the wire blob `out` (byte-identical to the
    numpy path; releases the GIL so packing overlaps the render workers).
    ``qual_bits`` 2/4 select the quality-codebook layout and ``"j4"`` the
    joint (code, quality) pair-codebook layout (wire v3), both with
    ``qual_lut = (lut_idx, lut_exact)``. Returns False when the native
    lib is unavailable or the array layout disqualifies (caller falls
    back to numpy)."""
    lib = load()
    if lib is None:
        return False
    n = out.shape[0]
    if (
        out.dtype != np.uint8
        or out.strides[1] != 1
        or n != np.asarray(qcfail).shape[0]
    ):
        return False
    if qual_bits != 6:
        if qual_lut is None:
            return False
        lut_idx = np.ascontiguousarray(qual_lut[0], dtype=np.uint8)
        lut_exact = np.ascontiguousarray(qual_lut[1], dtype=np.uint8)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    i32 = ctypes.POINTER(ctypes.c_int32)
    flags = np.asarray(qcfail).astype(np.uint8)  # H2D_QCFAIL = bit 0
    offset = 0
    for w, (code, qual, length) in zip(widths, segments):
        if w % 4:
            raise ValueError(f"h2d segment width {w} not a multiple of 4")
        sw = code.shape[1]
        if sw > w:
            return False
        code = np.ascontiguousarray(code, dtype=np.uint8)
        qual = np.ascontiguousarray(qual, dtype=np.uint8)
        length = np.ascontiguousarray(length, dtype=np.int32)
        length_bytes = 1 if w < 256 else 2
        if qual_bits == 6:
            lib.pq_pack_h2d_segment(
                code.ctypes.data_as(u8),
                qual.ctypes.data_as(u8),
                length.ctypes.data_as(i32),
                n,
                sw,
                w,
                out.ctypes.data_as(u8),
                out.strides[0],
                offset,
                length_bytes,
                flags.ctypes.data_as(u8),
            )
            offset += w // 2 + (3 * w) // 4 + length_bytes
            continue
        if qual_bits == "j4":
            lib.pq_pack_h2d_segment_j4(
                code.ctypes.data_as(u8),
                qual.ctypes.data_as(u8),
                length.ctypes.data_as(i32),
                n,
                sw,
                w,
                out.ctypes.data_as(u8),
                out.strides[0],
                offset,
                length_bytes,
                flags.ctypes.data_as(u8),
                lut_idx.ctypes.data_as(u8),
                lut_exact.ctypes.data_as(u8),
            )
            offset += w // 2 + length_bytes
            continue
        else:
            lib.pq_pack_h2d_segment_cb(
                code.ctypes.data_as(u8),
                qual.ctypes.data_as(u8),
                length.ctypes.data_as(i32),
                n,
                sw,
                w,
                out.ctypes.data_as(u8),
                out.strides[0],
                offset,
                length_bytes,
                flags.ctypes.data_as(u8),
                qual_bits,
                lut_idx.ctypes.data_as(u8),
                lut_exact.ctypes.data_as(u8),
            )
            qw = w // 4 if qual_bits == 2 else w // 2
        offset += w // 2 + qw + length_bytes
    out[:, offset] = flags
    return True


def rans_compress(data: bytes, order: int = 0) -> bytes | None:
    """rANS 4x8 compress via the native lib; None when unavailable."""
    lib = load()
    if lib is None:
        return None
    capacity = 9 + 2 * len(data) + 257 * 800 + 4096
    out = ctypes.create_string_buffer(capacity)
    written = lib.pq_rans_compress(data, len(data), order, out, capacity)
    if written < 0:
        return None
    return out.raw[:written]


def rans_uncompress(data: bytes, raw_size: int) -> bytes | None:
    """rANS 4x8 decompress via the native lib; None when unavailable."""
    lib = load()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(max(raw_size, 1))
    written = lib.pq_rans_uncompress(data, len(data), out, raw_size)
    if written < 0:
        from ..errors import IOError_

        raise IOError_("rANS: malformed stream (native decoder)")
    return out.raw[:written]


def rans_nx16_compress(data: bytes, flags: int) -> bytes | None:
    """rANS Nx16 (CRAM 3.1) compress via the native lib — plain
    order-0/1 with 4/32-way interleave only (transform flags return
    None so the Python coder handles them). Byte-identical to
    io/rans_nx16's pure-Python encoder."""
    lib = load()
    if lib is None:
        return None
    capacity = 32 + 2 * len(data) + 257 * 1024 + (1 << 17)
    out = ctypes.create_string_buffer(capacity)
    written = lib.pq_rans_nx16_compress(data, len(data), flags, out, capacity)
    if written < 0:
        return None
    return out.raw[:written]


def rans_nx16_uncompress(data: bytes, raw_size: int) -> bytes | None:
    """rANS Nx16 decompress via the native lib; None when the stream's
    flags need the Python path or the lib is unavailable; typed error on
    a malformed stream."""
    lib = load()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(max(raw_size, 1))
    written = lib.pq_rans_nx16_uncompress(data, len(data), out, raw_size)
    if written == -3 or written == -1:
        return None  # unsupported flags / capacity: python path decides
    if written < 0:
        from ..errors import IOError_

        raise IOError_("rANS Nx16: malformed stream (native decoder)")
    return out.raw[:written]


class NativeBgzfFile:
    """Buffered file-like over the native parallel BGZF reader.

    Supports exactly the interface the BAM/CRAM readers use: ``read(n)``
    (n > 0) and ``close()``. Small reads (per-record headers) are served
    from a 1MB staging buffer so each ctypes crossing moves a chunk."""

    CHUNK = 1 << 20

    def __init__(self, handle, lib):
        self._handle = handle
        self._lib = lib
        self._buffer = b""
        self._position = 0

    def _fill(self) -> bool:
        buf = np.empty(self.CHUNK, dtype=np.uint8)
        got = self._lib.pq_bgzf_read(
            self._handle,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.CHUNK,
        )
        if got < 0:
            from ..errors import IOError_

            message = (self._lib.pq_bgzf_error(self._handle) or b"").decode(
                "utf-8", errors="replace"
            )
            raise IOError_(message or "BGZF read failed")
        if got == 0:
            return False
        self._buffer = buf[:got].tobytes()
        self._position = 0
        return True

    def read(self, n: int) -> bytes:
        if n <= 0 or self._handle is None:
            return b""
        pieces = []
        needed = n
        while needed > 0:
            available = len(self._buffer) - self._position
            if available == 0:
                if not self._fill():
                    break
                continue
            take = min(needed, available)
            pieces.append(self._buffer[self._position : self._position + take])
            self._position += take
            needed -= take
        if len(pieces) == 1:
            return pieces[0]
        return b"".join(pieces)

    def close(self):
        if self._handle is not None:
            self._lib.pq_bgzf_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def open_bgzf(path: str, threads: int | None = None):
    """Open `path` through the parallel BGZF decompressor, or None when
    the native library is unavailable or the file is not BGZF-framed
    (caller falls back to serial gzip)."""
    lib = load()
    if lib is None:
        return None
    if threads is None:
        threads = int(os.environ.get("PHENIQS_BGZF_THREADS", "3"))
    handle = lib.pq_bgzf_open(path.encode(), threads)
    if not handle:
        return None
    return NativeBgzfFile(handle, lib)


def pamld_classify_native(
    obs_code: np.ndarray,
    obs_qual: np.ndarray,
    panel_codes: np.ndarray,
    concentration: np.ndarray,
    lut: np.ndarray,
    noise_times_rbp: float,
    random_barcode_probability: float,
    confidence_threshold: float,
    hq_threshold: int,
    hqd_threshold: int,
    qcfail_in: np.ndarray,
):
    """Strict float64 PAMLD classify in C++ — bit-exact with the NumPy
    oracle (same LUT gathers, same Kahan order, same libm pow). Returns
    the result arrays, or None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    n, w = obs_code.shape
    b = panel_codes.shape[0]
    obs_code = np.ascontiguousarray(obs_code, dtype=np.uint8)
    obs_qual = np.ascontiguousarray(obs_qual, dtype=np.uint8)
    panel_codes = np.ascontiguousarray(panel_codes, dtype=np.uint8)
    concentration = np.ascontiguousarray(concentration, dtype=np.float64)
    lut = np.ascontiguousarray(lut, dtype=np.float64)
    qcfail_in = np.ascontiguousarray(qcfail_in, dtype=np.uint8)
    decoded = np.empty(n, dtype=np.int32)
    confidence = np.empty(n, dtype=np.float64)
    distance = np.empty(n, dtype=np.int32)
    qcfail_out = np.empty(n, dtype=np.uint8)
    branch = np.empty(n, dtype=np.int8)
    argmax = np.empty(n, dtype=np.int32)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.pq_pamld_classify(
        n,
        w,
        b,
        obs_code.ctypes.data_as(u8),
        obs_qual.ctypes.data_as(u8),
        panel_codes.ctypes.data_as(u8),
        concentration.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        lut.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(noise_times_rbp),
        float(random_barcode_probability),
        float(confidence_threshold),
        int(hq_threshold),
        int(hqd_threshold),
        qcfail_in.ctypes.data_as(u8),
        decoded.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        confidence.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        distance.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        qcfail_out.ctypes.data_as(u8),
        branch.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        argmax.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return decoded, confidence, distance, qcfail_out.astype(bool), branch, argmax


def mdd_classify_native(
    obs_codes: list,
    obs_quals: list,
    obs_lengths: list,
    panel_codes: np.ndarray,
    panel_widths: list,
    tolerance: list,
    quality_masking_threshold: int,
    qcfail_in: np.ndarray,
):
    """Integer-exact minimum-distance classify in C++ (exact-match scan
    then first-within-tolerance, reference mdd.cpp:37-86). Returns
    (decoded, distance, qcfail) or None when unavailable."""
    lib = load()
    if lib is None:
        return None
    s = len(obs_codes)
    n = obs_codes[0].shape[0] if s else 0
    b = panel_codes.shape[0]
    obs_code = np.ascontiguousarray(
        np.concatenate([np.asarray(c, dtype=np.uint8) for c in obs_codes], axis=1)
        if s else np.zeros((n, 0), np.uint8)
    )
    obs_qual = np.ascontiguousarray(
        np.concatenate([np.asarray(q, dtype=np.uint8) for q in obs_quals], axis=1)
        if s else np.zeros((n, 0), np.uint8)
    )
    obs_widths = np.array([c.shape[1] for c in obs_codes], dtype=np.int32)
    lengths = np.ascontiguousarray(
        np.stack([np.asarray(l, dtype=np.int32) for l in obs_lengths], axis=1)
    )
    panel_codes = np.ascontiguousarray(panel_codes, dtype=np.uint8)
    panel_width_arr = np.array(panel_widths, dtype=np.int32)
    tolerance_arr = np.array(tolerance, dtype=np.int32)
    qcfail_in = np.ascontiguousarray(qcfail_in, dtype=np.uint8)
    decoded = np.empty(n, dtype=np.int32)
    distance = np.empty(n, dtype=np.int32)
    qcfail_out = np.empty(n, dtype=np.uint8)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    i32 = ctypes.POINTER(ctypes.c_int32)
    lib.pq_mdd_classify(
        n, s, b,
        obs_code.ctypes.data_as(u8),
        obs_qual.ctypes.data_as(u8),
        obs_code.shape[1],
        obs_widths.ctypes.data_as(i32),
        lengths.ctypes.data_as(i32),
        panel_codes.ctypes.data_as(u8),
        panel_codes.shape[1],
        panel_width_arr.ctypes.data_as(i32),
        tolerance_arr.ctypes.data_as(i32),
        int(quality_masking_threshold),
        qcfail_in.ctypes.data_as(u8),
        decoded.ctypes.data_as(i32),
        distance.ctypes.data_as(i32),
        qcfail_out.ctypes.data_as(u8),
    )
    return decoded, distance, qcfail_out.astype(bool)
