"""Batch ingest: assemble multi-segment ReadBatches from input feeds.

Uses the native C++ parser (pheniqs_tpu.native) when it is available and
every feed is FASTQ, falling back to the pure-Python reader otherwise.
Feeds with resolution R (interleaved) contribute R consecutive records per
read, de-interleaved by stride — the batch analog of the reference's
per-read feed pulls under the ordered lock protocol (reference
transcode.cpp:287-316); determinism here comes from batch order instead of
locks.
"""

from __future__ import annotations

import numpy as np

from ..errors import IOError_, SequenceError
from ..model.batch import ReadBatch
from ..transform import SegmentBatch


def _names_equal(a, b) -> bool:
    """Byte equality across the bytes/uint8-view forms a name arena takes
    (zero-copy arenas stay numpy views; scratch parses are bytes)."""
    if isinstance(a, (bytes, bytearray)) and isinstance(b, (bytes, bytearray)):
        return a == b
    a_view = np.frombuffer(a, dtype=np.uint8) if isinstance(a, (bytes, bytearray)) else a
    b_view = np.frombuffer(b, dtype=np.uint8) if isinstance(b, (bytes, bytearray)) else b
    return a_view.shape == b_view.shape and bool(np.array_equal(a_view, b_view))


def _as_bytes(blob) -> bytes:
    return blob if isinstance(blob, (bytes, bytearray)) else blob.tobytes()


def native_read_batches(
    segment_urls: list[str],
    phred_offset: int,
    batch_size: int,
    max_length: int = 256,
    leading_segment_index: int = 0,
    formats: list[str] | None = None,
    sensed: bool = False,
    arena_provider=None,
):
    """Yield ReadBatch objects via the native parser.

    ``segment_urls`` maps input segment index -> feed URL path (repeated
    entries = interleaved feed with that resolution); ``formats`` gives
    each segment's feed format ("fastq" default, "bam" uses the native
    BAM batch reader over the parallel BGZF pool). ``sensed`` marks a
    layout inferred by head-probing, so sync errors can point at the
    sensing as the likely culprit (reference transcode.cpp:559-682).

    ``arena_provider(estimate_bytes)``, when given, returns a per-batch
    shared-memory SlotArena (or None): the native parsers then write
    batch matrices straight into worker-visible slot memory and staging
    becomes a layout record instead of a memcpy (engine/shm.py). Engaged
    only for non-interleaved native feeds (stride de-interleave needs a
    copy anyway, and the CRAM batch reader assembles its own arrays).
    """
    from ..io.cram import NativeCramReader
    from ..native import NativeBamReader, NativeFastqReader

    unique: list[str] = []
    for url in segment_urls:
        if url not in unique:
            unique.append(url)
    resolution = {url: segment_urls.count(url) for url in unique}
    segment_slot = []  # per segment: (url, offset within read)
    seen: dict[str, int] = {}
    for url in segment_urls:
        slot = seen.get(url, 0)
        segment_slot.append((url, slot))
        seen[url] = slot + 1

    format_by_url = {}
    for position, url in enumerate(segment_urls):
        fmt = formats[position] if formats else "fastq"
        format_by_url[url] = fmt
    reader_classes = {
        "bam": NativeBamReader,
        "cram": NativeCramReader,
    }
    readers = {
        url: reader_classes.get(format_by_url[url], NativeFastqReader)(
            url, phred_offset, max_length
        )
        for url in unique
    }
    def layout_hint() -> str:
        layout = ", ".join(f"{url}: {resolution[url]}" for url in unique)
        hint = f" (feed resolution: {layout})"
        if sensed:
            hint += (
                "; the layout was sensed from the head of each feed and may"
                " be wrong for this input — declare the input layout"
                " explicitly (repeat the url in `input` once per interleaved"
                " segment) to override sensing"
            )
        return hint

    pool = None
    if len(unique) > 1:
        from concurrent.futures import ThreadPoolExecutor

        # the native parser releases the GIL: feeds parse concurrently,
        # the thread analog of the reference's one io-thread per feed
        pool = ThreadPoolExecutor(max_workers=len(unique))
    baseline_url = segment_slot[0][0] if segment_slot else None
    zero_copy = (
        arena_provider is not None
        and all(r == 1 for r in resolution.values())
        and all(
            isinstance(reader, NativeFastqReader)
            for reader in readers.values()
        )
    )

    def read_into(url, arena):
        if arena is None:
            return readers[url].read_batch(batch_size * resolution[url])
        return readers[url].read_batch(
            batch_size,
            alloc=arena.alloc,
            name_alloc=arena.alloc if url == baseline_url else None,
        )

    try:
        while True:
            arena = None
            if zero_copy:
                estimate = 0
                for url in unique:
                    w = readers[url].max_length
                    estimate += (
                        2 * batch_size * w  # code + quality
                        + 5 * batch_size  # length + qcfail
                        + max(batch_size * 256, 8192)  # name arena
                        + 8 * (batch_size + 1)  # name offsets
                        + 1024  # alignment slack
                    )
                arena = arena_provider(estimate)
            try:
                batch = _assemble_batch(
                    unique, resolution, segment_slot,
                    leading_segment_index, layout_hint, pool, read_into,
                    arena,
                )
            except BaseException:
                if arena is not None:
                    arena.release()
                raise
            if batch is None:
                if arena is not None:
                    arena.release()
                return
            batch._arena = arena
            yield batch
    finally:
        if pool is not None:
            pool.shutdown()
        for reader in readers.values():
            reader.close()


def _assemble_batch(
    unique, resolution, segment_slot,
    leading_segment_index, layout_hint, pool, read_into, arena,
):
    """Parse one batch from every feed and assemble the ReadBatch; None at
    end of stream. Factored out of native_read_batches so the zero-copy
    arena's release is a single try/except at the call site."""
    per_feed: dict[str, tuple] = {}
    counts = set()
    if pool is not None:
        futures = {
            url: pool.submit(read_into, url, arena) for url in unique
        }
        results = {url: futures[url].result() for url in unique}
    else:
        results = {url: read_into(url, arena) for url in unique}
    for url in unique:
        parsed = results[url]
        if parsed is None:
            per_feed[url] = None
            counts.add(0)
        else:
            per_feed[url] = parsed
            count = parsed[0].shape[0]
            if count % resolution[url] != 0:
                raise IOError_(
                    f"truncated interleaved feed {url}: {count} "
                    "records" + layout_hint()
                )
            counts.add(count // resolution[url])
    if counts == {0}:
        return None
    if len(counts) != 1:
        raise IOError_(
            "truncated input: feeds ended out of sync" + layout_hint()
        )
    reads = counts.pop()

    segments = []
    baseline = None  # (blob, offsets) or list[bytes]
    qcfail = np.zeros(reads, dtype=bool)
    interleaved = any(r > 1 for r in resolution.values())
    for segment_position, (url, slot) in enumerate(segment_slot):
        code, qual, length, fail, blob, offsets = per_feed[url]
        stride = resolution[url]
        code = code[slot::stride]
        qual = qual[slot::stride]
        length = length[slot::stride]
        fail = fail[slot::stride]
        width = int(length.max(initial=1))
        if width > code.shape[1]:
            # the native reader grows its matrices to fit the longest
            # record (read_batch -3 protocol); reaching here means a
            # length column inconsistent with its data matrix
            raise SequenceError(
                f"record length {width} exceeds parsed matrix width "
                f"{code.shape[1]} for {url}"
            )
        # views, not copies: after the reader adapts its stride to
        # the run's read length the slice is the whole matrix, and
        # downstream consumers (device staging, SHM serialization,
        # native renderers) handle strided views where it is not
        segments.append(
            SegmentBatch(
                code=code[:, :width],
                quality=qual[:, :width],
                length=length,
            )
        )
        if segment_position == leading_segment_index:
            # the read's qcfail state comes from the leading
            # segment only (reference read.h:262, transcode.h:206)
            # (arena path: fail is already a fresh per-batch view,
            # kept in slot memory so staging records it in place)
            qcfail = fail if arena is not None else fail.copy()
        if interleaved:
            names = [
                blob[offsets[i] : offsets[i + 1]]
                for i in range(slot, offsets.shape[0] - 1, stride)
            ]
            if baseline is None:
                baseline = names
            elif names != baseline:
                for got, expected in zip(names, baseline):
                    if got != expected:
                        raise SequenceError(
                            f"read out of sync: {url} yields "
                            f"{got.decode()} where the leading feed "
                            f"has {expected.decode()}" + layout_hint()
                        )
        else:
            # one record per feed: names agree iff the arenas agree
            if baseline is None:
                baseline = (blob, offsets)
            elif not _names_equal(blob, baseline[0]) or not np.array_equal(
                offsets, baseline[1]
            ):
                mine_blob = _as_bytes(blob)
                theirs_blob = _as_bytes(baseline[0])
                mine = [
                    mine_blob[offsets[i] : offsets[i + 1]]
                    for i in range(offsets.shape[0] - 1)
                ]
                theirs = [
                    theirs_blob[baseline[1][i] : baseline[1][i + 1]]
                    for i in range(baseline[1].shape[0] - 1)
                ]
                for got, expected in zip(mine, theirs):
                    if got != expected:
                        raise SequenceError(
                            f"read out of sync: {url} yields "
                            f"{got.decode()} where the leading feed "
                            f"has {expected.decode()}" + layout_hint()
                        )
                raise SequenceError(
                    "read feeds out of sync" + layout_hint()
                )
    if interleaved:
        return ReadBatch(segments=segments, names=baseline, qcfail=qcfail)
    return ReadBatch(
        segments=segments,
        names_blob=baseline[0],
        name_offsets=baseline[1],
        qcfail=qcfail,
    )
