"""Streamed multiprocess pipeline engine.

The host-side scale-out architecture (the TPU-native answer to the
reference's N decoding threads over shared ring buffers, reference
transcode.cpp:1491-1500, transcode.h:202-225):

Two topologies share the worker pool, the ordered writer thread and the
worker-side compression (each worker BGZF-compresses its own chunks):

1. Device modes (fast/hybrid): the parent owns ingest + device
   classification + the f64 re-resolution + statistics; workers own
   template/tag/QC/format work. Output and statistics are identical to
   the serial engine at any worker count (single-owner classification
   state).

2. Strict mode: workers run the f64 classification too — the
   reference's N decoding threads (transcode.cpp:1491-1500) — and the
   parent merges their accumulators in worker order, so a run is
   deterministic for a fixed worker count.

Batch transport (auto-selected, PHENIQS_STREAM_TRANSPORT overrides):
the default is tmpfs shared memory (engine/shm.py) — parse stays
single-owner, one memcpy in, zero-copy views out. Fallbacks: replay
(workers re-parse disk input; parent ships only ~22 B/read of decision
arrays), autonomous (strict replay: workers own the whole pipeline
including the parse), and ship (whole batches pickled through the pipe;
the stdin path).

Rendered chunks stream to disk with bounded memory in raw batch order —
the single-owner replacement for the reference's ordered feed-lock
protocol (multiplex.h:201-216) — unlike round-1's ParallelEngine, which
buffered the entire output in memory.
"""

from __future__ import annotations

import contextlib
import multiprocessing as mp
import os
import pickle
import threading
import warnings

import numpy as np

from ..decode.oracle import ClassifyResult
from .strict import StrictEngine


@contextlib.contextmanager
def _quiet_fork():
    """Our fork sites are deliberate: render workers never touch jax (the
    source of the CPython 3.12 'os.fork() with threads' RuntimeWarning,
    imported into the parent by the site hook), and the warning would
    corrupt stderr consumers that parse the JSON report."""
    with warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore", message=r".*os\.fork\(\).*", category=RuntimeWarning
        )
        yield

_RESULT_FIELDS = (
    "decoded",
    "confidence",
    "edit_distance",
    "qcfail",
    "branch",
    "argmax",
)

#: device modes own statistics in the parent (device counters + oracle
#: rows), so workers only need what render consumes — the engine opts in
#: via its `_payload_fields` attribute
_RENDER_RESULT_FIELDS = ("decoded", "confidence", "qcfail")


class _BufferSink:
    """File-like over the capture buffer (for worker-side BGZF writers)."""

    def __init__(self, buffer: bytearray):
        self.buffer = buffer

    def write(self, payload: bytes):
        self.buffer += payload

    def flush(self):
        pass


class _HeaderlessBam:
    """BamWriter facade producing standalone BGZF record blocks (the
    parent writes the real header block; BGZF members concatenate)."""

    def __init__(self, sink):
        from ..io.hts import BgzfWriter

        self.bgzf = BgzfWriter(sink)

    def write_record(self, *args, **kwargs):
        from ..io.hts import BamWriter

        BamWriter.write_record(self, *args, **kwargs)

    def flush_block(self):
        self.bgzf.flush_block()


class WorkerFeed:
    """Stands in for OutputFeed inside render workers: collects the bytes
    this worker's batches produce for one destination, compressing locally
    when the destination is compressed."""

    def __init__(self, feed):
        self.url = feed.url
        self.format = feed.format
        self.phred_offset = feed.phred_offset
        self.platform = feed.platform
        self.buffer = bytearray()  # compressed paths (BAM/BGZF sinks)
        self.chunks = []  # plain path: payloads held by reference, no copy
        self.bam = None
        self._bgzf = None
        self._devnull = feed.url.is_dev_null()
        # OutputFeed.emit skips when stream is None (dev-null)
        self.stream = None if self._devnull else self

    def initiate(self, header_text: str | None = None):
        if self._devnull:
            return
        if self.format == "bam":
            self.bam = _HeaderlessBam(_BufferSink(self.buffer))
        elif self.format == "cram":
            # same intake surface as the parent's CramWriter, but slices
            # become pre-compressed parts the parent stamps with the
            # sequential record counter (io/cram.py CramPartBuilder)
            from ..io.cram import CramPartBuilder

            level = int(self.url.compression_level or 5)
            self.bam = CramPartBuilder(header_text or "", level)
        elif self.url.compression in ("gz", "bgzf"):
            from ..io.hts import BgzfWriter

            level = int(self.url.compression_level or 5)
            self._bgzf = BgzfWriter(_BufferSink(self.buffer), level)

    def write(self, payload):
        if self._devnull:
            return
        if self._bgzf is not None:
            self._bgzf.write(payload)
        else:
            # keep by reference: payloads are fresh render arenas (or
            # immutable bytes), consumed by take() within the same task
            self.chunks.append(payload)

    def write_records(self, payload):
        """Columnar record arena in this feed's record encoding (see
        OutputFeed.write_records): BAM arenas compress through the local
        headerless BGZF writer."""
        if self._devnull:
            return
        if self.format == "bam" and self.bam is not None:
            self.bam.bgzf.write(payload)
        else:
            self.write(payload)

    def flush(self):
        pass

    def emit(self, name, flag, code, quality, length, tags, segment_index):
        from .feeds import OutputFeed

        OutputFeed.emit(self, name, flag, code, quality, length, tags, segment_index)

    def take(self):
        if self.format == "cram":
            if self.bam is None:
                return b""
            parts = self.bam.take_parts()
            return pickle.dumps(parts) if parts else b""
        if self.bam is not None:
            self.bam.flush_block()
        if self._bgzf is not None:
            self._bgzf.flush_block()
        if self.buffer:
            payload = bytes(self.buffer)
            self.buffer.clear()
            return payload
        if not self.chunks:
            return b""
        chunks = self.chunks
        self.chunks = []
        if len(chunks) == 1:
            return chunks[0]
        return b"".join(chunks)  # accepts bytes and uint8 views alike

    def close(self):
        pass


def _build_worker_engine(ontology_blob: bytes) -> StrictEngine:
    ontology = pickle.loads(ontology_blob)
    engine = StrictEngine(ontology)
    engine.feeds_by_url = {
        url: WorkerFeed(feed) for url, feed in engine.feeds_by_url.items()
    }
    for channel in engine.channels:
        channel.feeds = [engine.feeds_by_url[url] for url in channel.output_urls]
    header_text = None
    if any(
        feed.format == "cram" for feed in engine.feeds_by_url.values()
    ):
        # CRAM part builders resolve RG indices against the same header
        # the parent's CramWriter was initiated with (same ontology ->
        # identical @RG registry)
        from ..io.sam import SamHeader

        header_text = (
            SamHeader(ontology, ontology.get("program")).encode().decode()
        )
    for feed in engine.feeds_by_url.values():
        feed.initiate(header_text)
    return engine


def _apply_decisions(engine: StrictEngine, batch, payloads):
    """Rebuild per-runtime ClassifyResults (recomputing the cheap
    observation gathers locally) and render."""
    results = []
    for runtime, payload in zip(engine.iter_runtimes(), payloads):
        if "edit_distance" not in payload:
            # render-only payload (_RENDER_RESULT_FIELDS): statistics live
            # with the parent, so the bookkeeping arrays are synthesized
            decoded = payload["decoded"]
            payload = dict(
                payload,
                edit_distance=np.zeros_like(decoded),
                branch=np.zeros(decoded.shape[0], dtype=np.int8),
                argmax=decoded,
            )
        result = ClassifyResult(**payload)
        if (
            runtime.spec.rule is not None
            and runtime.spec.algorithm != "passthrough"
        ):
            result.observation = runtime.spec.rule.apply(batch.segments)
        results.append(result)
    engine._render_batch(batch, results)


def _collect_chunk(engine: StrictEngine) -> dict:
    chunk = {}
    total = 0
    for url, feed in engine.feeds_by_url.items():
        data = feed.take()
        if len(data):
            chunk[url] = data
            total += len(data)
    if total >= 1 << 20:
        # large chunks ride tmpfs instead of the pickled result queue
        # (engine/shm.py chunk_to_shm); small ones aren't worth a file
        from .shm import chunk_to_shm

        spilled = chunk_to_shm(chunk)
        if spilled is not None:
            return spilled
    return chunk


def _render_worker_replay(
    ontology_blob: bytes,
    batch_size: int,
    task_pipe,
    result_queue,
):
    """Replay-mode worker: re-parse the input stream (cheap, GIL-released
    native parse), advance to each task's raw batch index, render with the
    decisions the parent classified."""
    engine = _build_worker_engine(ontology_blob)
    stream = engine.read_batches(batch_size)
    position = -1
    batch = None

    while True:
        task = task_pipe.recv_bytes()
        message = pickle.loads(task)
        if message is None:
            break
        index, payloads = message
        while position < index:
            batch = next(stream)
            position += 1
        if payloads == "skip":
            result_queue.put((index, {}))
            continue
        filtered = engine._apply_input_filters(batch)
        _apply_decisions(engine, filtered, payloads)
        result_queue.put((index, _collect_chunk(engine)))

    result_queue.put(("state", engine.channel_quality))


def _guarded(target, result_queue, args):
    """Run a worker body, relaying typed failures to the parent instead
    of dying with a bare nonzero exit (the parent re-raises the same
    typed error so exit codes stay faithful to error.h semantics)."""
    from ..errors import PheniqsError

    try:
        target(*args)
    except PheniqsError as error:
        result_queue.put(
            ("worker_error", type(error).__name__, error.message, error.code)
        )
    except Exception as error:  # noqa: BLE001 - relay, parent re-raises
        result_queue.put(
            ("worker_error", "InternalError", f"{type(error).__name__}: {error}", 1)
        )


def _snapshot_state(engine: StrictEngine) -> dict:
    """Worker-side accumulator snapshot for the parent's end-of-run merge
    (the streamed analog of Transcode::collect, reference
    transcode.cpp:317-320)."""
    return {
        "incoming_count": engine.incoming_count,
        "incoming_pf_count": engine.incoming_pf_count,
        "outgoing_count": engine.outgoing_count,
        "outgoing_pf_count": engine.outgoing_pf_count,
        "accumulators": [
            runtime.accumulator for runtime in engine.iter_runtimes()
        ],
        "quality": engine.channel_quality,
    }


def _autonomous_worker(
    ontology_blob: bytes,
    worker_id: int,
    workers: int,
    batch_size: int,
    result_queue,
):
    """Fully autonomous strict worker: re-parse the input, own batches
    round-robin by raw index, classify AND render them, stream ordered
    chunks out, and ship accumulator state at the end. The parent does no
    per-read work at all — this is how `--fidelity strict --threads N`
    scales the f64 classification itself (the reference's N decoding
    threads, transcode.cpp:1491-1500). Classification decisions are
    deterministic for a fixed worker count; the serial observation-scratch
    carry becomes per-worker state exactly as it becomes per-thread state
    in the reference."""
    import os as _os
    import sys as _sys
    import time as _time
    _debug = _os.environ.get("PHENIQS_STREAM_DEBUG") == "1"
    _t_parse = _t_proc = _t_put = 0.0
    _t0 = _time.perf_counter()
    engine = _build_worker_engine(ontology_blob)
    _t_build = _time.perf_counter() - _t0
    stream = engine.read_batches(batch_size)
    index = -1
    while True:
        _t = _time.perf_counter()
        try:
            batch = next(stream)
        except StopIteration:
            break
        _t_parse += _time.perf_counter() - _t
        index += 1
        if index % workers != worker_id:
            continue
        _t = _time.perf_counter()
        engine.process_batch(batch)
        chunk = _collect_chunk(engine)
        _t_proc += _time.perf_counter() - _t
        _t = _time.perf_counter()
        result_queue.put((index, chunk))
        _t_put += _time.perf_counter() - _t
    if _debug:
        _sys.stderr.write(
            f"[worker {worker_id}] build={_t_build:.2f} parse={_t_parse:.2f} "
            f"process={_t_proc:.2f} put={_t_put:.2f} "
            f"wall={_time.perf_counter()-_t0:.2f}\n")
    state = _snapshot_state(engine)
    state["worker_id"] = worker_id
    result_queue.put(("state", state))


def _render_worker_ship(
    ontology_blob: bytes,
    task_pipe,
    result_queue,
):
    """Ship-mode worker: batches arrive fully materialized in the task."""
    engine = _build_worker_engine(ontology_blob)
    while True:
        message = pickle.loads(task_pipe.recv_bytes())
        if message is None:
            break
        index, batch, payloads = message
        if payloads == "skip":
            result_queue.put((index, {}))
            continue
        _apply_decisions(engine, batch, payloads)
        result_queue.put((index, _collect_chunk(engine)))
    result_queue.put(("state", engine.channel_quality))


def _render_worker_shm(
    ontology_blob: bytes,
    worker_id: int,
    task_source,
    result_queue,
):
    """Shared-memory worker: tasks arrive as tiny descriptors; batch
    arrays are zero-copy views into one segment per task (engine/shm.py).
    A task with decision arrays renders only (device modes); one without
    classifies too (strict mode) and ships its accumulator state at the
    end — the parse stays single-owner either way.

    `task_source` is either this worker's pipe (strict mode: round-robin
    assignment keeps the per-worker f64 accumulator merge deterministic)
    or a queue shared by all workers (device modes: any worker takes the
    next task, so a slow batch never blocks idle peers — the statistics
    are parent-owned and the writer resequences by raw index, so dynamic
    assignment changes no output byte)."""
    import os as _os
    import sys as _sys
    import time as _time

    from .shm import shm_to_batch

    _debug = _os.environ.get("PHENIQS_STREAM_DEBUG") == "1"
    _t_wait = _t_work = 0.0
    _t0 = _time.perf_counter()
    engine = _build_worker_engine(ontology_blob)
    classified_any = False
    if hasattr(task_source, "recv_bytes"):
        def _next_task():
            return pickle.loads(task_source.recv_bytes())
    else:
        def _next_task():
            return task_source.get()
    while True:
        _t = _time.perf_counter()
        message = _next_task()
        _t_wait += _time.perf_counter() - _t
        if message is None:
            break
        if isinstance(message, tuple) and message[0] == "skip":
            result_queue.put((message[1], {}))
            continue
        _t = _time.perf_counter()
        # zero-copy views into the pooled slot: the batch must be fully
        # consumed before the result is reported (the parent then reuses
        # the slot), which _render_batch/_collect_chunk guarantee
        batch, decisions = shm_to_batch(message)
        if decisions is not None:
            _apply_decisions(engine, batch, decisions)
        else:
            classified_any = True
            engine.process_batch(batch)
        index = batch.raw_index
        result_queue.put((index, _collect_chunk(engine)))
        _t_work += _time.perf_counter() - _t
    if _debug:
        _sys.stderr.write(
            f"[shm worker {worker_id}] wait={_t_wait:.2f}s work={_t_work:.2f}s "
            f"wall={_time.perf_counter() - _t0:.2f}s\n"
        )
    if classified_any:
        state = _snapshot_state(engine)
        state["worker_id"] = worker_id
        result_queue.put(("state", state))
    else:
        result_queue.put(("state", engine.channel_quality))


def _shm_available() -> bool:
    from .shm import shm_supported

    return shm_supported()


class StreamRunner:
    """Owns the render worker pool and the ordered writer thread.

    Transport (auto-selected, PHENIQS_STREAM_TRANSPORT overrides):
      shm        — parent ships batches (+ decisions) through one
                   shared-memory segment per task; parse single-owner
      autonomous — strict only: workers re-parse and own everything
      replay     — workers re-parse; parent ships decision arrays
      ship       — whole batches pickled through the pipe (stdin input)
    Control flow is one pipe per worker, written from the parent's main
    thread (no feeder threads competing for the GIL)."""

    def __init__(
        self,
        engine: StrictEngine,
        workers: int,
        batch_size: int = 16384,
        classify_in_worker: bool = False,
        transport: str | None = None,
    ):
        import os

        self.engine = engine
        self.workers = max(1, workers)
        self.batch_size = batch_size
        self.classify_in_worker = classify_in_worker
        if transport is None:
            transport = os.environ.get("PHENIQS_STREAM_TRANSPORT")
        if transport is None:
            if _shm_available():
                transport = "shm"
            elif self._input_replayable():
                transport = "autonomous" if classify_in_worker else "replay"
            else:
                transport = "ship"
        if transport == "autonomous" and not (
            classify_in_worker and self._input_replayable()
        ):
            transport = "ship"
        if transport == "replay" and not self._input_replayable():
            transport = "ship"
        self.transport = transport
        self._processes: list = []
        self._task_pipes: list = []
        # device modes: one shared task queue, any worker takes the next
        # task (round-robin pipes stay for strict mode, where per-worker
        # accumulator merge order must be deterministic)
        self._task_queue = None
        self._result_queue = None
        self._writer: threading.Thread | None = None
        self._collector: threading.Thread | None = None
        self._chunk_queue = None
        self._writer_error: list = []
        self._states: list = []
        self._pool = None  # shm.SlotPool: reusable segments + backpressure
        # autonomous workers self-drive from fork, so their first chunk can
        # race the parent's _initiate_feeds (write_raw on an un-initiated
        # feed silently drops bytes); the writer waits for this gate, which
        # the engine sets right after initiating. Every other transport
        # only produces chunks after the parent submits (post-initiate),
        # so the gate opens at start(). Initiating BEFORE the fork instead
        # would be worse: children inherit the parent's buffered streams
        # and flush stdout copies at exit (duplicate headers).
        self.feeds_ready = threading.Event()
        self._slot_by_index: dict[int, int] = {}
        self._worker_failure: tuple | None = None
        # stage-time reserve for the decision arrays appended at submit;
        # self-tunes to the first batch's observed footprint
        self._decision_reserve = 1 << 20

    def _input_replayable(self) -> bool:
        """Workers can re-parse iff every input is a real file (not a
        std stream) — the native FASTQ reader and the HTS readers all
        reopen by path."""
        from ..config.url import URL

        proxies = self.engine.ontology.get("feed", {}).get(
            "input feed by segment", []
        )
        if not proxies:
            return False
        for proxy in proxies:
            url = URL(proxy["url"])
            if url.is_stdin() or url.is_dev_null():
                return False
        return True

    def start(self):
        context = mp.get_context("fork")
        self._result_queue = context.Queue()
        ontology_blob = pickle.dumps(self.engine.ontology)
        if self.transport == "shm":
            from .shm import SlotPool, sweep_stale

            sweep_stale()  # reclaim segments from hard-killed runs
            # the pool's free queue bounds the unconsumed segments living
            # in /dev/shm AND provides the pipeline's backpressure; sized
            # so the device lookahead window never starves for a slot
            import os

            lookahead = max(1, int(os.environ.get("PHENIQS_LOOKAHEAD", "4")))
            # + prefetch depth: batches are staged into slots on the
            # ingest thread, ahead of dispatch (device.py _prepared_batches);
            # zero-copy parse arenas acquire one stage earlier still (the
            # parse prefetch queue, depth 4 + in-hand), so the pool carries
            # that window too — tmpfs pages cost only what is touched
            self._pool = SlotPool(self.workers * 2 + 12 + 2 * lookahead)
        for worker_id in range(self.workers):
            if self.transport == "autonomous":
                process = context.Process(
                    target=_guarded,
                    args=(
                        _autonomous_worker,
                        self._result_queue,
                        (
                            ontology_blob,
                            worker_id,
                            self.workers,
                            self.batch_size,
                            self._result_queue,
                        ),
                    ),
                    daemon=True,
                )
                with _quiet_fork():
                    process.start()
                self._processes.append(process)
                continue
            if self.transport == "shm" and not self.classify_in_worker:
                if self._task_queue is None:
                    self._task_queue = context.Queue()
                process = context.Process(
                    target=_guarded,
                    args=(
                        _render_worker_shm,
                        self._result_queue,
                        (
                            ontology_blob,
                            worker_id,
                            self._task_queue,
                            self._result_queue,
                        ),
                    ),
                    daemon=True,
                )
                with _quiet_fork():
                    process.start()
                self._processes.append(process)
                continue
            parent_end, child_end = context.Pipe()
            if self.transport == "shm":
                process = context.Process(
                    target=_guarded,
                    args=(
                        _render_worker_shm,
                        self._result_queue,
                        (
                            ontology_blob,
                            worker_id,
                            child_end,
                            self._result_queue,
                        ),
                    ),
                    daemon=True,
                )
            elif self.transport == "replay":
                process = context.Process(
                    target=_guarded,
                    args=(
                        _render_worker_replay,
                        self._result_queue,
                        (
                            ontology_blob,
                            self.batch_size,
                            child_end,
                            self._result_queue,
                        ),
                    ),
                    daemon=True,
                )
            else:
                process = context.Process(
                    target=_guarded,
                    args=(
                        _render_worker_ship,
                        self._result_queue,
                        (ontology_blob, child_end, self._result_queue),
                    ),
                    daemon=True,
                )
            with _quiet_fork():
                process.start()
            child_end.close()
            self._processes.append(process)
            self._task_pipes.append(parent_end)
        import queue as queue_mod

        # bounded: rendered chunks are tens of MB each; the collector
        # blocks (delaying further slot releases) only when the disk
        # writer falls far behind
        self._chunk_queue = queue_mod.Queue(maxsize=self.workers * 2)
        self._collector = threading.Thread(
            target=self._collector_loop, daemon=True
        )
        self._collector.start()
        self._writer = threading.Thread(target=self._writer_loop, daemon=True)
        self._writer.start()
        if self.transport != "autonomous":
            self.feeds_ready.set()

    def submit(self, batch, results: list[ClassifyResult]):
        index = batch.raw_index
        fields = getattr(self.engine, "_payload_fields", _RESULT_FIELDS)
        payloads = [
            {field: getattr(result, field) for field in fields}
            for result in results
        ]
        try:
            if self.transport == "shm":
                self._send_shm(batch, payloads)
                return
            pipe = self._task_pipes[index % self.workers]
            if self.transport == "replay":
                pipe.send_bytes(pickle.dumps((index, payloads)))
            else:
                pipe.send_bytes(pickle.dumps((index, batch, payloads)))
        except (BrokenPipeError, OSError):
            self._raise_worker_failure()
            raise

    def submit_raw(self, batch):
        """Strict shm mode: ship the unclassified batch; the worker runs
        the whole per-read pipeline on it."""
        try:
            self._send_shm(batch, None)
        except (BrokenPipeError, OSError):
            self._raise_worker_failure()
            raise

    def acquire_parse_arena(self, estimate: int):
        """Hand the ingest layer a SlotArena so the native parser writes
        batch matrices straight into a pool slot (zero-copy staging:
        stage_batch then records offsets instead of copying). Returns None
        when the transport doesn't stage through shared memory."""
        if self._pool is None or self.transport != "shm":
            return None
        if os.environ.get("PHENIQS_ZERO_COPY_STAGE", "1") == "0":
            return None
        import time

        from .shm import SlotArena

        stage_add = getattr(self.engine, "_stage_add", None)
        mark = time.perf_counter()
        # non-blocking: a writer stall must never stall the parser — with
        # no slot free this batch parses into private memory and takes the
        # stage-time copy path, which buffers ahead in host RAM exactly
        # like the pre-zero-copy pipeline (measured: a blocking acquire
        # here cost 9.9 s of parse_slot in one bad-weather 10M-read run
        # while the copy path beside it rode the prefetch queue)
        acquired = self._pool.try_acquire(max(int(estimate), 1))
        if stage_add is not None:
            stage_add("parse_slot_map", time.perf_counter() - mark)
            # count-type entries (the `_n` suffix renders as an integer in
            # _trace_summary, not seconds): zero-copy engagements vs
            # dry-pool fallbacks
            if acquired is None:
                stage_add("parse_slot_dry_n", 1.0)
            else:
                stage_add("parse_slot_zc_n", 1.0)
        if acquired is None:
            return None
        slot, target = acquired
        return SlotArena(self._pool, slot, target)

    def stage(self, batch):
        """Write the batch's arrays into a pool slot NOW (called from the
        ingest thread): the big memcpy and any slot backpressure happen
        off the dispatch/pull loop; _send_shm later appends only the small
        decision arrays. Reserves space for them based on the last batch.
        Zero-copy batches (parsed straight into a SlotArena) only record
        their layout here."""
        if self._pool is None or self.transport != "shm":
            return
        import time

        from .shm import stage_batch

        stage_add = getattr(self.engine, "_stage_add", None)
        mark = time.perf_counter()
        wait_before = self._pool.wait_seconds
        batch._shm_staged = stage_batch(
            batch, self._pool, self._decision_reserve
        )
        if stage_add is not None:
            waited = self._pool.wait_seconds - wait_before
            stage_add("stage_slot", waited)
            stage_add("stage_copy", time.perf_counter() - mark - waited)

    def _send_shm(self, batch, payloads):
        import time

        from .shm import batch_to_shm

        stage_add = getattr(self.engine, "_stage_add", None)
        mark = time.perf_counter()
        wait_before = self._pool.wait_seconds
        staged = getattr(batch, "_shm_staged", None)
        descriptor, slot = batch_to_shm(batch, payloads, self._pool, staged)
        if staged is not None and payloads is not None:
            # next stage() reserves what this batch's decisions needed
            used = descriptor["layout"][-1]
            end = used[3] + int(np.prod(used[1])) * np.dtype(used[2]).itemsize
            self._decision_reserve = max(
                self._decision_reserve, (end - staged[2]) + (1 << 12)
            )
        # released by the writer thread when this task's result lands
        self._slot_by_index[batch.raw_index] = slot
        if stage_add is not None:
            waited = self._pool.wait_seconds - wait_before
            stage_add("submit_slot", waited)
            stage_add("submit_copy", time.perf_counter() - mark - waited)
        if self._task_queue is not None:
            self._task_queue.put(descriptor)
        else:
            pipe = self._task_pipes[batch.raw_index % self.workers]
            pipe.send_bytes(pickle.dumps(descriptor))

    def submit_skip(self, index: int):
        """Nothing survived this raw batch's input filters: keep the index
        sequence gapless for the writer and the replay streams."""
        if self._task_queue is not None:
            self._task_queue.put(("skip", index))
            return
        pipe = self._task_pipes[index % self.workers]
        if self.transport == "shm":
            pipe.send_bytes(pickle.dumps(("skip", index)))
        elif self.transport == "replay":
            pipe.send_bytes(pickle.dumps((index, "skip")))
        else:
            pipe.send_bytes(pickle.dumps((index, None, "skip")))

    def _collector_loop(self):
        """Drain worker results: release slots IMMEDIATELY (so a long
        ordered disk write never withholds pipeline backpressure) and hand
        chunks to the writer thread."""
        states_seen = 0
        try:
            while states_seen < self.workers:
                item = self._result_queue.get()
                if item[0] == "worker_error":
                    self._worker_failure = item[1:]
                    states_seen += 1
                    continue
                if item[0] == "state":
                    states_seen += 1
                    state = item[1]
                    if isinstance(state, dict):
                        self._states.append(state)  # autonomous full state
                        quality = state.get("quality")
                    else:
                        quality = state
                    if quality is not None and self.engine.channel_quality is not None:
                        for mine, theirs in zip(
                            self.engine.channel_quality, quality
                        ):
                            mine.merge(theirs)
                    continue
                index, chunk = item
                if self._pool is not None:
                    slot = self._slot_by_index.pop(index, None)
                    if slot is not None:
                        self._pool.release(slot)
                self._chunk_queue.put((index, chunk))
        except Exception as error:  # surfaced by finish()
            self._writer_error.append(error)
        finally:
            self._chunk_queue.put(None)

    def _writer_loop(self):
        """Sequence worker chunks in raw batch order and stream them out."""
        self.feeds_ready.wait()
        feeds_by_url = self.engine.feeds_by_url
        pending: dict[int, dict] = {}
        next_write = 0
        try:
            while True:
                item = self._chunk_queue.get()
                if item is None:
                    break
                index, chunk = item
                pending[index] = chunk
                while next_write in pending:
                    chunk = pending.pop(next_write)
                    if "__shm_chunk__" in chunk:
                        from .shm import chunk_from_shm

                        for url, data in chunk_from_shm(chunk):
                            feeds_by_url[url].write_raw(data)
                    else:
                        for url, data in chunk.items():
                            feeds_by_url[url].write_raw(data)
                    next_write += 1
        except Exception as error:  # surfaced by finish()
            self._writer_error.append(error)
            # keep draining the bounded queue: otherwise the collector
            # blocks forever in _chunk_queue.put and finish() hangs on
            # its join instead of raising the stored error
            while True:
                item = self._chunk_queue.get()
                if item is None:
                    break
                _, chunk = item
                if isinstance(chunk, dict) and "__shm_chunk__" in chunk:
                    from .shm import unlink_leftover

                    unlink_leftover(chunk["__shm_chunk__"])

    def _raise_worker_failure(self):
        if self._worker_failure is None:
            return
        from .. import errors as errors_mod

        name, message, _code = self._worker_failure
        error_class = getattr(errors_mod, name, None)
        if error_class is None or not isinstance(error_class, type):
            error_class = errors_mod.InternalError
        raise error_class(message)

    def abort(self):
        """Tear the pool down after a parent-side failure: kill workers,
        unblock the writer, and reclaim the tmpfs segments. Never raises."""
        try:
            self.feeds_ready.set()  # unblock a gated writer before joining
            if self._task_queue is not None:
                self._task_queue.cancel_join_thread()
            for process in self._processes:
                if process.is_alive():
                    process.terminate()
            if self._result_queue is not None:
                for _ in range(self.workers):
                    self._result_queue.put(("state", None))
            if self._collector is not None:
                self._collector.join(timeout=10)
            if self._writer is not None:
                self._writer.join(timeout=10)
            for pipe in self._task_pipes:
                try:
                    pipe.close()
                except Exception:
                    pass
            for process in self._processes:
                process.join(timeout=10)
        except Exception:
            pass
        finally:
            if self._pool is not None:
                self._pool.close()

    def finish(self):
        self.feeds_ready.set()  # feeds are initiated by every caller here
        if self._task_queue is not None:
            for _ in self._processes:
                self._task_queue.put(None)
        sentinel = pickle.dumps(None)
        for pipe in self._task_pipes:
            try:
                pipe.send_bytes(sentinel)
            except (BrokenPipeError, OSError):
                pass
        self._collector.join()
        self._writer.join()
        for pipe in self._task_pipes:
            pipe.close()
        for process in self._processes:
            process.join()
            if process.exitcode not in (0, None):
                self._raise_worker_failure()
                from ..errors import InternalError

                raise InternalError(
                    f"render worker exited with code {process.exitcode}"
                )
        if self._pool is not None:
            # all workers have exited: nothing maps the slots any more
            self._pool.close()
        if self._writer_error:
            raise self._writer_error[0]
        self._raise_worker_failure()
        # merge worker statistics in worker order — the deterministic
        # analog of Transcode::collect iterating its thread array
        # (reference transcode.cpp:317-320)
        engine = self.engine
        self._states.sort(key=lambda state: state.get("worker_id", 0))
        for state in self._states:
            engine.incoming_count += state["incoming_count"]
            engine.incoming_pf_count += state["incoming_pf_count"]
            engine.outgoing_count += state["outgoing_count"]
            engine.outgoing_pf_count += state["outgoing_pf_count"]
            for runtime, theirs in zip(
                engine.iter_runtimes(), state["accumulators"]
            ):
                runtime.accumulator.collect(theirs)


class StreamedStrictEngine(StrictEngine):
    """--threads N CPU engine.

    With replayable (disk-file) input, workers run the FULL pipeline —
    parse, classify, render — over their round-robin batch slice, so the
    f64 classification itself scales with workers (the reference's N
    decoding threads, transcode.cpp:1491-1500); the parent only sequences
    output chunks and merges statistics in worker order, which keeps the
    run deterministic for a fixed worker count. Non-replayable input
    (stdin) falls back to parent-side classification with worker
    rendering."""

    def __init__(self, ontology: dict, workers: int):
        super().__init__(ontology)
        self.workers = workers
        self._runner: StreamRunner | None = None
        self._raw_counter = -1
        # in every transport the workers render (recomputing observation
        # gathers themselves); the parent never does
        self._render_local = False

    def execute(self, batch_size: int = 4096):
        import time

        self._runner = StreamRunner(
            self, self.workers, batch_size, classify_in_worker=True
        )
        self._runner.start()
        try:
            if self._runner.transport == "shm":
                # parent parses once; workers classify + render their
                # round-robin slice out of shared memory
                self._initiate_feeds()
                start = time.perf_counter()
                for index, batch in enumerate(self.read_batches(batch_size)):
                    batch.raw_index = index
                    self._runner.submit_raw(batch)
                    self._note_batch_submitted(batch)
                self._close_feeds()
                self._trace_summary(start)
                return
            if self._runner.transport == "autonomous":
                # workers own the whole per-read pipeline including the
                # parse; the parent waits for the ordered writer + merge
                self._initiate_feeds()
                self._runner.feeds_ready.set()
                start = time.perf_counter()
                self._close_feeds()
                self._trace_summary(start)
                return
            super().execute(batch_size)
        except BaseException:
            if self._runner is not None:
                self._runner.abort()
                self._runner = None
            raise

    def _parse_arena_provider(self, estimate: int):
        """Zero-copy staging for the strict shm topology: the parent's
        native parser writes batch matrices straight into the pool slot
        submit_raw would otherwise memcpy them into (engine/shm.py
        stage_batch records the in-slot layout instead of copying)."""
        runner = self._runner
        if runner is None:
            return None
        return runner.acquire_parse_arena(estimate)

    def process_batch(self, batch, filtered: bool = False):
        if self._runner is not None and batch.raw_index is None:
            self._raw_counter += 1
            batch.raw_index = self._raw_counter
        classified = self._classify_batch(batch, filtered)
        if classified is None:
            if self._runner is not None:
                self._runner.submit_skip(batch.raw_index)
            return
        self._consume_classified(*classified)

    def _consume_classified(self, batch, results):
        self._runner.submit(batch, results)

    def _note_batch_submitted(self, batch):
        """Per-raw-batch hook for instrumentation (benchmark timelines)."""

    def _close_feeds(self):
        if self._runner is not None:
            self._runner.finish()
            self._runner = None
        super()._close_feeds()
