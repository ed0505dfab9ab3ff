"""Streamed multiprocess pipeline engine.

The host-side scale-out architecture (the TPU-native answer to the
reference's N decoding threads over shared ring buffers, reference
transcode.cpp:1491-1500, transcode.h:202-225):

    parent:  ingest -> classify (+ statistics)      [strict CPU or device]
    workers: template -> tags -> QC -> format        [N processes]
    writer:  sequence worker chunks in batch order -> feeds

Unlike round-1's ParallelEngine (every worker re-parsed the whole input
and all output was buffered in memory until the end), classification
state (the observation-scratch carry, the accumulators) stays sequential
in one owner — so output is byte-identical to the serial engine at any
worker count — and rendered chunks stream to disk with bounded memory.
Workers compress their own BGZF blocks (BAM and gzip text feeds), so
compression parallelizes with rendering; the writer thread only sequences
and writes raw bytes (the single-owner replacement for the reference's
ordered feed-lock protocol, multiplex.h:201-216).

Transport: when every input is a disk file (replayable), workers re-parse
the input themselves — the native parser runs at ~2M records/s with the
GIL released, so duplicating the parse is far cheaper than shipping batch
matrices through a pipe — and the parent sends only the per-decoder
decision arrays (~22 bytes/read). Non-replayable inputs (stdin) fall back
to shipping whole batches.
"""

from __future__ import annotations

import multiprocessing as mp
import pickle
import threading

from ..decode.oracle import ClassifyResult
from .strict import StrictEngine

_RESULT_FIELDS = (
    "decoded",
    "confidence",
    "edit_distance",
    "qcfail",
    "branch",
    "argmax",
)


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
        self.buffer = bytearray()
        self.bam = None
        self._bgzf = None
        self._devnull = feed.url.is_dev_null()
        # OutputFeed.emit skips when stream is None (dev-null)
        self.stream = None if self._devnull else self

    def initiate(self):
        if self._devnull:
            return
        if self.format == "bam":
            self.bam = _HeaderlessBam(_BufferSink(self.buffer))
        elif self.url.compression in ("gz", "bgzf"):
            from ..io.hts import BgzfWriter

            level = int(self.url.compression_level or 5)
            self._bgzf = BgzfWriter(_BufferSink(self.buffer), level)

    def write(self, payload: bytes):
        if self._devnull:
            return
        if self._bgzf is not None:
            self._bgzf.write(payload)
        else:
            self.buffer += payload

    def flush(self):
        pass

    def emit(self, name, flag, code, quality, length, tags, segment_index):
        from .feeds import OutputFeed

        OutputFeed.emit(self, name, flag, code, quality, length, tags, segment_index)

    def take(self) -> bytes:
        if self.bam is not None:
            self.bam.flush_block()
        if self._bgzf is not None:
            self._bgzf.flush_block()
        payload = bytes(self.buffer)
        self.buffer.clear()
        return payload

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
    for feed in engine.feeds_by_url.values():
        feed.initiate()
    return engine


def _apply_decisions(engine: StrictEngine, batch, payloads):
    """Rebuild per-runtime ClassifyResults (recomputing the cheap
    observation gathers locally) and render."""
    results = []
    for runtime, payload in zip(engine.iter_runtimes(), payloads):
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
    for url, feed in engine.feeds_by_url.items():
        data = feed.take()
        if data:
            chunk[url] = data
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


class StreamRunner:
    """Owns the render worker pool and the ordered writer thread.

    ``replay`` workers re-parse the input; parent ships decisions only.
    Task transport is one pipe per worker, written from the parent's main
    thread (no feeder threads competing for the GIL)."""

    def __init__(
        self,
        engine: StrictEngine,
        workers: int,
        batch_size: int = 16384,
        replay: bool | None = None,
    ):
        self.engine = engine
        self.workers = max(1, workers)
        self.batch_size = batch_size
        self.replay = self._input_replayable() if replay is None else replay
        self._processes: list = []
        self._task_pipes: list = []
        self._result_queue = None
        self._writer: threading.Thread | None = None
        self._writer_error: list = []

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
        for worker_id in range(self.workers):
            parent_end, child_end = context.Pipe()
            if self.replay:
                process = context.Process(
                    target=_render_worker_replay,
                    args=(
                        ontology_blob,
                        self.batch_size,
                        child_end,
                        self._result_queue,
                    ),
                    daemon=True,
                )
            else:
                process = context.Process(
                    target=_render_worker_ship,
                    args=(ontology_blob, child_end, self._result_queue),
                    daemon=True,
                )
            process.start()
            child_end.close()
            self._processes.append(process)
            self._task_pipes.append(parent_end)
        self._writer = threading.Thread(target=self._writer_loop, daemon=True)
        self._writer.start()

    def submit(self, batch, results: list[ClassifyResult]):
        index = batch.raw_index
        payloads = [
            {field: getattr(result, field) for field in _RESULT_FIELDS}
            for result in results
        ]
        pipe = self._task_pipes[index % self.workers]
        if self.replay:
            pipe.send_bytes(pickle.dumps((index, payloads)))
        else:
            pipe.send_bytes(pickle.dumps((index, batch, payloads)))

    def submit_skip(self, index: int):
        """Nothing survived this raw batch's input filters: keep the index
        sequence gapless for the writer and the replay streams."""
        pipe = self._task_pipes[index % self.workers]
        if self.replay:
            pipe.send_bytes(pickle.dumps((index, "skip")))
        else:
            pipe.send_bytes(pickle.dumps((index, None, "skip")))

    def _writer_loop(self):
        """Sequence worker chunks in raw batch order and stream them out."""
        feeds_by_url = self.engine.feeds_by_url
        pending: dict[int, dict] = {}
        next_write = 0
        states_seen = 0
        try:
            while states_seen < self.workers:
                item = self._result_queue.get()
                if item[0] == "state":
                    states_seen += 1
                    quality = item[1]
                    if quality is not None and self.engine.channel_quality is not None:
                        for mine, theirs in zip(
                            self.engine.channel_quality, quality
                        ):
                            mine.merge(theirs)
                    continue
                index, chunk = item
                pending[index] = chunk
                while next_write in pending:
                    for url, data in pending.pop(next_write).items():
                        feeds_by_url[url].write_raw(data)
                    next_write += 1
        except Exception as error:  # surfaced by finish()
            self._writer_error.append(error)

    def finish(self):
        sentinel = pickle.dumps(None)
        for pipe in self._task_pipes:
            pipe.send_bytes(sentinel)
        self._writer.join()
        for pipe in self._task_pipes:
            pipe.close()
        for process in self._processes:
            process.join()
            if process.exitcode not in (0, None):
                from ..errors import InternalError

                raise InternalError(
                    f"render worker exited with code {process.exitcode}"
                )
        if self._writer_error:
            raise self._writer_error[0]


class StreamedStrictEngine(StrictEngine):
    """--threads N CPU engine: parent classifies, workers render."""

    def __init__(self, ontology: dict, workers: int):
        super().__init__(ontology)
        self.workers = workers
        self._runner: StreamRunner | None = None
        self._raw_counter = -1

    def execute(self, batch_size: int = 4096):
        self._runner = StreamRunner(self, self.workers, batch_size)
        self._runner.start()
        super().execute(batch_size)

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

    def _close_feeds(self):
        if self._runner is not None:
            self._runner.finish()
            self._runner = None
        super()._close_feeds()
