"""Multiprocess host engine: `--threads N` scale-out.

The process-level analog of the reference's N decoding threads over shared
feeds (reference transcode.cpp:1491-1500): N workers each stream the input
feeds (parsing is ~30x faster than decoding, so duplicated parsing is
cheap), own read batches round-robin, and run the full strict pipeline —
classify, template, tags, format — into in-memory capture buffers. The
parent writes captured payloads strictly in batch order (so output remains
globally input-ordered, stronger than the reference's arrival-order
interleaving under threads>1) and merges worker accumulators at the end,
exactly like ``Transcode::collect``.

Like the reference with threads>1, the serial observation-scratch carry
for reads shorter than a decoder token becomes per-worker state; goldens
are defined at threads=1 (reference test/BDGGG/BDGGG_interleave.json:57).
"""

from __future__ import annotations

import multiprocessing as mp
import pickle

from .strict import StrictEngine


class CaptureFeed:
    """Stands in for OutputFeed inside workers: collects emitted bytes."""

    def __init__(self, feed):
        self.url = feed.url
        self.format = feed.format
        self.phred_offset = feed.phred_offset
        self.platform = feed.platform
        self.buffer = bytearray()
        self.bam = None
        self.stream = self  # emit() checks `stream is None`

    # OutputFeed interface -------------------------------------------------
    def initiate(self, header):
        if self.format == "bam":
            # headerless BGZF stream: the parent writes the header block
            self.bam = _HeaderlessBam(self)

    def write(self, payload: bytes):
        self.buffer += payload

    def flush(self):
        pass

    def emit(self, name, flag, code, quality, length, tags, segment_index):
        from .strict import OutputFeed

        OutputFeed.emit(self, name, flag, code, quality, length, tags, segment_index)

    def close(self):
        pass

    def take(self) -> bytes:
        payload = bytes(self.buffer)
        self.buffer.clear()
        return payload


class _HeaderlessBam:
    """BamWriter facade producing standalone BGZF record blocks."""

    def __init__(self, capture: CaptureFeed):
        from ..io.hts import BgzfWriter

        self._writer = BgzfWriter(capture)
        self._capture = capture

    def write_record(self, *args, **kwargs):
        from ..io.hts import BamWriter

        BamWriter.write_record(self._writer_proxy(), *args, **kwargs)

    def _writer_proxy(self):
        proxy = _BamProxy()
        proxy.bgzf = self._writer
        return proxy

    def flush_block(self):
        self._writer.flush_block()


class _BamProxy:
    pass


_worker_state: dict = {}


def _worker_init(ontology_blob: bytes, workers: int, batch_size: int):
    ontology = pickle.loads(ontology_blob)
    engine = StrictEngine(ontology)
    engine.feeds_by_url = {
        url: CaptureFeed(feed) for url, feed in engine.feeds_by_url.items()
    }
    for channel in engine.channels:
        channel.feeds = [engine.feeds_by_url[url] for url in channel.output_urls]
    for feed in engine.feeds_by_url.values():
        feed.initiate(None)
    _worker_state.update(
        engine=engine,
        workers=workers,
        batch_size=batch_size,
    )


def _worker_run(worker_id: int):
    """Stream all batches, process the slice this task owns, return
    (ordered payload list, accumulator snapshot)."""
    engine: StrictEngine = _worker_state["engine"]
    workers = _worker_state["workers"]
    batch_size = _worker_state["batch_size"]

    payloads = []  # (batch_index, {url: bytes})
    for index, batch in enumerate(engine.read_batches(batch_size)):
        if index % workers != worker_id:
            continue
        engine.process_batch(batch)
        chunk = {}
        for url, feed in engine.feeds_by_url.items():
            if feed.bam is not None:
                feed.bam.flush_block()
            data = feed.take()
            if data:
                chunk[url] = data
        payloads.append((index, chunk))

    state = {
        "incoming_count": engine.incoming_count,
        "incoming_pf_count": engine.incoming_pf_count,
        "outgoing_count": engine.outgoing_count,
        "outgoing_pf_count": engine.outgoing_pf_count,
        "accumulators": [
            {
                "count": r.accumulator.count,
                "pf_count": r.accumulator.pf_count,
                "accumulated_distance": r.accumulator.accumulated_distance,
                "accumulated_pf_distance": r.accumulator.accumulated_pf_distance,
                "accumulated_confidence": r.accumulator.accumulated_confidence,
                "accumulated_pf_confidence": r.accumulator.accumulated_pf_confidence,
                "low_conditional_confidence_count": (
                    r.accumulator.low_conditional_confidence_count
                ),
                "low_confidence_count": r.accumulator.low_confidence_count,
            }
            for r in _runtimes(engine)
        ],
        "quality": engine.channel_quality,
    }
    return payloads, state


def _runtimes(engine: StrictEngine):
    out = []
    if engine.sample is not None:
        out.append(engine.sample)
    out.extend(engine.molecular)
    out.extend(engine.cellular)
    return out


class ParallelEngine(StrictEngine):
    """Drives N worker processes and merges their results."""

    def __init__(self, ontology: dict, workers: int):
        super().__init__(ontology)
        self.workers = max(1, workers)

    def execute(self, batch_size: int = 4096):
        from ..io.sam import SamHeader

        header = SamHeader(self.ontology, self.ontology.get("program"))
        initiated = set()
        for url, feed in self.feeds_by_url.items():
            if id(feed) not in initiated:
                feed.initiate(header)
                initiated.add(id(feed))

        # BAM feeds buffer their header block inside the BamWriter; force
        # it out before worker payload blocks are appended to the stream
        for feed in self.feeds_by_url.values():
            if getattr(feed, "bam", None) is not None:
                feed.bam.bgzf.flush_block()

        ontology_blob = pickle.dumps(self.ontology)
        context = mp.get_context("fork")
        with context.Pool(
            self.workers,
            initializer=_worker_init,
            initargs=(ontology_blob, self.workers, batch_size),
        ) as pool:
            results = pool.map(_worker_run, range(self.workers))

        # write payloads in global batch order
        chunks = []
        for payloads, _state in results:
            chunks.extend(payloads)
        chunks.sort(key=lambda item: item[0])
        for _index, by_url in chunks:
            for url, data in by_url.items():
                self.feeds_by_url[url].write(data)

        # merge statistics (the allreduce analog of Transcode::collect)
        mine = _runtimes(self)
        for _payloads, state in results:
            self.incoming_count += state["incoming_count"]
            self.incoming_pf_count += state["incoming_pf_count"]
            self.outgoing_count += state["outgoing_count"]
            self.outgoing_pf_count += state["outgoing_pf_count"]
            for runtime, snapshot in zip(mine, state["accumulators"]):
                accumulator = runtime.accumulator
                for field, value in snapshot.items():
                    getattr(accumulator, field).__iadd__(value)
            if state["quality"] is not None and self.channel_quality is not None:
                for mine_q, theirs_q in zip(self.channel_quality, state["quality"]):
                    mine_q.merge(theirs_q)

        for feed in self.feeds_by_url.values():
            feed.close()
