"""End-to-end production benchmark harness.

Measures the actual product: FASTQ in, classified+tagged SAM out, through
the hybrid (device classification + f64 boundary re-resolution + streamed
render fan-out) engine — not just the device decode step. The workload is
the flagship instrument (96-barcode dual-index PAMLD sample + 384-barcode
PAMLD cellular + naive UMI over 4-segment NovaSeq-shaped reads,
device/flagship.py), materialized as real FASTQ files.

Steady-state accounting: on the tunneled axon TPU the first decode-step
call pays a multi-minute remote XLA compile; per-batch completion
timestamps let the report separate cold-start from steady throughput
(memory: never benchmark the first device call).
"""

from __future__ import annotations

import os
import time

import numpy as np

from .device.flagship import flagship_ontology, synthetic_batch

SEGMENT_WIDTHS = (150, 8, 8, 26)


def synthesize_fastq_input(
    directory: str,
    n_reads: int,
    seed: int = 20260818,  # bumped with the RTA3 quality binning
    chunk: int = 1 << 17,
) -> list[str]:
    """Write the flagship workload as 4 per-segment FASTQ files (R1, I7,
    I5, R2 in NovaSeq terms). Returns the file paths (cached: reused when
    already present with the right size)."""
    from .native import fastq_format_batch

    # one directory per (size, seed): a different requested size must not
    # truncate another run's cached input files
    directory = f"{directory}_{n_reads}_{seed}"
    os.makedirs(directory, exist_ok=True)
    paths = [
        os.path.join(directory, f"flagship_s{s + 1:02d}.fastq")
        for s in range(len(SEGMENT_WIDTHS))
    ]
    marker = os.path.join(directory, f".complete_{n_reads}_{seed}")
    if os.path.exists(marker) and all(os.path.exists(p) for p in paths):
        return paths

    ontology = flagship_ontology()
    streams = [open(p, "wb") for p in paths]
    written = 0
    part = 0
    while written < n_reads:
        n = min(chunk, n_reads - written)
        batch = synthetic_batch(
            None, ontology, n, seed=seed + part, segment_widths=SEGMENT_WIDTHS
        )
        name_list = [b"r%d" % (written + i) for i in range(n)]
        names = b"".join(name_list)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum([len(x) for x in name_list], out=offsets[1:])
        qcfail = np.zeros(n, dtype=np.uint8)
        for s, stream in enumerate(streams):
            code, qual, length = batch["segments"][s]
            rendered = fastq_format_batch(
                names,
                offsets,
                qcfail,
                0,  # no Illumina comment: keeps the files lean
                np.ascontiguousarray(code.astype(np.uint8)),
                np.ascontiguousarray(qual.astype(np.uint8)),
                length,
                33,
                None,
            )
            if rendered is not None:
                stream.write(rendered[0])
            else:
                # native library unavailable (PHENIQS_NATIVE=0): render
                # in Python — synthesis only, speed immaterial
                from .iupac import BAM_TO_ASCII

                seqs = BAM_TO_ASCII[code.astype(np.uint8) & 0xF]
                phred = (qual.astype(np.uint8) + 33).astype(np.uint8)
                out = bytearray()
                for i in range(n):
                    l = int(length[i])
                    out += b"@" + name_list[i] + b"\n"
                    out += seqs[i, :l].tobytes() + b"\n+\n"
                    out += phred[i, :l].tobytes() + b"\n"
                stream.write(bytes(out))
        written += n
        part += 1
    for stream in streams:
        stream.close()
    open(marker, "w").close()
    return paths


def e2e_ontology(paths: list[str], output_url: str, threads: int) -> dict:
    """Compile the flagship instruction against real input feeds through
    the production config compiler."""
    from .cli.interface import Interface
    from .job import TranscodeJob

    base = flagship_ontology()
    instruction = {
        "input": list(paths),
        "template": {"transform": {"token": ["0::"]}},
        "sample": base["sample"],
        "cellular": base["cellular"],
        "molecular": base["molecular"],
        "output": [output_url],
        "report url": "/dev/null",
        "threads": threads,
    }
    import json as json_mod
    import tempfile

    with tempfile.NamedTemporaryFile(
        "w", suffix=".json", delete=False
    ) as handle:
        json_mod.dump(instruction, handle)
        config_path = handle.name
    interface = Interface(
        ["pheniqs-tpu", "mux", "--config", config_path, "--threads", str(threads)]
    )
    job = TranscodeJob(interface.operation())
    job.compiler.assemble()
    ontology = job.compiler.compile()
    os.unlink(config_path)
    return ontology


class _TimedMixin:
    """Record a wall-clock timestamp and cumulative read count after each
    batch completes its host-side consumption (classified consume on the
    device/serial paths, raw submit on the strict worker path)."""

    def _init_timeline(self):
        self.timeline: list[tuple[float, int]] = []
        self._timeline_reads = 0

    def _note_batch(self, batch):
        self._timeline_reads += batch.size
        self.timeline.append((time.perf_counter(), self._timeline_reads))

    def _consume_classified(self, batch, results):
        super()._consume_classified(batch, results)
        self._note_batch(batch)

    def _note_batch_submitted(self, batch):
        self._note_batch(batch)


class _NullDeviceMixin:
    """Replace the accelerator with an instant decision fabricator so the
    FULL production streamed host path runs unchanged — native parse ->
    input filters -> wire pack -> SHM worker staging -> decision apply ->
    render workers -> ordered single-owner writer. The measured number is
    the host-pipeline ceiling: the rate one host can feed a chip
    (the reference names host I/O as the demultiplexing wall,
    reference docs/configuration.md:20). Decisions spread reads across
    the barcode panel so tag rendering costs what production costs."""

    def _dispatch(self, batch, packed=None):
        if packed is None:
            packed = self._pack_batch(batch)  # keep the real wire-pack cost
        return None

    def _classify_batch_on_device(self, batch):
        n = batch.size
        cycle = np.arange(n, dtype=np.int64)
        results = []
        for dec in self.instrument.decoders:
            b = dec.barcode_count
            if dec.algorithm in ("pamld", "mdd") and b:
                decoded = ((cycle % b) + 1).astype(np.int32)
                confidence = np.full(n, 0.99951171875, dtype=np.float64)
            else:
                decoded = np.zeros(n, dtype=np.int32)
                confidence = np.zeros(n, dtype=np.float64)
            results.append(
                {
                    "decoded": decoded,
                    "confidence": confidence,
                    "qcfail": batch.qcfail.copy(),
                }
            )
        self._batch_rows = np.empty(0, dtype=np.int64)
        self._rows_qcfail = np.empty(0, dtype=bool)
        return results


def run_e2e(
    paths: list[str],
    output_url: str,
    fidelity: str = "hybrid",
    threads: int = 4,
    batch_size: int = 65536,
) -> dict:
    """Run the end-to-end engine over `paths`, returning throughput stats
    with cold-start (first two batches: XLA compile + warmup) separated
    from steady state."""
    ontology = e2e_ontology(paths, output_url, threads)

    if fidelity == "strict":
        if threads > 1:
            from .engine.stream import StreamedStrictEngine

            class Engine(_TimedMixin, StreamedStrictEngine):
                pass

            engine = Engine(ontology, workers=max(1, threads))
        else:
            from .engine.strict import StrictEngine

            class Engine(_TimedMixin, StrictEngine):
                pass

            engine = Engine(ontology)
    elif fidelity == "null":
        # host-pipeline ceiling: the streamed device engine with the
        # accelerator replaced by _NullDeviceMixin's fabricator
        from .engine.device import StreamedDeviceEngine

        class Engine(_TimedMixin, _NullDeviceMixin, StreamedDeviceEngine):
            pass

        engine = Engine(ontology, hybrid=False, workers=max(1, threads - 1))
    else:
        from .engine.device import DeviceEngine, StreamedDeviceEngine

        hybrid = fidelity == "hybrid"
        if threads > 1:

            class Engine(_TimedMixin, StreamedDeviceEngine):
                pass

            engine = Engine(ontology, hybrid=hybrid, workers=max(1, threads - 1))
        else:

            class Engine(_TimedMixin, DeviceEngine):
                pass

            engine = Engine(ontology, hybrid=hybrid)

    engine._init_timeline()
    start = time.perf_counter()
    engine.execute(batch_size=batch_size)
    wall = time.perf_counter() - start
    report = engine.finalize_report()

    timeline = engine.timeline
    total_reads = timeline[-1][1] if timeline else 0
    stats = {
        "reads": total_reads,
        "wall_s": round(wall, 3),
        "reads_per_s": round(total_reads / wall, 1) if wall else 0.0,
        "batches": len(timeline),
    }
    # steady state: drop the warmup batches (XLA compile + pipeline fill),
    # then report BOTH the window aggregate and the per-batch rate
    # distribution — the median is robust to relay stragglers, and the
    # p10/p90 spread documents the environment volatility instead of
    # letting a lucky batch stand in for "steady"
    warmup = 3 if len(timeline) > 8 else 1
    if len(timeline) > warmup + 2:
        t0, r0 = timeline[warmup]
        t1, r1 = timeline[-1]
        if t1 > t0:
            stats["steady_reads_per_s"] = round((r1 - r0) / (t1 - t0), 1)
            stats["cold_start_s"] = round(timeline[1][0] - start, 3)
            stats["steady_window_s"] = round(t1 - t0, 3)
            stats["steady_batches"] = len(timeline) - warmup - 1
        rates = []
        windows = []
        for (ta, ra), (tb, rb) in zip(timeline[warmup:-1], timeline[warmup + 1:]):
            if tb > ta:
                rates.append((rb - ra) / (tb - ta))
                windows.append((rb - ra, tb - ta))
        if rates:
            q = np.percentile(rates, [10, 50, 90])
            stats["batch_rate_p10"] = round(float(q[0]), 1)
            stats["batch_rate_median"] = round(float(q[1]), 1)
            stats["batch_rate_p90"] = round(float(q[2]), 1)
            # trimmed steady: the aggregate rate over the top-half batch
            # windows (those at or above the median per-batch rate).
            # The plain steady aggregate is dominated by multi-second
            # relay stalls on this tunneled environment (identical
            # configs measured 63k-490k in one afternoon, BASELINE.md);
            # the top-half aggregate measures what the program sustains
            # when the link behaves while still averaging over half the
            # run rather than trusting one lucky batch.
            med = float(q[1])
            top_reads = sum(r for (r, t), rate in zip(windows, rates)
                            if rate >= med)
            top_time = sum(t for (r, t), rate in zip(windows, rates)
                           if rate >= med)
            if top_time > 0:
                stats["steady_trimmed_reads_per_s"] = round(
                    top_reads / top_time, 1
                )
    # classification sanity: the synthetic panel reads should mostly decode
    incoming = report.get("incoming", {}).get("count", 0)
    sample = report.get("sample", {})
    classified = sum(
        entry.get("count", 0) for entry in sample.get("classified", [])
    )
    if incoming:
        stats["classified_fraction"] = round(classified / incoming, 4)
    return stats
