"""Production benchmark: end-to-end hybrid FASTQ -> tagged SAM on real TPU.

The headline metric is the actual product: parse real FASTQ feeds, classify
on the device (flagship instrument: 96-barcode dual-index PAMLD sample +
384-barcode PAMLD cellular + naive UMI, 4-segment NovaSeq-shaped reads),
re-resolve boundary reads in f64 (hybrid = guaranteed strict-identical
decisions), render+write tagged SAM through the streamed worker pool.
`value` is the steady-state reads/s with the cold remote-XLA compile and
pipeline fill excluded (the axon tunnel pays a multi-minute uncached
compile per process; steady state is what a production deployment with a
persistent compilation cache sees).

`vs_baseline` compares against the strict float64 serial host engine
running the same workload end-to-end on this host — the faithful stand-in
for the reference C++ (which cannot be built here: htslib absent), itself
vectorized NumPy, so the ratio understates the advantage over the
reference's per-read loop.

Prints exactly one JSON line:
  {"metric", "value", "unit", "vs_baseline", ...extra context keys}

Env knobs:
  PHENIQS_BENCH_MODE=e2e|step   step = round-1 device decode-step bench
  PHENIQS_BENCH_E2E_READS       workload size (default 20,000,000)
  PHENIQS_BENCH_BASELINE_READS  strict-baseline slice (default 200,000)
  PHENIQS_BENCH_THREADS         engine --threads (default 4)
  PHENIQS_BENCH_BATCH           engine batch size (default 131072)
  PHENIQS_BENCH_DIR             input cache dir (default /tmp/pheniqs_bench)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MODE = os.environ.get("PHENIQS_BENCH_MODE", "e2e")
E2E_READS = int(os.environ.get("PHENIQS_BENCH_E2E_READS", 20_000_000))
BASELINE_READS = int(os.environ.get("PHENIQS_BENCH_BASELINE_READS", 200_000))
# cores + 1: the parent thread spends its life in I/O waits (device pull,
# worker submit), so one render worker per core plus the thin parent beats
# reserving a core for it (measured 473k vs 428k steady on the 4-core box)
THREADS = int(
    os.environ.get("PHENIQS_BENCH_THREADS", (os.cpu_count() or 4) + 1)
)
BATCH = int(os.environ.get("PHENIQS_BENCH_BATCH", 1 << 17))
BENCH_DIR = os.environ.get("PHENIQS_BENCH_DIR", "/tmp/pheniqs_bench")


def _probe_accelerator() -> str:
    """Return the platform the benchmark will run on.

    The tunneled axon TPU occasionally goes unavailable (backend init
    raises, or hangs past any useful deadline). Probing in a subprocess
    keeps a hung tunnel from wedging the benchmark itself; on failure the
    benchmark still runs — on the CPU backend, honestly labelled — so an
    unattended driver run records a number instead of a stack trace.
    """
    import subprocess

    try:
        probe = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax; print(jax.devices()[0].platform)",
            ],
            capture_output=True,
            text=True,
            timeout=int(os.environ.get("PHENIQS_BENCH_PROBE_TIMEOUT", 240)),
            env=os.environ.copy(),
        )
    except subprocess.TimeoutExpired:
        return ""
    out = probe.stdout.strip().splitlines()
    platform = out[-1] if out else ""
    if probe.returncode == 0 and platform:
        return platform
    return ""


def main_e2e():
    # pin the benchmark to the measured wire-ladder winner: the round-4
    # 20M-read alternating A/B on the v5e put j4 (joint 4-bit pair lane,
    # 26 B/read) above v3 (2-bit quality lane, 37 B/read) on every
    # per-batch median (629/544/453k vs 561/383/425k) and 2 of 3 steady
    # windows (BASELINE.md round-4 wire matrix). Explicit
    # PHENIQS_QUAL_WIRE wins, so future A/B runs just set it.
    os.environ.setdefault("PHENIQS_QUAL_WIRE", "j4")
    # in-flight depth 4: the round-4 stall-weather A/B (BASELINE.md
    # "Relay stall tolerance") measured depth 2 vs 4 back-to-back on a
    # stall-heavy relay at 244k vs 490k steady (batch medians 350k vs
    # 636-890k across repeats) — deeper pipelining absorbs multi-second
    # relay stalls; depth 6-8 showed no further steady gain. Explicit
    # PHENIQS_LOOKAHEAD wins for future A/Bs.
    os.environ.setdefault("PHENIQS_LOOKAHEAD", "4")
    try:
        platform = _probe_accelerator()
    except Exception:
        platform = ""
    if not platform or platform == "cpu":
        # accelerator unreachable: run on CPU and say so in the record
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        platform = "cpu_fallback_accelerator_unavailable"

    from pheniqs_tpu.benchmark import run_e2e, synthesize_fastq_input

    paths = synthesize_fastq_input(os.path.join(BENCH_DIR, "main"), E2E_READS)
    baseline_paths = synthesize_fastq_input(
        os.path.join(BENCH_DIR, "baseline"), BASELINE_READS
    )

    # strict float64 serial host engine: the reference stand-in
    baseline = run_e2e(
        baseline_paths,
        os.path.join(BENCH_DIR, "baseline_out.sam"),
        fidelity="strict",
        threads=1,
        batch_size=16384,
    )

    stats = run_e2e(
        paths,
        os.path.join(BENCH_DIR, "main_out.sam"),
        fidelity="hybrid",
        threads=THREADS,
        batch_size=BATCH,
    )

    steady = stats.get("steady_reads_per_s", stats["reads_per_s"])
    # Reference anchor (VERDICT r2 item 2): the real pheniqs binary cannot
    # be built here — htslib's source is unreachable (zero network egress;
    # verified: pip/apt/no vendored copy).  The defensible proxy is this
    # repo's own strict engine (same f64 PAMLD algorithm, native C++
    # classifier + native ingest/render — a conservative stand-in for the
    # reference's per-read C++ loop), extrapolated with the reference's own
    # published claim of linear core scaling (reference README.md:28):
    # 32-core reference ~= 32 x strict-serial.  That extrapolation ignores
    # the I/O saturation the reference itself documents
    # (reference docs/configuration.md:20), i.e. it overstates the
    # reference — honest in the direction that disfavors us.
    proxy_32core = 32 * baseline["reads_per_s"]
    print(
        json.dumps(
            {
                "metric": "e2e_hybrid_fastq_to_tagged_sam",
                "value": steady,
                "unit": "reads/s",
                "vs_baseline": round(steady / baseline["reads_per_s"], 2),
                "total_reads": stats["reads"],
                "wall_s": stats["wall_s"],
                "overall_reads_per_s": stats["reads_per_s"],
                "cold_start_s": stats.get("cold_start_s"),
                "steady_window_s": stats.get("steady_window_s"),
                "steady_batches": stats.get("steady_batches"),
                "batch_rate_p10": stats.get("batch_rate_p10"),
                "batch_rate_median": stats.get("batch_rate_median"),
                "batch_rate_p90": stats.get("batch_rate_p90"),
                "baseline_strict_serial_reads_per_s": baseline["reads_per_s"],
                "reference_proxy_32core_reads_per_s": round(proxy_32core, 1),
                "vs_reference_32core_proxy": round(steady / proxy_32core, 3),
                "reference_proxy_note": (
                    "reference binary unbuildable here (htslib source"
                    " unreachable, zero egress); proxy = 32 x this repo's"
                    " strict f64 serial engine assuming the reference's"
                    " claimed linear core scaling"
                ),
                "threads": THREADS,
                "batch": BATCH,
                "platform": platform,
            }
        )
    )


def main_step():
    """Round-1 device decode-step bench (H2D + decode + packed D2H pull)."""
    import time

    import jax
    import numpy as np

    from pheniqs_tpu.decode.oracle import pamld_classify
    from pheniqs_tpu.decode.spec import spec_from_ontology
    from pheniqs_tpu.device.flagship import (
        flagship_instrument,
        flagship_ontology,
        synthetic_batch,
    )
    from pheniqs_tpu.device.step import make_decode_step

    iters = int(os.environ.get("PHENIQS_BENCH_ITERS", 20))
    ontology = flagship_ontology()
    instrument = flagship_instrument()
    batch_np = synthetic_batch(instrument, ontology, BATCH, seed=11)
    used = instrument.used_segments
    host_segments = [
        (
            batch_np["segments"][s][0].astype(np.uint8),
            batch_np["segments"][s][1].astype(np.uint8),
            batch_np["segments"][s][2],
        )
        for s in used
    ]
    qcfail = batch_np["qcfail"]
    step = jax.jit(
        make_decode_step(instrument, want_counters=False, pack_outputs=True)
    )

    def ship_and_run(host_segs):
        batch = {
            "segments": [
                (jax.device_put(c), jax.device_put(q), jax.device_put(l))
                for c, q, l in host_segs
            ],
            "qcfail": jax.device_put(qcfail),
        }
        return step(batch)

    jax.block_until_ready(ship_and_run(host_segments))
    variants = [
        host_segments,
        [(c.copy(), q.copy(), l.copy()) for c, q, l in host_segments],
    ]
    start = time.perf_counter()
    pending = None
    for i in range(iters):
        out = ship_and_run(variants[i % 2])
        if pending is not None:
            np.asarray(pending[0]["blob"])
        pending = out
    np.asarray(pending[0]["blob"])
    elapsed = time.perf_counter() - start
    device_rps = BATCH * iters / elapsed

    sample_spec = spec_from_ontology(ontology["sample"], "sample")
    cell_spec = spec_from_ontology(ontology["cellular"][0], "cellular")
    m = min(BASELINE_READS, 1 << 14)
    i7 = batch_np["segments"][1]
    i5 = batch_np["segments"][2]
    cell = batch_np["segments"][3]
    obs_sample_code = np.concatenate(
        [i7[0][:m].astype(np.uint8), i5[0][:m].astype(np.uint8)], axis=1
    )
    obs_sample_qual = np.concatenate(
        [i7[1][:m].astype(np.uint8), i5[1][:m].astype(np.uint8)], axis=1
    )
    fail = np.zeros(m, dtype=bool)
    t0 = time.perf_counter()
    r1 = pamld_classify(sample_spec, obs_sample_code, obs_sample_qual, fail)
    pamld_classify(
        cell_spec,
        cell[0][:m, :16].astype(np.uint8),
        cell[1][:m, :16].astype(np.uint8),
        r1.qcfail,
    )
    strict_rps = m / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "flagship_pamld_decode_throughput",
                "value": round(device_rps, 1),
                "unit": "reads/s",
                "vs_baseline": round(device_rps / strict_rps, 2),
            }
        )
    )


if __name__ == "__main__":
    if MODE == "step":
        main_step()
    else:
        main_e2e()
