"""One-command multi-chip / multi-host throughput bench.

    python -m pheniqs_tpu.tools.multichip_bench [--reads N] [--virtual D]

Runs the production hybrid engine (FASTQ -> tagged SAM) over the flagship
workload with the full scale-out topology engaged:

  * multi-host: `jax.distributed.initialize` from the standard env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); each
    host owns the PHENIQS_SHARD=k:H round-robin slice of the input and
    process 0 prints the cross-host aggregate (summed over DCN with one
    psum) — the collective analog of ``Transcode::collect`` (reference
    transcode.cpp:317-320)
  * multi-chip: the engine shard_maps its decode step over a 1-D `reads`
    mesh of this process's local devices with psum-merged counters
    (device/step.py)

`--virtual D` forces a D-device virtual CPU platform so the exact same
code path validates on a development machine (this is what the driver's
``dryrun_multichip`` exercises); on real hardware run it with no flags.

Prints one JSON line:
  {"metric": "multichip_e2e_hybrid", "value": <global reads/s>, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def run_bench(
    reads: int = 500_000,
    batch_size: int = 65536,
    threads: int = 4,
    fidelity: str = "hybrid",
    bench_dir: str | None = None,
    output: str | None = None,
    tp: str | None = None,
    tp_threshold: int | None = None,
) -> dict:
    """Synthesize (or reuse) the flagship input, run the engine over this
    host's shard, and return the cross-host aggregated stats dict.

    ``tp="R:P"`` engages barcode-axis tensor parallelism: the engine runs
    its decode step over a 2-D (reads, panel) mesh, sharding every PAMLD
    panel above ``tp_threshold`` barcodes across P devices
    (device/tp.py + make_tp_sharded_decode_step)."""
    import jax
    import numpy as np

    from ..benchmark import run_e2e, synthesize_fastq_input
    from ..device.distributed import initialize_multihost

    if tp:
        os.environ["PHENIQS_TP"] = tp
        if tp_threshold is not None:
            os.environ["PHENIQS_TP_THRESHOLD"] = str(tp_threshold)

    process_id, num_processes = initialize_multihost()
    if num_processes > 1:
        os.environ["PHENIQS_SHARD"] = f"{process_id}:{num_processes}"

    bench_dir = bench_dir or os.environ.get(
        "PHENIQS_BENCH_DIR", "/tmp/pheniqs_bench"
    )
    paths = synthesize_fastq_input(
        os.path.join(bench_dir, f"multichip_{reads}"), reads
    )
    if output is None:
        output = os.path.join(
            bench_dir, f"multichip_out_p{process_id}.sam"
        )
    stats = run_e2e(
        paths, output, fidelity=fidelity, threads=threads,
        batch_size=batch_size,
    )

    # cross-host aggregate: one DCN psum over (reads, wall-clock). The
    # global rate uses the max wall (hosts run concurrently).
    local = np.array([stats["reads"], stats["wall_s"]], dtype=np.float64)
    if num_processes > 1:
        from jax.sharding import Mesh, PartitionSpec

        mesh = Mesh(np.array(jax.devices()), ("hosts",))
        # all-sum of reads, all-max of wall over DCN
        import jax.numpy as jnp

        def agg(values):
            return (
                jax.lax.psum(values[0], "hosts"),
                jax.lax.pmax(values[1], "hosts"),
            )

        from jax.experimental.shard_map import shard_map

        global_reads, global_wall = jax.jit(
            shard_map(
                agg,
                mesh=mesh,
                in_specs=PartitionSpec(),
                out_specs=(PartitionSpec(), PartitionSpec()),
            )
        )(jnp.asarray(local))
        total_reads = float(global_reads)
        wall = float(global_wall)
    else:
        total_reads = float(local[0])
        wall = float(local[1])

    local_devices = len(jax.local_devices())
    result = {
        "metric": "multichip_e2e_hybrid",
        "value": round(total_reads / wall, 1) if wall else 0.0,
        "unit": "reads/s",
        "hosts": num_processes,
        "devices_per_host": local_devices,
        "reads": int(total_reads),
        "wall_s": round(wall, 3),
        "per_host_steady_reads_per_s": stats.get("steady_reads_per_s"),
        "process_id": process_id,
    }
    if tp:
        result["tp"] = tp
    return result


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="multi-chip/multi-host hybrid e2e throughput bench"
    )
    parser.add_argument("--reads", type=int, default=500_000)
    parser.add_argument("--batch-size", type=int, default=65536)
    parser.add_argument("--threads", type=int, default=4)
    parser.add_argument("--fidelity", default="hybrid")
    parser.add_argument(
        "--virtual", type=int, default=0,
        help="force an N-device virtual CPU platform (validation mode)",
    )
    parser.add_argument(
        "--tp", default=None, metavar="R:P",
        help="2-D (reads, panel) mesh: shard large PAMLD panels over P"
        " devices (barcode-axis tensor parallelism)",
    )
    parser.add_argument(
        "--tp-threshold", type=int, default=None,
        help="shard PAMLD panels above this many barcodes (default 16384)",
    )
    args = parser.parse_args(argv)

    if args.virtual > 1:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.virtual}"
            ).strip()
        import jax
        from jax._src import xla_bridge

        if not xla_bridge.backends_are_initialized():
            jax.config.update("jax_platforms", "cpu")

    result = run_bench(
        reads=args.reads,
        batch_size=args.batch_size,
        threads=args.threads,
        fidelity=args.fidelity,
        tp=args.tp,
        tp_threshold=args.tp_threshold,
    )
    if result["process_id"] == 0:
        print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
