"""The decode step: one jitted XLA program per instruction, and its
multi-chip SPMD wrapper.

``make_decode_step`` builds a pure function (batch) -> (per_read, counters)
covering every classifier of the instruction in the reference classify
order (sample, molecular*, cellular*; reference transcode.h:51-65), the
channel-routing index, and the statistics counters that feed the JSON
report. Counters are one-hot contractions (MXU-friendly), so they emerge
as small (B+1,) vectors per decoder.

``make_sharded_decode_step`` wraps the step in ``shard_map`` over a 1-D
``reads`` mesh axis — the TPU-native analog of the reference's N identical
decoding threads over shared feeds (reference transcode.cpp:1491-1500):
read batches are sharded over chips, the barcode panels and LUTs are
replicated, and the per-decoder counters are merged with ``psum`` over ICI
exactly where the reference merges thread-local accumulators at collect
time (reference transcode.cpp:317-320).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .classify import (
    BRANCH_LOW_CONFIDENCE,
    BRANCH_NOISE,
    BRANCH_PASS,
    apply_plans,
    mdd_classify_device,
    pamld_classify_device,
)
from .instrument import DeviceDecoder, DeviceInstrument


def _segment_sum(index: jnp.ndarray, weights: jnp.ndarray, b1: int) -> jnp.ndarray:
    """Stacked per-barcode sums: (N,) index + (N, K) weights -> (b1, K) via
    one one-hot contraction on the MXU (single pass over the batch)."""
    onehot = jax.nn.one_hot(index, b1, dtype=jnp.float32)  # (N, b1)
    return jnp.einsum(
        "nb,nk->bk", onehot, weights, precision=jax.lax.Precision.HIGHEST
    )


def _counters(dec: DeviceDecoder, result: dict) -> dict:
    """Per-batch accumulator deltas (reference selector.h:32-92), fused into
    one stacked one-hot contraction over the (B+1) barcode axis (row 0 =
    unclassified), plus one for the argmax-keyed filter counters."""
    b1 = dec.barcode_count + 1
    decoded = result["decoded"]
    branch = result["branch"]
    pf = (~result["qcfail"]).astype(jnp.float32)
    ones = jnp.ones_like(pf)

    columns = [ones, pf]
    names = ["count", "pf_count"]
    if dec.algorithm in ("pamld", "mdd"):
        distance = result["distance"].astype(jnp.float32)
        dist_mask = ((decoded > 0) & (result["distance"] > 0)).astype(jnp.float32)
        columns += [distance * dist_mask, distance * dist_mask * pf]
        names += ["accumulated_distance", "accumulated_pf_distance"]
    if dec.algorithm == "pamld":
        passed = (branch == BRANCH_PASS).astype(jnp.float32)
        confidence = result["confidence"]
        columns += [confidence * passed, confidence * passed * pf]
        names += ["accumulated_confidence", "accumulated_pf_confidence"]

    stacked = _segment_sum(decoded, jnp.stack(columns, axis=1), b1)
    counters = {name: stacked[:, k] for k, name in enumerate(names)}

    if dec.algorithm == "pamld":
        filters = _segment_sum(
            result["argmax"],
            jnp.stack(
                [
                    (branch == BRANCH_LOW_CONFIDENCE).astype(jnp.float32),
                    (branch == BRANCH_NOISE).astype(jnp.float32),
                ],
                axis=1,
            ),
            b1,
        )
        counters["low_confidence_count"] = filters[:, 0]
        counters["low_conditional_confidence_count"] = filters[:, 1]
    return counters


def _classify_one(
    instrument: DeviceInstrument,
    dec: DeviceDecoder,
    segments,
    qcfail,
    want_uncertain: bool = False,
    panel_shard=None,
    panel_axis: str | None = None,
):
    n = qcfail.shape[0]
    if dec.algorithm == "passthrough" or not dec.plans:
        return {
            "decoded": jnp.zeros(n, dtype=jnp.int32),
            "confidence": jnp.zeros(n, dtype=jnp.float32),
            "distance": jnp.zeros(n, dtype=jnp.int32),
            "qcfail": qcfail,
            "branch": jnp.zeros(n, dtype=jnp.int8),
            "argmax": jnp.zeros(n, dtype=jnp.int32),
        }
    observation = apply_plans(dec, segments)
    if dec.algorithm == "naive":
        return {
            "decoded": jnp.zeros(n, dtype=jnp.int32),
            "confidence": jnp.zeros(n, dtype=jnp.float32),
            "distance": jnp.zeros(n, dtype=jnp.int32),
            "qcfail": qcfail,
            "branch": jnp.zeros(n, dtype=jnp.int8),
            "argmax": jnp.zeros(n, dtype=jnp.int32),
        }
    if dec.algorithm == "pamld":
        obs_code = jnp.concatenate([c for c, _, _ in observation], axis=1)
        obs_qual = jnp.concatenate([q for _, q, _ in observation], axis=1)
        return pamld_classify_device(
            instrument, dec, obs_code, obs_qual, qcfail,
            want_uncertain=want_uncertain,
            panel_shard=panel_shard,
            panel_axis=panel_axis,
        )
    if dec.algorithm == "mdd":
        return mdd_classify_device(dec, observation, qcfail)
    raise ValueError(f"unknown algorithm {dec.algorithm}")


def h2d_blob_bytes(widths: list[int]) -> int:
    """Bytes per read of the packed host->device layout for `widths`."""
    return sum(2 * w + 4 for w in widths) + 1


def pack_h2d_blob(
    widths: list[int], segments, qcfail, out=None
):
    """Host-side packing of per-segment (code, qual, length) + qcfail into
    one (N, bytes_per_read) uint8 matrix — a single transfer instead of
    3*segments + 1 (the tunneled transport pays per-array latency)."""
    import numpy as np

    n = qcfail.shape[0]
    blob = out if out is not None else np.empty(
        (n, h2d_blob_bytes(widths)), dtype=np.uint8
    )
    offset = 0
    for w, (code, qual, length) in zip(widths, segments):
        sw = code.shape[1]
        blob[:, offset : offset + sw] = code
        if sw < w:
            blob[:, offset + sw : offset + w] = 0
        offset += w
        blob[:, offset : offset + sw] = qual
        if sw < w:
            blob[:, offset + sw : offset + w] = 0
        offset += w
        blob[:, offset : offset + 4] = (
            np.ascontiguousarray(length, dtype=np.int32)
            .view(np.uint8)
            .reshape(n, 4)
        )
        offset += 4
    blob[:, offset] = qcfail
    return blob


def _unpack_h2d_blob(widths: list[int], blob):
    """Device-side unpack (inside jit: pure slicing + one bitcast each)."""
    segments = []
    offset = 0
    for w in widths:
        code = blob[:, offset : offset + w].astype(jnp.int32)
        offset += w
        qual = blob[:, offset : offset + w].astype(jnp.int32)
        offset += w
        length = jax.lax.bitcast_convert_type(
            blob[:, offset : offset + 4], jnp.int32
        )
        offset += 4
        segments.append((code, qual, length))
    qcfail = blob[:, offset] > 0
    return segments, qcfail


def make_decode_step(
    instrument: DeviceInstrument,
    axis_name: str | None = None,
    want_uncertain: bool = False,
    want_counters: bool = True,
    pack_outputs: bool = False,
    h2d_widths: list[int] | None = None,
    panel_axis: str | None = None,
):
    """Build the (batch) -> (per_read, counters) step function.

    ``batch`` is a dict: ``segments`` — list of (code (N, Wi) int32,
    quality (N, Wi) int32, length (N,) int32) — and ``qcfail`` (N,) bool.
    With ``h2d_widths`` the step instead takes {"blob": (N, bytes) uint8}
    packed by `pack_h2d_blob` (one transfer up, one back).
    When ``axis_name`` is given, counters are psum'd over that mesh axis.
    """

    def step(batch):
        if h2d_widths is not None:
            segments, qcfail = _unpack_h2d_blob(h2d_widths, batch["blob"])
        else:
            segments = [
                (c.astype(jnp.int32), q.astype(jnp.int32), l.astype(jnp.int32))
                for c, q, l in batch["segments"]
            ]
            qcfail = batch["qcfail"]

        panel_shards = batch.get("panel_shards", {}) if panel_axis else {}
        per_read = []
        counters = []
        for position, dec in enumerate(instrument.decoders):
            result = _classify_one(
                instrument, dec, segments, qcfail,
                want_uncertain=want_uncertain,
                panel_shard=panel_shards.get(str(position)),
                panel_axis=panel_axis,
            )
            qcfail = result["qcfail"]
            entry = {
                "decoded": result["decoded"],
                "confidence": result["confidence"],
                "distance": result["distance"],
                "branch": result["branch"],
                "argmax": result["argmax"],
                "qcfail": result["qcfail"],
            }
            if want_uncertain:
                entry["uncertain"] = result.get(
                    "uncertain", jnp.zeros(qcfail.shape[0], dtype=bool)
                )
            per_read.append(entry)
            if want_counters:
                counters.append(_counters(dec, result))

        if instrument.multiplexing_index >= 0:
            channel_index = per_read[instrument.multiplexing_index]["decoded"]
        else:
            channel_index = jnp.zeros(qcfail.shape[0], dtype=jnp.int32)

        if pack_outputs:
            # ONE dense uint8 matrix for the whole device->host pull: the
            # tunneled transport pays per-array latency as well as
            # bandwidth, so indices/distances (int16 unless a panel
            # overflows it), packed flag bytes and f32 confidences bitcast
            # into a single (N, bytes_per_read) blob.
            wide = any(
                dec.barcode_count >= 32000 for dec in instrument.decoders
            )
            index_dtype = jnp.int32 if wide else jnp.int16
            n = qcfail.shape[0]
            int_columns = []
            flag_columns = []
            float_columns = []
            for entry in per_read:
                int_columns += [
                    entry["decoded"].astype(index_dtype),
                    entry["distance"].astype(index_dtype),
                    entry["argmax"].astype(index_dtype),
                ]
                flags = entry["branch"].astype(jnp.int8) | (
                    entry["qcfail"].astype(jnp.int8) << 2
                )
                if want_uncertain:
                    flags = flags | (entry["uncertain"].astype(jnp.int8) << 3)
                flag_columns.append(flags)
                float_columns.append(entry["confidence"])
            ints = jnp.stack(int_columns, axis=1)
            flags8 = jnp.stack(flag_columns, axis=1)
            floats = jnp.stack(float_columns, axis=1)
            blob = jnp.concatenate(
                [
                    jax.lax.bitcast_convert_type(ints, jnp.uint8).reshape(
                        n, -1
                    ),
                    flags8.astype(jnp.uint8),
                    jax.lax.bitcast_convert_type(floats, jnp.uint8).reshape(
                        n, -1
                    ),
                ],
                axis=1,
            )
            packed = {"blob": blob}
            if axis_name is not None and want_counters:
                counters = jax.lax.psum(counters, axis_name)
            return packed, counters

        per_read_out = {
            "decoders": per_read,
            "qcfail": qcfail,
            "channel_index": channel_index,
        }
        if axis_name is not None and want_counters:
            counters = jax.lax.psum(counters, axis_name)
        return per_read_out, counters

    return step


def make_sharded_decode_step(
    instrument: DeviceInstrument,
    mesh: Mesh,
    jit: bool = True,
    want_uncertain: bool = False,
    want_counters: bool = True,
    pack_outputs: bool = False,
    h2d_widths: list[int] | None = None,
):
    """SPMD decode step over a 1-D ``reads`` mesh axis.

    Batches must be padded to a multiple of the axis size; per-read outputs
    come back sharded along ``reads``, counters come back replicated (the
    psum-merged global statistics).
    """
    (axis_name,) = mesh.axis_names
    step = make_decode_step(
        instrument,
        axis_name=axis_name,
        want_uncertain=want_uncertain,
        want_counters=want_counters,
        pack_outputs=pack_outputs,
        h2d_widths=h2d_widths,
    )
    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(axis_name),),
        out_specs=(P(axis_name), P()),
        check_vma=False,
    )
    if jit:
        sharded = jax.jit(sharded)
    return sharded


def pad_batch(batch: dict, multiple: int) -> tuple[dict, int]:
    """Pad every per-read leaf up to a multiple of `multiple` along axis 0.

    Padding reads have zero codes/qualities/lengths and qcfail=True; the
    host discards rows >= the true count after the step returns, and
    counter deltas for padding rows are subtracted by the caller (padding
    reads decode deterministically to unclassified row 0)."""
    n = batch["qcfail"].shape[0]
    padded_n = -(-n // multiple) * multiple
    if padded_n == n:
        return batch, n

    def pad(leaf):
        pad_width = [(0, padded_n - n)] + [(0, 0)] * (leaf.ndim - 1)
        return jnp.pad(leaf, pad_width)

    padded = {
        "segments": [
            (pad(c), pad(q), pad(l)) for c, q, l in batch["segments"]
        ],
        "qcfail": jnp.pad(
            batch["qcfail"], (0, padded_n - n), constant_values=True
        ),
    }
    return padded, n


def make_tp_sharded_decode_step(
    instrument: DeviceInstrument,
    mesh: Mesh,
    want_uncertain: bool = False,
    want_counters: bool = True,
    pack_outputs: bool = False,
    h2d_widths: list[int] | None = None,
    shard_threshold: int = 1 << 14,
):
    """SPMD decode step over a 2-D ``(reads, panel)`` mesh: reads shard
    over the first axis, and every PAMLD panel above ``shard_threshold``
    barcodes shards its likelihood matrix over the second (barcode-axis
    tensor parallelism — for whitelists beyond one chip's HBM, see
    device/tp.py for the merge algebra). Returns (step, shard_panels)
    where ``shard_panels(device_put)`` builds the panel-shard argument
    dict to pass as ``batch["panel_shards"]``.
    """
    reads_axis, panel_axis = mesh.axis_names
    panel_size = mesh.shape[panel_axis]

    sharded_positions = [
        position
        for position, dec in enumerate(instrument.decoders)
        if dec.algorithm == "pamld" and dec.barcode_count > shard_threshold
    ]

    step = make_decode_step(
        instrument,
        axis_name=reads_axis,
        want_uncertain=want_uncertain,
        want_counters=want_counters,
        pack_outputs=pack_outputs,
        h2d_widths=h2d_widths,
        panel_axis=panel_axis,
    )

    def wrapped(batch, panel_shards):
        local = {}
        for key, (matrix, concentration) in panel_shards.items():
            base = (
                jax.lax.axis_index(panel_axis) * matrix.shape[1]
            ).astype(jnp.int32)
            local[key] = (matrix, concentration, base)
        batch = dict(batch)
        batch["panel_shards"] = local
        return step(batch)

    shard_specs = {
        str(position): (P(None, panel_axis), P(panel_axis))
        for position in sharded_positions
    }
    sharded = jax.shard_map(
        wrapped,
        mesh=mesh,
        in_specs=(P(reads_axis), shard_specs),
        out_specs=(P(reads_axis), P()),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def shard_panels():
        """device_put each large panel's matrix/concentration with the
        panel-axis sharding (padded to a multiple of the axis size)."""
        import numpy as np
        from jax.sharding import NamedSharding

        shards = {}
        for position in sharded_positions:
            dec = instrument.decoders[position]
            matrix = np.asarray(dec.likelihood_matrix)
            concentration = np.asarray(dec.concentration)
            b = matrix.shape[1]
            padded = -(-b // panel_size) * panel_size
            if padded != b:
                matrix = np.pad(matrix, ((0, 0), (0, padded - b)))
                concentration = np.pad(concentration, (0, padded - b))
            shards[str(position)] = (
                jax.device_put(
                    matrix, NamedSharding(mesh, P(None, panel_axis))
                ),
                jax.device_put(
                    concentration, NamedSharding(mesh, P(panel_axis))
                ),
            )
        return shards

    return jitted, shard_panels, sharded_positions
