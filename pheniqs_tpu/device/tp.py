"""Tensor parallelism over the barcode axis (panel sharding).

The reference has no model parallelism to mirror (SURVEY §2.9: barcode
panels are tiny), but very large single-cell whitelists (1M+ barcodes)
can exceed one chip's HBM once the likelihood matrix, the (N, B)
posterior intermediates and the batch all compete. This module shards the
PAMLD posterior over a 2-D ``(reads, panel)`` mesh: every device holds a
panel shard's likelihood columns, computes shifted partials for its local
reads x local barcodes tile, and the global posterior merges with one
``pmin`` (the running shift), one ``psum`` (the posterior mass) and a
deterministic first-index argmax merge over the panel axis — exactly the
online-logsumexp algebra the single-chip chunked path uses
(device/classify.py _posterior_chunked), with collectives in place of the
scan carry.

Validated against the single-device posterior on a virtual CPU mesh
(tests/test_tp.py); engage on hardware with ``tp_posterior`` +
``tp_mesh(reads=r, panel=p)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .classify import _second_max
from .instrument import LN_PHRED_BASE

_BIG = jnp.float32(3.0e38)
_BIG_INDEX = jnp.int32(2**30)


def tp_mesh(reads: int, panel: int, devices=None) -> Mesh:
    """2-D mesh: `reads * panel` devices arranged (reads, panel)."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < reads * panel:
        raise ValueError(
            f"need {reads * panel} devices for a ({reads},{panel}) mesh, "
            f"have {len(devices)}"
        )
    grid = np.array(devices[: reads * panel]).reshape(reads, panel)
    return Mesh(grid, ("reads", "panel"))


def _local_posterior(features, qpos_uniform, matrix, concentration):
    """Per-device partials over its (N_local, B_local) tile."""
    sigma = (
        jnp.dot(
            features,
            matrix,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        + qpos_uniform[:, None]
    )
    shift = sigma.min(axis=1)
    conditional = jnp.exp(LN_PHRED_BASE * (sigma - shift[:, None]))
    prior_adjusted = conditional * concentration[None, :]
    total = prior_adjusted.sum(axis=1)
    best_local = jnp.argmax(prior_adjusted, axis=1).astype(jnp.int32)
    best_p = jnp.take_along_axis(
        prior_adjusted, best_local[:, None], axis=1
    )[:, 0]
    second_p = _second_max(prior_adjusted, best_local)
    sigma_best = jnp.take_along_axis(sigma, best_local[:, None], axis=1)[:, 0]
    return shift, total, best_p, second_p, best_local, sigma_best


def tp_posterior(
    mesh: Mesh,
    features: jnp.ndarray,       # (N, FW) replicated over 'panel'
    qpos_uniform: jnp.ndarray,   # (N,)
    matrix: jnp.ndarray,         # (FW, B) sharded over 'panel'
    concentration: jnp.ndarray,  # (B,) sharded over 'panel'
    adjusted_noise: float,
):
    """Global (best0, best_p, sigma_p, sigma_best, second_p) with the
    panel sharded across the mesh's 'panel' axis and reads across 'reads'.

    Outputs are replicated along 'panel' and sharded along 'reads' — the
    same contract as the single-device posterior per read shard.
    """
    panel_size = mesh.shape["panel"]
    b = matrix.shape[1]
    local_b = -(-b // panel_size)
    padded_b = local_b * panel_size
    if padded_b != b:
        matrix = jnp.pad(matrix, ((0, 0), (0, padded_b - b)))
        concentration = jnp.pad(concentration, (0, padded_b - b))
    # padding columns must never win: zero concentration, huge sigma via
    # a zeroed matrix column is not enough (sigma could still be minimal),
    # so mask by index inside the kernel
    column_index = jnp.arange(padded_b, dtype=jnp.int32)

    if adjusted_noise > 0.0:
        log_noise = float(np.log(adjusted_noise))
    else:
        log_noise = float("-inf")

    def kernel(features, qpos_uniform, matrix, concentration, column_index):
        axis_index = jax.lax.axis_index("panel")
        base = axis_index * local_b

        sigma = (
            jnp.dot(
                features,
                matrix,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            + qpos_uniform[:, None]
        )
        pad = column_index >= b
        sigma = jnp.where(pad[None, :], _BIG, sigma)
        shift_local = sigma.min(axis=1)
        shift = jax.lax.pmin(shift_local, "panel")

        conditional = jnp.exp(LN_PHRED_BASE * (sigma - shift[:, None]))
        prior_adjusted = jnp.where(
            pad[None, :], 0.0, conditional * concentration[None, :]
        )
        total = jax.lax.psum(prior_adjusted.sum(axis=1), "panel")

        best_local = jnp.argmax(prior_adjusted, axis=1).astype(jnp.int32)
        best_p_local = jnp.take_along_axis(
            prior_adjusted, best_local[:, None], axis=1
        )[:, 0]
        second_p_local = _second_max(prior_adjusted, best_local)
        sigma_best_local = jnp.take_along_axis(
            sigma, best_local[:, None], axis=1
        )[:, 0]
        global_index_local = base + best_local

        best_p = jax.lax.pmax(best_p_local, "panel")
        # deterministic tie-break: the FIRST barcode in codec order among
        # shards achieving the maximum (strict `p > best` update rule)
        candidate = jnp.where(
            best_p_local >= best_p, global_index_local, _BIG_INDEX
        )
        best0 = jax.lax.pmin(candidate, "panel")
        holder = global_index_local == best0
        sigma_best = jax.lax.pmin(
            jnp.where(holder, sigma_best_local, _BIG), "panel"
        )
        # global runner-up: on the winning shard its own second-best, on
        # every other shard its best
        runner_candidate = jnp.where(holder, second_p_local, best_p_local)
        second_p = jax.lax.pmax(runner_candidate, "panel")

        if np.isfinite(log_noise):
            noise_shifted = jnp.exp(log_noise - LN_PHRED_BASE * shift)
        else:
            noise_shifted = jnp.zeros_like(shift)
        sigma_p = total + noise_shifted
        return best0, best_p, sigma_p, sigma_best, second_p

    sharded = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(
            P("reads", None),    # features
            P("reads"),          # qpos_uniform
            P(None, "panel"),    # likelihood matrix columns
            P("panel"),          # concentration
            P("panel"),          # column index
        ),
        out_specs=(
            P("reads"), P("reads"), P("reads"), P("reads"), P("reads"),
        ),
        check_vma=False,
    )
    return jax.jit(sharded)(
        features, qpos_uniform, matrix, concentration, column_index
    )
