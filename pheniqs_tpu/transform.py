"""Read tokenization: the `segment:start:end` token mini-language and knit
composition rules that extract barcode observations and assemble output
templates.

Semantics follow the reference transform engine (reference transform.h:34-227,
transform.cpp:31): tokens use python-slice coordinates with negative indices
and open ends; knit patterns compose output segments from token references,
with a `~` prefix meaning reverse complement; template tokens may reference
the virtual segments `s`/`c`/`m` (error-corrected sample/cellular/molecular
barcode, input_segment_index -1/-2/-3).

Unlike the reference's per-read memcpy loop, application here is vectorized:
a Rule is applied to a whole batch of reads at once with NumPy gathers,
producing padded (batch, width) code/quality arrays. On-device decoding uses
the same gather indices, so decoder tokenization compiles to static slices
under jit.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from .errors import ConfigurationError
from .iupac import BAM_REVERSE_COMPLEMENT

_TOKEN_PATTERN = re.compile(r"^(s|c|m|[0-9]+):(-?[0-9]+)?:(-?[0-9]+)?$")

#: virtual input segment indices for template rules
VIRTUAL_SEGMENT = {"s": -1, "c": -2, "m": -3}
VIRTUAL_SEGMENT_NAME = {-1: "s", -2: "c", -3: "m"}


@dataclass(frozen=True)
class Token:
    """One `segment:start:end` slice specification."""

    index: int
    input_segment_index: int
    start: int = 0
    end: int = 0
    end_terminated: bool = True

    @classmethod
    def parse(cls, pattern: str, index: int, allow_virtual: bool = False) -> "Token":
        match = _TOKEN_PATTERN.match(pattern)
        if match is None:
            raise ConfigurationError(f"illegal token syntax {pattern}")
        segment, start, end = match.groups()
        if segment in VIRTUAL_SEGMENT:
            if not allow_virtual:
                raise ConfigurationError(
                    f"virtual segment reference {segment} is only valid in a template transform"
                )
            segment_index = VIRTUAL_SEGMENT[segment]
        else:
            segment_index = int(segment)
        return cls(
            index=index,
            input_segment_index=segment_index,
            start=int(start) if start is not None else 0,
            end=int(end) if end is not None else 0,
            end_terminated=end is not None,
        )

    # --- static geometry -------------------------------------------------
    def empty(self) -> bool:
        return (
            self.end_terminated
            and self.start >= self.end
            and ((self.start >= 0 and self.end >= 0) or (self.start < 0 and self.end < 0))
        )

    def constant(self) -> bool:
        """Width is independent of the input segment length."""
        if self.end_terminated:
            return (self.start >= 0 and self.end >= 0) or (self.start < 0 and self.end < 0)
        return self.start < 0

    def length(self) -> int:
        """Static width, or -1 when the width depends on the segment length."""
        if self.constant():
            if self.end_terminated:
                return 0 if self.empty() else self.end - self.start
            return -self.start
        return -1

    # --- dynamic geometry (vectorized over segment lengths) --------------
    def absolute_start(self, length: np.ndarray) -> np.ndarray:
        length = np.asarray(length, dtype=np.int64)
        if self.start < 0:
            return np.maximum(length + self.start, 0)
        # a start beyond the segment collapses to 0 (reference transform.h:73-80)
        return np.where(self.start > length, 0, self.start)

    def absolute_end(self, length: np.ndarray) -> np.ndarray:
        length = np.asarray(length, dtype=np.int64)
        if not self.end_terminated:
            return length
        if self.end < 0:
            return np.maximum(length + self.end, 0)
        return np.minimum(self.end, length)

    def __str__(self) -> str:
        segment = VIRTUAL_SEGMENT_NAME.get(
            self.input_segment_index, str(self.input_segment_index)
        )
        start = str(self.start) if self.start else ""
        end = str(self.end) if self.end_terminated else ""
        return f"{segment}:{start}:{end}"


@dataclass(frozen=True)
class Transform:
    """A token routed to an output segment, optionally reverse-complemented."""

    token: Token
    output_segment_index: int
    reverse_complement: bool = False

    def __str__(self) -> str:
        return ("~" if self.reverse_complement else "") + str(self.token)


def parse_knit(patterns: list[str], token_array: list[Token]) -> list[Transform]:
    """Parse knit strings into transforms.

    Each knit string describes one output segment as a ':'-separated list of
    token references, each optionally prefixed with '~' for reverse
    complement (reference transform.cpp:252-331).
    """
    transform_array: list[Transform] = []
    for output_segment_index, pattern in enumerate(patterns):
        if not isinstance(pattern, str):
            raise ConfigurationError("transform element must be a string")
        for piece in pattern.split(":"):
            reverse = piece.startswith("~")
            if reverse:
                piece = piece[1:]
            if not piece.isdigit():
                raise ConfigurationError(
                    f"transform must explicitly specify a token reference in {pattern}"
                )
            token_index = int(piece)
            if token_index >= len(token_array):
                raise ConfigurationError(
                    f"invalid token reference {token_index} in transform"
                )
            transform_array.append(
                Transform(token_array[token_index], output_segment_index, reverse)
            )
    return transform_array


@dataclass
class SegmentBatch:
    """Padded SoA batch of one read segment: BAM codes + phred qualities."""

    code: np.ndarray  # (N, W) uint8
    quality: np.ndarray  # (N, W) uint8
    length: np.ndarray  # (N,) int32

    @classmethod
    def empty(cls, n: int, width: int) -> "SegmentBatch":
        return cls(
            code=np.zeros((n, max(width, 0)), dtype=np.uint8),
            quality=np.zeros((n, max(width, 0)), dtype=np.uint8),
            length=np.zeros(n, dtype=np.int32),
        )

    @property
    def width(self) -> int:
        return self.code.shape[1]


@dataclass
class Rule:
    """An ordered list of transforms producing `output_segment_cardinality`
    observation segments from a read."""

    token_array: list[Token]
    output_segment_cardinality: int
    transform_array: list[Transform]

    @classmethod
    def from_ontology(cls, transform: dict, allow_virtual: bool = False) -> "Rule":
        tokens_spec = transform.get("token")
        if tokens_spec is None:
            raise ConfigurationError("rule must define a token array")
        token_array = [
            Token.parse(pattern, i, allow_virtual=allow_virtual)
            for i, pattern in enumerate(tokens_spec)
        ]
        knit_spec = transform.get("knit")
        if knit_spec is None:
            # the config compiler synthesizes a trivial knit (one token per
            # output segment) before rules are built; accept the same default
            knit_spec = [str(i) for i in range(len(token_array))]
        transform_array = parse_knit(knit_spec, token_array)
        cardinality = len(knit_spec)
        return cls(token_array, cardinality, transform_array)

    def output_widths(self, input_widths: list[int]) -> list[int]:
        """Maximum width of each output segment, given padded input widths.

        Virtual segments (negative indices) are resolved by `input_widths`
        entries keyed -1/-2/-3 if provided via a dict instead of a list.
        """
        widths = [0] * self.output_segment_cardinality
        for tx in self.transform_array:
            token = tx.token
            static = token.length()
            if static >= 0:
                widths[tx.output_segment_index] += static
            else:
                if isinstance(input_widths, dict):
                    source_width = input_widths[token.input_segment_index]
                else:
                    source_width = input_widths[token.input_segment_index]
                # dynamic token: bounded by the source width
                widths[tx.output_segment_index] += int(source_width)
        return widths

    def apply(
        self,
        segments: dict[int, SegmentBatch] | list[SegmentBatch],
        widths: list[int] | None = None,
    ) -> list[SegmentBatch]:
        """Vectorized Rule::apply over a batch.

        `segments` maps input segment index -> SegmentBatch (negative keys
        for virtual corrected-barcode segments in template rules).
        """
        if isinstance(segments, list):
            segments = {i: s for i, s in enumerate(segments)}
        n = next(iter(segments.values())).length.shape[0]
        if widths is None:
            widths = self.output_widths({k: v.width for k, v in segments.items()})

        # zero-copy pass-through: an output segment built from exactly ONE
        # whole-segment token (`i::`, no revcomp) IS its input segment —
        # alias the arrays instead of allocating + copying. This is the
        # dominant template shape (the reference's default knit and every
        # bundled config emit whole biological segments), and the copy was
        # the single largest render-side cost in the round-5 profile
        # (~1.2 s per 400k reads of np.zeros + block memcpy). Consumers
        # treat rendered segments as read-only (native formatters bound by
        # `length`), matching the copy path's semantics except for bytes
        # past each read's extent, which no consumer reads.
        per_slot: dict[int, list] = {}
        for tx in self.transform_array:
            per_slot.setdefault(tx.output_segment_index, []).append(tx)
        aliased: dict[int, SegmentBatch] = {}
        skip = set()
        for slot, txs in per_slot.items():
            if len(txs) != 1:
                continue
            tx = txs[0]
            token = tx.token
            src = segments.get(token.input_segment_index)
            if (
                src is None
                or tx.reverse_complement
                or token.start != 0
                or token.end_terminated
                or widths[slot] != src.width
            ):
                continue
            aliased[slot] = SegmentBatch(
                code=src.code, quality=src.quality, length=src.length
            )
            skip.add(id(tx))
        out = [
            aliased[slot] if slot in aliased
            else SegmentBatch.empty(n, widths[slot])
            for slot in range(self.output_segment_cardinality)
        ]

        # destination write offset per output segment: scalar while every
        # prior size was uniform, else falls back to the per-read vector
        uniform_offset: list[int | None] = [0] * self.output_segment_cardinality

        for tx in self.transform_array:
            if id(tx) in skip:
                continue
            src = segments[tx.token.input_segment_index]
            dst = out[tx.output_segment_index]
            length = src.length.astype(np.int64)
            start = tx.token.absolute_start(length)
            end = tx.token.absolute_end(length)
            size = np.maximum(end - start, 0)
            wmax = int(size.max(initial=0))
            if wmax == 0:
                continue

            # fast path: forward copy from a constant start with
            # positionally aligned source data (the overwhelmingly common
            # case: whole-segment template tokens and fixed-width decoder
            # tokens) lands as one block slice assignment
            slot = tx.output_segment_index
            offset = uniform_offset[slot]
            start_scalar = int(start[0]) if start.size else 0
            if (
                not tx.reverse_complement
                and offset is not None
                and (start == start_scalar).all()
            ):
                stop = start_scalar + wmax
                if stop <= src.width:
                    full = bool((size == wmax).all())
                    uniform_offset[slot] = offset + wmax if full else None
                    from .native import apply_token_block

                    if apply_token_block(
                        src, dst, start_scalar, wmax, size, offset
                    ):
                        continue
                    block = slice(offset, offset + wmax)
                    dst.code[:, block] = src.code[:, start_scalar:stop]
                    dst.quality[:, block] = src.quality[:, start_scalar:stop]
                    if not full:
                        # zero the tail past each read's extent
                        past = (
                            np.arange(wmax, dtype=np.int64)[None, :]
                            >= size[:, None]
                        )
                        dst.code[:, block][past] = 0
                        dst.quality[:, block][past] = 0
                    dst.length = (
                        dst.length.astype(np.int64) + size
                    ).astype(np.int32)
                    continue

            uniform_offset[slot] = None
            offsets = np.arange(wmax, dtype=np.int64)[None, :]
            valid = offsets < size[:, None]
            if tx.reverse_complement:
                gather = np.clip(end[:, None] - 1 - offsets, 0, max(src.width - 1, 0))
                code = BAM_REVERSE_COMPLEMENT[src.code[np.arange(n)[:, None], gather]]
                qual = src.quality[np.arange(n)[:, None], gather]
            else:
                gather = np.clip(start[:, None] + offsets, 0, max(src.width - 1, 0))
                code = src.code[np.arange(n)[:, None], gather]
                qual = src.quality[np.arange(n)[:, None], gather]
            dest = dst.length.astype(np.int64)[:, None] + offsets
            dest_clipped = np.minimum(dest, max(dst.width - 1, 0))
            rows = np.broadcast_to(np.arange(n)[:, None], dest.shape)
            mask = valid & (dest < dst.width)
            dst.code[rows[mask], dest_clipped[mask]] = code[mask]
            dst.quality[rows[mask], dest_clipped[mask]] = qual[mask]
            dst.length = (dst.length.astype(np.int64) + size).astype(np.int32)
        return out
