"""pheniqs-tpu: a TPU-native barcode classification (demultiplexing) engine.

A brand-new implementation, designed for JAX/XLA/Pallas on TPU hardware, with
the capabilities of Pheniqs (PHilology ENcoder wIth Quality Statistics):
PAMLD (Phred-adjusted maximum likelihood), MDD (minimum distance) and naive
decoding of sample / cellular / molecular barcodes from FASTQ/SAM streams,
SAM auxiliary tag annotation, per-barcode output routing, and JSON statistics
reports with noise/concentration prior estimation.

Architecture (see SURVEY.md for the reference analysis):
  - host ingest packs reads into int8 code/quality tensors (SoA batches)
  - decode kernels evaluate dense (reads x barcodes) likelihood/distance
    matrices on TPU (Pallas / XLA), data-parallel over a device mesh
  - per-barcode statistics merge via allreduce collectives
  - an exact float64 NumPy engine ("strict" fidelity) reproduces the
    reference's double-precision Kahan-summed semantics bit for bit and
    doubles as the oracle for kernel tests
"""

from .version import __version__

__all__ = ["__version__"]
