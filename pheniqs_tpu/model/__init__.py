from .batch import ReadBatch

__all__ = ["ReadBatch"]
