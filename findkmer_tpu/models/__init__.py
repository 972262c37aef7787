from findkmer_tpu.models.counter import KmerCounter

__all__ = ["KmerCounter"]
