from findkmer_tpu.models.counter import KmerCounter, make_counter

__all__ = ["KmerCounter", "make_counter"]
