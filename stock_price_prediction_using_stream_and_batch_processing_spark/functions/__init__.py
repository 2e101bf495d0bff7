from . import text, vectors, scaling, hashing

__all__ = ["text", "vectors", "scaling", "hashing"]
