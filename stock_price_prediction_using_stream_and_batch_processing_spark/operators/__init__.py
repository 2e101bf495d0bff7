from . import windows, joins, dedup, similarity, textops, topk, multimodal, setops

__all__ = ["windows", "joins", "dedup", "similarity", "textops", "topk", "multimodal", "setops"]
