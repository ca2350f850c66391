from codebase_tpu.algos.registry import get_algorithm

__all__ = ["get_algorithm"]
