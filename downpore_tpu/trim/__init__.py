from .trimmer import Trimmer

__all__ = ["Trimmer"]
