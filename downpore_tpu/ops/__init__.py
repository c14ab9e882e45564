from . import chain, match

__all__ = ["chain", "match"]
