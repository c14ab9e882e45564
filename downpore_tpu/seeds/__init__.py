from .seed_sequence import SeedSequence, SeedMatch
from .seed_index import SeedIndex

__all__ = ["SeedSequence", "SeedMatch", "SeedIndex"]
