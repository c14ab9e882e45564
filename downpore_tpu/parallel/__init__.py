from .mesh import (make_mesh, sharded_hit_counts, sharded_pipeline_step,
                   sharded_kmer_histogram)

__all__ = ["make_mesh", "sharded_hit_counts", "sharded_pipeline_step",
           "sharded_kmer_histogram"]
