from .kmers import (kmer_occurrences, top_occurrences, default_kmer_values,
                    load_kmer_values, load_confusion_matrix)

__all__ = ["kmer_occurrences", "top_occurrences", "default_kmer_values",
           "load_kmer_values", "load_confusion_matrix"]
