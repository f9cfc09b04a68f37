"""Training-data / relational operators (all Ray-Data-first; see
COVERAGE.md for the operator -> query -> oracle map)."""

from .dedup import (embedding_neardup, embedding_pairs_exact,  # noqa: F401
                    exact_dedup, minhash_lsh_candidates, simhash_batch,
                    verify_jaccard_pairs)
from .relational import (asof_join, broadcast_join,  # noqa: F401
                         estimate_partitions, grouped_topk,
                         partial_final_agg, range_join, semi_join_filter,
                         sessionize, tumbling_window)
from .simsearch import brute_force_topk, ivf_topk, lsh_topk  # noqa: F401
