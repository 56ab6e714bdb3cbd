from .builder import SegmentArrays, build_segment_arrays, eager_scores
from .oracle import oracle_search, oracle_bm25_idf
