from .bm25 import bm25_topk_exact, bm25_topk_fast
