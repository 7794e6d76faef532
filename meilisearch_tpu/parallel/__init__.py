from .sharded import sharded_query_topk, make_mesh

__all__ = ["sharded_query_topk", "make_mesh"]
