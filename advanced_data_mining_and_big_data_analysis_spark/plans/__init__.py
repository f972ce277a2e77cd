from .registry import REGISTRY, QueryDef, all_queries, query

__all__ = ["REGISTRY", "QueryDef", "all_queries", "query"]
