from .registry import QuerySpec, all_oracles, all_queries, get_query, query

__all__ = ["QuerySpec", "all_oracles", "all_queries", "get_query", "query"]
