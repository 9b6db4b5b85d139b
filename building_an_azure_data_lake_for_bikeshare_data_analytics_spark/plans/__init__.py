from .registry import ORACLES, QUERIES, QuerySpec, REGISTRY

__all__ = ["ORACLES", "QUERIES", "QuerySpec", "REGISTRY"]
