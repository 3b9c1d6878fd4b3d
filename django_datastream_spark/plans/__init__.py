from .declared import ORACLES, QUERIES, build

__all__ = ["ORACLES", "QUERIES", "build"]
