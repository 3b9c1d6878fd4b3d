from .declared import ORACLES, QUERIES, build
from . import extensions  # noqa: F401 — registers q31+ into QUERIES/ORACLES

__all__ = ["ORACLES", "QUERIES", "build"]
