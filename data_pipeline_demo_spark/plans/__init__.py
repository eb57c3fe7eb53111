from .registry import ORACLE, QUERIES, register

_LOADED = False


def all_queries():
    """Import every query module (side-effect: registry population) and
    return (QUERIES, ORACLE)."""
    global _LOADED
    if not _LOADED:
        from . import relational, scalars, timeseries, windows_sort  # noqa: F401

        _LOADED = True
    return QUERIES, ORACLE


__all__ = ["ORACLE", "QUERIES", "all_queries", "register"]
