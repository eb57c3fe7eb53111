from .registry import ORACLE, QUERIES, register

_LOADED = False


def all_queries():
    """Import every query module (side-effect: registry population) and
    return (QUERIES, ORACLE)."""
    global _LOADED
    if not _LOADED:
        from . import (  # noqa: F401
            llm_ops,
            relational,
            scalars,
            timeseries,
            udfs,
            windows_sort,
        )

        _LOADED = True
    return QUERIES, ORACLE


__all__ = ["ORACLE", "QUERIES", "all_queries", "register"]
