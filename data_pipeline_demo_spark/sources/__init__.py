from .tables import TABLE_NAMES, load_all, table

__all__ = ["TABLE_NAMES", "load_all", "table"]
