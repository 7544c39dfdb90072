from .tables import TABLE_NAMES, load_table, load_tables, trends_view

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "trends_view"]
