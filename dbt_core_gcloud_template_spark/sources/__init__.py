from .registry import TABLES, load_table, register_testdata_views

__all__ = ["TABLES", "load_table", "register_testdata_views"]
