from .catalog import DRIVER_TABLES, load_tables, register_views

__all__ = ["DRIVER_TABLES", "load_tables", "register_views"]
