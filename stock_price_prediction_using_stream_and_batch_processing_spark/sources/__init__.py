from .tables import TABLES, load_table, register_views
from .ticks import tick_schema, generate_ticks, ticks_dataframe

__all__ = ["TABLES", "load_table", "register_views", "tick_schema", "generate_ticks", "ticks_dataframe"]
