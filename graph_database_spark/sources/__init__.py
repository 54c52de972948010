from .testdata import TABLES, load_table, load_tables, register_views
from .toy import toy_dataset
from . import connectors

__all__ = ["TABLES", "load_table", "load_tables", "register_views",
           "toy_dataset", "connectors"]
