from .osm_xml import materialize_raw, read_osm_elements
from .tables import TABLES, load_table, load_tables

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "materialize_raw",
    "read_osm_elements",
]
