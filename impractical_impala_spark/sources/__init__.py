from .readers import TESTDATA_TABLES, load_table, load_tables, read_wdi_csv
from .sinks import NATIVE_FORMATS, read_table, write_table

__all__ = ["TESTDATA_TABLES", "load_table", "load_tables", "read_wdi_csv",
           "NATIVE_FORMATS", "read_table", "write_table"]
