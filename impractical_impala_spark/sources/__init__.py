from .readers import TESTDATA_TABLES, load_table, load_tables, read_wdi_csv

__all__ = ["TESTDATA_TABLES", "load_table", "load_tables", "read_wdi_csv"]
