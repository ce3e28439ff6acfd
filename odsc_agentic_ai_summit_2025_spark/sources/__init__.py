from .io import read_json_records, read_table, register_testdata

__all__ = ["read_table", "read_json_records", "register_testdata"]
