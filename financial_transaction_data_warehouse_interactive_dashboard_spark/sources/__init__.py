"""Sources & sinks (SURVEY.md section 2.1: S1-S5)."""

from .csv import read_account_csv, read_plain_csv, read_semicolon_csv  # noqa: F401
from .registry import load_table, load_tables, register_views  # noqa: F401
