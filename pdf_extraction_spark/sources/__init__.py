from .synth import synth_page_row, synth_pages_pandas, write_pages_parquet
from .pages import read_pages, read_raw_crawl, synth_pages_df, PAGES_SCHEMA

__all__ = [
    "synth_page_row",
    "synth_pages_pandas",
    "write_pages_parquet",
    "read_pages",
    "read_raw_crawl",
    "synth_pages_df",
    "PAGES_SCHEMA",
]
