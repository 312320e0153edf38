"""Data sources/sinks (SURVEY.md §2.A rows 1-7, 25, 32-36).

CSV (native Spark), Excel (pure-stdlib xlsx parser), JSONL
(corrupt-line tolerant), text/grep, binary/multimodal ingestion, and
external-database SQL passthrough.
"""

from .csv_source import csv_append, csv_info, csv_read, csv_sql, csv_write
from .excel_source import (
    excel_read,
    excel_sql,
    excel_sql_frames,
    excel_write,
    excel_write_df,
    read_sheets,
    sheets_to_views,
)
from .external import (
    external_describe_table,
    external_explain,
    external_list_schemas,
    external_list_tables,
    external_query,
    external_read,
    jdbc_read,
    register_external,
)
from .binary import exif_info, exif_metadata, extract_metadata, fake_features, read_binary_dir
from .http_source import crawl_to_text, fetch_urls, partition_by_host
from .json_source import read_jsonl
from .pdf_source import pdf_extract_pages, pdf_read
from .text_source import grep_files

__all__ = [
    "exif_info",
    "exif_metadata",
    "crawl_to_text",
    "fetch_urls",
    "partition_by_host",
    "extract_metadata",
    "fake_features",
    "read_binary_dir",
    "csv_read",
    "csv_write",
    "csv_append",
    "csv_info",
    "csv_sql",
    "excel_read",
    "excel_sql",
    "excel_sql_frames",
    "excel_write",
    "excel_write_df",
    "read_sheets",
    "sheets_to_views",
    "external_describe_table",
    "external_explain",
    "external_list_schemas",
    "external_list_tables",
    "external_query",
    "external_read",
    "jdbc_read",
    "register_external",
    "read_jsonl",
    "pdf_extract_pages",
    "pdf_read",
    "grep_files",
]
