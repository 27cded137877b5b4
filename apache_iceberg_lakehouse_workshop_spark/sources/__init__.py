"""Bulk-ingest sources (SURVEY §2.1 S12 COPY INTO, S13 LIST_FILES)."""

from .copy_into import copy_into  # noqa: F401
from .list_files import list_files  # noqa: F401
