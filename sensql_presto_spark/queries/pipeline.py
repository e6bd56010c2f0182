"""LLM-data-pipeline operators as registry queries (SURVEY.md §7.8). Populated incrementally."""

from __future__ import annotations
