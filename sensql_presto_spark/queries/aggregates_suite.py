"""Aggregate-function coverage (SURVEY.md §2.4). Populated incrementally."""

from __future__ import annotations
