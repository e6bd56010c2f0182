"""Scalar-function coverage (SURVEY.md §2.8). Populated incrementally."""

from __future__ import annotations
