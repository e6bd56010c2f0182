"""Relational-operator coverage beyond TPC-H (SURVEY.md §2.5-2.9). Populated incrementally."""

from __future__ import annotations
