"""Time-window / sessionization / JSON queries over events (FIXTURES.md §2). Populated incrementally."""

from __future__ import annotations
