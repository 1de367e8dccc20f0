"""Text-analysis operators over the documents table (filled in this round)."""

from __future__ import annotations
