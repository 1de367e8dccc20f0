"""Similarity-search operators over the embeddings table (filled in this
round)."""

from __future__ import annotations
