"""Multimodal (binary-column) plumbing (filled in this round)."""

from __future__ import annotations
