"""Streaming window operators over the events table (filled in this round)."""

from __future__ import annotations
