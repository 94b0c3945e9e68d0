"""Typed failure hierarchy for the converter.

Mirrors the reference's exception surface (SURVEY.md §2.6):
``ConversionException`` (reference:
src/.../exception/ConversionException.java:11-40) and
``ZipBombDetectedException`` (src/.../exception/ZipBombDetectedException.java:11-33).
"""

from __future__ import annotations


class ConversionError(RuntimeError):
    """Structural conversion failure (unreadable input, bad sheet, IO)."""


class ZipBombDetectedError(ConversionError):
    """Archive expands beyond the configured inflation/size caps."""


class SheetNotFoundError(ConversionError):
    """Requested sheet absent; message lists available sheets, matching
    the reference's helpful error (UserModeEventConversionStrategy.java:156-161)."""
