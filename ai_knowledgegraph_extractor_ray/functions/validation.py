"""Request-parameter validation (reference M13: validators.py:355-411).

The reference validates document ids and version numbers at its API
boundary (positive int-coercible, ValidationError otherwise) and text
content length. Here the same checks guard the CLI and the point-lookup
API; text-content validation lives in ``ops/text.py`` (M12) where it runs
vectorized over the corpus.
"""

from __future__ import annotations


class ValidationError(Exception):
    """Invalid request parameter (reference validators.py:14-16)."""


def validate_version_number(version) -> int:
    """Positive int-coercible version (reference validators.py:370-388)."""
    try:
        v = int(version)
    except (ValueError, TypeError) as e:
        raise ValidationError("Version number must be a valid integer") from e
    if v <= 0:
        raise ValidationError("Version number must be a positive integer")
    return v


def validate_conv_id(conv_id) -> str:
    """Conversation id — the transcript analogue of the reference's
    document id (validators.py:355-367): non-empty, bounded, no control
    characters or path separators (ids name partition files)."""
    if not isinstance(conv_id, str) or not conv_id.strip():
        raise ValidationError("Conversation id must be a non-empty string")
    if len(conv_id) > 255:
        raise ValidationError("Conversation id too long (maximum 255)")
    if any(ord(c) < 32 for c in conv_id) or "/" in conv_id or "\\" in conv_id:
        raise ValidationError("Conversation id contains invalid characters")
    return conv_id


def validate_num_partitions(num_partitions) -> int:
    try:
        p = int(num_partitions)
    except (ValueError, TypeError) as e:
        raise ValidationError("num_partitions must be a valid integer") from e
    if not 1 <= p <= 1_000_000:
        raise ValidationError("num_partitions must be in [1, 1000000]")
    return p


def validate_non_negative(value, name: str) -> int:
    try:
        v = int(value)
    except (ValueError, TypeError) as e:
        raise ValidationError(f"{name} must be a valid integer") from e
    if v < 0:
        raise ValidationError(f"{name} must be non-negative")
    return v
