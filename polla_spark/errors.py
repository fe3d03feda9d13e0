"""Error taxonomy (parity: reference polla_app/exceptions.py:13-75).

The reference exposes ``ScriptError`` with structured context plus
subclasses ``ConfigError / PublishError / NetworkError / ParseError``
and ``RobotsDisallowedError`` (dual-inherits ``PermissionError`` —
asserted by reference tests/test_errors.py:21-26).

Engine rule (SURVEY.md §7.4): on distributed parse paths errors become
*columns* (``parse_error: string``), never task failures — one bad row
must not kill a 100 TB job. These exception types are raised only on
driver-side/scalar paths.
"""

from __future__ import annotations

from typing import Any


class ScriptError(Exception):
    """Base error with structured, redactable context."""

    def __init__(
        self,
        message: str,
        original_error: Exception | None = None,
        error_code: str | None = None,
        context: dict[str, Any] | None = None,
    ) -> None:
        super().__init__(message)
        self.message = message
        self.original_error = original_error
        self.error_code = error_code or type(self).__name__.upper()
        self.context = dict(context or {})

    def to_dict(self) -> dict[str, Any]:
        return {
            "error_code": self.error_code,
            "message": self.message,
            "context": redact_mapping(self.context),
        }


class ConfigError(ScriptError):
    pass


class NetworkError(ScriptError):
    pass


class ParseError(ScriptError):
    pass


class PublishError(ScriptError):
    pass


class RobotsDisallowedError(PermissionError, ScriptError):
    """robots.txt denied the fetch; is-a PermissionError for callers
    that catch the stdlib type (reference exceptions.py:54-75)."""

    def __init__(self, message: str, **kwargs: Any) -> None:
        PermissionError.__init__(self, message)
        ScriptError.__init__(self, message, **kwargs)


# ---------------------------------------------------------------------------
# Redaction (reference exceptions.py:78-93, obs.py:31-64)
# ---------------------------------------------------------------------------

_SENSITIVE_FRAGMENTS = ("token", "secret", "password", "credential", "apikey", "api_key", "auth")
_ALLOWED_KEYS = {"fuente", "source", "url"}


def redact(value: str) -> str:
    """Mask a secret, keeping 3-char head/2-char tail when long enough.

    Parity: reference exceptions.py:78-93 (``abc…xy``; ≤6 chars → ``…``).
    """
    if value is None:
        return value
    if len(value) <= 6:
        return "…"
    return f"{value[:3]}…{value[-2:]}"


def _is_sensitive_key(key: str) -> bool:
    low = key.lower()
    if low in _ALLOWED_KEYS:
        return False
    # word-boundary 'key' match: 'api_key' yes, 'monkey' no
    # (reference obs.py semantics)
    import re

    if re.search(r"(?:^|[^a-z])key(?:[^a-z]|$)", low):
        return True
    return any(frag in low for frag in _SENSITIVE_FRAGMENTS)


def redact_mapping(payload: Any) -> Any:
    """Recursively mask values under sensitive keys (reference obs.py:31-64)."""
    if isinstance(payload, dict):
        return {
            k: (redact(str(v)) if _is_sensitive_key(str(k)) else redact_mapping(v))
            for k, v in payload.items()
        }
    if isinstance(payload, (list, tuple)):
        return [redact_mapping(v) for v in payload]
    return payload
