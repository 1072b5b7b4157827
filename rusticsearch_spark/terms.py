"""Typed term encodings.

Terms are opaque byte strings with typed constructors, mirroring
/root/reference/src/search/term.rs:10-48:

* string   → UTF-8 bytes
* boolean  → single byte ``t`` / ``f``
* integer  → little-endian i64
* datetime → little-endian i64 of ``unix_seconds * 1_000_000 + micros``

For a text-only corpus the engine keeps terms as Spark ``string``
columns (their UTF-8 bytes are exactly the reference encoding); the
typed encoders below are used for non-text fields and for the
byte-golden parity tests.
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone


def term_from_string(value: str) -> bytes:
    return value.encode("utf-8")


def term_from_boolean(value: bool) -> bytes:
    return b"t" if value else b"f"


def term_from_integer(value: int) -> bytes:
    return struct.pack("<q", value)


CANONICAL_DT_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"


def parse_datetime_utc(value) -> datetime:
    """Parse an ISO-8601 / RFC-3339 value (offset or ``Z`` suffix;
    naive = UTC, matching Term::from_datetime's UTC normalization,
    term.rs:41-48) and return an aware UTC datetime."""
    if isinstance(value, datetime):
        dt = value
    else:
        dt = datetime.fromisoformat(str(value))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


def canonical_term_string(ftype: str, value) -> str:
    """The engine's typed term canonicalization.

    The reference encodes typed terms as bytes (term.rs:27-48:
    booleans ``t``/``f``, integers LE-i64, datetimes LE-i64 UTC
    micros); this engine stores one canonical STRING per value such
    that string equality ⇔ reference byte equality (a bijection per
    type: 'true'/'false' ↔ t/f, decimal i64 ↔ LE-i64, UTC ISO-8601
    micros ↔ LE-i64 micros).  Both the build (mapping.prepare_docs)
    and the query parser (dsl) must go through this one function —
    that is what makes e.g. a ``+03:00``-offset query value hit a
    UTC-indexed document (the term.rs:94-137 tz goldens).
    """
    if ftype == "boolean":
        if isinstance(value, bool):
            return "true" if value else "false"
        if value in ("true", "false"):
            return str(value)
        raise ValueError(f"not a boolean term value: {value!r}")
    if ftype == "integer":
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            raise ValueError(f"not an integer term value: {value!r}")
        return str(int(value))
    if ftype == "date":
        return parse_datetime_utc(value).strftime(CANONICAL_DT_FMT)
    return str(value)


def term_from_datetime(value: datetime) -> bytes:
    """LE i64 of ``timestamp * 1_000_000 + microseconds`` in UTC.

    Matches Term::from_datetime (term.rs:41-48): the reference takes
    ``timestamp()`` (whole seconds) plus ``nanosecond()/1000``.
    """
    if value.tzinfo is None:
        value = value.replace(tzinfo=timezone.utc)
    utc = value.astimezone(timezone.utc)
    seconds = int(utc.timestamp() - utc.microsecond / 1_000_000.0)
    # recompute whole seconds robustly (avoid float):
    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    delta = utc - epoch
    seconds = delta.days * 86400 + delta.seconds
    micros = utc.microsecond
    return struct.pack("<q", seconds * 1_000_000 + micros)
