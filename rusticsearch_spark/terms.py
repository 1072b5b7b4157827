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
