"""HL7v2 MSH-9 extraction as pure Spark column expressions.

Reference parity: ``hl7/HL7Utils.kt:11-40`` (getMSH9). Deliberately NOT
a full HL7 parser (the reference says so at ``HL7Utils.kt:15-16``); it
extracts exactly the message type/event pair with the reference's
malformed-input semantics — every malformed shape yields an empty
array. Pinned shapes (``HL7UtilsTest.kt:8-106``):

1. empty message                      → []
2. ``MSH`` only                       → []
3. ``MSH|`` only                      → []
4. header with < 10 fields            → []
5. valid header, empty MSH-9          → []
6. MSH-9 = ``MDMD^T02`` (8 chars)     → []
7. MSH-9 = ``MDMDT02`` (no ^ at idx 3)→ []
8. valid ``...|MDM^T02|...``          → ['MDM','T02']

Everything is JVM-side column algebra (locate/substring/split) — no UDF,
so at 100 TB this runs inside whole-stage codegen on the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _quote(col: Column) -> Column:
    """Wrap a dynamic single-char separator in \\Q..\\E so split() treats
    it literally (separators like | ^ are regex metacharacters)."""
    return F.concat(F.lit("\\Q"), col, F.lit("\\E"))


def get_msh9(message: Column | str) -> Column:
    """ARRAY<STRING> of [messageType, messageEvent]; [] when malformed.

    Bit-parity with ``HL7Utils.kt:11-40``, including its quirks:

    - separators are taken at ``indexOf("MSH") + 3/+4`` (:24-25), but
      the split runs over the ENTIRE message from position 0 — not the
      MSH line, not the tail from 'MSH' (:30). Content before 'MSH'
      containing the field separator therefore shifts field indices
      (usually producing []), and newlines are NOT split points.
    - field index 8 of that whole-message split is MSH-9 (:35).
    - MSH-9 must be exactly 7 chars with the component separator's
      FIRST occurrence at index 3 (``indexOf(separator2) == 3``, :36)
      — a separator at index 1 AND 3 is malformed.
    - the final split has NO limit and keeps trailing empties (Kotlin
      ``split(Char)`` semantics, :37), so ``MDM^T^2`` yields
      ['MDM','T','2'], not ['MDM','T^2'].
    """
    msg = F.col(message) if isinstance(message, str) else message
    pos = F.locate("MSH", msg)  # 1-based; 0 = absent
    sep1 = F.substring(msg, pos + 3, 1)  # field separator      (offset +3)
    sep2 = F.substring(msg, pos + 4, 1)  # component separator  (offset +4)
    fields = F.split(msg, _quote(sep1), 10)  # whole message, limit 10
    # try_element_at: ANSI mode is on (session.py) and element_at throws
    # on out-of-bounds — malformed messages must yield [] instead.
    msh9 = F.try_element_at(fields, F.lit(9))  # zero-based field 8 = MSH-9
    well_formed = (
        (pos > 0)
        & (F.length(sep1) == 1)
        & (F.length(sep2) == 1)
        & (F.size(fields) >= 10)
        & (F.length(msh9) == 7)
        # first occurrence of sep2 at zero-based index 3: char 4 IS sep2
        # and sep2 does not occur in chars 1-3
        & (F.substring(msh9, 4, 1) == sep2)
        & ~F.contains(F.substring(msh9, 1, 3), sep2)
    )
    parts = F.split(msh9, _quote(sep2), -1)
    return F.when(well_formed, parts).otherwise(
        F.array().cast("array<string>")
    )


def msh9_type(message: Column | str) -> Column:
    """messageType (MSH-9.1) or NULL when malformed."""
    return F.try_element_at(get_msh9(message), F.lit(1))


def msh9_event(message: Column | str) -> Column:
    """messageEvent (MSH-9.2) or NULL when malformed."""
    return F.try_element_at(get_msh9(message), F.lit(2))
