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

    Mirrors ``HL7Utils.kt``: locate 'MSH' (:19), field separator at
    offset +3 and component separator at +4 (:24-25), split the MSH
    line on the field separator with limit 10 (:30), take field index 8
    = MSH-9 (:35), require exactly 7 chars with the component separator
    at index 3 (:36), split into [type, event] (:37).
    """
    msg = F.col(message) if isinstance(message, str) else message
    pos = F.locate("MSH", msg)  # 1-based; 0 = absent
    # MSH segment = from 'MSH' to end of line
    tail = F.substring(msg, pos, F.length(msg))
    line = F.element_at(F.split(tail, "\\r\\n|\\r|\\n", 2), 1)
    sep1 = F.substring(line, 4, 1)  # field separator      (offset +3)
    sep2 = F.substring(line, 5, 1)  # component separator  (offset +4)
    fields = F.split(line, _quote(sep1), 10)
    # try_element_at: ANSI mode is on (session.py) and element_at throws
    # on out-of-bounds — malformed messages must yield [] instead.
    msh9 = F.try_element_at(fields, F.lit(9))  # zero-based field 8 = MSH-9
    well_formed = (
        (pos > 0)
        & (F.length(sep1) == 1)
        & (F.length(sep2) == 1)
        & (F.size(fields) >= 10)
        & (F.length(msh9) == 7)
        & (F.substring(msh9, 4, 1) == sep2)
    )
    parts = F.split(msh9, _quote(sep2), 2)
    return F.when(well_formed, parts).otherwise(
        F.array().cast("array<string>")
    )


def msh9_type(message: Column | str) -> Column:
    """messageType (MSH-9.1) or NULL when malformed."""
    return F.try_element_at(get_msh9(message), F.lit(1))


def msh9_event(message: Column | str) -> Column:
    """messageEvent (MSH-9.2) or NULL when malformed."""
    return F.try_element_at(get_msh9(message), F.lit(2))
