"""MSH-9 extraction — all 8 pinned shapes from the reference's
HL7UtilsTest.kt:8-106 (via FIXTURES.md A4)."""

from pyspark.sql import functions as F

from interop_datalake_spark.functions.hl7 import get_msh9, msh9_event, msh9_type

VALID = (
    "MSH|^~\\&|EPIC|EPICADT|SMS|SMSADT|199912271408|CHARRIS|MDM^T02|1817457|D|2.5|\n"
    "PID|||0493575^^^2^ID 1||DOE^JOHN||19480203|M"
)

CASES = [
    (1, "", []),
    (2, "MSH", []),
    (3, "MSH|", []),
    (4, "MSH|^~\\&|EPIC|EPICADT|SMS", []),  # < 10 fields
    (5, "MSH|^~\\&|EPIC|EPICADT|SMS|SMSADT|199912271408|CHARRIS||1817457|D|2.5|", []),
    (6, "MSH|^~\\&|EPIC|EPICADT|SMS|SMSADT|199912271408|CHARRIS|MDMD^T02|1817457|D|2.5|", []),
    (7, "MSH|^~\\&|EPIC|EPICADT|SMS|SMSADT|199912271408|CHARRIS|MDMDT02|1817457|D|2.5|", []),
    (8, VALID, ["MDM", "T02"]),
]


def test_msh9_all_shapes(spark):
    df = spark.createDataFrame(
        [(i, m) for i, m, _ in CASES], "msg_id INT, message STRING"
    )
    got = {
        r["msg_id"]: r["msh9"]
        for r in df.select("msg_id", get_msh9("message").alias("msh9")).collect()
    }
    for i, _, expected in CASES:
        assert got[i] == expected, f"case {i}: {got[i]} != {expected}"


def test_msh9_parts(spark):
    df = spark.createDataFrame([(VALID,), ("MSH",)], "message STRING")
    rows = df.select(
        msh9_type("message").alias("t"), msh9_event("message").alias("e")
    ).collect()
    assert (rows[0]["t"], rows[0]["e"]) == ("MDM", "T02")
    assert (rows[1]["t"], rows[1]["e"]) == (None, None)


def test_msh9_not_first_segment(spark):
    # MSH located mid-message (locate, not startsWith — HL7Utils.kt:19)
    msg = "XXX\n" + VALID
    df = spark.createDataFrame([(msg,)], "message STRING")
    assert df.select(get_msh9("message").alias("m")).first()["m"] == ["MDM", "T02"]


def test_msh9_alternate_separators(spark):
    # separators are read from the message, not assumed (HL7Utils.kt:24-25)
    msg = "MSH#*~\\&#EPIC#EPICADT#SMS#SMSADT#199912271408#CHARRIS#MDM*T02#1817457#D#2.5#"
    df = spark.createDataFrame([(msg,)], "message STRING")
    assert df.select(get_msh9("message").alias("m")).first()["m"] == ["MDM", "T02"]
