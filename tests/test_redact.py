"""PII redaction (hsip/redact.py).

Pins: masking of each pattern kind, multiple occurrences, masking order
(email before digit patterns), audit counts against the raw text, the
raw column staying untouched, and custom pattern tables.
"""

from pyspark.sql import functions as F

from hsip.redact import PII_PATTERNS, redact_pii

ROWS = [
    (0, "plain text with no identifiers at all"),
    (1, "mail a.b-c_d%e+f@sub.example.co.uk and x@y.io today"),
    (2, "call +1 555-867-5309 or 555 123 4567 now"),
    (3, "hosts 10.0.0.1 and 255.255.255.0, id 123-45-6789"),
    (4, "mixed bob@ex.org 10.1.2.3 555-111-2222 987-65-4321"),
]


def _one(df, doc_id):
    return df.filter(F.col("id") == doc_id).collect()[0]


def test_each_kind_masks_and_counts(spark):
    df = spark.createDataFrame(ROWS, "id long, text string")
    out = redact_pii(df, "text")

    r0 = _one(out, 0)
    assert r0["text_redacted"] == ROWS[0][1]
    assert (r0["n_email"], r0["n_phone"], r0["n_ipv4"], r0["n_idnum"]) == (0, 0, 0, 0)

    r1 = _one(out, 1)
    assert r1["text_redacted"] == "mail [EMAIL] and [EMAIL] today"
    assert r1["n_email"] == 2

    r2 = _one(out, 2)
    assert "[PHONE]" in r2["text_redacted"]
    assert r2["n_phone"] == 2

    r3 = _one(out, 3)
    assert r3["text_redacted"] == "hosts [IPV4] and [IPV4], id [IDNUM]"
    assert (r3["n_ipv4"], r3["n_idnum"]) == (2, 1)

    r4 = _one(out, 4)
    assert r4["text_redacted"] == "mixed [EMAIL] [IPV4] [PHONE] [IDNUM]"


def test_raw_column_untouched_and_custom_patterns(spark):
    df = spark.createDataFrame(ROWS, "id long, text string")
    out = redact_pii(df, "text", out_col="clean",
                     patterns={"email": PII_PATTERNS["email"]})
    got = {r["id"]: r for r in out.collect()}
    # raw text survives verbatim next to the masked column
    assert all(got[i]["text"] == t for i, t in ROWS)
    # only the requested pattern applies; no other count columns exist
    assert got[4]["clean"] == "mixed [EMAIL] 10.1.2.3 555-111-2222 987-65-4321"
    assert "n_email" in out.columns and "n_phone" not in out.columns


def test_email_masked_before_digit_patterns(spark):
    # digits inside a local-part must not leak into phone/id masking
    df = spark.createDataFrame(
        [(0, "w 555-867-5309x@example.com z")], "id long, text string"
    )
    r = redact_pii(df, "text").collect()[0]
    assert r["text_redacted"] == "w [EMAIL] z"
    assert (r["n_email"], r["n_phone"]) == (1, 1)  # counts audit RAW text
